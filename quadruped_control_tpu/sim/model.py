"""Whole-body model parameters for the MIT Mini Cheetah.

The reference's articulated model lives in a URDF from the companion
``mit_cheetah_description`` repo (quadruped.repos:6-9 — not part of the
reference checkout), parsed by Drake (drake_interface_node.cpp:184-191).
The kinematic tree is fully determined by the controller-side constants the
reference DOES ship (kinematics.cpp:23-31): per-leg chain
``Rx(q1) · [0,l1,0] · Ry(q2) · [0,0,-l2] · Ry(q3) · [0,0,-l3]`` hanging off
hip offsets ``(±0.196, ±0.050, 0)``.

Inertial parameters are NOT in the reference checkout, so this module
synthesizes a documented, physically-plausible set:

  - trunk: the SRB inertia the reference's controller uses,
    diag(0.011253, 0.036203, 0.042673) (mit_cheetah_config.yaml:94-96 — the
    published MIT Mini Cheetah body inertia), mass = total − legs;
  - leg links: Mini-Cheetah-like masses (abad 0.54 kg, thigh 0.634 kg,
    shank 0.151 kg) with thin-rod / point inertia approximations;
  - joint armature: reflected rotor inertia (gear ratio ~6) on each joint.

Total mass equals ``BalanceConfig.mass`` (11 kg) so the SRB controller's
model and the simulated robot agree on weight; the controller's massless-leg
assumption vs the sim's ~48 % leg mass is exactly the model mismatch the
reference's Drake validation exercises.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quadruped_control_tpu.config import ControlConfig, KinematicsConfig


class WholeBodyModel(NamedTuple):
    """Batched-friendly parameter pytree for the 13-body floating tree.

    Bodies: 0 = trunk (free joint); per leg ``l`` in [RL, FL, RR, FR] order
    a 3-joint chain abad -> thigh -> shank. All per-link arrays carry a
    leading leg axis of size 4 and a joint axis of size 3 (abad, thigh,
    shank). Frames: link frame ``(l, j)`` sits at joint ``j`` with the
    joint rotation applied; joint axes are x (abad) and y (thigh, knee) in
    the local frame — the ``Rx·Ry·Ry`` chain of kinematics.cpp:67-103.
    """

    # Joint placements: translation from parent link frame to joint frame,
    # in parent coordinates. (4, 3 joints, 3)
    joint_offsets: jnp.ndarray
    # Joint axis unit vectors in the child link frame. (4, 3, 3)
    joint_axes: jnp.ndarray
    # Link masses (4, 3) and COM offsets in link frame (4, 3, 3).
    link_mass: jnp.ndarray
    link_com: jnp.ndarray
    # Link rotational inertia about the link COM, link frame. (4, 3, 3, 3)
    link_inertia: jnp.ndarray
    # Trunk.
    trunk_mass: jnp.ndarray  # ()
    trunk_inertia: jnp.ndarray  # (3, 3) about trunk COM = base origin
    # Reflected rotor inertia added to each joint's diagonal of M. (4, 3)
    armature: jnp.ndarray
    # Viscous joint damping  tau -= damping * qdot. (4, 3)
    joint_damping: jnp.ndarray


def mit_cheetah_whole_body_model(
    cfg: ControlConfig | None = None,
    dtype=jnp.float32,
    abad_mass: float = 0.54,
    thigh_mass: float = 0.634,
    shank_mass: float = 0.151,
    armature: float = 0.002,
    joint_damping: float = 0.01,
) -> WholeBodyModel:
    """Build the default whole-body model from the controller config.

    Geometry comes from ``cfg.kinematics`` (the reference's exact
    constants); inertials are the synthesized set documented in the module
    docstring. ``trunk_mass = cfg.balance.mass − 4·(leg link masses)``.
    """
    cfg = cfg or ControlConfig()
    kin: KinematicsConfig = cfg.kinematics

    hips = kin.hip_offsets(dtype)  # (4, 3)
    l1s = kin.l1_signed(dtype)  # (4,)
    zeros4 = jnp.zeros((4,), dtype)

    # Joint offsets in parent coordinates:
    #   abad joint at the hip offset (parent = trunk);
    #   thigh joint at (0, ±l1, 0) in the abad frame;
    #   knee joint at (0, 0, -l2) in the thigh frame.
    off_abad = hips
    off_thigh = jnp.stack([zeros4, l1s, zeros4], axis=-1)
    off_knee = jnp.stack(
        [zeros4, zeros4, jnp.full((4,), -kin.l2, dtype)], axis=-1
    )
    joint_offsets = jnp.stack([off_abad, off_thigh, off_knee], axis=1)

    ex = jnp.array([1.0, 0.0, 0.0], dtype)
    ey = jnp.array([0.0, 1.0, 0.0], dtype)
    joint_axes = jnp.broadcast_to(
        jnp.stack([ex, ey, ey], axis=0), (4, 3, 3)
    )

    link_mass = jnp.broadcast_to(
        jnp.array([abad_mass, thigh_mass, shank_mass], dtype), (4, 3)
    )

    # COM offsets: abad COM halfway to the hip-pitch joint (lateral);
    # thigh/shank COM halfway along the (0, 0, -l) link vector.
    com_abad = jnp.stack([zeros4, 0.5 * l1s, zeros4], axis=-1)
    com_thigh = jnp.stack(
        [zeros4, zeros4, jnp.full((4,), -0.5 * kin.l2, dtype)], axis=-1
    )
    com_shank = jnp.stack(
        [zeros4, zeros4, jnp.full((4,), -0.5 * kin.l3, dtype)], axis=-1
    )
    link_com = jnp.stack([com_abad, com_thigh, com_shank], axis=1)

    def _rod_inertia(m, length, axis):
        """Thin rod along `axis` (0=x,1=y,2=z): I_perp = m l^2 / 12 plus a
        small floor so no principal moment is exactly zero."""
        i_perp = m * length * length / 12.0
        floor = 1e-5
        diag = [i_perp + floor] * 3
        diag[axis] = floor
        return jnp.diag(jnp.array(diag, dtype))

    I_abad = _rod_inertia(abad_mass, kin.l1, 1)  # lateral rod (y)
    I_thigh = _rod_inertia(thigh_mass, kin.l2, 2)  # along z
    I_shank = _rod_inertia(shank_mass, kin.l3, 2)
    link_inertia = jnp.broadcast_to(
        jnp.stack([I_abad, I_thigh, I_shank], axis=0), (4, 3, 3, 3)
    )

    leg_mass_total = 4.0 * (abad_mass + thigh_mass + shank_mass)
    trunk_mass = jnp.asarray(cfg.balance.mass - leg_mass_total, dtype)
    trunk_inertia = jnp.diag(jnp.asarray(cfg.balance.inertia_diag, dtype))

    return WholeBodyModel(
        joint_offsets=joint_offsets,
        joint_axes=joint_axes,
        link_mass=link_mass,
        link_com=link_com,
        link_inertia=link_inertia,
        trunk_mass=trunk_mass,
        trunk_inertia=trunk_inertia,
        armature=jnp.full((4, 3), armature, dtype),
        joint_damping=jnp.full((4, 3), joint_damping, dtype),
    )


def mit_cheetah_urdf_model(
    cfg: ControlConfig | None = None,
    dtype=jnp.float32,
    total_mass: float | None = None,
    joint_damping: float = 0.01,
) -> WholeBodyModel:
    """Whole-body model with the PUBLISHED Mini Cheetah link inertials.

    The synthesized default (:func:`mit_cheetah_whole_body_model`) places
    leg COMs at mid-link with thin-rod inertias — plausible but wrong in a
    way that matters: the real Mini Cheetah concentrates leg mass AT THE
    HIP (co-axial actuators) with a 0.064 kg carbon-fiber lower leg, so
    its swing-leg reaction dynamics are far tamer than mid-link rods of
    the same total mass. This preset encodes the published values from
    Katz, Di Carlo & Kim, "Mini Cheetah: A Platform for Pushing the Limits
    of Dynamic Quadruped Control" (ICRA 2019) as reproduced in the open
    mit_cheetah_description / Cheetah-Software model (the same URDF family
    the reference's Drake sim loads, quadruped.repos:6-9,
    drake_interface_node.cpp:184-191):

      body:  m 3.3 kg, I diag (11253, 36203, 42673)e-6 kg m^2 — note this
             EXACTLY matches the reference's SRB inertia
             (mit_cheetah_config.yaml:94-96), corroborating the source;
      abad:  m 0.54 kg,  com (0, +-0.036, 0),    I (381, 560, 444)e-6;
      thigh: m 0.634 kg, com (0, +-0.016, -0.02), I (1983, 2103, 676)e-6;
      shank: m 0.064 kg, com (0, 0, -0.061),      I (245, 248, 6)e-6;
      rotor: I 33e-6 kg m^2 at gear ratio 6 -> reflected armature
             33e-6 * 36 = 1.188e-3 kg m^2 per joint.

    (+- mirrors left/right with the hip y sign.) Link GEOMETRY stays the
    reference's exact kinematic constants (kinematics.cpp:23-31) — only
    inertials change; the published link lengths differ by a few mm, and
    behavioral parity pins geometry to the controller's model.

    ``total_mass`` (default ``cfg.balance.mass`` = the reference's 11 kg):
    the trunk absorbs the difference between the published 8.25 kg bare
    robot and the controller's SRB mass — physically the battery /
    electronics payload rides in the trunk, and the controller/plant
    weight agreement is the same invariant the synthesized model keeps.
    Pass e.g. ``total_mass=8.252`` to simulate the bare published robot
    (the controller's 11 kg model then over-forces it — the reference
    would have the same mismatch against a bare-robot URDF).

    Per-leg mass drops 1.325 -> 0.838 kg (48% -> 30% of an 11 kg robot)
    and, more importantly, the distal mass nearly vanishes — measured
    closed-loop effect: the reverse trot that falls on the synthesized
    model within ~2 s survives here (tests/test_whole_body_loop.py
    gait-transition test; PARITY.md "Model fidelity").
    """
    cfg = cfg or ControlConfig()
    kin: KinematicsConfig = cfg.kinematics

    base = mit_cheetah_whole_body_model(cfg, dtype=dtype)
    l1s = kin.l1_signed(dtype)  # (4,) signed hip-to-leg lateral offset
    side = jnp.sign(l1s)  # +1 left legs, -1 right legs
    zeros4 = jnp.zeros((4,), dtype)

    abad_mass, thigh_mass, shank_mass = 0.54, 0.634, 0.064
    link_mass = jnp.broadcast_to(
        jnp.array([abad_mass, thigh_mass, shank_mass], dtype), (4, 3))

    com_abad = jnp.stack([zeros4, 0.036 * side, zeros4], axis=-1)
    com_thigh = jnp.stack(
        [zeros4, 0.016 * side, jnp.full((4,), -0.02, dtype)], axis=-1)
    com_shank = jnp.stack(
        [zeros4, zeros4, jnp.full((4,), -0.061, dtype)], axis=-1)
    link_com = jnp.stack([com_abad, com_thigh, com_shank], axis=1)

    e6 = 1e-6
    I_abad = jnp.diag(jnp.array([381., 560., 444.], dtype) * e6)
    I_thigh = jnp.diag(jnp.array([1983., 2103., 676.], dtype) * e6)
    I_shank = jnp.diag(jnp.array([245., 248., 6.], dtype) * e6)
    link_inertia = jnp.broadcast_to(
        jnp.stack([I_abad, I_thigh, I_shank], axis=0), (4, 3, 3, 3))

    total = float(cfg.balance.mass) if total_mass is None else float(
        total_mass)
    leg_total = 4.0 * (abad_mass + thigh_mass + shank_mass)
    trunk_mass = jnp.asarray(total - leg_total, dtype)

    return base._replace(
        link_mass=link_mass,
        link_com=link_com,
        link_inertia=link_inertia,
        trunk_mass=trunk_mass,
        armature=jnp.full((4, 3), 33e-6 * 36.0, dtype),
        joint_damping=jnp.full((4, 3), joint_damping, dtype),
    )
