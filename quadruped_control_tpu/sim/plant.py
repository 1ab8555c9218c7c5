"""Torque-driven whole-body plant with compliant ground contact.

The TPU-native stand-in for the reference's Drake simulation node
(drake_interface_node.cpp): a floating-base articulated robot on a
halfspace ground with Coulomb friction (the reference registers exactly
that geometry, drake_interface_node.cpp:196-210), driven ONLY by joint
torques (jointTorqueCallback, :63-87), stepped at a fine physics substep
(physics.yaml: 0.1 ms) inside each control tick.

Contact model (Drake v0.26-class penalty/point contact):
  normal:     fz = max(0, k_n * phi + d_n * k_n * phi * phidot)
              (stiffness + Hunt-Crossley-style dissipation, clamped >= 0)
  tangential: regularized Coulomb, f_t = -mu * fz * v_t / max(|v_t|, v_s)
Contact points: the 4 feet plus 4 trunk-corner points so a fallen robot
rests on its body instead of falling through the world (Drake's trunk
collision geometry analogue) — scans stay finite beyond the envelope.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import ControlConfig
from quadruped_control_tpu.math.rotations import so3_exp
from quadruped_control_tpu.ops.kinematics import (
    forward_kinematics,
    leg_jacobian,
)
from quadruped_control_tpu.sim.dynamics import (
    mass_matrix,
    precompute_leg_kinematics,
    prefactor_mass_matrix,
    rnea_bias,
    solve_prefactored,
)
from quadruped_control_tpu.sim.model import (
    WholeBodyModel,
    mit_cheetah_whole_body_model,
)
from quadruped_control_tpu.types import ComState, JointState


@dataclasses.dataclass(frozen=True)
class ContactConfig:
    """Compliant contact + integration parameters (physics.yaml analogue).

    Tangential model ``"anchor"`` (default) is spring-damper stiction to a
    per-point contact anchor, clamped to the friction cone with the anchor
    sliding on saturation — true static friction, like Drake's near-rigid
    stiction (v_stiction 1e-3 m/s). ``"coulomb"`` is velocity-regularized
    Coulomb: simpler and stateless, but effectively viscous below
    ``stiction_velocity`` — a quadruped balancing on a support diagonal
    skates on it (measured: roll diverges within one gait cycle).
    """

    stiffness: float = 3.0e4  # N/m (~1 mm static penetration per 30 N)
    dissipation: float = 1.0  # s/m, Hunt-Crossley style
    mu: float = 0.8  # ground Coulomb friction (physics.yaml / config)
    tangential: str = "anchor"  # "anchor" | "coulomb"
    tangent_stiffness: float = 1.2e4  # N/m anchor spring
    tangent_damping: float = 80.0  # N*s/m
    stiction_velocity: float = 0.05  # m/s ("coulomb" regularization)
    substep_dt: float = 1.0e-4  # physics step (physics.yaml:6, 0.1 ms)
    trunk_contact_z: float = -0.05  # trunk corner points below hip plane


class WholeBodyState(NamedTuple):
    """Floating-base maximal state: base pose + generalized velocity.

    ``anchor`` is the per-contact-point tangential stiction anchor (world
    xy) for ``ContactConfig.tangential == "anchor"``; it resets to the
    point's current position whenever the point is airborne.
    """

    R: jnp.ndarray  # (..., 3, 3) world-from-base
    x: jnp.ndarray  # (..., 3) base origin in world
    u: jnp.ndarray  # (..., 18) [omega_b, v_b (base coords), qdot (12)]
    q: jnp.ndarray  # (..., 4, 3) joint angles
    anchor: jnp.ndarray  # (..., 8, 2) tangential contact anchors


def init_whole_body_state(cfg: ControlConfig, batch_shape=(),
                          dtype=jnp.float32, height=None,
                          q0=(0.0, 1.61, -2.78),
                          contact: "ContactConfig | None" = None
                          ) -> WholeBodyState:
    """Laying pose (mit_cheetah_config.yaml:8,43): init joints, base resting
    so the lowest contact point just touches the ground."""
    contact = contact or ContactConfig()
    q = jnp.broadcast_to(
        jnp.array(q0, dtype=dtype), batch_shape + (4, 3)
    )
    feet_body = forward_kinematics(q, cfg.kinematics)
    # Rest the lowest point (foot or trunk corner) on the ground.
    lowest = jnp.min(feet_body[..., 2], axis=-1)
    h0 = -lowest if height is None else jnp.asarray(height, dtype)
    x = jnp.zeros(batch_shape + (3,), dtype)
    x = x.at[..., 2].set(jnp.broadcast_to(h0, batch_shape))
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    u = jnp.zeros(batch_shape + (18,), dtype)
    pts_b = _contact_points_body(q, cfg, contact)
    anchor = (pts_b + x[..., None, :])[..., :2]
    return WholeBodyState(R=R, x=x, u=u, q=q, anchor=anchor)


def whole_body_com_state(state: WholeBodyState, cfg: ControlConfig):
    """What the controller 'measures': base pose published as the CoM state
    — the reference does the same (drake_interface_node.cpp:340-359 reads
    the floating-base pose out of the 25-dim discrete state, the commander
    consumes it as RobotStateCoM)."""
    R, x, u, q = state.R, state.x, state.u, state.q
    w_world = (R @ u[..., :3, None])[..., 0]
    xdot_world = (R @ u[..., 3:6, None])[..., 0]
    com = ComState(R=R, x=x, xdot=xdot_world, w=w_world)
    qdot = u[..., 6:].reshape(u.shape[:-1] + (4, 3))
    return com, JointState(q=q, qdot=qdot)


def _contact_points_body(state_q, cfg: ControlConfig,
                         contact: ContactConfig):
    """Body-frame contact points (..., 8, 3): 4 feet then 4 trunk corners,
    plus per-point leg index (-1 for trunk points)."""
    feet = forward_kinematics(state_q, cfg.kinematics)
    hips = cfg.kinematics.hip_offsets(feet.dtype)
    corners = hips.at[..., 2].add(contact.trunk_contact_z)
    corners = jnp.broadcast_to(corners, feet.shape)
    return jnp.concatenate([feet, corners], axis=-2)


def _contact_forces_world(p_w, v_w, anchor, contact: ContactConfig, dtype):
    """Compliant normal + stiction-capable tangential friction, per point.

    p_w, v_w: (..., P, 3) world positions/velocities of contact points;
    anchor: (..., P, 2) tangential stiction anchors (world xy).
    Returns ((..., P, 3) world forces on the robot, updated anchors).
    """
    phi = -p_w[..., 2]  # penetration depth
    phidot = -v_w[..., 2]
    k = contact.stiffness
    fn = k * phi * (1.0 + contact.dissipation * phidot)
    fn = jnp.where(phi > 0.0, jnp.maximum(fn, 0.0), 0.0)

    vt = v_w[..., :2]
    p_xy = p_w[..., :2]
    in_contact = phi > 0.0
    ft_max = contact.mu * fn
    if contact.tangential == "anchor":
        kt = contact.tangent_stiffness
        ct = contact.tangent_damping
        ft_raw = -kt * (p_xy - anchor) - ct * vt
        ft_norm = jnp.sqrt(jnp.sum(ft_raw * ft_raw, axis=-1) + 1e-16)
        scale = jnp.minimum(1.0, ft_max / ft_norm)
        ft = jnp.where(in_contact[..., None], scale[..., None] * ft_raw, 0.0)
        # Anchor consistency: a' = p + (ft + ct*v)/kt keeps the spring
        # exactly at the (possibly cone-clamped) force — no-op while
        # sticking, slides the anchor while slipping; airborne resets.
        anchor_new = jnp.where(
            in_contact[..., None], p_xy + (ft + ct * vt) / kt, p_xy
        )
    else:
        speed = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-16)
        scale = ft_max / jnp.maximum(speed, contact.stiction_velocity)
        ft = -scale[..., None] * vt
        anchor_new = p_xy
    return jnp.concatenate([ft, fn[..., None]], axis=-1), anchor_new


def whole_body_step(state: WholeBodyState, tau, dt,
                    model: WholeBodyModel, cfg: ControlConfig,
                    contact: ContactConfig = ContactConfig(),
                    n_substeps: int | None = None,
                    m_update: str = "substep") -> WholeBodyState:
    """Advance the articulated plant by one control period ``dt``.

    Args:
      tau: (..., 4, 3) joint torques, held constant over the period (zero-
        order hold — exactly how the reference's sim consumes the torque
        topic between control ticks, drake_interface_node.cpp:244-254).
      n_substeps: physics substeps (default: round(dt / contact.substep_dt)).
      m_update: "substep" recomputes the mass matrix every physics substep
        (accuracy-first default; use for energy/momentum audits);
        "tick" computes + prefactors M(q) once per control period and
        holds it across substeps (q moves <~0.03 rad per tick, so the
        inertia error is a few percent transiently) — the mass-matrix
        columns are ~18/19 of the RNEA work, so this is ~5x faster and is
        what the closed-loop rollouts use. Contact kinematics and bias
        forces always use the current substep state.
    """
    if n_substeps is None:
        n_substeps = max(1, int(round(dt / contact.substep_dt)))
    h = dt / n_substeps
    dtype = state.x.dtype
    tau_flat = tau.reshape(tau.shape[:-2] + (12,)).astype(dtype)

    factor0 = None
    if m_update == "tick":
        kin0 = precompute_leg_kinematics(model, state.q)
        M0 = mass_matrix(model, kin0, state.x.shape[:-1], dtype)
        factor0 = prefactor_mass_matrix(M0)

    def substep(s: WholeBodyState, _):
        R, x, u, q, anchor = s
        batch = x.shape[:-1]
        kin = precompute_leg_kinematics(model, q)
        base_v = u[..., :6]
        qdot = u[..., 6:].reshape(batch + (4, 3))
        bias = rnea_bias(model, kin, R, base_v, qdot)
        if factor0 is None:
            factor = prefactor_mass_matrix(
                mass_matrix(model, kin, batch, dtype)
            )
        else:
            factor = factor0

        # Contact kinematics (world frame).
        pts_b = _contact_points_body(q, cfg, contact)  # (..., 8, 3)
        p_w = (
            jnp.einsum("...ij,...pj->...pi", R, pts_b) + x[..., None, :]
        )
        w_b = u[..., :3]
        v_b = u[..., 3:6]
        J_leg = leg_jacobian(q, cfg.kinematics)  # (..., 4, 3, 3)
        qdot_leg = qdot  # (..., 4, 3)
        v_pts_b = (
            v_b[..., None, :]
            + jnp.cross(
                jnp.broadcast_to(w_b[..., None, :], pts_b.shape), pts_b
            )
        )
        v_feet_joint = (J_leg @ qdot_leg[..., None])[..., 0]  # (..., 4, 3)
        v_pts_b = v_pts_b.at[..., :4, :].add(v_feet_joint)
        v_w = jnp.einsum("...ij,...pj->...pi", R, v_pts_b)

        f_w, anchor_new = _contact_forces_world(
            p_w, v_w, anchor, contact, dtype
        )  # (..., 8, 3)
        f_b = jnp.einsum("...ji,...pj->...pi", R, f_w)

        # Generalized contact force: tau_w = p x f, tau_v = f,
        # tau_leg = J^T f (feet only).
        g_w = jnp.sum(jnp.cross(pts_b, f_b), axis=-2)
        g_v = jnp.sum(f_b, axis=-2)
        g_leg = (
            jnp.swapaxes(J_leg, -1, -2) @ f_b[..., :4, :, None]
        )[..., 0]
        g_contact = jnp.concatenate(
            [g_w, g_v, g_leg.reshape(batch + (12,))], axis=-1
        )

        damping = model.joint_damping.reshape(12).astype(dtype)
        g_applied = jnp.concatenate(
            [
                jnp.zeros(batch + (6,), dtype),
                tau_flat - damping * u[..., 6:],
            ],
            axis=-1,
        )

        rhs = g_applied + g_contact - bias
        udot = solve_prefactored(factor, rhs)

        # Semi-implicit Euler: velocity first, then pose.
        u_new = u + h * udot
        # Post-fall poison guard (SURVEY §5 "diverged instances flagged,
        # not fatal"): a fully fallen robot (rolled body + saturated
        # torques + stiff compliant contact at the explicit substep rate)
        # can take one explosive substep whose velocities then NaN the
        # scenario's lanes a few ticks later. Two-stage guard: (1) clamp
        # generalized velocities to a far-beyond-envelope bound (200 — the
        # trot peaks |u| < 30) so a single hard impact cannot launch the
        # integrator; (2) if a substep still produces a non-finite value,
        # FREEZE that instance at its last finite state — one crashed
        # scenario can never poison a batched sweep (the SRB surrogate's
        # long-standing guarantee, now matched). Nominal rollouts never
        # touch either path (bound is 6x the envelope; freeze needs a
        # non-finite). The reference leans on Drake's implicit integrator
        # here (drake_interface_node.cpp:184-191).
        u_new = jnp.clip(u_new, -200.0, 200.0)
        w_new = u_new[..., :3]
        v_new = u_new[..., 3:6]
        x_new = x + h * (R @ v_new[..., None])[..., 0]
        R_new = R @ so3_exp(w_new * h)
        q_new = q + h * u_new[..., 6:].reshape(batch + (4, 3))
        ok = (
            jnp.isfinite(u_new).all(-1)
            & jnp.isfinite(x_new).all(-1)
            & jnp.isfinite(R_new).all((-1, -2))
            & jnp.isfinite(q_new).all((-1, -2))
            # anchor too (round-4 advisor): otherwise a non-finite contact
            # anchor can be committed on a substep whose other state is
            # still finite, and the freeze then latches one substep late
            # with a poisoned anchor.
            & jnp.isfinite(anchor_new).all((-1, -2))
        )
        okv = ok[..., None]
        new = WholeBodyState(
            R=jnp.where(okv[..., None], R_new, R),
            x=jnp.where(okv, x_new, x),
            # zeroed velocity on freeze: carrying the pre-blow-up u would
            # re-diverge on the next substep; a frozen crash site stays put.
            u=jnp.where(okv, u_new, jnp.zeros_like(u)),
            q=jnp.where(okv[..., None], q_new, q),
            anchor=jnp.where(okv[..., None], anchor_new, anchor),
        )
        return new, None

    state, _ = lax.scan(substep, state, None, length=n_substeps)
    return state
