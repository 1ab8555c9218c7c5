"""On-device single-rigid-body plant surrogate.

The reference closes its loop through a Drake ``MultibodyPlant`` in a second
OS process over TCPROS (drake_interface_node.cpp:96-391, SURVEY.md §3.2).
For TPU-resident closed-loop rollouts we use the same model the controller
itself assumes — a single rigid body with massless legs and pinned stance
feet — integrated on device so a full gait rollout is one ``lax.scan`` with
no host round-trips. Drake remains the host-side ground truth; this
surrogate is the batched "environment" for BASELINE configs 1-3.

Dynamics (world frame):
    xddot = (sum_i f_i) / m + g
    wdot  = Iw^-1 (sum_i (p_i - x) x f_i - w x Iw w)
    Rdot  = [w]x R
integrated semi-implicitly at the physics step. Contact: stance feet are
pinned where they first touch (no slip — consistent with the friction cone
the QP enforces); swing feet follow the commanded trajectory kinematically.
Joint states come from leg IK of the body-frame foot positions, matching
what the commander's FK expects.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quadruped_control_tpu.config import GRAVITY, ControlConfig
from quadruped_control_tpu.math.rotations import so3_exp
from quadruped_control_tpu.ops.kinematics import (
    forward_kinematics,
    inverse_kinematics,
)
from quadruped_control_tpu.types import ComState, JointState


class PlantState(NamedTuple):
    com: ComState
    feet_world: jnp.ndarray  # (..., 4, 3) foot positions in world frame
    joints: JointState


def init_plant_state(cfg: ControlConfig, batch_shape=(), dtype=jnp.float32,
                     height=None) -> PlantState:
    """Initial state: the reference's laying pose — base at z=0.06 with the
    init joint configuration (mit_cheetah_config.yaml:8, 43)."""
    q0 = jnp.broadcast_to(
        jnp.array([0.0, 1.61, -2.78], dtype=dtype), batch_shape + (4, 3)
    )
    h0 = 0.06 if height is None else height
    x0 = jnp.zeros(batch_shape + (3,), dtype=dtype).at[..., 2].set(h0)
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    feet_body = forward_kinematics(q0, cfg.kinematics)
    feet_world = (
        jnp.einsum("...ij,...lj->...li", R0, feet_body) + x0[..., None, :]
    )
    feet_world = feet_world.at[..., 2].set(jnp.maximum(feet_world[..., 2], 0.0))
    com = ComState(
        R=R0, x=x0,
        xdot=jnp.zeros_like(x0), w=jnp.zeros_like(x0),
    )
    return PlantState(com=com, feet_world=feet_world,
                      joints=JointState(q=q0, qdot=jnp.zeros_like(q0)))


def plant_step(state: PlantState, forces_world, stance_mask, swing_foot_refs,
               dt, cfg: ControlConfig) -> PlantState:
    """Advance the SRB surrogate one physics step.

    Args:
      forces_world: (..., 12) ground-reaction forces ON the robot, world
        frame (the QP's primal solution — its formulation solves for the
        forces the ground applies, balance_controller.cpp docstring).
      stance_mask: (..., 4) current stance legs.
      swing_foot_refs: (..., 4, 3) world-frame reference positions for swing
        feet (from the trajectory manager).
      dt: physics step.
    Returns:
      next PlantState.
    """
    com = state.com
    dtype = com.x.dtype
    m = cfg.balance.mass
    Ib_diag = jnp.asarray(cfg.balance.inertia_diag, dtype=dtype)

    f_legs = forces_world.reshape(forces_world.shape[:-1] + (4, 3))
    f_legs = jnp.where(stance_mask[..., None], f_legs, 0.0)
    # Contact physics saturation: the ground cannot pull (fz >= 0) and
    # tangential forces live inside the friction cone. The QP enforces this
    # when converged; the plant enforces it ALWAYS, so a rare unconverged
    # f32 solve (a ~1e-2 per-tick tail event in long trot sweeps) cannot
    # inject unbounded force and NaN the whole scan — the surrogate
    # analogue of the reference's +-20 N*m torque clamp + Drake's own
    # contact model (commander_node.cpp:526, drake_interface_node.cpp:196).
    fz = jnp.clip(f_legs[..., 2], 0.0, 2.0 * cfg.balance.fz_max)
    ft_max = cfg.balance.mu * fz
    f_legs = jnp.stack(
        [jnp.clip(f_legs[..., 0], -ft_max, ft_max),
         jnp.clip(f_legs[..., 1], -ft_max, ft_max),
         fz],
        axis=-1,
    )
    f_total = jnp.sum(f_legs, axis=-2)

    gvec = jnp.array([0.0, 0.0, -GRAVITY], dtype=dtype)
    xddot = f_total / m + gvec

    r = state.feet_world - com.x[..., None, :]
    torque = jnp.sum(jnp.cross(r, f_legs), axis=-2)
    Iw = (com.R * Ib_diag[..., None, :]) @ jnp.swapaxes(com.R, -1, -2)
    # Angular MOMENTUM integration: dL/dt = torque (world frame), then
    # w = Iw^-1 L. Explicit Euler on wdot = Iw^-1(tau - w x Iw w) is
    # unstable in the gyroscopic term once the body tumbles (|w| grows
    # ~double-exponentially and so3_exp NaNs); the momentum form conserves
    # L exactly under zero torque, like the true rigid-body flow.
    L = (Iw @ com.w[..., None])[..., 0]
    L_new = L + dt * torque
    w_new = jnp.linalg.solve(Iw, L_new[..., None])[..., 0]

    # Semi-implicit Euler: velocities first, then pose. Saturation bounds
    # (the surrogate analogue of Drake's contact/joint-limit dissipation,
    # physics.yaml): a fallen, tumbling body stays FINITE so batched scans
    # never poison neighboring scenarios through a NaN reduction.
    xdot_new = com.xdot + dt * xddot
    xdot_new = jnp.clip(xdot_new, -50.0, 50.0)
    w_new = jnp.clip(w_new, -100.0, 100.0)
    x_new = com.x + dt * xdot_new
    x_new = x_new.at[..., 2].set(jnp.clip(x_new[..., 2], -1.0, 10.0))
    R_new = so3_exp(w_new * dt) @ com.R

    # Feet: stance pinned, swing tracks the reference trajectory.
    feet_world = jnp.where(
        stance_mask[..., None], state.feet_world, swing_foot_refs
    )
    feet_world = feet_world.at[..., 2].set(
        jnp.maximum(feet_world[..., 2], 0.0)
    )

    # Joint states from IK of body-frame foot positions (exact transform).
    feet_body = jnp.einsum(
        "...ji,...lj->...li", R_new, feet_world - x_new[..., None, :]
    )
    q_new = inverse_kinematics(feet_body, cfg.kinematics)
    qdot_new = (q_new - state.joints.q) / dt

    return PlantState(
        com=ComState(R=R_new, x=x_new, xdot=xdot_new, w=w_new),
        feet_world=feet_world,
        joints=JointState(q=q_new, qdot=qdot_new),
    )
