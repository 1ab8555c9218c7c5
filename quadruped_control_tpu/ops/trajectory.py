"""Swing-foot trajectories, twist integration, and support polygon.

TPU-native re-implementation of trajectory.{hpp,cpp}:

  - ``FootTrajectory``: a 6th-order polynomial per axis through 7 boundary
    constraints (trajectory.cpp:256-296). The reference solves the 7x7 system
    ``A @ coeffs = B`` with ``arma::solve`` on every replan; but A is a
    *constant* Vandermonde-like matrix, so here ``A^-1`` is precomputed once
    in float64 and every replan is a single (7x7)@(7x3) matmul — batched
    across legs and scenarios it maps straight onto the MXU.
  - ``FootTrajectoryManager``: phase -> trajectory-time affine clamp
    (trajectory.cpp:300-307, 366-388) as pure functions over coefficient
    pytrees (:class:`FootTrajCoeffs`) instead of a mutable map.
  - ``integrate_twist_yaw`` (trajectory.cpp:29-69): desired CoM pose from a
    commanded body twist, with roll/pitch zeroed to stop drift.
  - ``SupportPolygon`` (trajectory.cpp:71-147): erf-weighted virtual CoM
    target from scheduled contact phases.
"""

from __future__ import annotations

import jax.scipy.special
import jax.numpy as jnp
import numpy as np

from quadruped_control_tpu.config import GaitConfig
from quadruped_control_tpu.math.rotations import (
    matrix_to_rpy,
    rpy_to_matrix,
    so3_exp,
    transform_apply,
)
from quadruped_control_tpu.types import FootState, FootTrajCoeffs, Gait

# The constant 7x7 constraint system (trajectory.cpp:267-274):
# rows = [s(0), s(1), s(0.5), sdot(0), sdot(1), sddot(0), sddot(1)].
_A_CONSTRAINTS = np.array(
    [
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
        [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625],
        [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        [0.0, 0.0, 2.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 2.0, 6.0, 12.0, 20.0, 30.0],
    ]
)
_A_INV = np.linalg.inv(_A_CONSTRAINTS)


def sextic_coefficients(p_start, p_center, p_final):
    """Polynomial coefficients through (p0, pc, pf) with zero boundary
    velocity/acceleration (trajectory.cpp:220-225, 279-296).

    Args:
      p_start, p_center, p_final: (..., 3) waypoints.
    Returns:
      (..., 7, 3) coefficients (constant term first).
    """
    dtype = p_start.dtype
    zeros = jnp.zeros_like(p_start)
    # B rows: [p_start, p_final, p_center, 0, 0, 0, 0] (trajectory.cpp:290-294).
    B = jnp.stack([p_start, p_final, p_center, zeros, zeros, zeros, zeros], axis=-2)
    return jnp.asarray(_A_INV, dtype=dtype) @ B


def sextic_track(coeffs, t):
    """Position/velocity on the polynomial at normalized time ``t`` in [0,1]
    (trajectory.cpp:227-254).

    Args:
      coeffs: (..., 7, 3).
      t: broadcastable to coeffs' batch shape.
    Returns:
      FootState with (..., 3) position and velocity.
    """
    t = jnp.asarray(t, dtype=coeffs.dtype)
    # Powers built multiplicatively (autodiff-safe at t = 0, unlike t**k).
    one = jnp.ones_like(t)
    t2 = t * t
    t3 = t2 * t
    t4 = t3 * t
    t5 = t4 * t
    t6 = t5 * t
    powers = jnp.stack([one, t, t2, t3, t4, t5, t6], axis=-1)
    zero = jnp.zeros_like(t)
    dpowers = jnp.stack(
        [zero, one, 2 * t, 3 * t2, 4 * t3, 5 * t4, 6 * t5], axis=-1
    )
    position = jnp.einsum("...k,...kd->...d", powers, coeffs)
    velocity = jnp.einsum("...k,...kd->...d", dpowers, coeffs)
    return FootState(position=position, velocity=velocity)


def sextic_accel(coeffs, t):
    """Second derivative of the sextic at normalized time ``t`` in [0,1].

    The reference computes (and then comments out) exactly this
    (trajectory.cpp:246-251) — it never ships acceleration references.
    Used by the swing inertia feedforward (commander ``swing_accel_ff``):
    real-time acceleration is this value / t_swing^2. Zero at both
    boundaries by the sextic's construction, so feedforward torque
    vanishes at lift-off and touchdown.
    """
    t = jnp.asarray(t, dtype=coeffs.dtype)
    one = jnp.ones_like(t)
    zero = jnp.zeros_like(t)
    t2 = t * t
    t3 = t2 * t
    t4 = t3 * t
    ddpowers = jnp.stack(
        [zero, zero, 2 * one, 6 * t, 12 * t2, 20 * t3, 30 * t4], axis=-1
    )
    return jnp.einsum("...k,...kd->...d", ddpowers, coeffs)


def swing_time_of_phase(phase, cfg: GaitConfig):
    """Gait phase -> trajectory time t = clamp(slope*phase + intercept, 0, 1)
    (trajectory.cpp:300-307, 373)."""
    slope = 1.0 / (1.0 - cfg.stance_phase)
    intercept = 1.0 - slope
    return jnp.clip(slope * phase + intercept, 0.0, 1.0)


def plan_swing_trajectories(traj: FootTrajCoeffs, p_start, p_final, replan_mask,
                            cfg: GaitConfig) -> FootTrajCoeffs:
    """Replan per-leg swing trajectories where ``replan_mask`` is set.

    The apex is the midpoint at z = swing height (trajectory.cpp:322-324).
    Legs not replanned keep their carried coefficients (the reference's
    ``traj_map_`` persistence).

    Args:
      traj: carried coefficients.
      p_start, p_final: (..., 4, 3) world-frame bounds.
      replan_mask: (..., 4) bool.
    Returns:
      updated FootTrajCoeffs.
    """
    p_center = 0.5 * (p_start + p_final)
    p_center = p_center.at[..., 2].set(cfg.swing_height)
    new_coeffs = sextic_coefficients(p_start, p_center, p_final)
    coeffs = jnp.where(replan_mask[..., None, None], new_coeffs, traj.coeffs)
    valid = jnp.logical_or(traj.valid, replan_mask)
    return FootTrajCoeffs(coeffs=coeffs, valid=valid)


def reference_foot_states(traj: FootTrajCoeffs, gait: Gait,
                          cfg: GaitConfig) -> FootState:
    """Reference foot states for all legs at the gait's phases
    (trajectory.cpp:348-388). Legs without a valid trajectory return zeros —
    the reference's lookup-miss path (trajectory.cpp:382-388)."""
    t = swing_time_of_phase(gait.phase, cfg)
    state = sextic_track(traj.coeffs, t)
    mask = traj.valid[..., None]
    return FootState(
        position=jnp.where(mask, state.position, 0.0),
        velocity=jnp.where(mask, state.velocity, 0.0),
    )


def integrate_twist_yaw(R, x, twist, dt):
    """Desired CoM pose from a commanded body twist (trajectory.cpp:29-69).

    The body pose used for integration keeps only yaw (roll/pitch zeroed to
    stop drift, trajectory.cpp:57-62). The twist is ``[v; w]`` in body frame;
    the incremental rotation is exp([w dt]) and the translation is rotated by
    it before composing (trajectory.cpp:48-54 — including the reference's
    choice to rotate v by R(bb') rather than integrate exactly).

    Args:
      R: (..., 3, 3) current world-from-body rotation.
      x: (..., 3) current CoM position.
      twist: (..., 6) [vx, vy, vz, wx, wy, wz] body twist.
      dt: integration step (commander uses 0.001, commander_node.cpp:344).
    Returns:
      (R_desired, x_desired).
    """
    delta_aa = twist[..., 3:] * dt
    Rbbp = so3_exp(delta_aa)
    tbbp = (Rbbp @ (twist[..., :3] * dt)[..., None])[..., 0]

    rpy = matrix_to_rpy(R)
    yaw_only = jnp.stack(
        [jnp.zeros_like(rpy[..., 0]), jnp.zeros_like(rpy[..., 1]), rpy[..., 2]],
        axis=-1,
    )
    Rwb_yaw = rpy_to_matrix(yaw_only)
    # Twb' = Twb_yaw * Tbb'
    R_new = Rwb_yaw @ Rbbp
    x_new = transform_apply(Rwb_yaw, x, tbbp)
    return R_new, x_new


# Adjacent legs (clockwise, counter-clockwise) per leg in [RL, FL, RR, FR]
# order (trajectory.cpp:73-79): RL->(FL,RR), FL->(FR,RL), FR->(RR,FL),
# RR->(RL,FR).
_ADJ_MINUS = jnp.array([1, 3, 0, 2])  # clockwise neighbor index
_ADJ_PLUS = jnp.array([2, 0, 3, 1])  # counter-clockwise neighbor index


def support_polygon_position(stance_start, stance_end, swing_start, swing_end,
                             foot_positions, gait: Gait):
    """Virtual predictive support-polygon CoM (x, y) target
    (trajectory.cpp:81-147).

    Args:
      stance_start/stance_end/swing_start/swing_end: (..., 4) scheduled phase
        windows per leg (reference ``ScheduledPhasesMap``).
      foot_positions: (..., 4, 3) foot positions.
      gait: current gait snapshot.
    Returns:
      (..., 2) virtual CoM target.
    """
    erf = jax.scipy.special.erf
    root2 = jnp.sqrt(jnp.asarray(2.0, dtype=gait.phase.dtype))
    eps = 1e-12
    phase = gait.phase

    w_stance = 0.5 * (
        erf(phase / (stance_start * root2 + eps))
        + erf((1.0 - phase) / (stance_end * root2 + eps))
    )
    w_swing = 0.5 * (
        2.0
        + erf(-phase / (swing_start * root2 + eps))
        + erf((phase - 1.0) / (swing_end * root2 + eps))
    )
    weight = jnp.where(gait.in_stance, w_stance, w_swing)

    p = foot_positions[..., :2]
    p_minus = jnp.take(p, _ADJ_MINUS, axis=-2)
    p_plus = jnp.take(p, _ADJ_PLUS, axis=-2)
    w_minus = jnp.take(weight, _ADJ_MINUS, axis=-1)
    w_plus = jnp.take(weight, _ADJ_PLUS, axis=-1)

    wcol = weight[..., None]
    zeta_minus = p * wcol + p_minus * (1.0 - wcol)
    zeta_plus = p * wcol + p_plus * (1.0 - wcol)

    supports = (
        wcol * p + w_minus[..., None] * zeta_minus + w_plus[..., None] * zeta_plus
    ) / (weight + w_minus + w_plus)[..., None]

    return jnp.mean(supports, axis=-2)
