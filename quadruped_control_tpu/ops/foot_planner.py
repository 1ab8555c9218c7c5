"""Raibert-heuristic foothold planning as masked dataflow.

TPU-native re-implementation of ``FootPlanner`` (reference foot_planner.cpp).
The reference plans a new world-frame foothold only for legs on a
stance->swing transition, tracked by a mutable ``state_map_``
(foot_planner.cpp:106-157). Here the edge detector is a pure function of a
scan-carried ``(prev_in_stance, initialized)`` state, and the Raibert +
linear-inverted-pendulum foothold formula (foot_planner.cpp:76-104) is
evaluated for all four legs at once with the replan decision applied as a
mask — branch-free and vmappable over scenario batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quadruped_control_tpu.config import FootPlannerConfig
from quadruped_control_tpu.types import Gait


class FootholdPlan(NamedTuple):
    replan: jnp.ndarray  # (..., 4) bool — legs whose foothold was replanned
    footholds: jnp.ndarray  # (..., 4, 3) world-frame footholds (z = 0)
    prev_in_stance: jnp.ndarray  # (..., 4) carried leg states
    initialized: jnp.ndarray  # (...,) carried first-call flag


def raibert_footholds(t_stance, R, x, xdot, w, xdot_d, foot_positions,
                      cfg: FootPlannerConfig = FootPlannerConfig(),
                      symmetric_velocity=None, symmetric_omega=None,
                      capture_scale=None):
    """World-frame footholds for all legs (reference ``singleFoot``,
    foot_planner.cpp:76-104).

    foothold = p_thigh + (t_stance/2) xdot + k (xdot - xdot_d)
             + (t_stance/2) (w x (R p_foot)) + 0.5 sqrt(z/g) xdot,  z -> 0

    Args:
      R: (..., 3, 3) world-from-body rotation.
      x, xdot, w, xdot_d: (..., 3) CoM state / desired velocity.
      foot_positions: (..., 4, 3) current foot positions in the body frame.
      symmetric_velocity: optional (..., 3) velocity to use in the
        ``t_stance/2`` travel (neutral-point) term instead of the measured
        ``xdot``. The reference samples the instantaneous velocity at the
        replan edge (foot_planner.cpp:87); with a long stance (0.4 s
        half-period) a trot's lateral rocking velocity aliases into
        +-10 cm foothold scatter. Passing the commanded velocity keeps the
        travel term steady while the k- and capture-point terms retain the
        measured-velocity feedback.
      capture_scale: optional coefficient (scalar or per-instance array)
        replacing the reference's 0.5 in the LIP capture term
        (foot_planner.cpp:95-96 halves Pratt's sqrt(z/g) capture gain).
        None = reference behavior. A stronger stepping reflex damps the
        trot's lateral/roll rocking (config.FootholdTrimConfig).
    Returns:
      (..., 4, 3) footholds projected to the ground plane.
    """
    hips = cfg.hip_offsets(foot_positions.dtype)
    p_thigh = jnp.einsum("...ij,lj->...li", R, hips) + x[..., None, :]
    pcom_foot = jnp.einsum("...ij,...lj->...li", R, foot_positions)
    # symmetric_omega (optional, mirror of symmetric_velocity): the
    # reference's tangential term samples the MEASURED angular velocity
    # (foot_planner.cpp:91) — feet placed ahead of the CURRENT rotation
    # are positive feedback for an in-place turn (measured 2x yaw-rate
    # overshoot at wz = 0.02, fall at 0.05; scripts/yaw lab, round 4).
    # Feeding the COMMANDED rate keeps the term feed-forward.
    w_t = w if symmetric_omega is None else symmetric_omega
    tang_vel = jnp.cross(jnp.broadcast_to(w_t[..., None, :],
                                          pcom_foot.shape), pcom_foot)

    v_sym = xdot if symmetric_velocity is None else symmetric_velocity
    p_linear = (t_stance / 2.0) * v_sym + cfg.k * (xdot - xdot_d)
    p_tangent = (t_stance / 2.0) * tang_vel
    # z clamped >= 0: the reference would sqrt a negative height if the
    # base ever fell below ground (foot_planner.cpp:95 has no guard — a
    # crashed robot is out of its envelope); batched scans here must stay
    # FINITE so one fallen scenario cannot NaN-poison a whole sweep.
    cap = 0.5 if capture_scale is None else capture_scale
    if not isinstance(cap, float):
        cap = jnp.asarray(cap)[..., None]
    p_lip = cap * jnp.sqrt(jnp.maximum(x[..., 2:3], 0.0) / cfg.gravity) * xdot

    foothold = p_thigh + (p_linear + p_lip)[..., None, :] + p_tangent
    return foothold.at[..., 2].set(0.0)


def plan_footholds(prev_in_stance, initialized, gait: Gait, t_stance, R, x,
                   xdot, w, xdot_d, foot_positions,
                   cfg: FootPlannerConfig = FootPlannerConfig(),
                   symmetric_velocity=None, symmetric_omega=None,
                   capture_scale=None) -> FootholdPlan:
    """Edge-triggered foothold replanning (reference ``positions`` +
    ``updateStates``, foot_planner.cpp:45-74, 106-157).

    First call (``initialized`` false): plan for every swing leg
    (foot_planner.cpp:112-134). Afterwards: plan only on a stance->swing
    transition (foot_planner.cpp:139-153).
    """
    swing_now = jnp.logical_not(gait.in_stance)
    edge = jnp.logical_and(prev_in_stance, swing_now)
    replan = jnp.where(initialized[..., None], edge, swing_now)

    footholds = raibert_footholds(t_stance, R, x, xdot, w, xdot_d,
                                  foot_positions, cfg,
                                  symmetric_velocity=symmetric_velocity,
                                  symmetric_omega=symmetric_omega,
                                  capture_scale=capture_scale)
    footholds = jnp.where(replan[..., None], footholds, 0.0)

    return FootholdPlan(
        replan=replan,
        footholds=footholds,
        prev_in_stance=gait.in_stance,
        initialized=jnp.ones_like(initialized),
    )
