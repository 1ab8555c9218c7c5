"""Core state containers (TPU-native replacement for types.hpp).

The reference keys everything by leg-name strings (``GaitMap``,
``FootholdMap``, ``ForceMap``, ... — types.hpp:27-127). Here each map becomes
a fixed-axis array over legs in ``[RL, FL, RR, FR]`` order, packed into
NamedTuples (which JAX treats as pytrees), so every container flows through
jit/vmap/scan unchanged.

``LegState`` enum -> boolean mask ``in_stance`` of shape (..., 4); ``True`` is
stance (reference ``LegState::stance``), ``False`` is swing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ComState(NamedTuple):
    """Body CoM state in world frame (reference ``RobotStateCoM``)."""

    R: jnp.ndarray  # (..., 3, 3) world-from-body rotation Rwb
    x: jnp.ndarray  # (..., 3) CoM position
    xdot: jnp.ndarray  # (..., 3) CoM linear velocity
    w: jnp.ndarray  # (..., 3) body angular velocity (world frame)


class JointState(NamedTuple):
    """Per-leg joint positions/velocities (reference ``LegJointStates``)."""

    q: jnp.ndarray  # (..., 4, 3)
    qdot: jnp.ndarray  # (..., 4, 3)


class FootState(NamedTuple):
    """Reference/actual foot kinematic state (reference ``FootState``)."""

    position: jnp.ndarray  # (..., 4, 3)
    velocity: jnp.ndarray  # (..., 4, 3)


class Gait(NamedTuple):
    """Gait snapshot: stance mask + phase per leg (reference ``GaitMap``)."""

    in_stance: jnp.ndarray  # (..., 4) bool
    phase: jnp.ndarray  # (..., 4) in [0, 1)


class FootTrajCoeffs(NamedTuple):
    """Per-leg sextic swing-trajectory coefficients (trajectory.hpp:89-136).

    ``coeffs[leg]`` is the 7x3 polynomial coefficient matrix; ``valid`` marks
    legs that have a planned trajectory (replaces the reference's
    ``traj_map_.find`` miss path, trajectory.cpp:366-388).
    """

    coeffs: jnp.ndarray  # (..., 4, 7, 3)
    valid: jnp.ndarray  # (..., 4) bool


class PlannerState(NamedTuple):
    """Carried state for stance->swing edge detection + planned footholds.

    Replaces FootPlanner's mutable ``state_map_`` (foot_planner.hpp:39) and
    the trajectory manager's ``traj_map_`` with scan-carried pytrees.
    """

    prev_in_stance: jnp.ndarray  # (..., 4) bool
    initialized: jnp.ndarray  # (...,) bool — first-call semantics
    traj: FootTrajCoeffs


def make_stance_gait(batch_shape=(), dtype=jnp.float32) -> Gait:
    """All-legs-stance gait at phase 0 (reference gait.cpp:24-34)."""
    return Gait(
        in_stance=jnp.ones(batch_shape + (4,), dtype=bool),
        phase=jnp.zeros(batch_shape + (4,), dtype=dtype),
    )


def init_planner_state(batch_shape=(), dtype=jnp.float32) -> PlannerState:
    return PlannerState(
        prev_in_stance=jnp.ones(batch_shape + (4,), dtype=bool),
        initialized=jnp.zeros(batch_shape, dtype=bool),
        traj=FootTrajCoeffs(
            coeffs=jnp.zeros(batch_shape + (4, 7, 3), dtype=dtype),
            valid=jnp.zeros(batch_shape + (4,), dtype=bool),
        ),
    )
