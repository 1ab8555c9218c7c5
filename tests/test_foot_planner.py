"""Raibert foothold planner vs float64 loop oracle (foot_planner.cpp)."""

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from quadruped_control_tpu.config import FootPlannerConfig
from quadruped_control_tpu.ops import foot_planner as fp
from quadruped_control_tpu.types import Gait

CFG = FootPlannerConfig()

HIPS = np.array(
    [[-0.196, 0.127, 0.0], [0.196, 0.127, 0.0],
     [-0.196, -0.127, 0.0], [0.196, -0.127, 0.0]]
)


def single_foot_oracle(t_stance, Rwb, x, xdot, w, xdot_d, foot_pos, leg):
    """Float64 reimplementation of singleFoot (foot_planner.cpp:76-104)."""
    p_thigh = Rwb @ HIPS[leg] + x
    pcom_foot = Rwb @ foot_pos
    tang_vel = np.cross(w, pcom_foot)
    p_linear = (t_stance / 2.0) * xdot + CFG.k * (xdot - xdot_d)
    p_tangent = (t_stance / 2.0) * tang_vel
    p_lip = 0.5 * np.sqrt(x[2] / 9.81) * xdot
    foothold = p_thigh + p_linear + p_tangent + p_lip
    foothold[2] = 0.0
    return foothold


def test_raibert_matches_oracle(rng):
    Rwb = R.from_euler("xyz", rng.uniform(-0.2, 0.2, 3)).as_matrix()
    x = np.array([0.1, -0.05, 0.26])
    xdot = rng.normal(size=3) * 0.3
    w = rng.normal(size=3) * 0.2
    xdot_d = rng.normal(size=3) * 0.3
    feet = rng.normal(size=(4, 3)) * 0.2
    got = np.asarray(
        fp.raibert_footholds(
            0.8, jnp.asarray(Rwb), jnp.asarray(x), jnp.asarray(xdot),
            jnp.asarray(w), jnp.asarray(xdot_d), jnp.asarray(feet), CFG,
        )
    )
    for leg in range(4):
        np.testing.assert_allclose(
            got[leg], single_foot_oracle(0.8, Rwb, x, xdot, w, xdot_d, feet[leg], leg),
            atol=1e-12,
        )


def _plan(prev, init, in_stance):
    gait = Gait(in_stance=jnp.asarray(in_stance), phase=jnp.zeros(4))
    return fp.plan_footholds(
        jnp.asarray(prev), jnp.asarray(init), gait, 0.8,
        jnp.eye(3), jnp.array([0.0, 0.0, 0.26]), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros((4, 3)), CFG,
    )


def test_edge_detection_first_call():
    """Uninitialized: plan for every swing leg (foot_planner.cpp:112-134)."""
    plan = _plan(np.ones(4, bool), np.asarray(False),
                 np.array([True, False, False, True]))
    np.testing.assert_array_equal(
        np.asarray(plan.replan), [False, True, True, False]
    )
    assert bool(plan.initialized)


def test_edge_detection_stance_to_swing_only():
    """Initialized: replan only on stance->swing edges
    (foot_planner.cpp:139-153)."""
    prev = np.array([True, True, False, False])
    now = np.array([True, False, False, True])  # FL edges, FR swings->stance
    plan = _plan(prev, np.asarray(True), now)
    np.testing.assert_array_equal(
        np.asarray(plan.replan), [False, True, False, False]
    )
    np.testing.assert_array_equal(np.asarray(plan.prev_in_stance), now)


def test_footholds_on_ground_plane(rng):
    plan = _plan(np.ones(4, bool), np.asarray(False), np.zeros(4, bool))
    np.testing.assert_allclose(np.asarray(plan.footholds)[:, 2], 0.0)
