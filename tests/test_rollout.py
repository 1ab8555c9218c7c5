"""Closed-loop behavior tests: commander x SRB plant surrogate.

These mirror the reference's de-facto integration testing (Drake demo runs,
README.md:54-63) as deterministic on-device rollouts: stand-up reaches the
target height, trotting tracks the commanded twist, and the reference
preset's gravity-sign quirk produces the predicted low equilibrium.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quadruped_control_tpu.config import (
    mit_cheetah_config,
    mit_cheetah_physical_config,
)
from quadruped_control_tpu.control.rollout import (
    stand_up_rollout,
    walk_rollout,
)


@pytest.fixture(scope="module")
def stand_result():
    return stand_up_rollout(mit_cheetah_physical_config(), seconds=2.0,
                            dtype=jnp.float64)


def test_stand_up_reaches_height(stand_result):
    z = np.asarray(stand_result.trace.x[..., 2])
    assert abs(z[-1] - 0.26) < 0.01, z[-1]
    assert bool(stand_result.trace.standing[-1])
    assert np.all(np.isfinite(np.asarray(stand_result.trace.x)))


def test_stand_up_respects_torque_limits(stand_result):
    tmax = np.asarray(stand_result.trace.torque_max)
    assert np.all(tmax <= 20.0 + 1e-9)


def test_stand_up_qps_converge(stand_result):
    conv = np.asarray(stand_result.trace.qp_converged)
    assert conv.mean() > 0.99


def test_reference_gravity_quirk_equilibrium():
    """With the reference's exact SRB gravity sign + kff feedforward, the
    closed-loop equilibrium sits ~3.5 cm below the commanded height
    (analysis in config.BalanceConfig.gravity_z_term). This documents the
    quirk as behavior, not a bug in this port."""
    res = stand_up_rollout(mit_cheetah_config(), seconds=2.0,
                           dtype=jnp.float64)
    z_end = float(res.trace.x[-1, 2])
    assert 0.21 < z_end < 0.235, z_end


def test_walk_tracks_command():
    res = walk_rollout(mit_cheetah_physical_config(), vx=0.2, seconds=2.0,
                       dtype=jnp.float64)
    x = np.asarray(res.trace.x)
    v_avg = (x[-1, 0] - x[0, 0]) / 2.0
    assert v_avg > 0.1, v_avg  # moves forward at a meaningful fraction
    assert np.all(np.abs(x[:, 2] - 0.26) < 0.04)  # height held
    assert np.all(np.isfinite(x))
    # Trot: both stance and swing phases occur.
    stance_frac = float(np.mean(np.asarray(res.trace.in_stance)))
    assert 0.7 < stance_frac < 0.95


def test_walk_batched_scenarios():
    """vmapped rollout over a scenario batch — the BASELINE config-3 shape."""
    res = walk_rollout(mit_cheetah_physical_config(), vx=0.2, seconds=0.5,
                       batch_shape=(4,), dtype=jnp.float64)
    assert res.trace.x.shape[1] == 4
    assert np.all(np.isfinite(np.asarray(res.trace.x)))
    # All four identical scenarios agree.
    x = np.asarray(res.trace.x)
    np.testing.assert_allclose(x[:, 0], x[:, 1], atol=1e-9)


def test_rollout_chunked_matches_single_scan():
    """Host-side chunking is exact: same compiled tick, same carries."""
    import jax.numpy as jnp

    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.commander import init_commander_carry
    from quadruped_control_tpu.control.plant import init_plant_state
    from quadruped_control_tpu.control.rollout import (
        rollout,
        rollout_chunked,
    )

    cfg = mit_cheetah_physical_config()
    plant = init_plant_state(cfg, (), dtype=jnp.float64)
    carry = init_commander_carry((), dtype=jnp.float64)
    cmd = jnp.zeros((6,), jnp.float64)
    a = rollout(plant, carry, cmd, 45, cfg)
    b = rollout_chunked(plant, carry, cmd, 45, cfg, chunk=20)
    np.testing.assert_array_equal(np.asarray(a.trace.x),
                                  np.asarray(b.trace.x))
    np.testing.assert_array_equal(np.asarray(a.plant.joints.q),
                                  np.asarray(b.plant.joints.q))


def test_cmd_schedule_constant_matches_plain():
    """A cmd_schedule that repeats one constant twist is BITWISE the plain
    constant-cmd rollout — scheduling only changes where the command comes
    from, not the tick math."""
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.commander import init_commander_carry
    from quadruped_control_tpu.control.plant import init_plant_state
    from quadruped_control_tpu.control.rollout import rollout

    cfg = mit_cheetah_physical_config()
    plant = init_plant_state(cfg, (), dtype=jnp.float64)
    carry = init_commander_carry((), dtype=jnp.float64)
    cmd = jnp.zeros((6,), jnp.float64).at[0].set(0.2)
    steps = 30
    sched = jnp.broadcast_to(cmd, (steps, 6))
    a = rollout(plant, carry, cmd, steps, cfg)
    b = rollout(plant, carry, sched, steps, cfg, cmd_schedule=True)
    np.testing.assert_array_equal(np.asarray(a.trace.x),
                                  np.asarray(b.trace.x))
    np.testing.assert_array_equal(np.asarray(a.plant.joints.q),
                                  np.asarray(b.plant.joints.q))


def test_gait_transition_fwd_and_back():
    """The reference's headline teleop demo — walk forward AND backward in
    one session (README.md:57, cmd updated live via cmdCallback,
    commander_node.cpp:191-202) — as a single scheduled rollout: stand,
    trot to +0.2 m/s, decelerate, reverse to -0.2 m/s. The transition must
    survive closed loop: net forward progress in the forward phase, net
    backward progress in the reverse phase, height held throughout."""
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.commander import init_commander_carry
    from quadruped_control_tpu.control.plant import init_plant_state
    from quadruped_control_tpu.control.rollout import (
        piecewise_command,
        rollout,
    )

    cfg = mit_cheetah_physical_config()
    plant = init_plant_state(cfg, (), dtype=jnp.float64)
    carry = init_commander_carry((), dtype=jnp.float64)
    sched = piecewise_command(
        [(1.5, [0, 0, 0, 0, 0, 0]),        # stand up
         (2.0, [0.2, 0, 0, 0, 0, 0]),      # trot forward (demo speed)
         (0.5, [0, 0, 0, 0, 0, 0]),        # decelerate
         (2.0, [-0.2, 0, 0, 0, 0, 0])],    # reverse
        cfg.frequency, dtype=jnp.float64)
    steps = sched.shape[0]
    res = rollout(plant, carry, sched, steps, cfg, cmd_schedule=True)
    x = np.asarray(res.trace.x)
    assert np.all(np.isfinite(x))
    f = int(1.5 * cfg.frequency)
    d = int(3.5 * cfg.frequency)
    r = int(4.0 * cfg.frequency)
    fwd = x[d - 1, 0] - x[f, 0]
    back = x[-1, 0] - x[r, 0]
    assert fwd > 0.2, fwd     # meaningful forward progress at 0.2 m/s
    assert back < -0.2, back  # and meaningful backward progress after
    # Height held through BOTH transitions (the demo's upright criterion).
    assert np.all(np.abs(x[f:, 2] - 0.26) < 0.05)


def test_plant_saturates_unphysical_forces():
    """A garbage QP output (huge pulls/pushes) must not NaN the plant: the
    surrogate enforces the contact cone (fz >= 0, |ft| <= mu fz) like
    Drake's contact model bounds the reference."""
    import jax.numpy as jnp
    import numpy as np

    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.plant import (
        init_plant_state,
        plant_step,
    )

    cfg = mit_cheetah_physical_config()
    plant = init_plant_state(cfg, (), dtype=jnp.float64)
    bad = jnp.full((12,), 1.0e9, jnp.float64).at[2].set(-1.0e9)
    stance = jnp.ones(4, dtype=bool)
    for _ in range(5):
        plant = plant_step(plant, bad, stance, plant.feet_world,
                           0.01, cfg)
    x = np.asarray(plant.com.x)
    assert np.all(np.isfinite(x))
    # Bounded upward acceleration: fz <= 4 * 2 * fz_max.
    assert np.all(np.abs(x) < 10.0)


def test_fallen_robot_stays_finite():
    """Beyond the stable envelope the robot falls — and the whole scan must
    stay FINITE (momentum-form angular integration + saturation bounds +
    the planner's sqrt(z) guard): one crashed scenario must never NaN-poison
    a batched sweep."""
    res = walk_rollout(mit_cheetah_physical_config(), vx=0.5, seconds=3.0,
                       dtype=jnp.float64)
    assert np.all(np.isfinite(np.asarray(res.trace.x)))
    assert np.all(np.isfinite(np.asarray(res.trace.torque_max)))
    res32 = walk_rollout(mit_cheetah_physical_config(), vx=0.5, seconds=3.0,
                         dtype=jnp.float32)
    assert np.all(np.isfinite(np.asarray(res32.trace.x)))


def test_walk_sideways_tracks_reference_max():
    """The reference's published sideways max is 0.1 m/s (README.md:63)."""
    res = walk_rollout(mit_cheetah_physical_config(), vx=0.0, vy=0.1,
                       seconds=3.0, dtype=jnp.float64)
    x = np.asarray(res.trace.x)
    assert x[:, 2].min() > 0.2
    vy = (x[-1, 1] - x[300, 1]) / ((x.shape[0] - 300) / 300.0)
    assert abs(vy - 0.1) < 0.03, vy
    assert abs(x[-1, 0] - x[300, 0]) < 0.05  # no forward drift


def test_walk_yaw_tracks_reference_max():
    """The reference's published yaw max is 0.05 rad/s (README.md:63)."""
    from quadruped_control_tpu.math.rotations import matrix_to_rpy

    res = walk_rollout(mit_cheetah_physical_config(), vx=0.0, wz=0.05,
                       seconds=3.0, dtype=jnp.float64)
    x = np.asarray(res.trace.x)
    assert x[:, 2].min() > 0.2
    yaw_end = float(matrix_to_rpy(res.plant.com.R)[2])
    # ~2.75 s of active gait at 0.05 rad/s.
    assert 0.09 < yaw_end < 0.18, yaw_end
    assert np.abs(x[-1, :2] - x[300, :2]).max() < 0.05  # turns in place


def test_walk_backward_tracks_command():
    """Gait-transition demo: 0.2 m/s backward (README.md:57)."""
    res = walk_rollout(mit_cheetah_physical_config(), vx=-0.2,
                       seconds=3.0, dtype=jnp.float64)
    x = np.asarray(res.trace.x)
    assert x[:, 2].min() > 0.2
    v = (x[-1, 0] - x[300, 0]) / ((x.shape[0] - 300) / 300.0)
    assert abs(v + 0.2) < 0.04, v
