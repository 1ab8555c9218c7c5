"""Gait phase algebra vs the reference's threaded integrator (gait.cpp)."""

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.config import GaitConfig
from quadruped_control_tpu.ops import gait as gait_ops

CFG = GaitConfig()  # t_stance=0.8, t_swing=0.18, offsets [0,.5,.5,0]


def test_phases_match_threaded_integrator():
    """The reference thread does phases += dt/(t_sw+t_st) at ~200 Hz then
    fmod 1 (gait.cpp:113-123). The closed form must match the integral."""
    dt = 0.005
    phases = np.array(CFG.offsets)
    for step in range(1, 400):
        phases = np.mod(phases + dt / CFG.period, 1.0)
        t = step * dt
        got = np.asarray(gait_ops.phases_at_time(t, CFG, dtype=jnp.float64))
        # Circular comparison: at exact wrap points the integrator sits at
        # 0.999.. while the closed form is 0.0 — same phase on the circle.
        diff = np.abs(got - phases)
        diff = np.minimum(diff, 1.0 - diff)
        assert np.all(diff < 1e-9), f"t={t}: {got} vs {phases}"


def test_stance_swing_split():
    sp = CFG.stance_phase  # 0.8 / 0.98
    # Exactly at the boundary -> stance (almost_equal inclusive,
    # gait.cpp:127-129).
    phases = jnp.array([0.0, sp, sp + 1e-6, 0.99])
    states = np.asarray(gait_ops.leg_states(phases, CFG))
    np.testing.assert_array_equal(states, [True, True, False, False])


def test_trot_pairs():
    """Offsets [0, .5, .5, 0]: RL/FR in phase, FL/RR opposite."""
    for t in np.linspace(0.0, 2 * CFG.period, 23):
        g = gait_ops.gait_at_time(float(t), CFG, dtype=jnp.float64)
        ph = np.asarray(g.phase)
        assert abs(ph[0] - ph[3]) < 1e-12  # RL == FR
        assert abs(ph[1] - ph[2]) < 1e-12  # FL == RR
        np.testing.assert_allclose(np.mod(ph[0] + 0.5, 1.0), ph[1], atol=1e-12)


def test_make_stance_gait():
    g = gait_ops.make_stance_gait()
    assert np.all(np.asarray(g.in_stance))
    np.testing.assert_allclose(np.asarray(g.phase), 0.0)


def test_batched_time_grid():
    t = jnp.linspace(0.0, 3.0, 50)
    g = gait_ops.gait_at_time(t, CFG)
    assert g.phase.shape == (50, 4)
    assert g.in_stance.shape == (50, 4)
    # Duty factor over a full cycle ~ stance_phase.
    tt = jnp.linspace(0.0, CFG.period, 4001)[:-1]
    frac = float(jnp.mean(gait_ops.gait_at_time(tt, CFG).in_stance[:, 0]))
    assert abs(frac - CFG.stance_phase) < 1e-3
