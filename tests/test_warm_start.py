"""Warm-starting: the batched analogue of qpOASES hotstart."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.ipm import qp_objective, solve_qp_ipm
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)


def test_warm_start_converges_in_fewer_iterations(rng):
    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(9), 32, cfg, dtype=jnp.float64)
    qp = assemble_qp_batch(s, cfg)

    cold_full = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=30)
    assert bool(jnp.all(cold_full.converged))
    obj_ref = np.asarray(qp_objective(qp.Q, qp.c, cold_full.x))

    # Perturb the problem slightly (the next control tick).
    c2 = qp.c * 1.01
    warm = solve_qp_ipm(qp.Q, c2, qp.G, qp.h, iterations=8, polish=True,
                        warm_start=(cold_full.x, cold_full.s, cold_full.z))
    cold_short = solve_qp_ipm(qp.Q, c2, qp.G, qp.h, iterations=8,
                              polish=True)
    ref2 = solve_qp_ipm(qp.Q, c2, qp.G, qp.h, iterations=30)
    obj2 = np.asarray(qp_objective(qp.Q, c2, ref2.x))

    gap_warm = np.abs(np.asarray(qp_objective(qp.Q, c2, warm.x)) - obj2)
    gap_cold = np.abs(np.asarray(qp_objective(qp.Q, c2, cold_short.x)) - obj2)
    rel_warm = gap_warm / (1.0 + np.abs(obj2))

    # Warm-started 8 iterations reach near-exact objectives ...
    assert np.max(rel_warm) < 1e-6, rel_warm
    # ... and (on aggregate) beat the cold 8-iteration run.
    assert np.median(gap_warm) <= np.median(gap_cold) * 1.5


def test_warm_start_same_problem_is_stable(rng):
    """Re-solving the identical problem warm-started must stay at optimum."""
    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(10), 16, cfg, dtype=jnp.float64)
    qp = assemble_qp_batch(s, cfg)
    sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=30)
    re = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=6, polish=True,
                      warm_start=(sol.x, sol.s, sol.z))
    obj_a = np.asarray(qp_objective(qp.Q, qp.c, sol.x))
    obj_b = np.asarray(qp_objective(qp.Q, qp.c, re.x))
    np.testing.assert_allclose(obj_b, obj_a, rtol=1e-8, atol=1e-8)


def test_transition_aware_reset_beats_stale_warm_start(rng):
    """Across a stance-pattern flip the carried (s, z) are stale; resetting
    the changed legs' rows must not be worse than the stale warm start and
    must reach the true optimum within the short schedule."""
    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(11), 32, cfg, dtype=jnp.float64)
    qp = assemble_qp_batch(s, cfg)
    sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=30)

    # Next tick: trot pair flips — legs [RL, FR] <-> [FL, RR].
    stance2 = ~s.stance
    s2 = s._replace(stance=stance2)
    qp2 = assemble_qp_batch(s2, cfg)
    ref = solve_qp_ipm(qp2.Q, qp2.c, qp2.G, qp2.h, iterations=30)
    obj_ref = np.asarray(qp_objective(qp2.Q, qp2.c, ref.x))

    changed = jnp.repeat(s.stance != stance2, 6, axis=-1)
    warm_reset = solve_qp_ipm(
        qp2.Q, qp2.c, qp2.G, qp2.h, iterations=8, polish=True,
        warm_start=(sol.x, sol.s, sol.z), warm_reset_mask=changed)
    warm_stale = solve_qp_ipm(
        qp2.Q, qp2.c, qp2.G, qp2.h, iterations=8, polish=True,
        warm_start=(sol.x, sol.s, sol.z))

    gap_reset = np.abs(
        np.asarray(qp_objective(qp2.Q, qp2.c, warm_reset.x)) - obj_ref)
    gap_stale = np.abs(
        np.asarray(qp_objective(qp2.Q, qp2.c, warm_stale.x)) - obj_ref)
    rel_reset = gap_reset / (1.0 + np.abs(obj_ref))
    # A full stance flip moves the solution far from the warm point: 8
    # iterations cannot rescue every instance (nor could a cold start) —
    # require near-exact objectives for the bulk and no regression vs the
    # stale warm start.
    assert np.percentile(rel_reset, 90) < 1e-6, rel_reset
    assert np.median(gap_reset) <= np.median(gap_stale) * 1.5
    conv_reset = float(jnp.mean(warm_reset.converged.astype(jnp.float64)))
    conv_stale = float(jnp.mean(warm_stale.converged.astype(jnp.float64)))
    assert conv_reset >= conv_stale - 1e-9
    assert conv_reset > 0.9
