"""Fused assembly+solve kernel tests (interpret mode on CPU).

The in-kernel closed-form assembly must reproduce ops/dynamics.py's
build_balance_qp exactly (same math, different factorization of the
einsums); the fused end-to-end solve must match the jnp IPM path. The full
TPU run is exercised by bench.py and the TPU-gated test below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.solver import pallas_fused as pf
from quadruped_control_tpu.solver.ipm import equilibrate, qp_objective, solve_qp_ipm
from quadruped_control_tpu.utils.scenarios import assemble_qp_batch, grf_scenarios

B = pf.TILE


def _scenario_inputs(key, dtype=jnp.float32, randomize=False):
    cfg = mit_cheetah_config()
    s = grf_scenarios(key, B, cfg, dtype=dtype, randomize_params=randomize)
    bal = cfg.balance
    xdd, wdd = dyn.pd_accelerations(s.R, s.R_d, s.x, s.xdot, s.w, s.x_d,
                                    s.xdot_d, s.w_d, bal)
    com_ft = jnp.einsum("...ij,...lj->...li", s.R, s.feet)
    r_masked = jnp.where(s.stance[..., None], com_ft, 0.0)
    b = pf.srb_rhs(s.R, s.w_d, xdd, wdd, bal, mass=s.mass,
                   inertia_diag=s.inertia_diag)
    mu = bal.mu if s.mu is None else s.mu
    return cfg, s, r_masked, b, mu


def test_fused_assembly_matches_xla(rng):
    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(7))
    bal = cfg.balance

    Qk, ck, Gk, hk = pf.assemble_qp_fused_debug(
        r_masked, b, s.stance, mu, bal.fz_min, bal.fz_max,
        s_diag=tuple(bal.s_diag), w_diag=float(bal.w_diag), interpret=True)

    qp = assemble_qp_batch(s, cfg)
    np.testing.assert_allclose(np.asarray(Qk), np.asarray(qp.Q),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ck), np.asarray(qp.c),
                               rtol=2e-5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(Gk), np.asarray(qp.G),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(qp.h),
                               rtol=1e-6, atol=1e-6)


def test_fused_assembly_randomized_params(rng):
    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(8),
                                               randomize=True)
    bal = cfg.balance
    Qk, ck, Gk, hk = pf.assemble_qp_fused_debug(
        r_masked, b, s.stance, mu, bal.fz_min, bal.fz_max,
        s_diag=tuple(bal.s_diag), w_diag=float(bal.w_diag), interpret=True)
    qp = assemble_qp_batch(s, cfg)
    np.testing.assert_allclose(np.asarray(Qk), np.asarray(qp.Q),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ck), np.asarray(qp.c),
                               rtol=2e-5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(Gk), np.asarray(qp.G),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(qp.h),
                               rtol=1e-6, atol=1e-6)


def test_fused_equilibration_matches_jnp(rng):
    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(9))
    bal = cfg.balance
    Qk, ck, Gk, hk = pf.assemble_qp_fused_debug(
        r_masked, b, s.stance, mu, bal.fz_min, bal.fz_max,
        s_diag=tuple(bal.s_diag), w_diag=float(bal.w_diag),
        equilibrated=True, interpret=True)
    qp = assemble_qp_batch(s, cfg)
    Qs, cs, Gs, hs, _, _, _ = equilibrate(qp.Q, qp.c, qp.G, qp.h)
    np.testing.assert_allclose(np.asarray(Qk), np.asarray(Qs),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ck), np.asarray(cs),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(Gk), np.asarray(Gs),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(hs),
                               rtol=3e-5, atol=3e-5)


def test_fused_solve_interpret_matches_jnp_barrier(rng):
    """Barrier-only fused solve (no polish: the scratch LDL loops are slow in
    interpret mode) vs the jnp IPM on the same problems."""
    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(11))
    bal = cfg.balance
    sol = pf.solve_grf_qp_fused(
        r_masked, b, s.stance, mu, bal.fz_min, bal.fz_max,
        s_diag=tuple(bal.s_diag), w_diag=float(bal.w_diag),
        iterations=18, polish=False, interpret=True)

    qp = assemble_qp_batch(s, cfg)
    ref = solve_qp_ipm(qp.Q.astype(jnp.float32), qp.c.astype(jnp.float32),
                       qp.G.astype(jnp.float32), qp.h.astype(jnp.float32),
                       iterations=18, polish=False)

    obj_f = np.asarray(qp_objective(qp.Q, qp.c, sol.x), np.float64)
    obj_r = np.asarray(qp_objective(qp.Q, qp.c, ref.x), np.float64)
    scale = 1.0 + np.abs(obj_r)
    rel = np.abs(obj_f - obj_r) / scale
    # Same algorithm, different summation order: objectives should agree to
    # f32 roundoff on nearly all instances.
    assert np.median(rel) < 1e-6
    assert np.percentile(rel, 95) < 1e-4
    # Feasibility of the fused solution in original units.
    viol = np.asarray(
        jnp.einsum("bij,bj->bi", qp.G, sol.x) - qp.h, np.float64)
    assert np.percentile(viol.max(axis=-1), 95) < 1e-3


@pytest.mark.skipif(jax.devices()[0].platform == "cpu",
                    reason="full fused kernel requires TPU")
def test_fused_full_matches_oracle_on_tpu():
    from quadruped_control_tpu.native import solve_qp_batch_native
    from quadruped_control_tpu.solver.reference import grf_feasible_point

    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(3))
    bal = cfg.balance
    sol = pf.solve_grf_qp_fused(
        r_masked, b, s.stance, mu, bal.fz_min, bal.fz_max,
        s_diag=tuple(bal.s_diag), w_diag=float(bal.w_diag))
    assert float(jnp.mean(sol.converged.astype(jnp.float32))) > 0.98

    qp = assemble_qp_batch(s, cfg)
    Q, c, G, h = (np.asarray(a, np.float64) for a in (qp.Q, qp.c, qp.G, qp.h))
    stance = np.asarray(s.stance)
    x0 = np.stack([grf_feasible_point(stance[i], 10., 120.)
                   for i in range(B)])
    xn, _, kkt, st = solve_qp_batch_native(Q, c, G, h, x0)
    xs = np.asarray(sol.x, np.float64)
    obj = 0.5 * np.einsum("bi,bij,bj->b", xs, Q, xs) + \
        np.einsum("bi,bi->b", c, xs)
    objn = 0.5 * np.einsum("bi,bij,bj->b", xn, Q, xn) + \
        np.einsum("bi,bi->b", c, xn)
    rel = np.abs(obj - objn) / (1 + np.abs(objn))
    assert np.median(rel) < 1e-7
    assert np.percentile(rel, 95) < 1e-6


def test_prox_tail_lifts_convergence_interpret(rng):
    """prox_tail plumbing (argsort compaction -> IN-KERNEL prox restarts,
    prox_backend="kernel" round-3 default -> merge-back): with a
    deliberately starved base schedule, the prox phase must certify
    instances the base could not, and never lose already-certified
    ones."""
    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(9))
    bal = cfg.balance
    base = pf.solve_balance_qp_fused(
        s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
        s.stance, bal, iterations=4, polish=True, polish_sweeps=1,
        polish_refine=1, rows=8, interpret=True)
    prox = pf.solve_balance_qp_fused(
        s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
        s.stance, bal, iterations=4, polish=True, polish_sweeps=1,
        polish_refine=1, rows=8, prox_tail=True, prox_divisor=2,
        prox_steps=2, prox_iterations=20, interpret=True)
    c0 = float(jnp.mean(base.converged.astype(jnp.float32)))
    c1 = float(jnp.mean(prox.converged.astype(jnp.float32)))
    assert c1 > c0, (c0, c1)
    # Monotone: nothing certified gets lost.
    assert not bool(jnp.any(base.converged & ~prox.converged))
    assert bool(jnp.all(jnp.isfinite(prox.x)))


def test_fused_warm_barrier_interpret(rng):
    """Warm-started barrier mode (the reference's qpOASES hotstart
    economics, balance_controller.cpp:193-195, in-kernel):

      1. the zeros/st_prev=-1 warm carry is BITWISE the cold start
         (first-tick init invariant of the warm fused tick);
      2. restarting from a 12-iteration solution, 4 warm iterations
         dominate 4 cold iterations and never degrade the seed's
         objective beyond f32 noise.
    """
    cfg, s, r_masked, b, mu = _scenario_inputs(jax.random.key(13))
    bal = cfg.balance
    kw = dict(s_diag=tuple(bal.s_diag), w_diag=float(bal.w_diag),
              mu=mu, fz_min=bal.fz_min, fz_max=bal.fz_max,
              polish=False, interpret=True)

    cold = pf.solve_grf_qp_fused(r_masked, b, s.stance, iterations=12, **kw)

    warm0 = (jnp.zeros((B, 12)), jnp.zeros((B, 24)), jnp.zeros((B, 24)))
    coldish = pf.solve_grf_qp_fused(
        r_masked, b, s.stance, iterations=12, warm=warm0,
        warm_stance_prev=-jnp.ones((B, 4)), **kw)
    np.testing.assert_array_equal(np.asarray(cold.x), np.asarray(coldish.x))
    np.testing.assert_array_equal(np.asarray(cold.z), np.asarray(coldish.z))
    np.testing.assert_array_equal(np.asarray(cold.s), np.asarray(coldish.s))

    warm4 = pf.solve_grf_qp_fused(
        r_masked, b, s.stance, iterations=4,
        warm=(cold.x, cold.s, cold.z), **kw)
    cold4 = pf.solve_grf_qp_fused(r_masked, b, s.stance, iterations=4, **kw)
    assert float(warm4.converged.mean()) >= float(cold4.converged.mean())

    qp = assemble_qp_batch(s, cfg)
    obj_seed = np.asarray(qp_objective(qp.Q, qp.c, cold.x), np.float64)
    obj_warm = np.asarray(qp_objective(qp.Q, qp.c, warm4.x), np.float64)
    # The warm restart may only refine (or hold) the seed's objective.
    assert np.percentile(obj_warm - obj_seed, 99) < 1e-4 * (
        1.0 + np.abs(obj_seed).max())
