"""Native (C++) active-set solver vs the NumPy oracle and the IPM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.native import load_native, solve_qp_batch_native
from quadruped_control_tpu.solver.ipm import solve_qp_ipm
from quadruped_control_tpu.solver.reference import (
    grf_feasible_point,
    solve_qp_batch_oracle,
)
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)


@pytest.fixture(scope="module")
def qp_batch():
    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(11), 64, cfg, dtype=jnp.float64)
    qp = assemble_qp_batch(s, cfg)
    stance = np.asarray(s.stance)
    x0 = np.stack([
        grf_feasible_point(stance[b], cfg.balance.fz_min, cfg.balance.fz_max)
        for b in range(64)
    ])
    return qp, stance, x0


def test_native_builds_and_loads():
    assert load_native() is not None, "native library failed to build"


def test_native_matches_numpy_oracle(qp_batch):
    qp, stance, x0 = qp_batch
    Q, c, G, h = (np.asarray(a) for a in (qp.Q, qp.c, qp.G, qp.h))
    x, lam, kkt, status = solve_qp_batch_native(Q, c, G, h, x0)
    assert np.all(status == 0)
    assert kkt.max() < 1e-8

    xs, objs, errs = solve_qp_batch_oracle(Q[:8], c[:8], G[:8], h[:8],
                                           stance[:8])
    np.testing.assert_allclose(x[:8], xs, atol=1e-8)


def test_native_certifies_ipm_solutions(qp_batch):
    qp, stance, x0 = qp_batch
    sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=25)
    Q, c = np.asarray(qp.Q), np.asarray(qp.c)
    x_n, _, kkt, status = solve_qp_batch_native(
        Q, c, np.asarray(qp.G), np.asarray(qp.h), x0
    )
    obj_ipm = 0.5 * np.einsum("bi,bij,bj->b", np.asarray(sol.x), Q,
                              np.asarray(sol.x)) + \
        np.einsum("bi,bi->b", c, np.asarray(sol.x))
    obj_nat = 0.5 * np.einsum("bi,bij,bj->b", x_n, Q, x_n) + \
        np.einsum("bi,bi->b", c, x_n)
    rel = np.abs(obj_ipm - obj_nat) / (1.0 + np.abs(obj_nat))
    assert rel.max() < 1e-6
