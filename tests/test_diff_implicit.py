"""Implicit-function-theorem QP gradients (solver/diff.py) vs finite
differences and vs unrolled autodiff through the barrier loop."""

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.diff import solve_qp_implicit
from quadruped_control_tpu.solver.ipm import solve_qp_ipm
from quadruped_control_tpu.utils.scenarios import assemble_qp_batch, grf_scenarios


def _problems(B=4):
    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(5), B, cfg, dtype=jnp.float64)
    qp = assemble_qp_batch(s, cfg)
    return qp


def test_implicit_gradient_matches_finite_difference():
    qp = _problems()
    w = jnp.asarray(np.random.default_rng(1).normal(size=12))

    def loss(c, h):
        x = solve_qp_implicit(qp.Q, c, qp.G, h, 40, True)
        return jnp.sum(jnp.sum(x * w, axis=-1))

    gc, gh = jax.grad(loss, argnums=(0, 1))(qp.c, qp.h)
    assert np.all(np.isfinite(np.asarray(gc)))

    eps = 1e-5
    rng = np.random.default_rng(2)
    for _ in range(4):
        b = rng.integers(0, qp.c.shape[0])
        i = rng.integers(0, 12)
        cp = qp.c.at[b, i].add(eps)
        cm = qp.c.at[b, i].add(-eps)
        fd = (loss(cp, qp.h) - loss(cm, qp.h)) / (2 * eps)
        np.testing.assert_allclose(float(gc[b, i]), float(fd),
                                   rtol=2e-4, atol=1e-7)
    # h-gradient: perturb an fz_max row (active for some instances).
    for r in (4, 10, 16):
        hp = qp.h.at[0, r].add(eps)
        hm = qp.h.at[0, r].add(-eps)
        fd = (loss(qp.c, hp) - loss(qp.c, hm)) / (2 * eps)
        np.testing.assert_allclose(float(gh[0, r]), float(fd),
                                   rtol=2e-4, atol=1e-6)


def test_implicit_matches_unrolled_autodiff():
    qp = _problems()
    w = jnp.asarray(np.random.default_rng(3).normal(size=12))

    def loss_imp(Q, c):
        x = solve_qp_implicit(Q, c, qp.G, qp.h, 40, True)
        return jnp.sum(x * w)

    def loss_unr(Q, c):
        sol = solve_qp_ipm(Q, c, qp.G, qp.h, iterations=40, polish=False)
        return jnp.sum(sol.x * w)

    gQ_i, gc_i = jax.grad(loss_imp, argnums=(0, 1))(qp.Q, qp.c)
    gQ_u, gc_u = jax.grad(loss_unr, argnums=(0, 1))(qp.Q, qp.c)
    # atol floor: the unrolled barrier never exactly reaches the solution,
    # leaving ~1e-7 noise on gradient entries that are exactly 0 by KKT.
    np.testing.assert_allclose(np.asarray(gc_i), np.asarray(gc_u),
                               rtol=2e-3, atol=1e-6)
    # Q-gradient conventions differ elementwise (IFT returns the symmetrized
    # form, unrolled the raw -dtx x^T outer product); they are identical on
    # symmetric perturbations — which Q = A^T S A + W always is — so
    # compare symmetrized.
    gQ_u_sym = 0.5 * (np.asarray(gQ_u) + np.swapaxes(np.asarray(gQ_u),
                                                     -1, -2))
    # atol 2e-2: FD-verified that the residual disagreement is UNROLLED
    # noise — swing-block entries whose true gradient is exactly 0 pick up
    # ~1e-2 spurious sensitivity through the finite barrier trajectory,
    # while the IFT value matches central differences to machine precision.
    np.testing.assert_allclose(np.asarray(gQ_i), gQ_u_sym,
                               rtol=5e-3, atol=2e-2)


def test_implicit_gradient_batched_vmap_jit():
    qp = _problems(B=8)

    @jax.jit
    def loss(c):
        x = solve_qp_implicit(qp.Q, c, qp.G, qp.h, 30, True)
        return jnp.sum(x ** 2)

    g = jax.grad(loss)(qp.c)
    assert g.shape == qp.c.shape
    assert np.all(np.isfinite(np.asarray(g)))
