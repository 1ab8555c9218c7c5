"""Pallas Riccati MPC kernel vs the structured (scan) solver — interpret
mode on CPU (the full TPU run is exercised by scripts/mpc_bench.py and the
verify drive)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.mpc import structured as ms
from quadruped_control_tpu.mpc.horizon import (
    build_mpc_qp,
    make_reference_trajectory,
)
from quadruped_control_tpu.mpc.pallas_riccati import TILE, solve_mpc_fused
from quadruped_control_tpu.utils.scenarios import standing_feet

CFG = mit_cheetah_physical_config()
N, DT, B = 4, 0.03, TILE


def _setup():
    dtype = jnp.float32
    ks = jax.random.split(jax.random.key(0), 3)
    xi0 = jnp.zeros((B, 13), dtype).at[:, 5].set(
        jax.random.uniform(ks[0], (B,), dtype, 0.20, 0.30)).at[:, 12].set(1.0)
    xi0 = xi0.at[:, 9].set(0.2 * jax.random.normal(ks[1], (B,), dtype))
    cmd = jnp.zeros((B, 6), dtype).at[:, 0].set(0.2)
    ref = make_reference_trajectory(xi0, cmd, N, DT)
    feet_w = jnp.broadcast_to(
        standing_feet(CFG, dtype) + jnp.array([0, 0, 0.26], dtype), (B, 4, 3))
    x_com = jnp.tile(jnp.array([0, 0, 0.26], dtype), (B, 1))
    yaw = 0.1 * jax.random.normal(ks[2], (B,), dtype)
    stance = jnp.tile(jnp.array(
        [[True, False, False, True], [False, True, True, False],
         [True, False, False, True], [False, True, True, False]])[None],
        (B, 1, 1))
    return xi0, ref, yaw, feet_w, x_com, stance


def test_riccati_kernel_matches_structured_interpret():
    xi0, ref, yaw, feet_w, x_com, stance = _setup()
    F, sol = solve_mpc_fused(xi0, ref, yaw, feet_w, x_com, stance, N, DT,
                             CFG, iterations=30, interpret=True)
    F2, sol2 = ms.solve_mpc_structured(xi0, ref, yaw, feet_w, x_com, stance,
                                       N, DT, CFG, iterations=40)
    assert float(jnp.mean(sol.converged.astype(jnp.float32))) > 0.97
    F = np.asarray(F, np.float64)
    F2 = np.asarray(F2, np.float64)
    assert np.isfinite(F).all()
    # Swing forces pinned (B columns masked + alpha regularization).
    swing = ~np.asarray(stance)
    f_legs = F.reshape(B, N, 4, 3)
    assert np.abs(f_legs[swing]).max() < 1e-2

    # Objective parity vs the structured solver through the condensed H.
    rel = []
    for b in range(8):
        qp = build_mpc_qp(
            xi0[b].astype(jnp.float64), ref[b].astype(jnp.float64),
            yaw[b].astype(jnp.float64), feet_w[b].astype(jnp.float64),
            x_com[b].astype(jnp.float64), stance[b], N, DT, CFG)
        H, c = np.asarray(qp.H), np.asarray(qp.c)

        def obj(x):
            x = x.reshape(-1)
            return 0.5 * x @ H @ x + c @ x

        rel.append(abs(obj(F[b]) - obj(F2[b])) / (1 + abs(obj(F2[b]))))
    # f32, loose-tol MPC solvers: ~1e-4-relative objective agreement.
    assert np.median(rel) < 5e-5, rel
    assert max(rel) < 5e-4, rel


def test_riccati_kernel_pads_arbitrary_batch():
    """The wrapper accepts any batch shape (pads to the 1024 tile and
    strips) — the commander's riccati-pallas backend relies on this."""
    xi0, ref, yaw, feet_w, x_com, stance = _setup()
    nb = (3, 37)
    n = nb[0] * nb[1]

    def cut(a):
        return a[:n].reshape(nb + a.shape[1:])

    F, sol = solve_mpc_fused(cut(xi0), cut(ref), cut(yaw), cut(feet_w),
                             cut(x_com), cut(stance), N, DT, CFG,
                             iterations=30, interpret=True)
    assert F.shape == nb + (N, 12)
    assert sol.converged.shape == nb
    F_full, _ = solve_mpc_fused(xi0, ref, yaw, feet_w, x_com, stance, N, DT,
                                CFG, iterations=30, interpret=True)
    np.testing.assert_allclose(np.asarray(F).reshape(n, N, 12),
                               np.asarray(F_full)[:n], atol=1e-5)
