#!/usr/bin/env python
"""Proximal re-solve prototype for the saturated certification tail.

After the strong two-phase tail, ~0.1% of instances stay uncertified: the
degenerate 4-stance family (rank-6 A^T S A + 1e-5 W, condition ~1e6) sits
at f32's stationarity floor. Proximal iteration solves a SEQUENCE of
better-conditioned problems

    x_k = argmin 1/2 x^T (Q + rho I) x + (c - rho x_{k-1})^T x  s.t. Gx<=h

whose original-problem dual residual is EXACTLY rho (x_{k-1} - x_k): it
shrinks as the prox iterates converge, with each subproblem's condition
improved by ~rho/lambda_min. This script measures how many of the harvested
hard instances a 3-step prox (jnp IPM f32, on-TPU) certifies under the
ORIGINAL KKT criterion.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/tail_prox.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.ipm import solve_qp_ipm
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)

BATCH = 16384
TOL = 3e-5


def log(m):
    print(m, file=sys.stderr, flush=True)


def certify(Q, c, G, h, x, z, s):
    """The solve_qp_ipm converged criterion against the ORIGINAL problem."""
    pr = jnp.abs(jnp.einsum("bij,bj->bi", G, x) + s - h).max(-1)
    dr = jnp.abs(jnp.einsum("bij,bj->bi", Q, x) + c
                 + jnp.einsum("bij,bi->bj", G, z)).max(-1)
    gap = jnp.abs(jnp.einsum("bi,bi->b", s, z)) / G.shape[-2]
    scale = 1.0 + jnp.abs(c).max(-1)
    hmax = 1.0 + jnp.abs(h).max(-1)
    return (pr < TOL * hmax) & (dr < TOL * scale) & (gap < TOL * scale)


def main():
    cfg = mit_cheetah_config()

    @jax.jit
    def pipeline(key):
        s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
        sol = solve_balance_qp_fused(
            s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
            s.stance, cfg.balance, iterations=20, polish=True,
            polish_sweeps=2, two_phase=True, split=True, rows=16)
        return sol, s

    subs, xs0 = [], []
    for seed in range(6):
        sol, s = jax.block_until_ready(pipeline(jax.random.key(seed)))
        conv = np.asarray(sol.converged)
        fail = np.where(~conv)[0]
        subs.append(jax.tree.map(
            lambda a: None if a is None else np.asarray(a)[fail], s))
        xs0.append(np.asarray(sol.x)[fail])
        log(f"seed {seed}: {fail.size} hard (conv {conv.mean():.5f})")

    hard = jax.tree.map(
        lambda *a: None if a[0] is None else jnp.asarray(np.concatenate(a)),
        *subs)
    x0 = jnp.asarray(np.concatenate(xs0), jnp.float32)
    nh = int(hard.x.shape[0])
    log(f"total hard: {nh}")

    qp = assemble_qp_batch(hard, cfg)
    Q = jnp.asarray(qp.Q, jnp.float32)
    c = jnp.asarray(qp.c, jnp.float32)
    G = jnp.asarray(qp.G, jnp.float32)
    h = jnp.asarray(qp.h, jnp.float32)

    x_star, obj_star, _ = solve_qp_batch_oracle(
        np.asarray(qp.Q), np.asarray(qp.c), np.asarray(qp.G),
        np.asarray(qp.h), np.asarray(hard.stance),
        cfg.balance.fz_min, cfg.balance.fz_max)
    Qd = np.asarray(qp.Q, np.float64)
    cd = np.asarray(qp.c, np.float64)

    def report(name, x, conv):
        x = np.asarray(x, np.float64)
        conv = np.asarray(conv)
        obj = 0.5 * np.einsum("bi,bij,bj->b", x, Qd, x) + \
            np.einsum("bi,bi->b", cd, x)
        rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
        line = (f"{name:28s} conv {conv.mean():.3f} objrel p50 "
                f"{np.median(rel):.1e} max {rel.max():.1e}")
        if conv.any():
            line += f" [cert objrel max {rel[conv].max():.1e}]"
        log(line)

    # Baseline: direct jnp f32 long solve.
    sol = jax.block_until_ready(
        solve_qp_ipm(Q, c, G, h, iterations=60, polish=True, tol=TOL))
    report("direct jnp it=60", sol.x, sol.converged)

    # Proximal: rho scaled to the Q diagonal; 2-4 prox steps.
    diag = jnp.einsum("bii->bi", Q)
    for rho_rel in (1e-3, 1e-2):
        rho = (rho_rel * diag.mean(-1))[:, None]
        Qp = Q + rho[..., None] * jnp.eye(12, dtype=jnp.float32)

        @jax.jit
        def prox(xk, n=4):
            sols = None
            for _ in range(n):
                cp = c - rho * xk
                sols = solve_qp_ipm(Qp, cp, G, h, iterations=30,
                                    polish=True, tol=TOL)
                xk = sols.x
            return xk, sols.z, sols.s

        xk, z, s = jax.block_until_ready(prox(x0))
        conv = certify(Q, c, G, h, xk, z, s)
        report(f"prox rho={rho_rel} n=4", xk, conv)


if __name__ == "__main__":
    main()
