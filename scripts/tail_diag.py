#!/usr/bin/env python
"""Diagnose the uncertified tail of the fused GRF solve.

Runs the exact bench.py configuration, pulls out the instances whose
converged flag stays False after the two-phase tail re-solve, and
characterizes them: stance pattern, body state, residual magnitudes, and
float64 active-set oracle comparison (is the instance actually solvable, and
how far is our iterate from the true optimum?).

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/tail_diag.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)

BATCH = 16384


def log(m):
    print(m, file=sys.stderr, flush=True)


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

    n_fail_total = 0
    fail_rows = []
    for seed in range(4):
        sol, s = jax.block_until_ready(pipeline(jax.random.key(seed)))
        conv = np.asarray(sol.converged)
        fail = np.where(~conv)[0]
        n_fail_total += fail.size
        log(f"seed {seed}: {fail.size}/{BATCH} uncertified "
            f"({1 - fail.size / BATCH:.4f} conv)")
        if fail.size == 0:
            continue

        idx = fail[:256]
        sub = jax.tree.map(
            lambda a: None if a is None else np.asarray(a)[idx], s)
        stance = sub.stance
        n_stance = stance.sum(axis=1)
        pr = np.asarray(sol.primal_residual)[idx]
        dr = np.asarray(sol.dual_residual)[idx]
        gap = np.asarray(sol.gap)[idx]
        log(f"  stance-leg counts among failures: "
            f"{dict(zip(*map(list, np.unique(n_stance, return_counts=True))))}")
        log(f"  z height: min {sub.x[:, 2].min():.3f} "
            f"max {sub.x[:, 2].max():.3f} mean {sub.x[:, 2].mean():.3f}")
        log(f"  pr: p50 {np.median(pr):.2e} max {pr.max():.2e}")
        log(f"  dr: p50 {np.median(dr):.2e} max {dr.max():.2e}")
        log(f"  gap: p50 {np.median(gap):.2e} max {gap.max():.2e}")

        # Oracle on the first 64 failures: what is the true solution, and
        # how good is our iterate really?
        n_check = min(64, idx.size)
        scen_sub = jax.tree.map(
            lambda a: None if a is None else jnp.asarray(a[:n_check]), sub)
        qp = assemble_qp_batch(scen_sub, cfg)
        x_star, obj_star, kkt = solve_qp_batch_oracle(
            np.asarray(qp.Q), np.asarray(qp.c), np.asarray(qp.G),
            np.asarray(qp.h), np.asarray(scen_sub.stance),
            cfg.balance.fz_min, cfg.balance.fz_max)
        xs = np.asarray(sol.x)[idx[:n_check]].astype(np.float64)
        Qd = np.asarray(qp.Q, np.float64)
        cd = np.asarray(qp.c, np.float64)
        obj = 0.5 * np.einsum("bi,bij,bj->b", xs, Qd, xs) + \
            np.einsum("bi,bi->b", cd, xs)
        rel = (obj - obj_star) / (1.0 + np.abs(obj_star))
        log(f"  oracle KKT ok frac (is the QP well-posed?): "
            f"{np.mean(kkt):.3f}")
        log(f"  our-obj minus oracle-obj rel: p50 {np.median(rel):.2e} "
            f"max {rel.max():.2e} min {rel.min():.2e}")
        log(f"  force diff: p50 "
            f"{np.median(np.abs(xs - x_star).max(axis=1)):.2e} max "
            f"{np.abs(xs - x_star).max():.2e} N")
        # Conditioning proxy: Q diagonal spread of the failures.
        dspread = Qd.diagonal(axis1=1, axis2=2)
        log(f"  Q diag cond proxy: max/min p50 "
            f"{np.median(dspread.max(1) / dspread.min(1)):.1e}")
        for k in range(min(4, n_check)):
            log(f"    ex{k}: stance={stance[k].astype(int)} "
                f"z={sub.x[k, 2]:.3f} pr={pr[k]:.1e} dr={dr[k]:.1e} "
                f"gap={gap[k]:.1e} objrel={rel[k]:.1e}")
        fail_rows.append((seed, fail.size))

    log(f"total: {n_fail_total}/{4 * BATCH} "
        f"({1 - n_fail_total / (4 * BATCH):.5f} conv)")


if __name__ == "__main__":
    main()
