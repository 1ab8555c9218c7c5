#!/usr/bin/env python
"""Knob sweep on harvested hard instances: which solver setting certifies
the uncertified tail?

Harvests the failures of the production two-phase config from several seeds,
then re-solves ONLY those instances with longer/deeper schedules (barrier
iterations, polish sweeps, refinement steps) and the jnp IPM, reporting
certified fraction and true objective error vs the float64 oracle.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/tail_knobs.py
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

    subs = []
    for seed in range(4):
        sol, s = jax.block_until_ready(pipeline(jax.random.key(seed)))
        conv = np.asarray(sol.converged)
        fail = np.where(~conv)[0]
        subs.append(jax.tree.map(
            lambda a: None if a is None else np.asarray(a)[fail], s))
        log(f"seed {seed}: harvested {fail.size}")

    hard = jax.tree.map(
        lambda *a: None if a[0] is None else jnp.asarray(np.concatenate(a)),
        *subs)
    nh = hard.x.shape[0]
    log(f"total hard instances: {nh}")

    qp = assemble_qp_batch(hard, cfg)
    x_star, obj_star, _ = solve_qp_batch_oracle(
        np.asarray(qp.Q), np.asarray(qp.c), np.asarray(qp.G),
        np.asarray(qp.h), np.asarray(hard.stance),
        cfg.balance.fz_min, cfg.balance.fz_max)
    Qd = np.asarray(qp.Q, np.float64)
    cd = np.asarray(qp.c, np.float64)

    def report(name, x, conv):
        x = np.asarray(x, np.float64)[:nh]
        conv = np.asarray(conv)[:nh]
        obj = 0.5 * np.einsum("bi,bij,bj->b", x, Qd, x) + \
            np.einsum("bi,bi->b", cd, x)
        rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
        line = (f"{name:34s} conv {conv.mean():.3f}  objrel p50 "
                f"{np.median(rel):.1e} max {rel.max():.1e}")
        if conv.any():
            line += f"  [certified objrel max {rel[conv].max():.1e}]"
        log(line)

    def run_kernel(name, **kw):
        sol = solve_balance_qp_fused(
            hard.R, hard.R_d, hard.x, hard.xdot, hard.w, hard.x_d,
            hard.xdot_d, hard.w_d, hard.feet, hard.stance, cfg.balance, **kw)
        sol = jax.block_until_ready(sol)
        report(name, sol.x, sol.converged)

    run_kernel("kernel it=28 sw=24 rf=2", iterations=28, polish=True,
               polish_sweeps=24, polish_refine=2, rows=16)
    run_kernel("kernel it=28 sw=32 rf=2", iterations=28, polish=True,
               polish_sweeps=32, polish_refine=2, rows=16)
    run_kernel("kernel it=40 sw=32 rf=4", iterations=40, polish=True,
               polish_sweeps=32, polish_refine=4, rows=16)
    run_kernel("kernel it=48 sw=32 rf=4", iterations=48, polish=True,
               polish_sweeps=32, polish_refine=4, rows=16)

    # jnp IPM at f32, longer schedule.
    sol = jax.block_until_ready(solve_qp_ipm(
        qp.Q, qp.c, qp.G, qp.h, iterations=60, polish=True, tol=3e-5))
    report("jnp f32 it=60", sol.x, sol.converged)


if __name__ == "__main__":
    main()
