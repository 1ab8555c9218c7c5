#!/usr/bin/env python
"""Compare the split pipeline (XLA assembly -> pallas_ipm kernels) against
the fully-fused kernel (pallas_fused) on the real TPU.

Rep-scaling timing: measures at two rep counts to separate fixed dispatch
overhead from marginal per-batch device time (CLAUDE.md: small-dispatch
timing on the axon tunnel is unreliable).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.solver.pallas_ipm import solve_qp_ipm_pallas
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)

BATCH = 16384


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_reps(fn, key, reps):
    keys = jax.random.split(key, reps)
    jax.block_until_ready(fn(keys[0]))
    t0 = time.time()
    out = None
    for k in keys:
        out = fn(k)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    cfg = mit_cheetah_config()
    log(f"device: {jax.devices()[0]}")

    @jax.jit
    def split_pipeline(key):
        s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
        qp = assemble_qp_batch(s, cfg)
        sol = solve_qp_ipm_pallas(qp.Q, qp.c, qp.G, qp.h,
                                  iterations=20, polish=True)
        return sol.x, sol.converged

    @jax.jit
    def fused_pipeline(key):
        s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
        sol = solve_balance_qp_fused(
            s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
            s.stance, cfg.balance, iterations=20, polish=True)
        return sol.x, sol.converged

    for name, fn in (("fused", fused_pipeline), ("split", split_pipeline)):
        t0 = time.time()
        x, conv = jax.block_until_ready(fn(jax.random.key(0)))
        log(f"{name}: compile+first {time.time() - t0:.1f}s, "
            f"conv {float(jnp.mean(conv.astype(jnp.float32))):.4f}")
        t_small = time_reps(fn, jax.random.key(1), 4)
        t_big = time_reps(fn, jax.random.key(2), 12)
        # marginal per-call time from the rep scaling: (12*t12 - 4*t4) / 8
        marginal = (12 * t_big - 4 * t_small) / 8
        log(f"{name}: {t_small*1e3:.1f} ms/call @4 reps, "
            f"{t_big*1e3:.1f} ms/call @12 reps, marginal {marginal*1e3:.1f} ms"
            f" -> {BATCH/t_big:,.0f} QPs/s (@12), {BATCH/marginal:,.0f} QPs/s"
            f" (marginal)")

    # Cross-check solutions: fused vs split on the same scenarios.
    key = jax.random.key(5)
    s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
    qp = assemble_qp_batch(s, cfg)
    sol_f = jax.jit(lambda: solve_balance_qp_fused(
        s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
        s.stance, cfg.balance, iterations=20, polish=True))()
    sol_s = solve_qp_ipm_pallas(qp.Q, qp.c, qp.G, qp.h, iterations=20,
                                polish=True)
    Q64 = np.asarray(qp.Q, np.float64)
    c64 = np.asarray(qp.c, np.float64)

    def obj(x):
        x = np.asarray(x, np.float64)
        return 0.5 * np.einsum("bi,bij,bj->b", x, Q64, x) + \
            np.einsum("bi,bi->b", c64, x)

    of, os_ = obj(sol_f.x), obj(sol_s.x)
    rel = np.abs(of - os_) / (1 + np.abs(os_))
    convf = float(jnp.mean(sol_f.converged.astype(jnp.float32)))
    convs = float(jnp.mean(sol_s.converged.astype(jnp.float32)))
    log(f"fused vs split: obj rel p50 {np.median(rel):.2e} "
        f"p99 {np.percentile(rel, 99):.2e} max {rel.max():.2e}; "
        f"conv fused {convf:.4f} split {convs:.4f}")


if __name__ == "__main__":
    main()
