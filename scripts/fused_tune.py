#!/usr/bin/env python
"""Tune the fused kernel: sweep tile height (rows), barrier iterations, and
polish sweeps; report marginal ms/call, converged fraction, and conv-weighted
throughput. Run on the real TPU."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.utils.scenarios import grf_scenarios

BATCH = 32768


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_config()
    log(f"device: {jax.devices()[0]}")

    configs = [
        # (rows, it, sweeps, refine, two, split, tdiv, tail_it, tsw, trf)
        # Strong tail: the degenerate 4-stance stragglers need ~32 active-set
        # sweeps (scripts/tail_knobs.py: 84% of the old-tail failures certify
        # at it=48/sw=32/rf=4; sweeps are THE knob, saturating ~sw=24-32).
        # Measured: conv 0.9943 -> 0.9985 at UNCHANGED marginal ms (the
        # 1/8-size tail is latency-hidden); deeper tails saturate ~0.9987.
        # Now shave PHASE 1: with the strong tail catching stragglers, how
        # few barrier iterations / polish sweeps does the bulk need?
        (16, 20, 2, 4, True, True, 8, 48, 32, 4),     # champion
        (16, 16, 2, 4, True, True, 8, 48, 32, 4),
        (16, 14, 2, 4, True, True, 8, 48, 32, 4),
        (16, 12, 2, 4, True, True, 8, 48, 32, 4),
        (16, 16, 1, 4, True, True, 8, 48, 32, 4),
    ]

    for rows, its, sweeps, refine, two, split, tdiv, tit, tsw, trf in configs:
        name = (f"rows={rows} it={its} sw={sweeps} rf={refine} "
                f"two={two} split={split} tdiv={tdiv} tail_it={tit} "
                f"tsw={tsw} trf={trf}")
        try:
            @jax.jit
            def pipeline(key, rows=rows, its=its, sweeps=sweeps,
                         refine=refine, two=two, split=split,
                         tdiv=tdiv, tit=tit, tsw=tsw, trf=trf):
                s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
                sol = solve_balance_qp_fused(
                    s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d,
                    s.feet, s.stance, cfg.balance, iterations=its,
                    polish=True, polish_sweeps=max(sweeps, 1),
                    polish_refine=max(refine, 1), rows=rows, two_phase=two,
                    split=split, tail_divisor=tdiv, tail_iterations=tit,
                    tail_sweeps=tsw, tail_refine=trf)
                return sol.converged

            t0 = time.time()
            conv = jax.block_until_ready(pipeline(jax.random.key(0)))
            tc = time.time() - t0
            cf = float(jnp.mean(conv.astype(jnp.float32)))

            def timed(reps, key):
                keys = jax.random.split(key, reps)
                jax.block_until_ready(pipeline(keys[0]))
                t0 = time.time()
                out = None
                for k in keys:
                    out = pipeline(k)
                jax.block_until_ready(out)
                return (time.time() - t0) / reps

            t4 = timed(4, jax.random.key(1))
            t12 = timed(12, jax.random.key(2))
            marginal = (12 * t12 - 4 * t4) / 8
            qps = BATCH / marginal * cf
            log(f"{name}: compile {tc:.0f}s conv {cf:.4f} | "
                f"{t4*1e3:.1f}/{t12*1e3:.1f} ms @4/12, marginal "
                f"{marginal*1e3:.1f} ms -> {qps:,.0f} conv-QPs/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
