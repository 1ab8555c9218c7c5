#!/usr/bin/env python
"""Headline benchmark: converged 12-var friction-cone GRF QPs per second per chip.

Runs the full pipeline on the attached accelerator in float32: on-device
scenario generation (BASELINE configs 1-3 mix) -> SRB/QP assembly -> batched
interior-point solve with certified active-set polish. Reports ONE JSON line
on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is against the reference's implied throughput of ~100 warm-started
qpOASES solves/s on one CPU core (balance_controller.cpp:91 — one 12x20 QP
per <=10 ms budget; BASELINE.md).

Extra diagnostics (convergence fraction, f64-oracle objective parity on a
subsample) go to stderr so stdout stays machine-parseable.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)

import os

BASELINE_QPS = 100.0  # reference: 1 warm-started 12x20 QP / 10 ms, 1 core
BATCH = int(os.environ.get("QCT_BENCH_BATCH", 32768))
ITERATIONS = int(os.environ.get("QCT_BENCH_ITERS", 20))
ROWS = int(os.environ.get("QCT_BENCH_ROWS", 16))  # tile height: the fused
# kernel is VPU-latency-bound; 16 sublanes halve the instruction count/QP
REPS = int(os.environ.get("QCT_BENCH_REPS", 16))
# Certification tail: QCT_BENCH_PROX selects how the compacted hard tail
# is certified.
#   "1" (default): THIRD-stage IN-KERNEL proximal restarts on a second
#       B/64 compaction (solver/pallas_fused prox_backend="kernel") — the
#       round-3 path: the slice is small enough to afford a heavy restart
#       schedule, ~10x cheaper than the legacy XLA stage and far cheaper
#       to compile.
#   "tail": fold lighter prox restarts INTO the two-phase tail dispatch
#       (tail_prox_steps) — two dispatches total; measured 1.21M @ 0.9991
#       (v5e 2026-08-21).
#   "0": no prox — the two-phase-only throughput point (~0.9985 conv).
#   "xla": the legacy round-2 XLA prox stage (solve_qp_ipm_pallas
#       restarts; ~15 ms + ~200 s compile at 32k) for A/B comparison.
PROX = os.environ.get("QCT_BENCH_PROX", "1")
# Prox shape: restart count, barrier iterations per restart, and
# post-restart re-polish sweeps.
PROX_STEPS = int(os.environ.get("QCT_BENCH_PROX_STEPS", 6))
PROX_ITERS = int(os.environ.get("QCT_BENCH_PROX_ITERS", 24))
PROX_SWEEPS = int(os.environ.get("QCT_BENCH_PROX_SWEEPS", 6))
# Two-phase hard-tail schedule (phase 2); the stage-3 prox now carries
# the deep certification, so the tail can run shorter than round 2's
# it=48/sweeps=32.
TAIL_ITERS = int(os.environ.get("QCT_BENCH_TAIL_ITERS", 24))
TAIL_SWEEPS = int(os.environ.get("QCT_BENCH_TAIL_SWEEPS", 16))
# QCT_BENCH_MARGINAL=1 reports the marginal per-rep time (long run minus
# short run), removing fixed dispatch overhead from the headline.
MARGINAL = os.environ.get("QCT_BENCH_MARGINAL", "0") != "0"
MAX_ROUNDS = int(os.environ.get("QCT_BENCH_MAX_ROUNDS", 8))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_config()
    dev = jax.devices()[0]
    log(f"device: {dev}")

    @jax.jit
    def pipeline(key):
        s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
        # Tuned config (scripts/fused_tune.py on v5e): fused kernel at
        # rows=16 tile height, 2 polish sweeps for everyone + a long-schedule
        # re-solve of the uncertified tail — higher conv than 8 sweeps
        # everywhere at ~1.7x the speed. The certification prox restarts
        # ride INSIDE that tail dispatch (tail_prox_steps, round 3).
        sol = solve_balance_qp_fused(
            s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
            s.stance, cfg.balance, iterations=ITERATIONS, polish=True,
            polish_sweeps=2, two_phase=True, split=True, rows=ROWS,
            tail_iterations=TAIL_ITERS, tail_sweeps=TAIL_SWEEPS,
            tail_prox_steps=PROX_STEPS if PROX == "tail" else 0,
            tail_prox_iterations=PROX_ITERS,
            tail_prox_sweeps=PROX_SWEEPS,
            prox_tail=PROX in ("1", "xla"),
            prox_backend="kernel" if PROX == "1" else "xla",
            prox_steps=PROX_STEPS, prox_iterations=PROX_ITERS,
            prox_sweeps=PROX_SWEEPS)
        return sol.x, sol.converged, s

    key = jax.random.key(0)
    t0 = time.time()
    x, conv, scen = jax.block_until_ready(pipeline(key))
    log(f"compile+first run: {time.time() - t0:.1f}s")

    # Steady-state timing: new key each rep defeats result caching; the axon
    # tunnel adds ONE-SIDED contention noise (measured up to 3x between
    # processes), so min time is the device capability. Adaptive best-of:
    # keep taking rounds until the best stops improving for two consecutive
    # rounds (>=3, <=MAX_ROUNDS).
    def run_reps(seed, reps):
        keys = jax.random.split(jax.random.key(seed), reps)
        jax.block_until_ready(pipeline(keys[0]))
        t0 = time.time()
        out = None
        for k in keys:
            out = pipeline(k)
        jax.block_until_ready(out)
        return time.time() - t0

    def round_time(seed):
        if MARGINAL:
            # Marginal per-rep cost: (3*REPS run - REPS run) / (2*REPS)
            # cancels fixed per-call dispatch overhead. The tunnel's
            # one-sided contention can inflate the SHORT run past a third
            # of the long one, making the difference non-positive — such a
            # round is noise, not a measurement: discard it (retry with a
            # fresh seed; give up after 3 tries rather than loop forever).
            for retry in range(3):
                t1 = run_reps(seed + 10000 * retry, REPS)
                t3 = run_reps(seed + 1000 + 10000 * retry, 3 * REPS)
                dt = (t3 - t1) / (2 * REPS)
                if dt > 0:
                    return dt
                log(f"  marginal round discarded (non-positive {dt*1e3:.2f}"
                    " ms): short run hit tunnel contention; retrying")
            return t3 / (3 * REPS)  # fall back to the plain per-rep time
        return run_reps(seed, REPS) / REPS

    times = []
    best = float("inf")
    stall = 0
    for s in range(1, MAX_ROUNDS + 1):
        t = round_time(s)
        times.append(t)
        if t < best * 0.99:
            best, stall = min(best, t), 0
        else:
            stall += 1
        if len(times) >= 3 and stall >= 2:
            break
    dt = min(times)
    log(f"round times ({len(times)}): "
        f"{', '.join(f'{t*1e3:.1f}' for t in times)} ms"
        + (" [marginal]" if MARGINAL else ""))
    qps = BATCH / dt

    conv_frac = float(jnp.mean(conv.astype(jnp.float32)))
    log(f"batch {BATCH}, {dt * 1e3:.1f} ms/solve-batch, conv frac {conv_frac:.4f}")

    # Objective parity vs the float64 active-set oracle on a subsample.
    try:
        from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle

        n_check = 64
        idx = np.arange(n_check)
        qp = assemble_qp_batch(
            jax.tree.map(lambda a: a[idx] if a is not None else None, scen),
            cfg,
        )
        stance = scen.stance
        x_star, obj_star, kkt = solve_qp_batch_oracle(
            np.asarray(qp.Q), np.asarray(qp.c),
            np.asarray(qp.G), np.asarray(qp.h),
            np.asarray(stance)[idx], cfg.balance.fz_min, cfg.balance.fz_max,
        )
        xs = np.asarray(x, np.float64)[idx]
        Qd = np.asarray(qp.Q, np.float64)
        cd = np.asarray(qp.c, np.float64)
        obj = 0.5 * np.einsum("bi,bij,bj->b", xs, Qd, xs) + \
            np.einsum("bi,bi->b", cd, xs)
        rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
        log(f"oracle parity (n={n_check}): obj rel p50 {np.median(rel):.2e} "
            f"max {rel.max():.2e}; force diff max "
            f"{np.abs(xs - x_star).max():.2e} N (N-scale force diffs at "
            "1e-8 objective parity are the degenerate 4-stance family's "
            "optimal-set multiplicity, not an error — see ROADMAP)")
        parity_ok = float(np.median(rel) < 1e-6)
    except Exception as e:  # oracle is host-side float64; never block bench
        log(f"oracle check skipped: {e}")
        parity_ok = -1.0

    # Second operating point for the diagnostics (VERDICT round-2 #3):
    # the two-phase-only THROUGHPUT mode (no prox), one quick marginal
    # round. The JSON headline stays the certified default above.
    if PROX == "1" and os.environ.get("QCT_BENCH_SECOND", "1") != "0":
        @jax.jit
        def pipeline_fast(key):
            s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
            sol = solve_balance_qp_fused(
                s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d,
                s.feet, s.stance, cfg.balance, iterations=ITERATIONS,
                polish=True, polish_sweeps=2, two_phase=True, split=True,
                rows=ROWS, tail_iterations=TAIL_ITERS,
                tail_sweeps=TAIL_SWEEPS)
            return sol.converged

        conv_f = jax.block_until_ready(
            pipeline_fast(jax.random.key(7)))
        reps = max(REPS // 2, 4)
        keys = jax.random.split(jax.random.key(99), 3 * reps)
        jax.block_until_ready(pipeline_fast(keys[0]))
        t0 = time.time()
        for k in keys[:reps]:
            out = pipeline_fast(k)
        jax.block_until_ready(out)
        t1 = time.time() - t0
        t0 = time.time()
        for k in keys:
            out = pipeline_fast(k)
        jax.block_until_ready(out)
        t3 = time.time() - t0
        dtf = (t3 - t1) / (2 * reps)
        # Tunnel contention makes the marginal unreliable below ~20% of
        # the plain per-rep time (the same artifact the headline's
        # discard-and-retry handles); fall back to the plain time.
        plain = t3 / (3 * reps)
        if dtf < 0.2 * plain:
            dtf = plain
        log(f"throughput mode (no prox): {BATCH / dtf:,.0f} QPs/s"
            f" at conv {float(jnp.mean(conv_f.astype(jnp.float32))):.4f}"
            " (headline stays the certified point)")

    # Converged throughput is the honest headline: solved instances per
    # second on this chip.
    value = qps * conv_frac
    print(json.dumps({
        "metric": "converged_grf_qps_per_chip",
        "value": round(value, 1),
        "unit": "QPs/s",
        "vs_baseline": round(value / BASELINE_QPS, 2),
    }))


if __name__ == "__main__":
    main()
