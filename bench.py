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
from quadruped_control_tpu.solver.pallas_ipm import solve_qp_ipm_pallas
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)

BASELINE_QPS = 100.0  # reference: 1 warm-started 12x20 QP / 10 ms, 1 core
BATCH = 16384
ITERATIONS = 20
REPS = 10


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_config()
    dev = jax.devices()[0]
    log(f"device: {dev}")

    @jax.jit
    def pipeline(key):
        s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
        qp = assemble_qp_batch(s, cfg)
        sol = solve_qp_ipm_pallas(qp.Q, qp.c, qp.G, qp.h,
                                  iterations=ITERATIONS, polish=True)
        return sol.x, sol.converged, qp, s.stance

    key = jax.random.key(0)
    t0 = time.time()
    x, conv, qp, stance = jax.block_until_ready(pipeline(key))
    log(f"compile+first run: {time.time() - t0:.1f}s")

    # Steady-state timing (new key each rep defeats caching of the result).
    keys = jax.random.split(jax.random.key(1), REPS)
    jax.block_until_ready(pipeline(keys[0]))
    t0 = time.time()
    for k in keys:
        out = pipeline(k)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    qps = BATCH / dt

    conv_frac = float(jnp.mean(conv.astype(jnp.float32)))
    log(f"batch {BATCH}, {dt * 1e3:.1f} ms/solve-batch, conv frac {conv_frac:.4f}")

    # Objective parity vs the float64 active-set oracle on a subsample.
    try:
        from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle

        n_check = 64
        idx = np.arange(n_check)
        x_star, obj_star, kkt = solve_qp_batch_oracle(
            np.asarray(qp.Q)[idx], np.asarray(qp.c)[idx],
            np.asarray(qp.G)[idx], np.asarray(qp.h)[idx],
            np.asarray(stance)[idx], cfg.balance.fz_min, cfg.balance.fz_max,
        )
        xs = np.asarray(x, np.float64)[idx]
        Qd = np.asarray(qp.Q, np.float64)[idx]
        cd = np.asarray(qp.c, np.float64)[idx]
        obj = 0.5 * np.einsum("bi,bij,bj->b", xs, Qd, xs) + \
            np.einsum("bi,bi->b", cd, xs)
        rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
        log(f"oracle parity (n={n_check}): obj rel p50 {np.median(rel):.2e} "
            f"max {rel.max():.2e}; force diff max "
            f"{np.abs(xs - x_star).max():.2e} N")
        parity_ok = float(np.median(rel) < 1e-6)
    except Exception as e:  # oracle is host-side float64; never block bench
        log(f"oracle check skipped: {e}")
        parity_ok = -1.0

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
