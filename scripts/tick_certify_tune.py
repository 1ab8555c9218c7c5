#!/usr/bin/env python
"""Tune the CERTIFIED fused tick (VERDICT round-1 #3): warm-6 barrier plus
a cheap in-kernel active-set polish.

scripts/tick_tail_diag.py isolated the in-loop uncertified ~2-3%: the
degenerate 4-stance family (rank-6 A^T S A, cond ~7.5e5) in the trot's
4-stance overlap windows — more barrier iterations do NOT certify them
(cold-12 re-solve: 20%), but the quasidefinite-LDL polish does (the same
physics as the two-phase tail, scripts/tail_knobs.py). With the warm carry
seeding the polish's initial active set from the previous tick's (s, z),
1-2 sweeps should certify nearly every tick. This script measures the
cost/convergence frontier.

Run: PYTHONPATH="$PYTHONPATH:." python scripts/tick_certify_tune.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_state,
    mit_cheetah_whole_body_model,
)
from quadruped_control_tpu.sim.pallas_tick import (
    make_fused_tick,
    rollout_whole_body_fused,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def behavior(tick, B=256):
    cfg = mit_cheetah_physical_config()
    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    res = jax.block_until_ready(rollout_whole_body_fused(
        wb, carry, jnp.zeros((B, 6), jnp.float32), 600, tick,
        n_substeps=10, record=True))
    z = np.asarray(res.plant.x[:, 2])
    conv_s = np.asarray(res.trace.qp_converged).mean()
    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)
    res2 = jax.block_until_ready(rollout_whole_body_fused(
        res.plant, res.carry, cmd, 600, tick, n_substeps=10, record=True,
        warm=res.warm))
    conv_t = np.asarray(res2.trace.qp_converged).mean()
    xtrav = np.asarray(res2.plant.x[:, 0]).mean()
    up = (np.asarray(res2.plant.R[:, 2, 2]) > 0.9).mean()
    log(f"  stand z {z.mean():.4f} conv {conv_s:.4f} | trot x {xtrav:.3f}"
        f" upright {up:.3f} conv {conv_t:.4f}")
    return conv_s, conv_t


def marginal_ms(tick, B=4096, lo=50, hi=300):
    cfg = mit_cheetah_physical_config()
    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    carry = carry._replace(standing=jnp.ones((B,), bool))
    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)

    def run(steps):
        return rollout_whole_body_fused(wb, carry, cmd, steps, tick,
                                        n_substeps=10, record=False)

    res = {}
    for steps in (lo, hi):
        jax.block_until_ready(run(steps))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(steps))
            best = min(best, time.time() - t0)
        res[steps] = best
    return (res[hi] - res[lo]) / (hi - lo) * 1e3


def main():
    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    contact = ContactConfig()
    rows = 16
    log(f"device: {jax.devices()[0]}, rows={rows}")

    # Grid from the offline frontier (scripts/tail_warm_polish_probe.py +
    # the numpy search replica on the harvested hard set): warm-set polish
    # certifies 63% at 1 sweep, 84% at 4-12 (the 'wanderer' family starts
    # ~8 rows from the oracle set and converges ~1 row/sweep), 95% at 24
    # (saturating — 5% of the hard set defeats the f32 single-swap search
    # at any budget). Multi-swap and over-active seeds measurably hurt.
    # Round-3 frontier (first sweep measured 2026-08-21, v5e):
    #   warm6-bar                 0.9983/0.9667  0.101 ms
    #   warm6-tail4-s24-prox2x8   1.0000/0.9983 10.710 ms (prox_sweeps=24)
    #   warm6-tail4-s16-prox2x8   1.0000/0.9800  7.218 ms
    #   warm6-tail4-s24-prox3x10  1.0000/0.9983 14.236 ms
    #   warm6-p24r1 (round-2 ref) 1.0000/0.9967  5.022 ms
    # -> the in-kernel prox BEATS the round-2 0.9967 asymptote (0.9983),
    # and the cost is pure KERNEL LATENCY (sweeps x grid steps): at b4096
    # the compacted tail is nb=1 and saves nothing. This sweep cuts the
    # post-prox polish (prox_sweeps) and adds a LARGE-batch marginal where
    # compaction genuinely amortizes (nb_tail = nb/4).
    grid = (
        ("warm6-bar", dict(qp_iterations=6, qp_polish=False)),
        ("warm6-tail4-s24-prox2x8-ps6", dict(
            qp_iterations=6, qp_polish=False, qp_tail=True,
            qp_tail_divisor=4, qp_tail_sweeps=24, qp_tail_prox_steps=2,
            qp_tail_prox_iterations=8, qp_tail_prox_sweeps=6)),
        ("warm6-tail4-s24-prox1x8-ps8", dict(
            qp_iterations=6, qp_polish=False, qp_tail=True,
            qp_tail_divisor=4, qp_tail_sweeps=24, qp_tail_prox_steps=1,
            qp_tail_prox_iterations=8, qp_tail_prox_sweeps=8)),
        ("warm6-p24r1", dict(qp_iterations=6, qp_polish=True,
                             qp_polish_sweeps=24, qp_polish_refine=1)),
    )
    out = {}
    for name, kw in grid:
        tick = make_fused_tick(model, cfg, contact, rows=rows,
                               qp_warm_start=True, gravity_comp=True, **kw)
        log(f"{name}:")
        conv_s, conv_t = behavior(tick)
        per = marginal_ms(tick)
        per32 = marginal_ms(tick, B=32768, lo=20, hi=100)
        log(f"  {per:.3f} ms/tick @ b4096 -> {4096 / per * 1e3:,.0f} t/s; "
            f"{per32:.3f} ms @ b32768 -> {32768 / per32 * 1e3:,.0f} t/s")
        out[name] = (conv_s, conv_t, per, per32)

    log("\nsummary (conv_stand, conv_trot, ms/tick@4096, ms/tick@32768):")
    for name, (cs, ct, per, per32) in out.items():
        log(f"  {name}: {cs:.4f} {ct:.4f} {per:.3f} {per32:.3f}")


if __name__ == "__main__":
    sys.exit(main())
