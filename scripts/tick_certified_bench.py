#!/usr/bin/env python
"""Measure + record the in-loop certified-tick operating points
(VERDICT round-2 #1 deliverable): BENCH_tick_certified.json.

Grid: the fast barrier-only default, the shipped certified tail config
(qp_tail=True: argsort-compacted B/4 slice re-solved with 24 warm-seeded
polish sweeps + one in-kernel proximal restart), and a rows=16 tail
variant (same per-sweep latency, half the tiles at scale).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
        scripts/tick_certified_bench.py
"""

import json
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
    conv_s = float(np.asarray(res.trace.qp_converged).mean())
    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)
    res2 = jax.block_until_ready(rollout_whole_body_fused(
        res.plant, res.carry, cmd, 600, tick, n_substeps=10, record=True,
        warm=res.warm))
    conv_t = float(np.asarray(res2.trace.qp_converged).mean())
    up = float((np.asarray(res2.plant.R[:, 2, 2]) > 0.9).mean())
    return conv_s, conv_t, up


def marginal_ms(tick, B, lo, hi):
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
    log(f"device: {jax.devices()[0]}")

    grid = (
        ("barrier_only", dict(qp_iterations=6, qp_polish=False)),
        ("certified_tail", dict(
            qp_iterations=6, qp_polish=False, qp_tail=True,
            qp_tail_divisor=4, qp_tail_sweeps=24, qp_tail_prox_steps=1,
            qp_tail_prox_iterations=8, qp_tail_prox_sweeps=8)),
        ("certified_tail_r16", dict(
            qp_iterations=6, qp_polish=False, qp_tail=True,
            qp_tail_divisor=4, qp_tail_rows=16, qp_tail_sweeps=24,
            qp_tail_prox_steps=1, qp_tail_prox_iterations=8,
            qp_tail_prox_sweeps=8)),
        ("certified_tail_s32", dict(
            qp_iterations=6, qp_polish=False, qp_tail=True,
            qp_tail_divisor=4, qp_tail_sweeps=32, qp_tail_prox_steps=1,
            qp_tail_prox_iterations=8, qp_tail_prox_sweeps=8)),
    )
    out = {}
    for name, kw in grid:
        tick = make_fused_tick(model, cfg, contact, rows=16,
                               qp_warm_start=True, gravity_comp=True, **kw)
        conv_s, conv_t, up = behavior(tick)
        per4k = marginal_ms(tick, 4096, 50, 300)
        per32k = marginal_ms(tick, 32768, 20, 100)
        log(f"{name}: stand {conv_s:.4f} trot {conv_t:.4f} upright {up:.3f}"
            f" | {per4k:.3f} ms @4096, {per32k:.3f} ms @32768")
        out[name] = dict(conv_stand=round(conv_s, 4),
                         conv_trot=round(conv_t, 4), upright=up,
                         ms_per_tick_b4096=round(per4k, 3),
                         ms_per_tick_b32768=round(per32k, 3),
                         ticks_per_s_b4096=round(4096 / per4k * 1e3),
                         config=kw)

    artifact = dict(
        metric="in_loop_certified_tick_frontier",
        device=str(jax.devices()[0]),
        note=("VERDICT round-2 #1: in-kernel prox restarts in the "
              "compacted tail push the in-loop trot certification past "
              "the round-2 polish asymptote (0.9967). The <=1 ms/0.999 "
              "combined target is below the polish kernel's measured "
              "latency floor (~0.10-0.15 ms per sweep per tile; "
              "certified grade needs ~32 sweep-units) — see ROADMAP "
              "'certification latency physics'."),
        points=out,
    )
    with open("BENCH_tick_certified.json", "w") as f:
        json.dump(artifact, f, indent=1)
    log("wrote BENCH_tick_certified.json")


if __name__ == "__main__":
    sys.exit(main())
