#!/usr/bin/env python
"""Drive the WARM-STARTED fused tick on the real TPU and measure the
hotstart economics (ROADMAP item 1).

The reference amortizes its QP via qpOASES hotstart across ticks
(balance_controller.cpp:193-195, nWSR<=200 warm vs cold). The fused tick's
equivalent carries (x, s, z, stance) through the scan in packed lane layout
and warm-starts the in-kernel barrier (stance-transition rows reset cold).
This script checks, at several warm iteration counts:

  1. behavior: stand-up latches 0.26 m; 0.2 m/s trot stays upright —
     the same criteria as scripts/verify_fused_tick.py (cold baseline);
  2. marginal ms/tick at batch 4096 vs the cold-start tick.

Expected (ROADMAP): cold needs all 12 iterations (8 falls over in trot);
warm ~6 should hold behavior at ~0.7x the tick cost.

Run: PYTHONPATH="$PYTHONPATH:." python scripts/verify_warm_tick.py
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
    cmd0 = jnp.zeros((B, 6), jnp.float32)
    res = jax.block_until_ready(rollout_whole_body_fused(
        wb, carry, cmd0, 600, tick, n_substeps=10, record=True))
    z = np.asarray(res.plant.x[:, 2])
    up = np.asarray(res.plant.R[:, 2, 2])
    conv_s = np.asarray(res.trace.qp_converged).mean()
    standing = np.asarray(res.carry.standing).mean()
    ok_stand = (abs(z.mean() - cfg.stand.height) < 0.015
                and up.min() > 0.98 and standing > 0.9)

    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)
    res2 = jax.block_until_ready(rollout_whole_body_fused(
        res.plant, res.carry, cmd, 600, tick, n_substeps=10, record=True))
    z2 = np.asarray(res2.plant.x[:, 2])
    up2 = np.asarray(res2.plant.R[:, 2, 2])
    xtrav = np.asarray(res2.plant.x[:, 0]).mean()
    upright_frac = (up2 > 0.9).mean()
    conv_t = np.asarray(res2.trace.qp_converged).mean()
    ok_trot = upright_frac > 0.95 and xtrav > 0.15
    log(f"  stand: z {z.mean():.4f} standing {standing:.3f} conv {conv_s:.4f}"
        f" | trot: x {xtrav:.3f} m z {z2.mean():.4f} upright"
        f" {upright_frac:.4f} conv {conv_t:.4f}"
        f" -> {'OK' if (ok_stand and ok_trot) else 'FAIL'}")
    return ok_stand and ok_trot


def marginal_ms(tick, B=4096, lo=50, hi=450):
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

    ticks = {}
    for name, it, warm in (("cold-12", 12, False), ("warm-8", 8, True),
                           ("warm-6", 6, True), ("warm-5", 5, True)):
        ticks[name] = make_fused_tick(
            model, cfg, contact, rows=rows, qp_iterations=it,
            qp_polish=False, qp_warm_start=warm, gravity_comp=True)

    ok = {}
    for name, tick in ticks.items():
        log(f"{name}:")
        ok[name] = behavior(tick)

    log("timing (marginal ms/tick, B=4096):")
    for name, tick in ticks.items():
        per = marginal_ms(tick)
        log(f"  {name}: {per:.3f} ms/tick -> {4096/per*1e3:,.0f} "
            f"scenario-ticks/s ({4096/per*1e3/cfg.frequency:,.0f}x rt)")

    ok_all = ok["cold-12"] and (ok["warm-6"] or ok["warm-8"])
    print("PASS" if ok_all else "FAIL")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
