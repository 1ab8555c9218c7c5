#!/usr/bin/env python
"""Measure the WARM-STARTED fused MPC tick on the real TPU: the Riccati
IPM seeded from the previous tick's horizon solution (F, s, z) with
schedule-changed rows reset cold (mpc/pallas_riccati.py warm mode) — the
receding-horizon analogue of the balance tick's in-kernel warm start
(scripts/verify_warm_tick.py, BENCH_warm_tick.json).

For each config (cold-15 reference + warm at reduced iterations):
  1. behavior at B=256: stand-up latches the stand height; 0.2 m/s trot
     stays upright and travels (chunked 50 — axon tunnel budget);
  2. marginal ms/tick at batch 1024 and 4096 (rows=8; the Riccati
     scratch exceeds VMEM at rows=16).

Run: PYTHONPATH="$PYTHONPATH:." python scripts/verify_mpc_warm_tick.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_control_tpu.config import mit_cheetah_whole_body_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_state,
    mit_cheetah_whole_body_model,
)
from quadruped_control_tpu.sim.pallas_tick import (
    make_fused_tick,
    rollout_whole_body_fused,
    rollout_whole_body_fused_chunked,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def behavior(tick, cfg, B=256):
    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    t0 = time.time()
    res = rollout_whole_body_fused_chunked(
        wb, carry, jnp.zeros((B, 6), jnp.float32), 600, tick, chunk=50,
        n_substeps=10, record=True)
    z = np.asarray(res.plant.x[:, 2])
    standing = np.asarray(res.carry.standing).mean()
    conv_s = np.asarray(res.trace.qp_converged).mean()
    log(f"  stand ({time.time() - t0:.0f}s): z {z.mean():.4f} standing "
        f"{standing:.3f} conv {conv_s:.4f}")
    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)
    t0 = time.time()
    res2 = rollout_whole_body_fused_chunked(
        res.plant, res.carry, cmd, 900, tick, chunk=50, n_substeps=10,
        record=True, warm=res.warm)
    xtrav = np.asarray(res2.plant.x[:, 0]).mean()
    up = (np.asarray(res2.plant.R[:, 2, 2]) > 0.9).mean()
    conv_t = np.asarray(res2.trace.qp_converged).mean()
    vx = xtrav / (900 / cfg.frequency)
    log(f"  trot ({time.time() - t0:.0f}s): x {xtrav:.3f} (vx {vx:.3f}) "
        f"upright {up:.4f} conv {conv_t:.4f}")
    ok = (abs(z.mean() - cfg.stand.height) < 0.02 and standing > 0.9
          and up > 0.95 and 0.10 < vx < 0.25)
    return dict(stand_z=round(float(z.mean()), 4),
                standing=round(float(standing), 4),
                trot_x=round(float(xtrav), 3), vx=round(float(vx), 3),
                upright=round(float(up), 4),
                conv_stand=round(float(conv_s), 4),
                conv_trot=round(float(conv_t), 4), ok=bool(ok))


def marginal(tick, cfg, Bt, lo=10, hi=50):
    wbt = init_whole_body_state(cfg, (Bt,), dtype=jnp.float32)
    ct = init_commander_carry((Bt,), dtype=jnp.float32)
    ct = ct._replace(standing=jnp.ones((Bt,), bool))
    cmdt = jnp.zeros((Bt, 6), jnp.float32).at[:, 0].set(0.2)

    def run(steps):
        return rollout_whole_body_fused(wbt, ct, cmdt, steps, tick,
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
    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    contact = ContactConfig()
    log(f"device: {jax.devices()[0]}")

    grid = (
        ("cold-15", dict(mpc_iterations=15, mpc_warm_start=False)),
        ("warm-10", dict(mpc_iterations=10, mpc_warm_start=True)),
        ("warm-8", dict(mpc_iterations=8, mpc_warm_start=True)),
        ("warm-6", dict(mpc_iterations=6, mpc_warm_start=True)),
    )
    out = {}
    for name, kw in grid:
        tick = make_fused_tick(model, cfg, contact, rows=8,
                               controller="mpc", mpc_horizon=8,
                               mpc_dt=0.03, gravity_comp=True, **kw)
        log(f"{name}:")
        beh = behavior(tick, cfg)
        per = {}
        for Bt in (1024, 4096):
            per[Bt] = marginal(tick, cfg, Bt)
            log(f"  B={Bt}: {per[Bt]:.3f} ms/tick -> "
                f"{Bt / per[Bt] * 1e3:,.0f} ticks/s")
        out[name] = (beh, per)

    log("\nsummary:")
    for name, (beh, per) in out.items():
        log(f"  {name}: ok={beh['ok']} conv_trot={beh['conv_trot']} "
            f"ms/tick@1024={per[1024]:.3f} @4096={per[4096]:.3f}")
    import json
    print(json.dumps({n: {"behavior": b,
                          "marginal_ms_per_tick": {str(k): round(v, 4)
                                                   for k, v in p.items()}}
                      for n, (b, p) in out.items()}, indent=1))


if __name__ == "__main__":
    sys.exit(main())
