#!/usr/bin/env python
"""Drive the fused 3-kernel whole-body tick on the real TPU (f32).

Behavior: stand-up from the laying pose latches the 0.26 m target; a
0.2 m/s trot (the reference's gait-transition demo speed, README.md:57)
stays upright. Then marginal per-tick timing vs the previous fastest path
(XLA commander(fused QP) + pallas substep stepper).

Run: PYTHONPATH="$PYTHONPATH:." python scripts/verify_fused_tick.py
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
    make_pallas_stepper,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)
from quadruped_control_tpu.sim.pallas_tick import (
    make_fused_tick,
    rollout_whole_body_fused,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    contact = ContactConfig()
    log(f"device: {jax.devices()[0]}")

    # gravity_comp=True is the documented full-physics operating point
    # (PARITY.md: tau = J^T f realizes the GRF only for massless legs; the
    # ~2-3 N leg-weight bias otherwise sags the base ~1.4 cm, below the
    # 5 mm standing-latch window). Criteria mirror the float64 oracle
    # tests (tests/test_whole_body_loop.py: 600 ticks, |z - 0.26| < 0.015).
    # qp_polish=False matches rollout_whole_body's closed-loop default
    # (barrier-only; the certified-polish stage is for solver sweeps and
    # costs ~4.7 ms/tick at b4096 — see scripts/tick_stage_profile.py).
    tick = make_fused_tick(model, cfg, contact, rows=8, qp_iterations=12,
                           qp_polish=False, qp_warm_start=False,
                           gravity_comp=True)

    # ---- behavior: stand-up then trot at 0.2 m/s --------------------------
    B = 256
    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    cmd0 = jnp.zeros((B, 6), jnp.float32)
    t0 = time.time()
    res = jax.block_until_ready(rollout_whole_body_fused(
        wb, carry, cmd0, 600, tick, n_substeps=10, record=True))
    log(f"stand-up 600 ticks: {time.time()-t0:.1f}s (incl. compile)")
    z = np.asarray(res.plant.x[:, 2])
    up = np.asarray(res.plant.R[:, 2, 2])
    conv = np.asarray(res.trace.qp_converged).mean()
    log(f"stand-up: z mean {z.mean():.4f} (min {z.min():.4f}), "
        f"upright R22 min {up.min():.4f}, conv {conv:.4f}, "
        f"standing {np.asarray(res.carry.standing).mean():.3f}")
    ok_stand = (abs(z.mean() - cfg.stand.height) < 0.015
                and up.min() > 0.98 and conv > 0.98
                and np.asarray(res.carry.standing).mean() > 0.9)

    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)
    res2 = jax.block_until_ready(rollout_whole_body_fused(
        res.plant, res.carry, cmd, 600, tick, n_substeps=10, record=True))
    z2 = np.asarray(res2.plant.x[:, 2])
    up2 = np.asarray(res2.plant.R[:, 2, 2])
    xtrav = np.asarray(res2.plant.x[:, 0]).mean()
    upright_frac = (up2 > 0.9).mean()
    log(f"trot 0.2 m/s, 600 ticks (2 s): x {xtrav:.3f} m, z mean "
        f"{z2.mean():.4f}, upright frac {upright_frac:.4f}, conv "
        f"{np.asarray(res2.trace.qp_converged).mean():.4f}")
    ok_trot = upright_frac > 0.95 and xtrav > 0.15

    # ---- timing: fused tick vs XLA-commander + pallas stepper -------------
    for B in (1024, 4096):
        wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
        carry = init_commander_carry((B,), dtype=jnp.float32)
        carry = carry._replace(standing=jnp.ones((B,), bool))
        cmdB = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)

        tickB = make_fused_tick(model, cfg, contact, rows=8,
                                qp_iterations=12, qp_polish=False,
                                qp_warm_start=False)

        def run_fused(steps):
            return rollout_whole_body_fused(wb, carry, cmdB, steps, tickB,
                                            n_substeps=10, record=False)

        stepper = make_pallas_stepper(model, cfg, contact, rows=8,
                                      prefactor="kernel")

        def run_ref(steps):
            return rollout_whole_body(
                wb, carry, cmdB, steps, cfg, model, contact,
                n_substeps=10, qp_iterations=12, qp_backend="fused",
                record=False, stepper=stepper)

        # Longer scans for the fused tick: at ~0.2 ms/tick a 40-tick
        # marginal is below the tunnel's dispatch noise floor.
        for name, fn, lo, hi in (("fused-tick", run_fused, 50, 450),
                                 ("ref-3stage", run_ref, 20, 100)):
            res = {}
            for steps in (lo, hi):
                jax.block_until_ready(fn(steps))  # compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(fn(steps))
                    best = min(best, time.time() - t0)
                res[steps] = best
            per = (res[hi] - res[lo]) / (hi - lo)
            log(f"B={B} {name}: {per*1e3:.3f} ms/tick -> "
                f"{B/per:,.0f} scenario-ticks/s "
                f"({B/per/cfg.frequency:,.0f}x realtime)")

    print("PASS" if (ok_stand and ok_trot) else "FAIL")
    return 0 if (ok_stand and ok_trot) else 1


if __name__ == "__main__":
    sys.exit(main())
