#!/usr/bin/env python
"""A/B on device: fused 3-kernel tick vs XLA commander + kernels, same
scenario (stand-up from laying, physical config, no gravity comp).

Run: PYTHONPATH="$PYTHONPATH:." python scripts/tick_ab_device.py
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
    B = 64
    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    cmd0 = jnp.zeros((B, 6), jnp.float32)

    stepper = make_pallas_stepper(model, cfg, contact, rows=8,
                                  prefactor="kernel")
    t0 = time.time()
    res_x = jax.block_until_ready(rollout_whole_body(
        wb, carry, cmd0, 300, cfg, model, contact, n_substeps=10,
        qp_iterations=12, qp_backend="fused", record=False,
        stepper=stepper))
    zx = np.asarray(res_x.plant.x[:, 2])
    log(f"[3stage] {time.time()-t0:.0f}s z mean {zx.mean():.4f} "
        f"min {zx.min():.4f} standing "
        f"{np.asarray(res_x.carry.standing).mean():.3f}")

    tick = make_fused_tick(model, cfg, contact, rows=8, qp_iterations=12,
                           qp_polish=True, qp_warm_start=False)
    t0 = time.time()
    res_f = jax.block_until_ready(rollout_whole_body_fused(
        wb, carry, cmd0, 300, tick, n_substeps=10, record=False))
    zf = np.asarray(res_f.plant.x[:, 2])
    log(f"[fused ] {time.time()-t0:.0f}s z mean {zf.mean():.4f} "
        f"min {zf.min():.4f} standing "
        f"{np.asarray(res_f.carry.standing).mean():.3f}")

    # Final-state snapshot for localization.
    for name, r in (("3stage", res_x), ("fused", res_f)):
        q = np.asarray(r.plant.q)
        log(f"{name}: q0 {q[0, 0]}, x {np.asarray(r.plant.x)[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
