#!/usr/bin/env python
"""Device verify: Pallas whole-body substep kernel in the closed loop.

User-style drive of THIS session's surface on the real TPU in float32:
  1. f32 device parity: ``make_pallas_stepper`` vs the XLA plant path over
     one control tick (10 substeps) on a random batch.
  2. The shipped full-physics operating point (whole-body config, MPC
     controller, gravity compensation) run stand-up -> 0.2 m/s trot with
     the Pallas stepper, chunked host-side per CLAUDE.md (axon tunnel
     aborts long single executions).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_wb_pallas_drive.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_whole_body_config
from quadruped_control_tpu.math.rotations import matrix_to_rpy
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_rollout,
    init_whole_body_state,
    make_pallas_stepper,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
    whole_body_step,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    assert "TPU" in str(dev), dev

    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    contact = ContactConfig()
    stepper = make_pallas_stepper(model, cfg, contact, rows=8)

    # --- 1. f32 parity on device: kernel vs XLA path ---------------------
    B = 1024
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    state = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    state = state._replace(
        q=state.q + jax.random.uniform(k1, (B, 4, 3), jnp.float32, -0.3, 0.3),
        u=jax.random.uniform(k2, (B, 18), jnp.float32, -1.0, 1.0),
    )
    tau = jax.random.uniform(k3, (B, 4, 3), jnp.float32, -5.0, 5.0)
    out_pl = jax.block_until_ready(stepper(state, tau, 1.0 / 300.0, 10))

    @jax.jit
    def xla_step(s, t):
        return whole_body_step(s, t, 1.0 / 300.0, model, cfg, contact,
                               n_substeps=10, m_update="tick")

    out_x = jax.block_until_ready(xla_step(state, tau))
    for name in ("R", "x", "u", "q", "anchor"):
        a = np.asarray(getattr(out_pl, name))
        b = np.asarray(getattr(out_x, name))
        err = np.max(np.abs(a - b))
        scale = max(1.0, np.max(np.abs(b)))
        log(f"parity {name}: max abs err {err:.3e} (scale {scale:.1f})")
        assert np.isfinite(a).all(), name
        assert err / scale < 3e-4, (name, err)

    # --- 2. closed loop: stand-up then trot at 0.2 m/s -------------------
    B = 256
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=8,
              mpc_dt=0.03, mpc_iterations=15, gravity_comp=True,
              n_substeps=10, qp_backend="fused", stepper=stepper,
              record=False)
    plant, carry = init_whole_body_rollout(cfg, (B,), dtype=jnp.float32)

    def run(plant, carry, cmd, ticks, chunk=100):
        for _ in range(ticks // chunk):
            res = jax.block_until_ready(rollout_whole_body(
                plant, carry, cmd, chunk, cfg, model, contact, **kw))
            plant, carry = res.plant, res.carry
        return plant, carry

    t0 = time.time()
    cmd0 = jnp.zeros((B, 6), jnp.float32)
    plant, carry = run(plant, carry, cmd0, 900)
    z = np.asarray(plant.x[:, 2])
    standing = np.asarray(carry.standing)
    log(f"stand-up ({time.time()-t0:.0f}s): z p50 {np.median(z):.4f}, "
        f"standing {standing.mean():.3f}")
    assert abs(np.median(z) - cfg.stand.height) < 0.01
    assert standing.mean() > 0.95

    t0 = time.time()
    x0 = np.asarray(plant.x[:, 0])
    cmd = cmd0.at[:, 0].set(0.2)
    plant, carry = run(plant, carry, cmd, 1200)
    x1 = np.asarray(plant.x[:, 0])
    z = np.asarray(plant.x[:, 2])
    vx = np.median(x1 - x0) / (1200 / cfg.frequency)
    rpy = np.asarray(matrix_to_rpy(plant.R))
    upright = (np.abs(rpy[:, 0]) < 0.3) & (np.abs(z - cfg.stand.height) < 0.06)
    log(f"trot ({time.time()-t0:.0f}s): vx p50 {vx:.3f} m/s "
        f"(cmd 0.2), z p50 {np.median(z):.4f}, upright {upright.mean():.3f}")
    assert 0.12 < vx < 0.24, vx
    assert upright.mean() > 0.9
    assert np.isfinite(np.asarray(plant.u)).all()
    log("VERIFY OK: pallas whole-body stepper drives the full-physics "
        "closed loop on TPU f32")


if __name__ == "__main__":
    main()
