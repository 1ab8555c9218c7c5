#!/usr/bin/env python
"""Walking-speed envelope, measured as ONE batched experiment per config.

The reference established its 0.4 m/s headline by watching individual Drake
runs (README.md:54-63). Here the whole envelope is measured at once: the
commanded-speed axis IS the batch axis — every speed runs as a lane of the
same jitted closed-loop scan on the TPU. Four configs: {reference-style
balance QP, receding-horizon MPC} x {shipped slow trot, running trot}.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/envelope_sweep.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import (
    mit_cheetah_fast_trot_config,
    mit_cheetah_physical_config,
)
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.control.rollout import rollout_chunked

SPEEDS = np.round(np.arange(0.1, 2.01, 0.1), 2)  # 20 lanes
WALK_S = 3.0


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_config(name, cfg, **kw):
    B = (len(SPEEDS),)
    plant = init_plant_state(cfg, B, dtype=jnp.float32)
    carry = init_commander_carry(B, dtype=jnp.float32)
    cmd0 = jnp.zeros(B + (6,), jnp.float32)
    stand = rollout_chunked(plant, carry, cmd0, 450, cfg, record=False, **kw)

    cmd = cmd0.at[:, 0].set(jnp.asarray(SPEEDS, jnp.float32))
    steps = int(WALK_S * cfg.frequency)
    walk = rollout_chunked(stand.plant, stand.carry, cmd, steps, cfg, **kw)
    x = np.asarray(walk.trace.x)  # (T, B, 3)
    n_settle = steps // 3
    v = (x[-1, :, 0] - x[n_settle, :, 0]) / ((steps - n_settle)
                                             / cfg.frequency)
    zmin = x[:, :, 2].min(axis=0)
    stable = (zmin > 0.2) & (np.abs(v - SPEEDS) < 0.2 * SPEEDS + 0.05)
    vmax = SPEEDS[stable].max() if stable.any() else 0.0
    # Highest speed below which EVERYTHING is stable (no holes).
    holes = np.where(~stable)[0]
    vmax_contig = SPEEDS[holes[0] - 1] if holes.size and holes[0] > 0 else (
        SPEEDS[-1] if not holes.size else 0.0)
    log(f"{name}: stable through {vmax_contig} m/s "
        f"(per-speed: {dict(zip(SPEEDS, stable.astype(int)))})")
    return vmax_contig


def main():
    log(f"device: {jax.devices()[0]}; speeds {SPEEDS[0]}..{SPEEDS[-1]}")
    mpc = dict(controller="mpc", mpc_horizon=8, mpc_dt=0.04,
               mpc_iterations=20, mpc_backend="riccati-pallas")
    slow = mit_cheetah_physical_config()
    fast = mit_cheetah_fast_trot_config()
    results = {
        "balance + slow trot": run_config("balance+slow", slow),
        "balance + fast trot": run_config("balance+fast", fast),
        "mpc + slow trot": run_config("mpc+slow", slow, **mpc),
        "mpc + fast trot": run_config("mpc+fast", fast, **mpc),
    }
    log("\n| config | max stable commanded speed |")
    log("|---|---|")
    for k, v in results.items():
        log(f"| {k} | {v} m/s |")
    log("(reference headline: 0.4 m/s forward, Drake — README.md:56)")


if __name__ == "__main__":
    main()
