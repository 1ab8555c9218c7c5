#!/usr/bin/env python
"""Closed-loop rollout throughput: jnp vs fused QP backend on the real TPU.

Measures control ticks/s for a batched trot rollout (commander x SRB plant
in one lax.scan). Marginal per-step cost comes from two rollout lengths so
compile and dispatch constants drop out.
"""

import sys
import time

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.control.rollout import rollout

BATCH = 4096
STEPS_A, STEPS_B = 40, 120


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_physical_config()
    log(f"device: {jax.devices()[0]}, batch {BATCH}")
    plant = init_plant_state(cfg, (BATCH,), dtype=jnp.float32)
    carry = init_commander_carry((BATCH,), dtype=jnp.float32)
    cmd = jnp.zeros((BATCH, 6), jnp.float32).at[:, 0].set(0.2)

    variants = [
        ("jnp", dict(qp_backend="jnp"), (STEPS_A, STEPS_B)),
        ("fused", dict(qp_backend="fused"), (STEPS_A, STEPS_B)),
        # MPC in the loop (Di Carlo convex MPC as the stance-force
        # controller): N=8 horizon re-solved every control tick.
        ("mpc-structured",
         dict(controller="mpc", mpc_horizon=8, mpc_dt=0.05,
              mpc_iterations=25, mpc_backend="structured"), (10, 30)),
        ("mpc-riccati-pallas",
         dict(controller="mpc", mpc_horizon=8, mpc_dt=0.05,
              mpc_iterations=25, mpc_backend="riccati-pallas"), (10, 30)),
    ]
    for backend, kw, (sa, sb) in variants:
        res = {}
        for steps in (sa, sb):
            t0 = time.time()
            out = jax.block_until_ready(rollout(
                plant, carry, cmd, steps, cfg, qp_iterations=12,
                qp_polish=False, record=False, **kw))
            tc = time.time() - t0

            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = rollout(plant, carry, cmd, steps, cfg,
                              qp_iterations=12, qp_polish=False,
                              record=False, **kw)
            jax.block_until_ready(out)
            res[steps] = (time.time() - t0) / reps
            log(f"{backend} steps={steps}: compile+first {tc:.1f}s, "
                f"steady {res[steps]*1e3:.1f} ms")
        per_step = (res[sb] - res[sa]) / (sb - sa)
        log(f"{backend}: {per_step*1e3:.2f} ms/step -> "
            f"{BATCH/per_step:,.0f} scenario-ticks/s "
            f"({BATCH/per_step/100:,.0f}x realtime at 100 Hz)")


if __name__ == "__main__":
    main()
