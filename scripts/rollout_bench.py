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
from quadruped_control_tpu.control.rollout import (
    rollout,
    rollout_mpc_decimated,
)

BATCH = 4096
BATCH_MPC = 1024  # per-tick MPC is latency-bound; also: a single XLA
# execution must stay under the tunnel's ~60 s abort (CLAUDE.md), which
# caps steps x per-step cost.
STEPS_A, STEPS_B = 40, 120


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_physical_config()
    log(f"device: {jax.devices()[0]}, batch {BATCH} (mpc: {BATCH_MPC})")

    state = {}
    for b in (BATCH, BATCH_MPC):
        state[b] = (init_plant_state(cfg, (b,), dtype=jnp.float32),
                    init_commander_carry((b,), dtype=jnp.float32),
                    jnp.zeros((b, 6), jnp.float32).at[:, 0].set(0.2))

    def run_plain(batch, steps, **kw):
        plant, carry, cmd = state[batch]
        return rollout(plant, carry, cmd, steps, cfg, qp_iterations=12,
                       qp_polish=False, record=False, **kw)

    def run_decimated(batch, steps, **kw):
        plant, carry, cmd = state[batch]
        return rollout_mpc_decimated(plant, carry, cmd, steps, cfg,
                                     record=False, **kw)

    mpc_kw = dict(mpc_horizon=8, mpc_dt=0.05, mpc_iterations=25)
    variants = [
        ("jnp", run_plain, dict(qp_backend="jnp"), BATCH,
         (STEPS_A, STEPS_B)),
        ("fused", run_plain, dict(qp_backend="fused"), BATCH,
         (STEPS_A, STEPS_B)),
        # MPC in the loop (Di Carlo convex MPC as the stance-force
        # controller): N=8 horizon re-solved every control tick...
        ("mpc-structured", run_plain,
         dict(controller="mpc", mpc_backend="structured", **mpc_kw),
         BATCH_MPC, (4, 12)),
        ("mpc-riccati-pallas", run_plain,
         dict(controller="mpc", mpc_backend="riccati-pallas", **mpc_kw),
         BATCH_MPC, (10, 30)),
        # ...and at the Cheetah-3 operating point: re-solved every 10th
        # tick, f_0 zero-order-held in between.
        ("mpc-structured-decim10", run_decimated,
         dict(mpc_every=10, mpc_backend="structured", **mpc_kw),
         BATCH_MPC, (40, 120)),
        ("mpc-riccati-pallas-decim10", run_decimated,
         dict(mpc_every=10, mpc_backend="riccati-pallas", **mpc_kw),
         BATCH_MPC, (40, 120)),
    ]
    for backend, fn, kw, batch, (sa, sb) in variants:
        res = {}
        try:
            for steps in (sa, sb):
                t0 = time.time()
                out = jax.block_until_ready(fn(batch, steps, **kw))
                tc = time.time() - t0

                t0 = time.time()
                reps = 2
                for _ in range(reps):
                    out = jax.block_until_ready(fn(batch, steps, **kw))
                res[steps] = (time.time() - t0) / reps
                log(f"{backend} steps={steps}: compile+first {tc:.1f}s, "
                    f"steady {res[steps]*1e3:.1f} ms")
        except Exception as e:
            log(f"{backend}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        per_step = (res[sb] - res[sa]) / (sb - sa)
        log(f"{backend}: {per_step*1e3:.2f} ms/step -> "
            f"{batch/per_step:,.0f} scenario-ticks/s "
            f"({batch/per_step/100:,.0f}x realtime at 100 Hz)")


if __name__ == "__main__":
    main()
