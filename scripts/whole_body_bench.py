#!/usr/bin/env python
"""Whole-body (full articulated physics) closed-loop throughput on TPU.

The reference's physics+controller pair runs ONE robot at 600 Hz on a
desktop CPU (drake_interface 0.1 ms steps + 100-300 Hz commander,
physics.yaml:5-7). Here the same closed loop — 13-body RNEA dynamics,
compliant contact, GRF-QP commander — runs as one fused scan for thousands
of scenarios per chip. Marginal per-tick cost from two rollout lengths so
compile/dispatch constants drop out (CLAUDE.md timing rules).
"""

import sys
import time

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_rollout,
    make_pallas_stepper,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)

STEPS_A, STEPS_B = 20, 60


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    log(f"device: {jax.devices()[0]}")

    contact0 = ContactConfig()
    steppers = {
        (rows, pf): make_pallas_stepper(model, cfg, contact0, rows=rows,
                                        prefactor=pf)
        for rows in (8, 16) for pf in ("kernel", "xla")
    }
    variants = [
        ("wb-pallas-kfac-b1024", 1024,
         dict(n_substeps=10, qp_backend="fused",
              stepper=steppers[(8, "kernel")])),
        ("wb-pallas-kfac-b4096", 4096,
         dict(n_substeps=10, qp_backend="fused",
              stepper=steppers[(8, "kernel")])),
        ("wb-pallas-kfac-sub33-b4096", 4096,
         dict(n_substeps=33, qp_backend="fused",
              stepper=steppers[(8, "kernel")])),
        ("wb-pallas-kfac-r16-b4096", 4096,
         dict(n_substeps=10, qp_backend="fused",
              stepper=steppers[(16, "kernel")])),
        ("wb-pallas-r8-b1024", 1024,
         dict(n_substeps=10, qp_backend="fused",
              stepper=steppers[(8, "xla")])),
        ("wb-pallas-r8-b4096", 4096,
         dict(n_substeps=10, qp_backend="fused",
              stepper=steppers[(8, "xla")])),
        ("wb-fused-b1024", 1024,
         dict(n_substeps=10, qp_backend="fused")),
        ("wb-fused-b4096", 4096,
         dict(n_substeps=10, qp_backend="fused")),
        ("wb-fused-sub33-b4096", 4096,
         dict(n_substeps=33, qp_backend="fused")),
        ("wb-jnp-b1024", 1024, dict(n_substeps=10)),
        ("wb-jnp-b1024-Msub", 1024,
         dict(n_substeps=10, m_update="substep")),
    ]
    for name, batch, kw in variants:
        contact = contact0
        plant, carry = init_whole_body_rollout(cfg, (batch,),
                                               dtype=jnp.float32)
        cmd = jnp.zeros((batch, 6), jnp.float32).at[:, 0].set(0.2)
        res = {}
        try:
            for steps in (STEPS_A, STEPS_B):
                t0 = time.time()
                out = jax.block_until_ready(rollout_whole_body(
                    plant, carry, cmd, steps, cfg, model, contact,
                    qp_iterations=12, record=False, **kw))
                tc = time.time() - t0
                t0 = time.time()
                reps = 2
                for _ in range(reps):
                    out = jax.block_until_ready(rollout_whole_body(
                        plant, carry, cmd, steps, cfg, model, contact,
                        qp_iterations=12, record=False, **kw))
                res[steps] = (time.time() - t0) / reps
                log(f"{name} steps={steps}: compile+first {tc:.1f}s, "
                    f"steady {res[steps]*1e3:.1f} ms")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        per_step = (res[STEPS_B] - res[STEPS_A]) / (STEPS_B - STEPS_A)
        n_sub = kw["n_substeps"]
        log(f"{name}: {per_step*1e3:.2f} ms/tick -> "
            f"{batch/per_step:,.0f} scenario-ticks/s, "
            f"{batch*n_sub/per_step:,.0f} physics-substeps/s "
            f"({batch/per_step/cfg.frequency:,.0f}x realtime)")


if __name__ == "__main__":
    main()
