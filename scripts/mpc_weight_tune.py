#!/usr/bin/env python
"""Gradient-tune the MPC state-cost weights through the walking closed loop.

Starts from deliberately DE-TUNED weights (height/orientation nearly
unweighted — the robot sags and wanders), differentiates a decimated-MPC
walking rollout end to end (FK -> gait -> planner -> swing tracking -> the
Riccati-IPM MPC solve -> J^T torques -> SRB plant, across ticks), and
descends in log-space. A capability class the reference's C++/qpOASES stack
cannot touch: the CONTROLLER ITSELF is a differentiable program.

Run (CPU f64 recommended):
    PYTHONPATH="$PYTHONPATH:." python scripts/mpc_weight_tune.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

# float64 end-to-end AD: this demo is a CPU workload (sitecustomize
# pre-registers the TPU, so force the platform in-process).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from quadruped_control_tpu.config import mit_cheetah_fast_trot_config
from quadruped_control_tpu.control.rollout import (
    rollout_mpc_decimated,
    stand_up_rollout,
)

STEPS = 150  # 0.5 s of fast walking per gradient evaluation
VX = 0.8  # high enough that bad weights visibly sag/lag (2.5x loss gap)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = mit_cheetah_fast_trot_config()
    stand = stand_up_rollout(cfg, seconds=2.0, dtype=jnp.float64)
    assert bool(stand.carry.standing)
    cmd = jnp.zeros((6,), jnp.float64).at[0].set(VX)

    def loss_fn(logw):
        w = jnp.exp(logw)
        res = rollout_mpc_decimated(
            stand.plant, stand.carry, cmd, STEPS, cfg, mpc_every=5,
            mpc_horizon=4, mpc_dt=0.04, mpc_iterations=15,
            mpc_backend="structured", mpc_state_weights=w, record=True)
        x = res.trace.x
        height = jnp.mean((x[..., 2] - 0.26) ** 2) * 1e3
        vel = (res.plant.com.xdot[0] - VX) ** 2 * 10.0
        lateral = jnp.mean(x[..., 1] ** 2) * 1e2
        return height + vel + lateral

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # De-tuned start: height/velocity channels nearly unweighted — the
    # robot sags and lags (measured 2.5x the shipped weights' loss).
    w = jnp.array([1.0, 1.0, 1.0, 1.0, 1.0, 0.05,
                   1.0, 1.0, 0.05, 0.05, 0.05, 0.05, 1e-6], jnp.float64)
    logw = jnp.log(w)
    l0 = None
    for i in range(15):
        loss, g = grad_fn(logw)
        if l0 is None:
            l0 = float(loss)
        step = jnp.clip(2.0 * g, -0.7, 0.7)
        logw = jnp.clip(logw - step, jnp.log(1e-7), jnp.log(500.0))
        if i % 5 == 0:
            log(f"iter {i:2d}: loss {float(loss):.4e}")
    loss_f, _ = grad_fn(logw)
    wf = np.exp(np.asarray(logw))
    log(f"final loss {float(loss_f):.4e} (start {l0:.4e}, "
        f"{l0 / float(loss_f):.1f}x better)")
    log(f"tuned weights: rpy {wf[0]:.1f}/{wf[1]:.1f}/{wf[2]:.1f} "
        f"pos {wf[3]:.1f}/{wf[4]:.1f} height {wf[5]:.1f} "
        f"w {wf[6]:.2f}/{wf[7]:.2f}/{wf[8]:.2f} "
        f"v {wf[9]:.2f}/{wf[10]:.2f}/{wf[11]:.2f}")
    assert float(loss_f) < 0.6 * l0, (l0, float(loss_f))
    log("MPC WEIGHT TUNE OK")


if __name__ == "__main__":
    main()
