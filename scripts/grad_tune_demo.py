#!/usr/bin/env python
"""Gradient-based gain tuning through the closed loop — a capability class
the reference stack (C++/qpOASES) cannot touch.

Differentiates a stand-up rollout (the reference's §3.3 scenario: pure
balance control from below the stand height) with respect to the CoM PD
gains, using the implicit-function-theorem QP gradients (solver/diff.py):
the QP solve inside every control tick backpropagates through its KKT
conditions, not through 20 unrolled barrier iterations.

Run (CPU f64 or TPU f32):
    PYTHONPATH="$PYTHONPATH:." python scripts/grad_tune_demo.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.solver.diff import solve_qp_implicit
from quadruped_control_tpu.utils.scenarios import standing_feet

STEPS = 60
DT = 0.01
TARGET = 0.26


def make_rollout(cfg):
    bal = cfg.balance
    feet = standing_feet(cfg, jnp.float64)
    eye3 = jnp.eye(3, dtype=jnp.float64)
    stance = jnp.ones(4, dtype=bool)
    m = bal.mass

    def step(carry, _, gains):
        x, xdot = carry
        kp, kd = gains
        # PD accelerations with the tunable gains (height channel only
        # matters for this scenario).
        x_d = jnp.array([0.0, 0.0, TARGET], jnp.float64)
        xddot_d = kp * (x_d - x) - kd * xdot
        wdot_d = jnp.zeros(3, jnp.float64)
        A, b = dyn.srb_dynamics(feet, eye3, xddot_d, jnp.zeros(3),
                                wdot_d, bal, stance_mask=stance)
        Q, c = dyn.assemble_qp(A, b, bal)
        G, h = dyn.cone_constraints(stance, cfg=bal, dtype=jnp.float64)
        f = solve_qp_implicit(Q[None], c[None], G[None], h[None], 30, True)[0]
        # SRB linear dynamics: world z force from 4 legs minus gravity.
        fz = f[2::3].sum()
        xddot = jnp.array([0.0, 0.0, fz / m - 9.81])
        xdot2 = xdot + DT * xddot
        x2 = x + DT * xdot2
        return (x2, xdot2), x2[2]

    def rollout(gains):
        x0 = (jnp.array([0.0, 0.0, 0.16]), jnp.zeros(3))
        (_, _), heights = lax.scan(
            lambda c, t: step(c, t, gains), x0, None, length=STEPS)
        err = heights - TARGET
        # Penalize the WHOLE transient (rise time + overshoot): gravity is
        # pre-compensated in the SRB rhs, so steady-state error is ~0 for
        # any gain — the gain-sensitive part of the loss is the transient.
        return jnp.mean(err ** 2)

    return rollout


def main():
    cfg = mit_cheetah_physical_config()
    rollout = make_rollout(cfg)
    loss_grad = jax.jit(jax.value_and_grad(rollout))

    gains = jnp.array([20.0, 3.0], jnp.float64)  # deliberately soft start
    # Normalized gradient steps (the loss surface spans decades in scale).
    hist = []
    for i in range(40):
        loss, g = loss_grad(gains)
        hist.append(float(loss))
        # Log-space (multiplicative) descent: scale-invariant across the
        # decades kp/kd span, step clipped to +-40% per iteration.
        rel_step = jnp.clip(400.0 * g * gains, -0.4, 0.4)
        gains = jnp.clip(gains * jnp.exp(-rel_step), 1.0, 500.0)
        if i % 5 == 0:
            print(f"iter {i:2d}: loss {float(loss):.3e} "
                  f"gains kp={float(gains[0]):.1f} kd={float(gains[1]):.1f}",
                  file=sys.stderr)
    loss_final, _ = loss_grad(gains)
    print(f"final: loss {float(loss_final):.3e} "
          f"kp={float(gains[0]):.1f} kd={float(gains[1]):.1f}",
          file=sys.stderr)
    assert float(loss_final) < hist[0] * 0.35, (hist[0], float(loss_final))
    print("GRAD TUNE OK", file=sys.stderr)


if __name__ == "__main__":
    main()
