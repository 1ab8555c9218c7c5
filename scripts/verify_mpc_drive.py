#!/usr/bin/env python
"""Verify drive: MPC-in-the-loop commander on the real TPU in float32.

Runs the public rollout API with controller="mpc" (structured Riccati
backend) for a batched stand-up + short trot and checks physical behavior.
Rollouts are chunked host-side (~50 ticks per device call): the axon tunnel
aborts single XLA executions that run tens of seconds.
"""

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.control.rollout import rollout_chunked

cfg = mit_cheetah_physical_config()
B = (256,)
print("device:", jax.devices()[0], flush=True)

kw = dict(controller="mpc", mpc_horizon=6, mpc_dt=0.04, mpc_iterations=20,
          mpc_backend="structured")

plant = init_plant_state(cfg, B, dtype=jnp.float32)
carry = init_commander_carry(B, dtype=jnp.float32)
cmd0 = jnp.zeros(B + (6,), jnp.float32)
cmd_walk = cmd0.at[..., 0].set(0.2)

# cfg.frequency is 300 Hz: 450 ticks = 1.5 s (the MPC approach to the stand
# height is asymptotic and needs ~1.2 s).
stand = rollout_chunked(plant, carry, cmd0, 450, cfg, **kw)
x = np.asarray(stand.trace.x)
z = x[..., 2]
print("stand: z end", z[-1, :3], "standing frac",
      np.asarray(stand.trace.standing[-1]).mean(), flush=True)
assert np.all(np.abs(z[-1] - 0.26) < 0.015), z[-1].min()
assert np.all(np.isfinite(z))

T_WALK = 600  # 2 s
walk = rollout_chunked(stand.plant, stand.carry, cmd_walk, T_WALK, cfg, **kw)
x = np.asarray(walk.trace.x)
conv = np.asarray(walk.trace.qp_converged)
v = (x[-1, :, 0] - x[0, :, 0]) / (T_WALK / cfg.frequency)
print("walk: mean vx", v.mean(), "height dev max",
      np.abs(x[..., 2] - 0.26).max(), flush=True)
print("mpc converged frac:", conv.mean(), flush=True)
assert v.mean() > 0.1
assert np.abs(x[..., 2] - 0.26).max() < 0.05
assert np.all(np.isfinite(x))
print("OK: MPC commander drives the closed loop on TPU f32")
