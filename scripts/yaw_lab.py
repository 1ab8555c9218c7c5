"""Yaw-authority lab on full physics (VERDICT round-4 #2).

One compile, per-instance traced knobs: commanded wz, heading_lead (the
absolute-heading desired-yaw servo), MPC yaw weight multiplier, trim
yaw_gain, and optional forward speed (turn-while-walking). Prints
windowed yaw vs the integrated reference heading, plus roll/height
health.

Grid entries "wz:hl:wy:yg[:vx]" via QCT_YAW_GRID; model/op-point mirrors
the round-4 demo operating point (URDF substrate + reference gains).
Env: QCT_YAW_SECS (default 8), QCT_YAW_MODEL (urdfref default).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from quadruped_control_tpu.config import (  # noqa: E402
    FootholdTrimConfig,
    JointControlConfig,
    mit_cheetah_whole_body_config,
)
from quadruped_control_tpu.control.commander import (  # noqa: E402
    commander_step,
)
from quadruped_control_tpu.math.rotations import matrix_to_rpy  # noqa: E402
from quadruped_control_tpu.sim import (  # noqa: E402
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_urdf_model,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)
from quadruped_control_tpu.sim.dynamics import (  # noqa: E402
    leg_gravity_torques,
)
from quadruped_control_tpu.sim.plant import (  # noqa: E402
    whole_body_com_state,
    whole_body_step,
)

DT64 = jnp.float64
N_SUB = int(os.environ.get("QCT_YAW_NSUB", 10))


def main():
    import dataclasses
    import time

    cfg = mit_cheetah_whole_body_config()
    which = os.environ.get("QCT_YAW_MODEL", "urdfref")
    if which == "urdfref":
        cfg = dataclasses.replace(cfg, joint_control=JointControlConfig())
        which = "urdf"
    model = (mit_cheetah_urdf_model(cfg, dtype=DT64) if which == "urdf"
             else mit_cheetah_whole_body_model(cfg, dtype=DT64))
    contact = ContactConfig()
    f = cfg.frequency
    dt = 1.0 / f
    secs = float(os.environ.get("QCT_YAW_SECS", "8"))
    grid = []
    for g in os.environ.get(
            "QCT_YAW_GRID", "0.05:0:1:0.6,0.05:0.1:1:0.6").split(","):
        p = [float(v) for v in g.split(":")]
        p += [0.0][len(p) - 4:]  # optional vx
        grid.append(tuple(p))  # (wz, hl, wy_mult, yaw_gain, vx)
    B = len(grid)
    # r4 operating-point weights with per-instance yaw multiplier.
    base_w = np.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                       1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0])
    wts = np.tile(base_w, (B, 1))
    wts[:, 2] *= np.array([g[2] for g in grid])
    mpc_kw = dict(controller="mpc", mpc_backend="structured",
                  mpc_horizon=24, mpc_dt=0.02, mpc_iterations=25,
                  mpc_state_weights=jnp.asarray(wts, DT64))

    ftd = FootholdTrimConfig()
    bfe = os.environ.get("QCT_YAW_BFE", "0") != "0"

    class Trim:
        yaw_gain = jnp.array([g[3] for g in grid], DT64)
        yaw_max = ftd.yaw_max
        lat_gain = jnp.full((B,), 0.2, DT64)
        lat_vel_gain = jnp.full((B,), 0.05, DT64)
        lat_max = ftd.lat_max
        capture_scale = jnp.full((B,), 0.5, DT64)
        roll_gain = jnp.zeros((B,), DT64)
        roll_vel_gain = jnp.zeros((B,), DT64)
        roll_max = ftd.roll_max
        heading_lead = jnp.array([g[1] for g in grid], DT64)

    plant, carry = init_whole_body_rollout(cfg, dtype=DT64)
    stand_kw = dict(mpc_kw)
    stand_kw["mpc_state_weights"] = None
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT64), 900, cfg,
                             model, contact, n_substeps=N_SUB,
                             gravity_comp=True,
                             raibert_cmd_symmetric=True, **stand_kw)
    print("stand: standing=%s z=%.3f" % (bool(res.carry.standing),
                                         float(res.plant.x[2])), flush=True)
    bcast = lambda a: jnp.broadcast_to(a, (B,) + a.shape)  # noqa: E731
    plant_b = jax.tree.map(bcast, res.plant)
    carry_b = jax.tree.map(bcast, res.carry)
    carry_b = carry_b._replace(ref_pose=jnp.zeros((B, 3), DT64))

    cmd = jnp.zeros((B, 6), DT64)
    cmd = cmd.at[:, 5].set(jnp.array([g[0] for g in grid], DT64))
    cmd = cmd.at[:, 0].set(jnp.array([g[4] for g in grid], DT64))
    steps = int(secs * f)

    @jax.jit
    def run(plant_s, carry_s):
        def body(state, _):
            wb, cc = state
            com, joints = whole_body_com_state(wb, cfg)
            g_tau = leg_gravity_torques(model, joints.q, com.R)
            out, cc = commander_step(
                com, joints, cc, cmd, dt, cfg, foothold_trim=Trim,
                gravity_comp_tau=g_tau, raibert_cmd_symmetric=True,
                body_frame_exact=bfe,
                **mpc_kw)
            wb = whole_body_step(wb, out.torques, dt, model, cfg, contact,
                                 n_substeps=N_SUB)
            rpy = matrix_to_rpy(wb.R)
            return (wb, cc), (wb.x, rpy, cc.ref_pose)

        (wb, cc), tr = lax.scan(body, (plant_s, carry_s), None,
                                length=steps)
        return tr

    t0 = time.time()
    xs, rpys, refs = jax.block_until_ready(run(plant_b, carry_b))
    print(f"lab: {time.time()-t0:.0f}s model={which}", flush=True)
    xs, rpys, refs = np.asarray(xs), np.asarray(rpys), np.asarray(refs)
    W = int(1.0 * f)
    for i, g in enumerate(grid):
        roll = np.abs(rpys[:, i, 0])
        fall = np.argmax(roll > 1.0) if (roll > 1.0).any() else -1
        tgt = g[0] * secs
        print(f"\n== wz={g[0]} hl={g[1]} wy={g[2]} yg={g[3]} vx={g[4]}"
              + (f" fall_tick={fall} ({fall/f:.2f}s)" if fall >= 0
                 else f" SURVIVED yaw_end={rpys[-1,i,2]:+.3f}"
                      f" target={tgt:+.3f}"
                      f" ratio={rpys[-1,i,2]/tgt if tgt else 0:.2f}"),
              flush=True)
        for w0 in range(0, xs.shape[0], W):
            w1 = min(w0 + W, xs.shape[0])
            if fall >= 0 and w0 > fall + W:
                break
            print(f"  t={w0/f:4.1f}-{w1/f:4.1f}s "
                  f"yaw {rpys[w1-1,i,2]:+.3f} (ref {refs[w1-1,i,2]:+.3f})"
                  f" roll[{rpys[w0:w1,i,0].min():+.2f},"
                  f"{rpys[w0:w1,i,0].max():+.2f}]"
                  f" pitch[{rpys[w0:w1,i,1].min():+.2f},"
                  f"{rpys[w0:w1,i,1].max():+.2f}]"
                  f" z[{xs[w0:w1,i,2].min():.3f},{xs[w0:w1,i,2].max():.3f}]"
                  f" xy=({xs[w1-1,i,0]:+.2f},{xs[w1-1,i,1]:+.2f})")


if __name__ == "__main__":
    main()
