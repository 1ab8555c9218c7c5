"""Gain sweep: foothold-level heading/station regulation for FULL-PHYSICS
backward walking (VERDICT round-3 task #1).

The reference's backward-walking demo (README.md:57,
transition_backwards.gif) is HUMAN-PILOTED; pilot-less reverse on the
whole-body engine falls in 2-4 s from unregulated heading drift (PARITY.md
"Reverse-walking anatomy"). This sweep measures the foothold-trim regulator
(config.FootholdTrimConfig) across a gain grid in ONE compiled batched
rollout: the gains enter as per-instance ARRAYS through a closure (not a
static arg), so the whole grid costs a single CPU-f64 compile.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/reverse_trim_sweep.py
Env: QCT_SWEEP_MODEL=urdf selects mit_cheetah_urdf_model (default synth),
     QCT_SWEEP_CMD (default -0.2), QCT_SWEEP_SECS (default 8).
"""

import dataclasses
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from quadruped_control_tpu.config import (  # noqa: E402
    FootholdTrimConfig,
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
N_SUB = 10
MPC_KW = dict(controller="mpc", mpc_backend="structured", mpc_horizon=8,
              mpc_dt=0.03, mpc_iterations=15)


def main():
    cfg = mit_cheetah_whole_body_config()
    which = os.environ.get("QCT_SWEEP_MODEL", "synth")
    model = (mit_cheetah_urdf_model(cfg, dtype=DT64) if which == "urdf"
             else mit_cheetah_whole_body_model(cfg, dtype=DT64))
    contact = ContactConfig()
    f = cfg.frequency
    dt = 1.0 / f
    cmd_vx = float(os.environ.get("QCT_SWEEP_CMD", "-0.2"))
    secs = float(os.environ.get("QCT_SWEEP_SECS", "8"))

    # --- gain grid (one batch instance per combo) ---
    yaw_gains = [float(x) for x in os.environ.get(
        "QCT_SWEEP_YAW", "0,0.3,0.6,1.0").split(",")]
    lat_gains = [float(x) for x in os.environ.get(
        "QCT_SWEEP_LAT", "0,0.2,0.4").split(",")]
    grid = [(yg, lg) for yg in yaw_gains for lg in lat_gains]
    B = len(grid)
    yg = jnp.array([g[0] for g in grid], DT64)
    lg = jnp.array([g[1] for g in grid], DT64)
    ft = FootholdTrimConfig()  # static limits; gains replaced per-instance
    trim = dataclasses.replace(ft)
    # Per-instance traced gains ride through a plain object whose fields
    # broadcast (commander math is fully batched); dataclasses are frozen,
    # so use a tiny namespace instead.

    class Trim:
        yaw_gain = yg
        yaw_max = ft.yaw_max
        lat_gain = lg
        lat_vel_gain = ft.lat_vel_gain
        lat_max = ft.lat_max

    del trim

    # --- stand phase once (B=1), then broadcast to the grid ---
    plant, carry = init_whole_body_rollout(cfg, dtype=DT64)
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT64), 900, cfg,
                             model, contact, n_substeps=N_SUB,
                             gravity_comp=True, **MPC_KW)
    print("stand: standing=%s z=%.3f" % (bool(res.carry.standing),
                                         float(res.plant.x[2])),
          flush=True)
    bcast = lambda a: jnp.broadcast_to(a, (B,) + a.shape)  # noqa: E731
    plant_b = jax.tree.map(bcast, res.plant)
    carry_b = jax.tree.map(bcast, res.carry)
    carry_b = carry_b._replace(ref_pose=jnp.zeros((B, 3), DT64))

    cmd = jnp.zeros((B, 6), DT64).at[:, 0].set(cmd_vx)
    steps = int(secs * f)

    @jax.jit
    def run(plant_s, carry_s):
        def body(state, _):
            wb, cc = state
            com, joints = whole_body_com_state(wb, cfg)
            g_tau = leg_gravity_torques(model, joints.q, com.R)
            out, cc = commander_step(
                com, joints, cc, cmd, dt, cfg, foothold_trim=Trim,
                gravity_comp_tau=g_tau, **MPC_KW)
            wb = whole_body_step(wb, out.torques, dt, model, cfg, contact,
                                 n_substeps=N_SUB)
            rpy = matrix_to_rpy(wb.R)
            return (wb, cc), (wb.x, rpy)

        (wb, cc), (xs, rpys) = lax.scan(body, (plant_s, carry_s), None,
                                        length=steps)
        return wb, cc, xs, rpys

    import time
    t0 = time.time()
    wb, cc, xs, rpys = jax.block_until_ready(run(plant_b, carry_b))
    print(f"reverse sweep: {time.time()-t0:.0f}s for {B} combos x "
          f"{steps} ticks", flush=True)

    xs = np.asarray(xs)       # (T, B, 3)
    rpys = np.asarray(rpys)   # (T, B, 3)
    z0 = cfg.stand.height
    print(f"cmd vx={cmd_vx} model={which}  target: |z-{z0}|<0.08, "
          "|roll|,|pitch|<0.3 throughout")
    print(f"{'yaw_g':>6} {'lat_g':>6} {'ok':>3} {'vx':>7} {'|y|max':>7} "
          f"{'yaw_end':>8} {'|roll|max':>9} {'|pitch|max':>10} {'z range':>15}")
    for i, (ygv, lgv) in enumerate(grid):
        zi = xs[:, i, 2]
        fin = np.isfinite(xs[:, i]).all() and np.isfinite(rpys[:, i]).all()
        rmax = np.abs(rpys[:, i, 0]).max() if fin else np.inf
        pmax = np.abs(rpys[:, i, 1]).max() if fin else np.inf
        ok = (fin and abs(zi - z0).max() < 0.08 and rmax < 0.3
              and pmax < 0.3)
        vx = (xs[-1, i, 0] - xs[int(1 * f), i, 0]) / (secs - 1)
        print(f"{ygv:6.2f} {lgv:6.2f} {str(ok)[:3]:>3} {vx:7.3f} "
              f"{np.abs(xs[:, i, 1]).max():7.3f} {rpys[-1, i, 2]:8.3f} "
              f"{rmax:9.3f} {pmax:10.3f} "
              f"[{zi.min():.3f},{zi.max():.3f}]")


if __name__ == "__main__":
    main()
