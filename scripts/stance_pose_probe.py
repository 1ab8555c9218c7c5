"""Full-physics probe of the stance_pose body-posing mode.

Stands the robot up, then drives a roll/pitch/yaw/height rate schedule
through the pose integrator (the reference's PS4 stance mapping,
teleop_ps4_stance.yaml) and prints windowed tracking: desired vs measured
rpy + height. Feeds the stance-pose demo test's operating point.

Env: QCT_SP_MODEL (synth/urdf/urdfref), QCT_SP_GRAV (default 1),
QCT_SP_CTRL (balance/mpc, default balance), QCT_SP_NSUB (default 10).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quadruped_control_tpu.config import (  # noqa: E402
    JointControlConfig,
    mit_cheetah_whole_body_config,
)
from quadruped_control_tpu.control.rollout import piecewise_command  # noqa: E402
from quadruped_control_tpu.math.rotations import matrix_to_rpy  # noqa: E402
from quadruped_control_tpu.sim import (  # noqa: E402
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_urdf_model,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)

DT64 = jnp.float64


def main():
    import dataclasses
    import time

    cfg = mit_cheetah_whole_body_config()
    which = os.environ.get("QCT_SP_MODEL", "urdfref")
    if which == "urdfref":
        cfg = dataclasses.replace(cfg, joint_control=JointControlConfig())
        which = "urdf"
    model = (mit_cheetah_urdf_model(cfg, dtype=DT64) if which == "urdf"
             else mit_cheetah_whole_body_model(cfg, dtype=DT64))
    f = cfg.frequency
    n_sub = int(os.environ.get("QCT_SP_NSUB", 10))
    kw = dict(controller=os.environ.get("QCT_SP_CTRL", "balance"),
              gravity_comp=os.environ.get("QCT_SP_GRAV", "1") != "0",
              n_substeps=n_sub, stance_pose=True)
    if kw["controller"] == "mpc":
        kw.update(mpc_backend="structured", mpc_horizon=8, mpc_dt=0.03,
                  mpc_iterations=15)

    # Rate schedule: each channel excursion-and-return; holds between.
    #           vz      wx     wy     wz
    sched = piecewise_command(
        [(4.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),      # stand up
         (0.5, [0, 0, 0.0, 0.4, 0.0, 0.0]),      # roll -> +0.2
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),      # hold
         (0.5, [0, 0, 0.0, -0.4, 0.0, 0.0]),     # roll -> 0
         (0.5, [0, 0, 0.0, 0.0, 0.4, 0.0]),      # pitch -> +0.2
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, 0.0, -0.4, 0.0]),     # pitch -> 0
         (0.5, [0, 0, 0.0, 0.0, 0.0, 0.4]),      # yaw -> +0.2
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, 0.0, 0.0, -0.4]),     # yaw -> 0
         (0.5, [0, 0, -0.12, 0.0, 0.0, 0.0]),    # z -> 0.20
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.2, 0.0, 0.0, 0.0]),      # z -> 0.30
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, -0.08, 0.0, 0.0, 0.0]),    # z -> 0.26
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0])], f, dtype=DT64)

    plant, carry = init_whole_body_rollout(cfg, dtype=DT64)
    t0 = time.time()
    res = rollout_whole_body(plant, carry, sched, sched.shape[0], cfg,
                             model, ContactConfig(), cmd_schedule=True,
                             **kw)
    x = np.asarray(res.trace.x)
    print(f"rollout: {time.time()-t0:.0f}s model={which} "
          f"ctrl={kw['controller']}", flush=True)
    print("final pose_cmd:", np.asarray(res.carry.pose_cmd))
    R = np.asarray(res.trace.R)
    W = int(0.25 * f)
    for w0 in range(0, x.shape[0], W):
        w1 = min(w0 + W, x.shape[0])
        rpy = np.stack([matrix_to_rpy(R[k]) for k in range(w0, w1, 10)])
        print(f"t={w0/f:5.2f}-{w1/f:5.2f}s "
              f"roll[{rpy[:,0].min():+.3f},{rpy[:,0].max():+.3f}] "
              f"pitch[{rpy[:,1].min():+.3f},{rpy[:,1].max():+.3f}] "
              f"yaw[{rpy[:,2].min():+.3f},{rpy[:,2].max():+.3f}] "
              f"z[{x[w0:w1,2].min():.3f},{x[w0:w1,2].max():.3f}] "
              f"xy=({x[w1-1,0]:+.3f},{x[w1-1,1]:+.3f})")


if __name__ == "__main__":
    main()
