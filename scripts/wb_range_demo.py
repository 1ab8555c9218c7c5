#!/usr/bin/env python
"""FULL-PHYSICS range demo: 0.4 m/s forward + sustained reverse (round 5).

The reference's headline performance number is its forward maximum —
"The fastest forward walking speed achieved so far was 0.4 m/s"
(README.md:56, demonstrated on Drake full physics, human-piloted) — and
its reverse demos are short piloted bursts (README.md:57). This script
reproduces BOTH beyond the reference's demonstrated range as ONE
pilot-less scheduled rollout on the 13-body engine: stand up ->
+0.4 m/s trot (5 s, ~+2 m) -> stand -> -0.2 m/s trot (8 s, ~-1.6 m) ->
stand.

Operating point: the round-4 demo point (x20 MPC pitch weight,
full-cycle horizon 24 x 0.02 s, symmetric Raibert travel, foothold-trim
regulator) on the URDF-true substrate with the reference's own joint
gains, plus the round-5 root-cause instrument ``body_frame_exact=True``
(PARITY.md "Swing-lag ratchet": the preserved world->body quirk
R^T p - x drifts the swing IK target ~25 mm per metre of travel — the
reason no prior round could walk far; commander_node.cpp:491).

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/wb_range_demo.py \
           [out_dir] [--animate] [--cpu]
"""

import dataclasses
import os
import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.config import (
    FootholdTrimConfig,
    JointControlConfig,
    mit_cheetah_whole_body_config,
)
from quadruped_control_tpu.control.rollout import piecewise_command
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_urdf_model,
    rollout_whole_body,
)
from quadruped_control_tpu.utils.viz import animate_rollout, plot_rollout


def main(out_dir="/tmp/wb_range_demo", animate=False):
    os.makedirs(out_dir, exist_ok=True)
    cfg = mit_cheetah_whole_body_config()
    dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    cfg = dataclasses.replace(cfg, joint_control=JointControlConfig())
    model = mit_cheetah_urdf_model(cfg, dtype=dtype)
    f = cfg.frequency
    wts = jnp.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                     1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], dtype)
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=24,
              mpc_dt=0.02, mpc_iterations=25, gravity_comp=True,
              raibert_cmd_symmetric=True,
              foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2),
              mpc_state_weights=wts, n_substeps=10,
              body_frame_exact=True)
    sched = piecewise_command(
        [(4.0, [0, 0, 0, 0, 0, 0]),       # stand up + in-place gait
         (5.0, [0.4, 0, 0, 0, 0, 0]),     # the reference's forward MAX
         (2.0, [0, 0, 0, 0, 0, 0]),
         (8.0, [-0.2, 0, 0, 0, 0, 0]),    # SUSTAINED reverse
         (3.0, [0, 0, 0, 0, 0, 0])], f, dtype=dtype)
    steps = sched.shape[0]
    print(f"whole-body scheduled rollout: {steps} ticks @ {f:.0f} Hz "
          "(stand | +0.4 | 0 | -0.2 x 8 s | 0 m/s), FULL physics")
    plant, carry = init_whole_body_rollout(cfg, dtype=dtype)
    res = rollout_whole_body(plant, carry, sched, steps, cfg, model,
                             ContactConfig(), cmd_schedule=True, **kw)
    x = np.asarray(res.trace.x)
    t = lambda s: int(s * f)  # noqa: E731
    print(f"forward leg (+0.4 cmd): {x[t(9) - 1, 0] - x[t(4), 0]:+.3f} m "
          "in 5 s")
    print(f"reverse leg (-0.2 cmd): {x[t(19) - 1, 0] - x[t(11), 0]:+.3f} m "
          "in 8 s")
    print(f"height band (after stand-up): [{x[t(2):, 2].min():.3f}, "
          f"{x[t(2):, 2].max():.3f}] m (target {cfg.stand.height})")
    print(f"final standing: {bool(res.carry.standing)}  x = {x[-1]}")
    path = os.path.join(out_dir, "wb_range.png")
    plot_rollout(res.trace, 1.0 / f, path=path)
    print("wrote", path)
    if animate:
        gif = os.path.join(out_dir, "wb_range.gif")
        # stride 24 + dpi 60 keeps the 22 s schedule's GIF ~3 MB (a
        # walking camera pans ground, which compresses far worse than
        # the in-place stance demo; do not commit double-digit-MB GIFs).
        animate_rollout(res.trace, 1.0 / f, gif, cfg=cfg, stride=24,
                        dpi=60)
        print("wrote", gif)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a not in ("--animate", "--cpu")]
    main(*argv, animate="--animate" in sys.argv)
