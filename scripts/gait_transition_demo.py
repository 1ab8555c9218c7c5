#!/usr/bin/env python
"""The reference's headline gait-transition demo, pilot-less.

README.md:57 shows the robot walking FORWARD and BACKWARD at 0.2 m/s in
one session, driven live over a PS4 pad (cmdCallback every tick,
commander_node.cpp:191-202). This reproduces it as ONE scheduled rollout
(control/rollout.piecewise_command + cmd_schedule=True): stand up, trot to
+0.2 m/s, decelerate, reverse to -0.2 m/s — on the SRB surrogate, where
the transition is robust (the full-physics reverse is measurably
heading-unstable without a pilot; PARITY.md "Reverse-walking anatomy").

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/gait_transition_demo.py \
           [out_dir] [--animate] [--cpu]

--animate writes gait_transition.gif (the reference's media genre).
--cpu forces the host CPU platform in-process (float64; env vars cannot
redirect once the TPU plugin is pre-registered via sitecustomize).
"""

import os
import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.control.rollout import (
    piecewise_command,
    rollout,
)
from quadruped_control_tpu.utils.viz import animate_rollout, plot_rollout


def main(out_dir="/tmp/gait_transition_demo", animate=False):
    os.makedirs(out_dir, exist_ok=True)
    cfg = mit_cheetah_physical_config()
    dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    plant = init_plant_state(cfg, (), dtype=dtype)
    carry = init_commander_carry((), dtype=dtype)
    sched = piecewise_command(
        [(1.5, [0, 0, 0, 0, 0, 0]),        # stand up
         (2.5, [0.2, 0, 0, 0, 0, 0]),      # trot forward (demo speed)
         (0.5, [0, 0, 0, 0, 0, 0]),        # decelerate
         (2.5, [-0.2, 0, 0, 0, 0, 0])],    # reverse
        cfg.frequency, dtype=dtype)
    steps = sched.shape[0]
    print(f"scheduled rollout: {steps} ticks @ {cfg.frequency:.0f} Hz "
          "(stand | +0.2 | 0 | -0.2 m/s)")
    res = rollout(plant, carry, sched, steps, cfg, cmd_schedule=True)
    x = np.asarray(res.trace.x)
    f = cfg.frequency
    i1, i2, i3 = int(1.5 * f), int(4.0 * f), int(4.5 * f)
    print(f"forward leg:  {x[i2 - 1, 0] - x[i1, 0]:+.3f} m")
    print(f"reverse leg:  {x[-1, 0] - x[i3, 0]:+.3f} m")
    print(f"height band (walking): [{x[i1:, 2].min():.3f}, "
          f"{x[i1:, 2].max():.3f}] m (target {cfg.stand.height})")
    print(f"QP convergence: "
          f"{float(np.mean(np.asarray(res.trace.qp_converged))):.3f}")
    path = os.path.join(out_dir, "gait_transition.png")
    plot_rollout(res.trace, 1.0 / f, path=path)
    print("wrote", path)
    if animate:
        gif = os.path.join(out_dir, "gait_transition.gif")
        animate_rollout(res.trace, 1.0 / f, gif, cfg=cfg)
        print("wrote", gif)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a not in ("--animate", "--cpu")]
    main(*argv, animate="--animate" in sys.argv)
