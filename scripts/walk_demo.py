#!/usr/bin/env python
"""Closed-loop walking demo: stand up, then trot at the commanded twist.

The reference's headline demo (README.md:54-63, Drake + rviz GIFs) as a
headless on-device rollout: commander x SRB plant surrogate in one scan,
plots written as PNGs.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/walk_demo.py \
           [vx] [vy] [wz] [seconds] [out_dir] [--animate]

``--animate`` additionally writes walk.gif — the headless equivalent of
the reference's rviz demo media (quadruped_controller/media/).
"""

import os
import sys

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.rollout import walk_rollout
from quadruped_control_tpu.utils.viz import animate_rollout, plot_rollout


def main(vx=0.2, vy=0.0, wz=0.0, seconds=4.0, out_dir="/tmp/walk_demo",
         animate=False):
    vx, vy, wz, seconds = map(float, (vx, vy, wz, seconds))
    os.makedirs(out_dir, exist_ok=True)
    cfg = mit_cheetah_physical_config()
    print(f"rolling out: vx={vx} vy={vy} wz={wz} for {seconds}s "
          f"@ {cfg.frequency:.0f} Hz ...")
    res = walk_rollout(cfg, vx=vx, vy=vy, wz=wz, seconds=seconds,
                       dtype=jnp.float32)
    x = np.asarray(res.trace.x)
    v_avg = (x[-1, :2] - x[0, :2]) / seconds
    print(f"final position: x={x[-1,0]:+.3f} y={x[-1,1]:+.3f} z={x[-1,2]:.3f}")
    print(f"mean planar velocity: vx={v_avg[0]:+.3f} vy={v_avg[1]:+.3f} "
          f"(cmd {vx:+.2f}/{vy:+.2f})")
    print(f"QP convergence: "
          f"{float(np.mean(np.asarray(res.trace.qp_converged))):.3f}")
    path = os.path.join(out_dir, "walk.png")
    plot_rollout(res.trace, 1.0 / cfg.frequency, path=path)
    print("wrote", path)
    if animate:
        gif = os.path.join(out_dir, "walk.gif")
        animate_rollout(res.trace, 1.0 / cfg.frequency, gif, cfg=cfg)
        print("wrote", gif)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--animate"]
    main(*argv, animate="--animate" in sys.argv)
