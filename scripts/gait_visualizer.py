#!/usr/bin/env python
"""Open-loop gait pipeline demo — the reference's ``gait_visualizer`` node
(gait_visualizer_node.cpp:103-362, SURVEY.md §3.4) without ROS/rviz.

Static base pose; runs scheduler -> Raibert planner -> sextic trajectories
-> IK over a time grid as ONE vectorized computation (no 5 Hz loop), then
renders the swing trajectories, foot tracks, and gait diagram to PNGs.

Usage: PYTHONPATH=. python scripts/gait_visualizer.py [out_dir]
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.ops.foot_planner import plan_footholds
from quadruped_control_tpu.ops.gait import gait_at_time
from quadruped_control_tpu.ops.kinematics import (
    forward_kinematics,
    inverse_kinematics,
)
from quadruped_control_tpu.ops.trajectory import (
    plan_swing_trajectories,
    reference_foot_states,
)
from quadruped_control_tpu.types import init_planner_state


def main(out_dir="/tmp/gait_viz"):
    os.makedirs(out_dir, exist_ok=True)
    cfg = mit_cheetah_config()
    dtype = jnp.float32

    # Static base pose at the standing height (gait_visualizer.yaml analog).
    R = jnp.eye(3, dtype=dtype)
    x = jnp.array([0.0, 0.0, 0.26], dtype=dtype)
    zeros3 = jnp.zeros(3, dtype=dtype)
    xdot_d = jnp.array([0.2, 0.0, 0.0], dtype=dtype)  # walk forward intent
    q0 = jnp.tile(jnp.array([0.0, 1.61, -2.78], dtype=dtype), (4, 1))
    feet_body = forward_kinematics(q0, cfg.kinematics)

    dt = 1.0 / 100.0
    steps = int(2.5 * cfg.gait.period / dt)

    def tick(carry, t):
        planner = carry
        gait = gait_at_time(t, cfg.gait, dtype=dtype)
        plan = plan_footholds(
            planner.prev_in_stance, planner.initialized, gait,
            cfg.gait.t_stance, R, x, xdot_d, zeros3, xdot_d, feet_body,
            cfg.foot_planner,
        )
        p_start = (R @ feet_body.T).T + x
        traj = plan_swing_trajectories(planner.traj, p_start, plan.footholds,
                                       plan.replan, cfg.gait)
        foot_ref = reference_foot_states(traj, gait, cfg.gait)
        p_body = (R.T @ foot_ref.position.T).T - x
        q = inverse_kinematics(p_body, cfg.kinematics)
        new_planner = planner._replace(
            prev_in_stance=plan.prev_in_stance,
            initialized=plan.initialized, traj=traj,
        )
        return new_planner, (gait.in_stance, foot_ref.position, q, traj.coeffs)

    ts = jnp.arange(steps, dtype=dtype) * dt
    planner, (stance, foot_pos, q_ik, coeffs) = jax.lax.scan(
        tick, init_planner_state((), dtype=dtype), ts
    )
    print(f"simulated {steps} ticks over {steps*dt:.2f}s "
          f"({float(jnp.mean(stance)):.2f} stance fraction)")

    from quadruped_control_tpu.utils.viz import plot_swing_trajectory

    plot_swing_trajectory(np.asarray(coeffs[-1]),
                          path=os.path.join(out_dir, "swing_trajectories.png"))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fp = np.asarray(foot_pos)
    st = np.asarray(stance)
    fig, axes = plt.subplots(2, 1, figsize=(9, 7))
    for leg, name in enumerate(("RL", "FL", "RR", "FR")):
        swing = ~st[:, leg]
        axes[0].plot(np.where(swing, fp[:, leg, 0], np.nan),
                     np.where(swing, fp[:, leg, 2], np.nan), label=name)
    axes[0].set_xlabel("x [m]"); axes[0].set_ylabel("z [m]")
    axes[0].set_title("swing foot tracks (world)"); axes[0].legend()
    t = np.asarray(ts)
    for leg in range(4):
        axes[1].fill_between(t, leg + 0.1, leg + 0.9,
                             where=st[:, leg], alpha=0.6, linewidth=0)
    axes[1].set_yticks([l + 0.5 for l in range(4)], ("RL", "FL", "RR", "FR"))
    axes[1].set_title("gait diagram")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "gait_pipeline.png"), dpi=110)
    print("wrote", out_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
