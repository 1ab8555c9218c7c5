#!/usr/bin/env python
"""FULL-PHYSICS stance body-posing demo (round 5).

The reference's balance-controller demo genre: the standing body posed
through roll / pitch / yaw / height on the PS4 stance mapping
(teleop_ps4_stance.yaml:5-14, media body_control.gif / stance.gif),
tracked by the GRF QP on all-stance support. Reproduced pilot-less as
ONE scheduled whole-body rollout through the commander's ``stance_pose``
mode: commanded pose RATES integrate into the carried desired pose
(config.StancePoseConfig clamps) and the balance QP tracks R_d/x_d.

Substrate: URDF-true inertials + the reference's own joint gains (the
round-4 flagship configuration). Pinned by
tests/test_whole_body_loop.py::test_whole_body_stance_pose.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/stance_pose_demo.py \
           [out_dir] [--animate] [--cpu]
"""

import dataclasses
import os
import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax  # noqa: E402
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
    rollout_whole_body,
)

DTYPE = jnp.float64 if "--cpu" in sys.argv else jnp.float32


def pose_schedule(f, dtype):
    """Stand up, then excursion-and-return on each pose channel:
    roll +0.2, pitch +0.2, yaw +0.2, height 0.26 -> 0.20 -> 0.30 -> 0.26."""
    return piecewise_command(
        [(4.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, 0.4, 0.0, 0.0]),
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, -0.4, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, 0.0, 0.4, 0.0]),
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, 0.0, -0.4, 0.0]),
         (0.5, [0, 0, 0.0, 0.0, 0.0, 0.4]),
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.0, 0.0, 0.0, -0.4]),
         (0.5, [0, 0, -0.12, 0.0, 0.0, 0.0]),
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, 0.2, 0.0, 0.0, 0.0]),
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0]),
         (0.5, [0, 0, -0.08, 0.0, 0.0, 0.0]),
         (1.0, [0, 0, 0.0, 0.0, 0.0, 0.0])], f, dtype=dtype)


def main():
    out_dir = next((a for a in sys.argv[1:] if not a.startswith("--")),
                   "media")
    os.makedirs(out_dir, exist_ok=True)
    cfg = dataclasses.replace(mit_cheetah_whole_body_config(),
                              joint_control=JointControlConfig())
    model = mit_cheetah_urdf_model(cfg, dtype=DTYPE)
    f = cfg.frequency
    sched = pose_schedule(f, DTYPE)
    plant, carry = init_whole_body_rollout(cfg, dtype=DTYPE)
    # Chunk host-side: single multi-thousand-tick device executions die
    # with UNAVAILABLE on the axon tunnel (CLAUDE.md).
    CH = 200
    parts = []
    for k in range(0, sched.shape[0], CH):
        chunk = sched[k:k + CH]
        res = rollout_whole_body(plant, carry, chunk,
                                 int(chunk.shape[0]), cfg, model,
                                 ContactConfig(), cmd_schedule=True,
                                 n_substeps=10, gravity_comp=True,
                                 stance_pose=True)
        plant, carry = res.plant, res.carry
        parts.append(jax.tree.map(np.asarray, res.trace))
    trace = jax.tree.map(lambda *a: np.concatenate(a), *parts)
    res = res._replace(trace=trace)
    x = np.asarray(trace.x)
    R = np.asarray(trace.R)
    rpy_end = matrix_to_rpy(res.plant.R)
    print(f"finite={np.isfinite(x).all()} z_end={x[-1, 2]:.3f} "
          f"rpy_end={np.asarray(rpy_end)}")
    t = lambda s: int(s * f)  # noqa: E731
    for name, k, ch in (("roll", t(5.4), 0), ("pitch", t(7.4), 1),
                        ("yaw", t(9.4), 2)):
        v = float(matrix_to_rpy(R[k])[ch])
        print(f"{name} hold: {v:+.3f} (target +0.200)")
    print(f"z low hold: {x[t(11.2), 2]:.3f} (target 0.200)")
    print(f"z high hold: {x[t(12.8), 2]:.3f} (target 0.300)")

    if "--animate" in sys.argv:
        from quadruped_control_tpu.utils.viz import animate_rollout

        path = os.path.join(out_dir, "stance_pose.gif")
        animate_rollout(res.trace, 1.0 / f, path, cfg=cfg, stride=12,
                        dpi=55)
        print("wrote", path, f"{os.path.getsize(path)/1e6:.1f} MB")


if __name__ == "__main__":
    main()
