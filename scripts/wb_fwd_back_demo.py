#!/usr/bin/env python
"""FULL-PHYSICS forward-AND-backward demo, pilot-less (round 4).

The reference's headline demo walks forward and BACKWARD at 0.2 m/s on
Drake full physics, driven by a human on a PS4 pad (README.md:57,
media transition_backwards.gif). This reproduces the whole genre as ONE
scheduled whole-body rollout with no pilot: stand up -> +0.2 m/s trot ->
stand -> -0.2 m/s trot -> stand, on the 13-body articulated engine with
compliant contact. The operating point is the round-4 reverse-capable
one (tests/test_whole_body_loop.py::test_whole_body_fwd_and_back_
scheduled): x20 MPC pitch weight, full-gait-cycle horizon (24 x 0.02 s),
symmetric Raibert travel term, and the foothold-trim heading/station
regulator (config.FootholdTrimConfig — the pilot analogue).

Default substrate: the URDF-TRUE inertials (mit_cheetah_urdf_model —
what the reference's Drake sim loads) with the reference's OWN joint
gains; measured the steadiest configuration (height +-1 mm, |roll| 0.04;
tests/test_whole_body_loop.py::test_whole_body_fwd_and_back_urdf).
--synth runs the synthesized-inertials robustness variant instead.

Usage: PYTHONPATH="$PYTHONPATH:." python scripts/wb_fwd_back_demo.py \
           [out_dir] [--animate] [--cpu] [--synth]
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
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)
from quadruped_control_tpu.utils.viz import animate_rollout, plot_rollout


def main(out_dir="/tmp/wb_fwd_back_demo", animate=False, synth=False):
    os.makedirs(out_dir, exist_ok=True)
    cfg = mit_cheetah_whole_body_config()
    dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    if synth:
        model = mit_cheetah_whole_body_model(cfg, dtype=dtype)
    else:
        # URDF-true inertials take the reference's own joint gains — the
        # whole-body config's stiffened swing PD is tuned for the heavy
        # synthesized rod legs and overdrives the URDF's 2.4x-lighter
        # distal links (measured: falls at 6-9 s; reference gains hold
        # height +-1 mm).
        cfg = dataclasses.replace(cfg, joint_control=JointControlConfig())
        model = mit_cheetah_urdf_model(cfg, dtype=dtype)
    f = cfg.frequency
    wts = jnp.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                     1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], dtype)
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=24,
              mpc_dt=0.02, mpc_iterations=25, gravity_comp=True,
              raibert_cmd_symmetric=True,
              foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2),
              mpc_state_weights=wts, n_substeps=10)
    sched = piecewise_command(
        [(4.0, [0, 0, 0, 0, 0, 0]),
         (3.0, [0.2, 0, 0, 0, 0, 0]),
         (2.0, [0, 0, 0, 0, 0, 0]),
         (2.5, [-0.2, 0, 0, 0, 0, 0]),
         (3.0, [0, 0, 0, 0, 0, 0])], f, dtype=dtype)
    steps = sched.shape[0]
    print(f"whole-body scheduled rollout: {steps} ticks @ {f:.0f} Hz "
          "(stand | +0.2 | 0 | -0.2 | 0 m/s), FULL physics")
    plant, carry = init_whole_body_rollout(cfg, dtype=dtype)
    res = rollout_whole_body(plant, carry, sched, steps, cfg, model,
                             ContactConfig(), cmd_schedule=True, **kw)
    x = np.asarray(res.trace.x)
    t = lambda s: int(s * f)  # noqa: E731
    print(f"forward leg:  {x[t(7) - 1, 0] - x[t(4), 0]:+.3f} m")
    print(f"reverse leg:  {x[t(11.5) - 1, 0] - x[t(9), 0]:+.3f} m")
    print(f"height band (after stand-up): [{x[t(2):, 2].min():.3f}, "
          f"{x[t(2):, 2].max():.3f}] m (target {cfg.stand.height})")
    print(f"final standing: {bool(res.carry.standing)}  x = {x[-1]}")
    path = os.path.join(out_dir, "wb_fwd_back.png")
    plot_rollout(res.trace, 1.0 / f, path=path)
    print("wrote", path)
    if animate:
        gif = os.path.join(out_dir, "wb_fwd_back.gif")
        animate_rollout(res.trace, 1.0 / f, gif, cfg=cfg)
        print("wrote", gif)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]
            if a not in ("--animate", "--cpu", "--synth")]
    main(*argv, animate="--animate" in sys.argv,
         synth="--synth" in sys.argv)
