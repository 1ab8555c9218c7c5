"""Forward speed frontier ABOVE the reference's 0.4 m/s maximum (round 5).

With the swing-lag ratchet root-caused away (body_frame_exact — PARITY.md
"Swing-lag ratchet"), 0.4 m/s holds a clean limit cycle but a 0 -> 0.5
STEP falls in under a second. This probe asks whether the frontier is the
step transient or the gait itself: per-instance piecewise speed schedules
(direct steps vs staged 0.4 -> higher) in ONE batched compile on the
URDF substrate at the r4 operating point + body_frame_exact.

Env: QCT_SFP_SECS (default 16), QCT_SFP_STAGES e.g.
"0.4,0.4:0.45,0.4:0.5,0.45" — comma-separated instances; each instance is
colon-separated speeds occupying equal shares of the post-stand window.
"""

import dataclasses
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quadruped_control_tpu.config import (  # noqa: E402
    FootholdTrimConfig,
    JointControlConfig,
    mit_cheetah_whole_body_config,
)
from quadruped_control_tpu.math.rotations import matrix_to_rpy  # noqa: E402
from quadruped_control_tpu.sim import (  # noqa: E402
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_urdf_model,
    rollout_whole_body,
)

DT64 = jnp.float64


def main():
    cfg = dataclasses.replace(mit_cheetah_whole_body_config(),
                              joint_control=JointControlConfig())
    model = mit_cheetah_urdf_model(cfg, dtype=DT64)
    f = cfg.frequency
    secs = float(os.environ.get("QCT_SFP_SECS", "16"))
    stages = [[float(v) for v in inst.split(":")]
              for inst in os.environ.get(
                  "QCT_SFP_STAGES", "0.4,0.4:0.45,0.4:0.5,0.45").split(",")]
    B = len(stages)
    steps = int(secs * f)
    # (steps, B, 6) command schedule: equal shares of the window.
    sched = np.zeros((steps, B, 6))
    for i, sp in enumerate(stages):
        share = steps // len(sp)
        for k, v in enumerate(sp):
            lo = k * share
            hi = steps if k == len(sp) - 1 else (k + 1) * share
            sched[lo:hi, i, 0] = v
    sched = jnp.asarray(sched, DT64)

    wts = jnp.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                     1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], DT64)
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=24,
              mpc_dt=0.02, mpc_iterations=25, gravity_comp=True,
              raibert_cmd_symmetric=True,
              foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2),
              mpc_state_weights=wts, n_substeps=10,
              body_frame_exact=True)

    plant, carry = init_whole_body_rollout(cfg, dtype=DT64)
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT64), 900, cfg,
                             model, ContactConfig(), **kw)
    print("stand: standing=%s z=%.3f" % (bool(res.carry.standing),
                                         float(res.plant.x[2])), flush=True)
    bcast = lambda a: jnp.broadcast_to(a, (B,) + a.shape)  # noqa: E731
    plant_b = jax.tree.map(bcast, res.plant)
    carry_b = jax.tree.map(bcast, res.carry)
    carry_b = carry_b._replace(ref_pose=jnp.zeros((B, 3), DT64))

    import time
    t0 = time.time()
    r2 = rollout_whole_body(plant_b, carry_b, sched, steps, cfg, model,
                            ContactConfig(), cmd_schedule=True, **kw)
    x = np.asarray(jax.block_until_ready(r2.trace.x))  # (steps, B, 3)
    R = np.asarray(r2.trace.R)
    print(f"probe: {time.time()-t0:.0f}s", flush=True)
    W = int(1.0 * f)
    for i, sp in enumerate(stages):
        rolls = np.stack([matrix_to_rpy(R[k, i]) for k in
                          range(0, steps, 10)])
        fall = (np.argmax(np.abs(rolls[:, 0]) > 1.0) * 10
                if (np.abs(rolls[:, 0]) > 1.0).any() else -1)
        tag = (f"fall_tick={fall} ({fall / f:.2f}s)" if fall >= 0
               else "SURVIVED")
        print(f"\n== stages={sp} {tag}", flush=True)
        for w0 in range(0, steps, W):
            w1 = min(w0 + W, steps)
            if fall >= 0 and w0 > fall + W:
                break
            v = (x[w1 - 1, i, 0] - x[w0, i, 0]) / ((w1 - w0) / f)
            print(f"  t={w0 / f:4.1f}-{w1 / f:4.1f}s vx={v:+.3f} "
                  f"z[{x[w0:w1, i, 2].min():.3f},"
                  f"{x[w0:w1, i, 2].max():.3f}] y={x[w1 - 1, i, 1]:+.3f}")


if __name__ == "__main__":
    main()
