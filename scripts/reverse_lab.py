"""Time-resolved fall anatomy for full-physics reverse walking.

Runs a small batch of trim-gain combos (one compile via traced per-instance
gains) and prints a windowed time series per combo: roll/pitch/yaw, lateral
drift, height, swing tracking error — to see WHAT diverges FIRST (heading ->
lateral -> roll, or roll directly from late touchdowns).

Env: QCT_LAB_GATE (contact_gate, default 0), QCT_LAB_SYM (0/1
raibert_cmd_symmetric), QCT_LAB_CMD (default -0.2), QCT_LAB_SECS (default 8),
QCT_LAB_MODEL (synth/urdf), QCT_LAB_GRID "yg:lg,yg:lg,..."
(default "0:0,0.6:0.2,1.0:0.4").
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
N_SUB = int(os.environ.get("QCT_LAB_NSUB", 10))
CTRL = os.environ.get("QCT_LAB_CTRL", "mpc")
MPC_KW = dict(controller=CTRL, mpc_backend="structured",
              mpc_horizon=int(os.environ.get("QCT_LAB_HOR", 8)),
              mpc_dt=float(os.environ.get("QCT_LAB_MPCDT", 0.03)),
              mpc_iterations=int(os.environ.get("QCT_LAB_MPCIT", 15)))


def main():
    import dataclasses

    cfg = mit_cheetah_whole_body_config()
    # Static config overrides (each value = one recompile).
    tst = float(os.environ.get("QCT_LAB_TST", cfg.gait.t_stance))
    tsw = float(os.environ.get("QCT_LAB_TSW", cfg.gait.t_swing))
    swh = float(os.environ.get("QCT_LAB_SWH", cfg.gait.swing_height))
    kpl = float(os.environ.get("QCT_LAB_K", cfg.foot_planner.k))
    sh = float(os.environ.get("QCT_LAB_H", cfg.stand.height))
    jc = cfg.joint_control
    if "QCT_LAB_KP" in os.environ or "QCT_LAB_KD" in os.environ:
        from quadruped_control_tpu.config import JointControlConfig
        kpv = [float(v) for v in os.environ.get(
            "QCT_LAB_KP", "80,80,100").split(",")]
        kdv = [float(v) for v in os.environ.get(
            "QCT_LAB_KD", "2,2,2").split(",")]
        jc = JointControlConfig(kp=tuple(kpv), kd=tuple(kdv))
    cfg = dataclasses.replace(
        cfg,
        gait=dataclasses.replace(cfg.gait, t_stance=tst, t_swing=tsw,
                                 swing_height=swh),
        foot_planner=dataclasses.replace(cfg.foot_planner, k=kpl),
        stand=dataclasses.replace(cfg.stand, height=sh),
        joint_control=jc)
    which = os.environ.get("QCT_LAB_MODEL", "synth")
    if which == "urdfref":
        from quadruped_control_tpu.config import JointControlConfig
        cfg = dataclasses.replace(cfg, joint_control=JointControlConfig())
        which = "urdf"
    model = (mit_cheetah_urdf_model(cfg, dtype=DT64) if which == "urdf"
             else mit_cheetah_whole_body_model(cfg, dtype=DT64))
    contact = ContactConfig()
    f = cfg.frequency
    dt = 1.0 / f
    cmd_vx = float(os.environ.get("QCT_LAB_CMD", "-0.2"))
    secs = float(os.environ.get("QCT_LAB_SECS", "8"))
    gate = float(os.environ.get("QCT_LAB_GATE", "0"))
    ssg = os.environ.get("QCT_LAB_SSG", "0") != "0"
    bfe = os.environ.get("QCT_LAB_BFE", "0") != "0"
    sym = os.environ.get("QCT_LAB_SYM", "0") != "0"
    # Grid entries yg:lg[:vx[:wp]] — per-instance command vx (overrides
    # QCT_LAB_CMD) and MPC pitch-weight multiplier wp, so combos compare
    # in ONE compile (state_weights is a traced (B, 13) array).
    grid = []
    for g in os.environ.get(
            "QCT_LAB_GRID", "0:0,0.6:0.2,1.0:0.4").split(","):
        p = [float(v) for v in g.split(":")]
        p += [cmd_vx, 1.0, 1.0, 1.0, 0.5, 0.05, 0.0, 0.0, 0.0,
              0.0][len(p) - 2:]
        grid.append(tuple(p))  # (yg,lg,vx,wp,wroll,wrr,cap,lv,rg,rvg,
        #                        vsc,hl)
        # vsc: swing_vel_rescale FRACTION of full 1/t_swing (0 = the
        # reference quirk). hl: FootholdTrimConfig.heading_lead [rad]
        # (0 = reference re-anchoring).
    B = len(grid)
    base_w = np.array([50.0, 50.0, 10.0, 1.0, 1.0, 100.0,
                       1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0])
    wts = np.tile(base_w, (B, 1))
    wts[:, 1] *= np.array([g[3] for g in grid])
    wts[:, 0] *= np.array([g[4] for g in grid])
    wts[:, 6] *= np.array([g[5] for g in grid])
    if CTRL == "mpc":
        MPC_KW["mpc_state_weights"] = jnp.asarray(wts, DT64)  # (B, 13)
    else:
        MPC_KW.pop("mpc_state_weights", None)
        MPC_KW["qp_iterations"] = 15
    grav = os.environ.get("QCT_LAB_GRAV", "1") != "0"
    ft = FootholdTrimConfig()

    class Trim:
        yaw_gain = jnp.array([g[0] for g in grid], DT64)
        yaw_max = ft.yaw_max
        lat_gain = jnp.array([g[1] for g in grid], DT64)
        lat_vel_gain = jnp.array([g[7] for g in grid], DT64)
        lat_max = ft.lat_max
        capture_scale = jnp.array([g[6] for g in grid], DT64)
        roll_gain = jnp.array([g[8] for g in grid], DT64)
        roll_vel_gain = jnp.array([g[9] for g in grid], DT64)
        roll_max = ft.roll_max
        heading_lead = jnp.array([g[11] for g in grid], DT64)

    if os.environ.get("QCT_LAB_TRIM", "1") == "0":
        Trim = None  # noqa: F811 — control runs without the regulator

    # Per-instance swing velocity-ff multiplier: grid slot 10 is the
    # FRACTION of the full physical rescale (0 = reference quirk,
    # 1 = 1/t_swing); QCT_LAB_VSCALE sets the default fraction.
    vfrac = np.array([g[10] for g in grid])
    env_vf = float(os.environ.get("QCT_LAB_VSCALE", "0"))
    if env_vf and not vfrac.any():
        vfrac[:] = env_vf
    vscale = (jnp.asarray(1.0 + vfrac * (1.0 / tsw - 1.0), DT64)
              if vfrac.any() else None)

    plant, carry = init_whole_body_rollout(cfg, dtype=DT64)
    stand_kw = dict(MPC_KW)
    stand_kw["mpc_state_weights"] = None
    # Stand-up runs WITHOUT the contact gate: during the rise the feet sit
    # above their eventual stance height and a gate would withhold them
    # from the QP (measured: instant fall). The gate is a walking-phase
    # instrument for late touchdowns.
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT64), 900, cfg,
                             model, contact, n_substeps=N_SUB,
                             gravity_comp=grav,
                             raibert_cmd_symmetric=sym, **stand_kw)
    print("stand: standing=%s z=%.3f" % (bool(res.carry.standing),
                                         float(res.plant.x[2])), flush=True)
    bcast = lambda a: jnp.broadcast_to(a, (B,) + a.shape)  # noqa: E731
    plant_b = jax.tree.map(bcast, res.plant)
    carry_b = jax.tree.map(bcast, res.carry)
    carry_b = carry_b._replace(ref_pose=jnp.zeros((B, 3), DT64))

    cmd = jnp.zeros((B, 6), DT64).at[:, 0].set(
        jnp.array([g[2] for g in grid], DT64))
    steps = int(secs * f)

    @jax.jit
    def run(plant_s, carry_s):
        aff = os.environ.get("QCT_LAB_AFF", "0") != "0"

        def body(state, _):
            wb, cc = state
            com, joints = whole_body_com_state(wb, cfg)
            g_tau = (leg_gravity_torques(model, joints.q, com.R)
                     if grav else None)
            sw_mass = None
            if aff:
                from quadruped_control_tpu.sim.dynamics import (
                    leg_mass_matrices,
                )
                sw_mass = leg_mass_matrices(model, joints.q)
            out, cc = commander_step(
                com, joints, cc, cmd, dt, cfg, foothold_trim=Trim,
                gravity_comp_tau=g_tau, contact_gate=gate,
                raibert_cmd_symmetric=sym,
                swing_vel_rescale=vscale,
                swing_accel_ff=aff, swing_mass=sw_mass,
                swing_start_ground=ssg,
                body_frame_exact=bfe,
                **MPC_KW)
            wb = whole_body_step(wb, out.torques, dt, model, cfg, contact,
                                 n_substeps=N_SUB)
            rpy = matrix_to_rpy(wb.R)
            # swing tracking: |foot_ref - foot|_z for swinging legs
            from quadruped_control_tpu.ops.kinematics import (
                forward_kinematics,
            )
            feet_b = forward_kinematics(wb.q, cfg.kinematics)
            feet_w = (jnp.einsum("...ij,...lj->...li", wb.R, feet_b)
                      + wb.x[..., None, :])
            swing = ~out.gait.in_stance
            terr = jnp.where(
                swing, jnp.linalg.norm(
                    out.foot_refs_world - feet_w, axis=-1), 0.0)
            terr = terr.max(-1)
            # swing z-gap: actual - ref foot height (neg = foot BELOW its
            # reference = dragging/early ground strike; pos = lagging high)
            zgap = jnp.where(swing,
                             feet_w[..., 2] - out.foot_refs_world[..., 2],
                             0.0)
            return (wb, cc), (wb.x, rpy, terr, cc.ref_pose,
                              zgap.min(-1), zgap.max(-1),
                              jnp.argmax(zgap, -1), wb.q)

        (wb, cc), tr = lax.scan(body, (plant_s, carry_s), None,
                                length=steps)
        return tr

    import time
    t0 = time.time()
    xs, rpys, terrs, refs, zgl, zgh, lwho, qs = jax.block_until_ready(
        run(plant_b, carry_b))
    lwho, qs = np.asarray(lwho), np.asarray(qs)
    print(f"lab: {time.time()-t0:.0f}s  gate={gate} sym={sym} "
          f"cmd={cmd_vx} model={which}", flush=True)
    xs, rpys, terrs = np.asarray(xs), np.asarray(rpys), np.asarray(terrs)
    refs, zgl, zgh = np.asarray(refs), np.asarray(zgl), np.asarray(zgh)
    W = int(0.5 * f)  # 0.5 s windows
    for i, g in enumerate(grid):
        roll = np.abs(rpys[:, i, 0])
        fall = np.argmax(roll > 1.0) if (roll > 1.0).any() else -1
        hdr = (f"\n== combo yaw_g={g[0]} lat_g={g[1]} vx={g[2]}"
               f" wp={g[3]} wr={g[4]} wrr={g[5]} cap={g[6]} lv={g[7]}"
               f" rg={g[8]} rvg={g[9]}")
        print(hdr + (f" fall_tick={fall} ({fall/f:.2f}s)" if fall >= 0
                     else " SURVIVED"), flush=True)
        for w0 in range(0, xs.shape[0], W):
            w1 = min(w0 + W, xs.shape[0])
            if fall >= 0 and w0 > fall + W:
                break
            print(f"  t={w0/f:4.1f}-{w1/f:4.1f}s roll[{rpys[w0:w1,i,0].min():+.2f},{rpys[w0:w1,i,0].max():+.2f}]"
                  f" pitch[{rpys[w0:w1,i,1].min():+.2f},{rpys[w0:w1,i,1].max():+.2f}]"
                  f" yaw {rpys[w1-1,i,2]:+.3f} y {xs[w1-1,i,1]:+.3f}"
                  f" z[{xs[w0:w1,i,2].min():.3f},{xs[w0:w1,i,2].max():.3f}]"
                  f" terr_max {terrs[w0:w1,i].max():.3f}"
                  f" zgap[{zgl[w0:w1,i].min():+.3f},{zgh[w0:w1,i].max():+.3f}]"
                  f" lag_leg={np.bincount(lwho[w0:w1,i], minlength=4).argmax()}"
                  f" eyaw {rpys[w1-1,i,2]-refs[w1-1,i,2]:+.3f}")
        # worst-tick joint state: the lagging leg's q at max zgap
        wt = int(np.argmax(zgh[:, i]))
        ll = int(lwho[wt, i])
        print(f"  worst tick {wt} ({wt/f:.2f}s) leg {ll} "
              f"q={qs[wt, i, ll]} zgap={zgh[wt, i]:+.3f}")


if __name__ == "__main__":
    main()
