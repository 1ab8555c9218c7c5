"""The commander control tick as a single pure function.

TPU-native re-implementation of the reference's commander node main loop
(commander_node.cpp:372-557, call stack SURVEY.md §3.1). The ROS node's
pub/sub boundaries, service flags, and the gait scheduler thread disappear:
one jitted function maps (robot state, carried controller state, command) to
joint torques. The function is fully batchable — vmap over scenario batches
turns the 100 Hz control tick into the "gait-cycle QP stream" benchmark
(BASELINE config 3).

State machine parity (commander_node.cpp:377-479):
  - not standing: stance gait, balance control drives the CoM to the stand
    target (the ``stand_up`` path, §3.3).
  - standing height reached (|z - 0.26| < 5 mm): start the gait clock.
  - walking: integrate the commanded twist for the desired pose, plan
    footholds on stance->swing edges, track sextic swing trajectories.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from quadruped_control_tpu.config import ControlConfig
from quadruped_control_tpu.math.numerics import almost_equal
from quadruped_control_tpu.math.rotations import transform_adjoint
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.ops.foot_planner import plan_footholds
from quadruped_control_tpu.ops.gait import gait_at_time
from quadruped_control_tpu.ops.joint_control import joint_pd_control
from quadruped_control_tpu.ops.kinematics import (
    forward_kinematics,
    inverse_kinematics,
    jacobian_transpose_control,
    leg_jacobian_inverse,
)
from quadruped_control_tpu.ops.trajectory import (
    integrate_twist_yaw,
    plan_swing_trajectories,
    reference_foot_states,
)
from quadruped_control_tpu.solver.ipm import IPMSolution, solve_qp_ipm
from quadruped_control_tpu.types import (
    ComState,
    Gait,
    JointState,
    PlannerState,
    init_planner_state,
    make_stance_gait,
)


class CommanderCarry(NamedTuple):
    """Scan-carried controller state (the reference's static/global flags:
    ``standing``, ``gait_running`` commander_node.cpp:365-366, the gait
    clock, the planner/trajectory state, and the QP warm-start triple — the
    batched analogue of qpOASES's hotstart across ticks,
    balance_controller.cpp:193-195)."""

    standing: jnp.ndarray  # (...,) bool
    gait_time: jnp.ndarray  # (...,) seconds since gait start (<0: not running)
    planner: PlannerState
    qp_x: jnp.ndarray  # (..., 12) previous primal solution
    qp_s: jnp.ndarray  # (..., 24) previous slacks
    qp_z: jnp.ndarray  # (..., 24) previous duals
    # (..., 3) [x_ref, y_ref, yaw_ref] command-integrated reference pose for
    # the foothold-trim regulator (None = regulator off, reference parity;
    # init_commander_carry(ref_pose=True) allocates it).
    ref_pose: "jnp.ndarray | None" = None
    # (..., 4) [roll, pitch, yaw, dz] rate-integrated desired body pose for
    # the stance_pose body-posing mode (None = mode off;
    # init_commander_carry(pose_cmd=True) allocates it).
    pose_cmd: "jnp.ndarray | None" = None


class CommanderOutput(NamedTuple):
    torques: jnp.ndarray  # (..., 4, 3) clamped joint torques
    forces_body: jnp.ndarray  # (..., 4, 3) stance GRFs in body frame
    forces_world: jnp.ndarray  # (..., 12) raw QP solution
    gait: Gait
    foot_refs_world: jnp.ndarray  # (..., 4, 3) swing foot reference positions
    swing_q_ref: jnp.ndarray  # (..., 4, 3)
    qp_converged: jnp.ndarray  # (...,)
    # Full horizon forces (..., N, 12) when controller="mpc", else None —
    # lets decimated drivers hold F_k instead of zero-order-holding F_0
    # when the hold window outruns one horizon step (rollout_mpc_decimated
    # hold_mode="horizon").
    forces_horizon: "jnp.ndarray | None" = None


def init_commander_carry(batch_shape=(), dtype=jnp.float32,
                         ref_pose: bool = False,
                         pose_cmd: bool = False) -> CommanderCarry:
    return CommanderCarry(
        standing=jnp.zeros(batch_shape, dtype=bool),
        gait_time=jnp.full(batch_shape, -1.0, dtype=dtype),
        planner=init_planner_state(batch_shape, dtype=dtype),
        qp_x=jnp.zeros(batch_shape + (12,), dtype=dtype),
        qp_s=jnp.ones(batch_shape + (24,), dtype=dtype),
        qp_z=jnp.ones(batch_shape + (24,), dtype=dtype),
        ref_pose=(jnp.zeros(batch_shape + (3,), dtype=dtype)
                  if ref_pose else None),
        pose_cmd=(jnp.zeros(batch_shape + (4,), dtype=dtype)
                  if pose_cmd else None),
    )


class CommanderPrecursors(NamedTuple):
    """Everything commander steps 1-8 produce (the pre-QP stage): inputs to
    the stance-force controller plus the swing pipeline's results. Shared by
    the XLA commander and the fused Pallas commander kernel's parity tests
    (control/pallas_commander.py)."""

    feet_body: jnp.ndarray  # (..., 4, 3)
    standing: jnp.ndarray  # (...,)
    gait_time: jnp.ndarray  # (...,)
    walking: jnp.ndarray  # (...,)
    gait: Gait
    eff_stance: jnp.ndarray  # (..., 4) gait stance AND (opt) contact gate
    R_d: jnp.ndarray  # (..., 3, 3)
    x_d: jnp.ndarray  # (..., 3)
    xdot_d: jnp.ndarray  # (..., 3)
    w_d: jnp.ndarray  # (..., 3)
    plan: "object"  # FootholdPlan
    traj: "object"  # FootTrajCoeffs
    foot_ref: "object"  # FootState
    q_ref: jnp.ndarray  # (..., 4, 3)
    qdot_ref: jnp.ndarray  # (..., 4, 3)
    tau_swing: jnp.ndarray  # (..., 4, 3)
    p_start: jnp.ndarray  # (..., 4, 3) current feet in world frame
    # Updated foothold-trim reference pose (None unless the regulator is
    # active); commander_step carries it forward.
    ref_pose: "jnp.ndarray | None" = None
    # Updated stance-pose integrator state (None unless stance_pose).
    pose_cmd: "jnp.ndarray | None" = None


def commander_precursors(com: ComState, joints: JointState,
                         carry: CommanderCarry, cmd_twist, dt,
                         cfg: ControlConfig, *, weight_shift: float = 0.0,
                         contact_gate: float = 0.0,
                         raibert_cmd_symmetric: bool = False,
                         heading_hold: bool = False,
                         foothold_trim=None,
                         swing_vel_rescale: bool = False,
                         swing_accel_ff: bool = False,
                         swing_mass=None,
                         stance_pose=False,
                         swing_start_ground: bool = False,
                         body_frame_exact: bool = False,
                         ) -> CommanderPrecursors:
    """Commander steps 1-8 (SURVEY.md §3.1): FK, the standing/gait state
    machine, desired-state generation, foothold planning, swing-trajectory
    tracking, IK, and swing PD — everything before the stance-force solve.
    All arguments broadcast over leading batch dims; see
    :func:`commander_step` for the option semantics.

    Args:
      com: CoM state (world frame).
      joints: per-leg joint states.
      carry: carried controller state.
      cmd_twist: (..., 6) commanded body twist (cmd_vel).
      dt: control period (1 / cfg.frequency).
      weight_shift: 0 disables (reference commander behavior). >0 blends
        the walking (x, y) position target toward the reference's
        *virtual predictive support polygon* (SupportPolygon,
        trajectory.cpp:71-147 — shipped but never wired into the
        reference's commander, SURVEY.md §2): the erf-weighted schedule
        de-weights feet near their scheduled lift-off, pre-shifting the
        body over the legs that will keep supporting it. NOTE: for a
        diagonal-pair TROT this is a measured no-op — the trot's swing
        pairs are point-symmetric, so the virtual support point stays at
        the centroid (plausibly why the reference never wired it in). It
        is the right tool for 3-1 crawl gaits, where single-leg lift-offs
        move the polygon. 1.0 = full shift.
      contact_gate: 0 disables (reference behavior: stance is purely
        clock-scheduled, gait.cpp:127). >0 = contact-aware stance gating
        for full-physics plants: a scheduled-stance foot measured (via FK)
        more than this height [m] above the ground is NOT handed to the
        GRF QP — the QP's fz_min >= 10 N row would otherwise force torque
        onto a foot that hasn't landed (a late touchdown kicks the body
        over). Gated legs keep swing-PD tracking toward their planned
        foothold until they actually reach the ground. Typical: 0.005-0.02.
      raibert_cmd_symmetric: False = reference behavior (the Raibert
        travel term samples the measured velocity at the replan edge,
        foot_planner.cpp:87). True = use the COMMANDED velocity in the
        travel term (k- and capture-point terms keep measured feedback),
        so a trot's lateral rocking does not alias into foothold scatter.
      heading_hold: EXPERIMENTAL, measured NEGATIVE result — keep False.
        False = reference behavior: the desired pose RE-ANCHORS to the
        measured pose every tick (integrate_twist_yaw(current pose, cmd,
        dt), commander_node.cpp:399-412), so heading is never servoed
        beyond a one-dt lead and the robot's yaw RANDOM-WALKS under the
        trot (measured ~0.3 rad over a 6 s stand+in-place phase on full
        physics) — the human pilot of the reference's teleop demos is the
        implicit heading regulator. True = pull the desired yaw toward
        the absolute reference heading wz_cmd * gait_time, clamped to a
        +-0.05 rad lead beyond measured. Measured on full physics
        (PARITY.md "Reverse-walking anatomy"): the trot has almost no
        spare yaw authority — both the raw step and this clamped lead
        destabilize even the robustly-stable FORWARD trot (yaw moments
        ride the same diagonal-support axis as the roll recovery), so the
        probe documents WHY pilot-less reverse fails rather than fixing
        it. Kept for reproducibility of that measurement.
      foothold_trim: None disables (reference behavior). A
        ``config.FootholdTrimConfig`` enables the foothold-level
        heading/station regulator — the PILOT ANALOGUE for the reference's
        human-teleoperated demos (README.md:57 backward walking is
        PS4-piloted): heading and cross-track error, accumulated against a
        carried command-integrated reference pose (``carry.ref_pose``,
        allocate with ``init_commander_carry(ref_pose=True)``), are closed
        through FOOTHOLD PLACEMENT (pattern rotation + lateral shift at
        replan edges) instead of GRF yaw moments — the instrument class the
        failed ``heading_hold`` probe showed the trot cannot afford. See
        FootholdTrimConfig for the mechanism and PARITY.md
        "Reverse-walking anatomy" for why this is the right lever.
    Returns:
      CommanderPrecursors.
    """
    dtype = com.x.dtype
    kin = cfg.kinematics
    gait_cfg = cfg.gait

    # 1. FK: feet in body frame (commander_node.cpp:383-384).
    feet_body = forward_kinematics(joints.q, kin)

    # 2. Standing detection (commander_node.cpp:387-391); latching.
    standing = jnp.logical_or(
        carry.standing,
        almost_equal(com.x[..., 2], cfg.stand.height, cfg.stand.height_tolerance),
    )
    # Gait clock starts one tick after standing (commander_node.cpp:474-478).
    gait_running = carry.gait_time >= 0.0
    gait_time = jnp.where(
        gait_running, carry.gait_time + dt,
        jnp.where(standing, jnp.zeros_like(carry.gait_time), carry.gait_time),
    )
    if stance_pose is not False and stance_pose is not None:
        # Stance body-posing mode (the reference's balance-controller demo
        # genre, teleop_ps4_stance.yaml / media body_control.gif): the
        # gait clock NEVER starts — all legs stay in stance support and
        # the balance QP tracks the pose integrator (step 3b below).
        gait_time = carry.gait_time
    walking = gait_time >= 0.0

    # 3. Desired CoM state: stand target, or integrated twist when walking
    #    (commander_node.cpp:346-364, 399-427).
    R_d_walk, x_d_walk = integrate_twist_yaw(
        com.R, com.x, cmd_twist, cfg.cmd_integration_dt
    )
    x_d_walk = x_d_walk.at[..., 2].set(cfg.stand.height)  # height pinned (:407)
    if heading_hold:
        # Absolute-heading regulation (see the option docstring): pull the
        # desired yaw toward the reference heading wz * time-since-walk-
        # start instead of re-anchoring to measured yaw + wz dt. The pull
        # is CLAMPED to +-0.05 rad beyond the measured yaw — a step to the
        # absolute target measurably destabilizes the trot (the kp_w=5000
        # rotation gain turns a 0.3 rad yaw step into a saturating moment
        # demand that fights the roll budget on diagonal support); the
        # clamped lead is the gentle continuous correction a pilot would
        # fly. Position stays re-anchored (reference behavior) — heading
        # is the direction-unstable channel.
        yaw_ref = cmd_twist[..., 5] * jnp.maximum(gait_time, 0.0)
        yaw_meas = jnp.arctan2(com.R[..., 1, 0], com.R[..., 0, 0])
        err = yaw_ref - yaw_meas
        err = jnp.arctan2(jnp.sin(err), jnp.cos(err))  # wrap to (-pi, pi]
        yaw_d = yaw_meas + jnp.clip(err, -0.05, 0.05)
        cy, sy = jnp.cos(yaw_d), jnp.sin(yaw_d)
        zr = jnp.zeros_like(cy)
        on = jnp.ones_like(cy)
        R_d_walk = jnp.stack([
            jnp.stack([cy, -sy, zr], axis=-1),
            jnp.stack([sy, cy, zr], axis=-1),
            jnp.stack([zr, zr, on], axis=-1),
        ], axis=-2)
    hl = (getattr(foothold_trim, "heading_lead", 0.0)
          if foothold_trim is not None else 0.0)
    heading_servo = not (isinstance(hl, float) and hl == 0.0)
    if heading_servo:
        # Absolute-heading desired yaw (FootholdTrimConfig.heading_lead):
        # servo toward the trim regulator's carried reference heading
        # (integrated from the COMMANDED wz, step 5b) instead of
        # re-anchoring to measured every tick — the GRF/MPC yaw channel
        # and the foothold pattern rotation then pull the SAME target.
        if carry.ref_pose is None:
            raise ValueError(
                "heading_lead needs carry.ref_pose — build the carry with "
                "init_commander_carry(ref_pose=True)")
        yaw_meas_h = jnp.arctan2(com.R[..., 1, 0], com.R[..., 0, 0])
        yaw_tgt = jnp.where(walking,
                            carry.ref_pose[..., 2] + cmd_twist[..., 5] * dt,
                            yaw_meas_h)
        e_h = yaw_tgt - yaw_meas_h
        e_h = jnp.arctan2(jnp.sin(e_h), jnp.cos(e_h))
        yaw_d = yaw_meas_h + jnp.clip(e_h, -hl, hl)
        cy, sy = jnp.cos(yaw_d), jnp.sin(yaw_d)
        zr = jnp.zeros_like(cy)
        on = jnp.ones_like(cy)
        R_d_walk = jnp.stack([
            jnp.stack([cy, -sy, zr], axis=-1),
            jnp.stack([sy, cy, zr], axis=-1),
            jnp.stack([zr, zr, on], axis=-1),
        ], axis=-2)
    Vw = (transform_adjoint(com.R, com.x) @ cmd_twist[..., None])[..., 0]

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), com.R.shape)
    x_stand = jnp.zeros_like(com.x).at[..., 2].set(cfg.stand.height)
    wmask = walking[..., None]
    R_d = jnp.where(wmask[..., None], R_d_walk, eye)
    x_d = jnp.where(wmask, x_d_walk, x_stand)
    xdot_d = jnp.where(wmask, Vw[..., :3], 0.0)
    w_d = jnp.where(wmask, Vw[..., 3:], 0.0)

    # 3b. (extension, opt-in) Stance body-pose integrator — the reference's
    #     body-posing demo genre (teleop_ps4_stance.yaml:5-14, media
    #     body_control.gif / stance.gif): the PS4 stance mapping commands
    #     POSE RATES (wx/wy/wz -> roll/pitch/yaw, vz -> height), which
    #     integrate into a carried desired pose that the balance QP tracks
    #     on all-stance support. Clamped to StancePoseConfig's reach-safe
    #     bounds; integration only runs once standing.
    new_pose_cmd = carry.pose_cmd
    if stance_pose is not False and stance_pose is not None:
        from quadruped_control_tpu.config import StancePoseConfig
        from quadruped_control_tpu.math.rotations import rpy_to_matrix

        if carry.pose_cmd is None:
            raise ValueError(
                "stance_pose needs carry.pose_cmd — build the carry with "
                "init_commander_carry(pose_cmd=True)")
        spc = (stance_pose if isinstance(stance_pose, StancePoseConfig)
               else StancePoseConfig())
        rate = jnp.concatenate(
            [cmd_twist[..., 3:6], cmd_twist[..., 2:3]], axis=-1)
        lo = jnp.array([-spc.roll_max, -spc.pitch_max, -spc.yaw_max,
                        spc.dz_min], dtype)
        hi = jnp.array([spc.roll_max, spc.pitch_max, spc.yaw_max,
                        spc.dz_max], dtype)
        pc = jnp.clip(carry.pose_cmd + rate * dt, lo, hi)
        new_pose_cmd = jnp.where(standing[..., None], pc, carry.pose_cmd)
        smask = standing[..., None]
        R_d = jnp.where(smask[..., None],
                        rpy_to_matrix(new_pose_cmd[..., :3]), R_d)
        x_d = jnp.where(
            smask,
            x_stand.at[..., 2].add(new_pose_cmd[..., 3]), x_d)
        # Desired rates follow the command (world ~ body at these tilts,
        # the reference's adjoint transform applied to a pure-rate twist).
        xdot_d = jnp.where(
            smask, jnp.zeros_like(xdot_d).at[..., 2].set(
                cmd_twist[..., 2]), xdot_d)
        w_d = jnp.where(
            smask, (com.R @ cmd_twist[..., 3:6, None])[..., 0], w_d)

    # 4. Gait schedule: stance until the clock runs (commander_node.cpp:369,433).
    gait_walk = gait_at_time(jnp.maximum(gait_time, 0.0), gait_cfg, dtype=dtype)
    stance_gait = make_stance_gait(batch_shape=gait_walk.phase.shape[:-1],
                                   dtype=dtype)
    gait = Gait(
        in_stance=jnp.where(wmask, gait_walk.in_stance, stance_gait.in_stance),
        phase=jnp.where(wmask, gait_walk.phase, stance_gait.phase),
    )

    # 4b. (extension, opt-in) Anticipatory weight shift: pull the walking
    #     (x, y) target toward the virtual predictive support polygon —
    #     the reference's own SupportPolygon component, computed from the
    #     measured feet and the scheduled gait (see docstring).
    if weight_shift:
        from quadruped_control_tpu.ops.trajectory import (
            support_polygon_position,
        )

        s_ph = gait_cfg.stance_phase
        pn = jnp.where(
            gait.in_stance,
            gait.phase / s_ph,
            (gait.phase - s_ph) / (1.0 - s_ph),
        )
        gait_n = Gait(in_stance=gait.in_stance, phase=pn)
        feet_w = (
            jnp.einsum("...ij,...lj->...li", com.R, feet_body)
            + com.x[..., None, :]
        )
        sig = jnp.full_like(pn, 0.25)
        p_sup = support_polygon_position(sig, sig, sig, sig, feet_w, gait_n)
        shift = weight_shift * (p_sup - x_d[..., :2])
        x_d = x_d.at[..., :2].add(jnp.where(wmask, shift, 0.0))

    # 5. Foothold planning on stance->swing edges (commander_node.cpp:436-441).
    cap = None
    if foothold_trim is not None:
        cs = getattr(foothold_trim, "capture_scale", 0.5)
        if not (isinstance(cs, float) and cs == 0.5):
            cap = cs  # boosted stepping reflex (FootholdTrimConfig)
    plan = plan_footholds(
        carry.planner.prev_in_stance, carry.planner.initialized, gait,
        gait_cfg.t_stance, com.R, com.x, com.xdot, com.w, xdot_d, feet_body,
        cfg.foot_planner,
        symmetric_velocity=xdot_d if raibert_cmd_symmetric else None,
        # symmetric_omega deliberately NOT wired to the flag: measured on
        # full physics it does NOT fix the in-place yaw-rate overshoot
        # (0.02 rad/s: 0.371 vs 0.321 rad over 8 s) and it would perturb
        # the validated fwd+back trajectories; the kwarg remains on
        # ops/foot_planner for probes.
        capture_scale=cap,
    )

    # 5b. (extension, opt-in) Foothold-level heading/station regulation —
    #     the pilot analogue (see the option docstring / FootholdTrimConfig).
    #     Acts purely on WHERE replanned footholds go; the GRF/MPC force
    #     budget and the re-anchored desired pose stay reference-exact.
    new_ref = carry.ref_pose
    if foothold_trim is not None:
        if carry.ref_pose is None:
            raise ValueError(
                "foothold_trim needs carry.ref_pose — build the carry with "
                "init_commander_carry(ref_pose=True)")
        ft = foothold_trim
        yaw_meas = jnp.arctan2(com.R[..., 1, 0], com.R[..., 0, 0])
        # Anchor the reference path to the measured pose until the gait
        # runs; from gait start it integrates the COMMANDED twist only.
        anchored = jnp.stack(
            [com.x[..., 0], com.x[..., 1], yaw_meas], axis=-1)
        ref = jnp.where(wmask, carry.ref_pose, anchored)
        rx, ry, ryaw = ref[..., 0], ref[..., 1], ref[..., 2]
        hx, hy = jnp.cos(ryaw), jnp.sin(ryaw)
        dx, dy = com.x[..., 0] - rx, com.x[..., 1] - ry
        e_ct = -hy * dx + hx * dy  # cross-track error (+ = left of path)
        v_ct = -hy * com.xdot[..., 0] + hx * com.xdot[..., 1]
        e_yaw = yaw_meas - ryaw
        e_yaw = jnp.arctan2(jnp.sin(e_yaw), jnp.cos(e_yaw))
        # Pattern rotation toward the reference heading: feet placed at the
        # CORRECTED heading pull the body's yaw back during stance.
        delta = jnp.clip(-ft.yaw_gain * e_yaw, -ft.yaw_max, ft.yaw_max)
        # Lateral shift toward the drift side: the LIP pushes the CoM away
        # from the feet, back onto the path.
        lat = jnp.clip(ft.lat_gain * e_ct + ft.lat_vel_gain * v_ct,
                       -ft.lat_max, ft.lat_max)
        # Roll-phase reflex (FootholdTrimConfig.roll_gain/_vel_gain): a
        # lateral shift along the BODY y axis from (roll, roll rate)
        # sampled at the replan edge — phased to land where it damps the
        # gait-locked roll oscillation at touchdown, which the lift-off-
        # sampled capture term cannot (measured destabilizing).
        r_g = getattr(ft, "roll_gain", 0.0)
        rv_g = getattr(ft, "roll_vel_gain", 0.0)
        roll = jnp.arctan2(com.R[..., 2, 1], com.R[..., 2, 2])
        wx_b = jnp.einsum("...i,...i->...", com.R[..., :, 0], com.w)
        lat_r = jnp.clip(r_g * roll + rv_g * wx_b,
                         -ft.roll_max, ft.roll_max)
        # body y axis projected to the ground plane
        byx, byy = com.R[..., 0, 1], com.R[..., 1, 1]
        cd, sd = jnp.cos(delta), jnp.sin(delta)
        relx = plan.footholds[..., 0] - com.x[..., 0:1]
        rely = plan.footholds[..., 1] - com.x[..., 1:2]
        fx = (com.x[..., 0:1] + cd[..., None] * relx - sd[..., None] * rely
              - (lat * hy)[..., None] + (lat_r * byx)[..., None])
        fy = (com.x[..., 1:2] + sd[..., None] * relx + cd[..., None] * rely
              + (lat * hx)[..., None] + (lat_r * byy)[..., None])
        trimmed = jnp.stack([fx, fy, jnp.zeros_like(fx)], axis=-1)
        plan = plan._replace(footholds=jnp.where(
            plan.replan[..., None], trimmed, plan.footholds))
        # Reference-pose update: slide to the along-track projection (a
        # pilot steers relative to the path — only heading and cross-track
        # persist; speed tracking is the command's job), then integrate the
        # commanded twist one tick.
        along = hx * dx + hy * dy
        vx_c, vy_c, wz_c = (cmd_twist[..., 0], cmd_twist[..., 1],
                            cmd_twist[..., 5])
        walk_ref = jnp.stack([
            rx + hx * along + dt * (hx * vx_c - hy * vy_c),
            ry + hy * along + dt * (hy * vx_c + hx * vy_c),
            ryaw + dt * wz_c,
        ], axis=-1)
        new_ref = jnp.where(wmask, walk_ref, anchored)

    # 6. Swing trajectory replan: p_start = world-frame current foot
    #    (commander_node.cpp:451-461).
    p_start = (
        jnp.einsum("...ij,...lj->...li", com.R, feet_body) + com.x[..., None, :]
    )
    p_plan = p_start
    if swing_start_ground:
        # (extension, opt-in) Swing-lag ratchet instrument (round 5): on a
        # LATE touchdown the scheduled lift-off catches the foot still in
        # the air, and the reference's plan-from-measured-foot rule
        # (commander_node.cpp:451-461) then lifts the entire new sextic by
        # the leftover height — the swing reference's z creeps cycle over
        # cycle (the measured secular zgap ratchet that trips 0.4 m/s
        # forward and sustained reverse, PARITY.md "Swing-lag ratchet").
        # Planning from the ground-projected start re-anchors every swing
        # to the terrain; the tracked reference still starts at the foot's
        # measured (x, y).
        p_plan = p_plan.at[..., 2].set(jnp.minimum(p_plan[..., 2], 0.0))
    traj = plan_swing_trajectories(
        carry.planner.traj, p_plan, plan.footholds, plan.replan, gait_cfg
    )

    # 7. Swing-leg joint references (commander_node.cpp:482-500).
    foot_ref = reference_foot_states(traj, gait, gait_cfg)
    # World -> body transform with the reference's exact quirk:
    # p_b = R^T p_w - x (commander_node.cpp:491, NOT R^T (p - x)).
    if body_frame_exact:
        # (extension, opt-in) The exact transform p_b = R^T (p_w - x).
        # The preserved quirk's error is (R^T - I) x — it GROWS WITH
        # DISTANCE TRAVELED: with the trot's small pitch bias theta the
        # swing IK z-target is off by ~ -theta * x_x, i.e. ~4 cm after
        # 2 m, which is the measured secular swing-foot zgap ratchet
        # that fells sustained reverse at ~10 s / ~2 m and 0.4 m/s
        # forward at ~7.7 s / ~3 m (round-5 labs: heading servo, swing
        # velocity ff, contact gating and accel ff all left the creep
        # slope unchanged — it is not a tracking problem, the TARGET
        # drifts). The reference never walks far from the origin in its
        # demos (short piloted bursts, Drake resets), so the quirk never
        # binds there; at range it is the dominant instability.
        p_ref_body = jnp.einsum(
            "...ji,...lj->...li", com.R,
            foot_ref.position - com.x[..., None, :])
    else:
        p_ref_body = (
            jnp.einsum("...ji,...lj->...li", com.R, foot_ref.position)
            - com.x[..., None, :]
        )
    v_ref_body = jnp.einsum("...ji,...lj->...li", com.R, foot_ref.velocity)
    if swing_vel_rescale is not None and swing_vel_rescale is not False:
        # Physical-units velocity feedforward (opt-in; round-5 instrument
        # for the swing-lag ratchet). The reference tracks the sextic in
        # NORMALIZED time and feeds sdot(t), t in [0, 1], straight into
        # the joint PD as a velocity reference (trajectory.cpp:239-254,
        # joint_controller.cpp:21-39) — a quirk we preserve by default.
        # Real foot velocity is dp/dt = sdot * dt_norm/dt = sdot/t_swing
        # (~5.6x at the reference gait), so the default qdot_ref is ~18%
        # of the true value and the kd term BRAKES the swing leg mid-
        # flight: measured on full physics, the swing foot lags its
        # descending reference by a per-cycle-growing zgap that ends in a
        # trip -> windmill at 0.4 m/s forward and in sustained reverse
        # (PARITY.md "Swing-lag ratchet"). True = the full physical
        # 1/t_swing; a float or per-instance array = explicit multiplier
        # (measured: the full scale overdrives the 0.2 m/s touchdowns on
        # the light URDF legs while fixing 0.3-0.4 — the demo operating
        # points pin tuned values).
        if swing_vel_rescale is True:
            v_ref_body = v_ref_body / gait_cfg.t_swing
        else:
            scale = jnp.asarray(swing_vel_rescale, dtype)
            v_ref_body = v_ref_body * scale[..., None, None]
    q_ref = inverse_kinematics(p_ref_body, kin)
    jinv = leg_jacobian_inverse(q_ref, kin)
    qdot_ref = (jinv @ v_ref_body[..., None])[..., 0]
    tau_ff_inertia = None
    if swing_accel_ff:
        # Model-based swing inertia feedforward (round-5 instrument for
        # the swing-lag ratchet): tau_ff = D(q) qddot_ref with D the
        # fixed-base per-leg mass matrix (sim.dynamics.leg_mass_matrices,
        # passed in by the rollout layer like gravity_comp_tau) and
        # qddot_ref = Jinv a_ref from the sextic's second derivative in
        # PHYSICAL time (1/t_swing^2 — no reference quirk to preserve:
        # the reference's own acceleration-reference code is commented
        # out, trajectory.cpp:246-251). Zero at lift-off/touchdown by the
        # sextic's boundary conditions.
        if swing_mass is None:
            raise ValueError(
                "swing_accel_ff needs swing_mass — pass "
                "sim.dynamics.leg_mass_matrices(model, joints.q)")
        from quadruped_control_tpu.ops.trajectory import (
            sextic_accel,
            swing_time_of_phase,
        )

        t_n = swing_time_of_phase(gait.phase, gait_cfg)
        a_norm = sextic_accel(traj.coeffs, t_n)
        a_w = jnp.where(traj.valid[..., None], a_norm, 0.0) / (
            gait_cfg.t_swing ** 2)
        a_body = jnp.einsum("...ji,...lj->...li", com.R, a_w)
        qdd_ref = (jinv @ a_body[..., None])[..., 0]
        tau_ff_inertia = (swing_mass @ qdd_ref[..., None])[..., 0]

    # 7b. (extension, opt-in) Contact-aware stance gating: scheduled-stance
    #     feet still above the ground are withheld from the GRF QP and keep
    #     swing-PD tracking toward their planned foothold (see docstring).
    eff_stance = gait.in_stance
    if contact_gate:
        from quadruped_control_tpu.ops.trajectory import sextic_track

        grounded = p_start[..., 2] < contact_gate
        eff_stance = jnp.logical_and(gait.in_stance, grounded)
        end_state = sextic_track(traj.coeffs, jnp.ones_like(gait.phase))
        end_pos = jnp.where(traj.valid[..., None], end_state.position,
                            p_start)
        if body_frame_exact:
            p_end_body = jnp.einsum("...ji,...lj->...li", com.R,
                                    end_pos - com.x[..., None, :])
        else:
            p_end_body = (
                jnp.einsum("...ji,...lj->...li", com.R, end_pos)
                - com.x[..., None, :]
            )
        q_end = inverse_kinematics(p_end_body, kin)
        gated = jnp.logical_and(gait.in_stance, ~grounded)
        q_ref = jnp.where(gated[..., None], q_end, q_ref)
        qdot_ref = jnp.where(gated[..., None], 0.0, qdot_ref)

    # 8. Swing PD torques (commander_node.cpp:503-504).
    tau_swing = joint_pd_control(q_ref, qdot_ref, joints.q, joints.qdot,
                                 cfg.joint_control)
    if tau_ff_inertia is not None:
        tau_swing = tau_swing + tau_ff_inertia

    return CommanderPrecursors(
        feet_body=feet_body, standing=standing, gait_time=gait_time,
        walking=walking, gait=gait, eff_stance=eff_stance, R_d=R_d, x_d=x_d,
        xdot_d=xdot_d, w_d=w_d, plan=plan, traj=traj, foot_ref=foot_ref,
        q_ref=q_ref, qdot_ref=qdot_ref, tau_swing=tau_swing,
        p_start=p_start, ref_pose=new_ref, pose_cmd=new_pose_cmd,
    )


def mpc_precursors(com: ComState, gait_time, walking, eff_stance,
                   cmd_twist, cfg: ControlConfig, mpc_horizon: int,
                   mpc_dt: float, contact_gate: float = 0.0,
                   yaw_d=None):
    """MPC input assembly shared by commander_step's ``controller="mpc"``
    branch and the fused-tick parity tests (the XLA twin of the
    commander-pre kernel's MPC precursor block,
    control/pallas_commander.mpc_block_size layout).

    Returns (xi0, xi_ref, yaw, stance_sched):
      xi0: (..., 13) [rpy, x, w_world, xdot_world, 1] SRB-MPC state;
      xi_ref: (..., N, 13) constant-twist reference
        (mpc/horizon.make_reference_trajectory);
      stance_sched: (..., N, 4) contact schedule sampled from the SAME
        gait clock that produced this tick's stance mask (step 0 equals
        gait.in_stance when walking); all-stance until the clock runs.
        With contact gating, step 0 carries the measured-contact gate;
        later steps stay clock-scheduled (the foot will have landed).
    """
    from quadruped_control_tpu.math.rotations import matrix_to_rpy
    from quadruped_control_tpu.mpc.horizon import make_reference_trajectory

    dtype = com.x.dtype
    rpy = matrix_to_rpy(com.R)
    ones = jnp.ones(com.x.shape[:-1] + (1,), dtype=dtype)
    xi0 = jnp.concatenate([rpy, com.x, com.w, com.xdot, ones], axis=-1)

    t0 = jnp.maximum(gait_time, 0.0)
    t_hor = t0[..., None] + mpc_dt * jnp.arange(mpc_horizon, dtype=dtype)
    gait_hor = gait_at_time(t_hor, cfg.gait, dtype=dtype)
    stance_sched = jnp.where(walking[..., None, None],
                             gait_hor.in_stance, True)
    if contact_gate:
        stance_sched = stance_sched.at[..., 0, :].set(
            stance_sched[..., 0, :] & eff_stance)

    # Constant-twist reference from the command (zero twist -> hold the
    # current (x, y, yaw) and drive to the stand height: the stand_up
    # path's MPC analogue).
    cmd_eff = jnp.where(walking[..., None], cmd_twist, 0.0)
    xi_seed = xi0
    if yaw_d is not None:
        # Absolute-heading servo (FootholdTrimConfig.heading_lead): seed
        # the reference trajectory's yaw from the SERVOED desired yaw
        # instead of the measured yaw, so the MPC's yaw-weight channel
        # pulls toward the carried reference heading rather than
        # re-anchoring every tick (the reason commanded wz was absorbed /
        # overshot: the cost never saw a persistent yaw error). The
        # DYNAMICS linearization stays at the measured xi0.
        xi_seed = xi0.at[..., 2].set(
            jnp.where(walking, yaw_d, xi0[..., 2]))
    xi_ref = make_reference_trajectory(xi_seed, cmd_eff, mpc_horizon,
                                       mpc_dt,
                                       target_height=cfg.stand.height)
    return xi0, xi_ref, rpy[..., 2], stance_sched


def commander_step(com: ComState, joints: JointState, carry: CommanderCarry,
                   cmd_twist, dt, cfg: ControlConfig,
                   qp_iterations: int = 15, qp_polish: bool = True,
                   qp_warm_start: bool = False, qp_backend: str = "jnp",
                   controller: str = "balance", mpc_horizon: int = 8,
                   mpc_dt: float = 0.05, mpc_iterations: int = 25,
                   mpc_backend: str = "structured", forces_override=None,
                   mpc_state_weights=None, weight_shift: float = 0.0,
                   contact_gate: float = 0.0,
                   raibert_cmd_symmetric: bool = False,
                   heading_hold: bool = False,
                   foothold_trim=None,
                   swing_vel_rescale: bool = False,
                   swing_accel_ff: bool = False,
                   swing_mass=None,
                   stance_pose=False,
                   swing_start_ground: bool = False,
                   body_frame_exact: bool = False,
                   gravity_comp_tau=None):
    """One control tick. All arguments broadcast over leading batch dims.

    Args:
      com: CoM state (world frame).
      joints: per-leg joint states.
      carry: carried controller state.
      cmd_twist: (..., 6) commanded body twist (cmd_vel).
      dt: control period (1 / cfg.frequency).
      qp_backend: "jnp" (any batch, supports warm start) or "fused" (the
        single-pallas_call assembly+solve kernel, solver/pallas_fused.py —
        the fast path for large rollout sweeps; pads to its tile multiple,
        so use it when the batch is ~1024+).
      controller: "balance" — the reference's single-step GRF QP
        (balance_controller.cpp:98-235); "mpc" — receding-horizon convex
        SRB MPC (Di Carlo et al. 2018, mpc/): the stance GRFs come from
        f_0 of the horizon solve over the gait's scheduled contacts; the
        swing pipeline (footholds, sextic tracking, IK, PD) is identical.
      mpc_horizon / mpc_dt / mpc_iterations: horizon length N (static), MPC
        step (>= control dt; the schedule is sampled from the gait clock),
        and IPM iteration count for controller="mpc".
      mpc_backend: "condensed" (mpc/horizon, dense stacked QP),
        "structured" (O(N) Riccati IPM, any batch), or "riccati-pallas"
        (mpc/pallas_riccati single-kernel path; batch must be a multiple
        of 1024).
      mpc_state_weights: optional (13,) MPC state-cost diagonal — a traced
        array for the condensed/structured backends (differentiable: tune
        the MPC cost through rollout gradients); ignored by riccati-pallas
        (kernel weights are compile-time constants).
      forces_override: optional (..., 12) world-frame GRFs — skip the
        stance-force solve entirely and apply these (zero-order hold for
        MPC decimation: the reference-class MPC runs at 25-50 Hz while the
        loop ticks at 100-300 Hz; rollout_mpc_decimated uses this). The
        swing pipeline (footholds, trajectories, IK, PD) still runs.
      weight_shift / contact_gate / raibert_cmd_symmetric / heading_hold /
        foothold_trim: opt-in extensions, documented on
        :func:`commander_precursors`.
      gravity_comp_tau: optional (..., 4, 3) leg gravity torques to add to
        the commanded torques (stance AND swing) before clamping — e.g.
        ``sim.dynamics.leg_gravity_torques(model, joints.q, com.R)``. The
        reference's tau = J^T f realizes the commanded GRF only for
        massless legs; with real link masses every foot force carries the
        leg's own weight as a ~2-3 N bias and the swing PD droops under
        gravity. None = reference behavior.
    Returns:
      (CommanderOutput, CommanderCarry).
    """
    dtype = com.x.dtype
    kin = cfg.kinematics
    gait_cfg = cfg.gait

    pre = commander_precursors(
        com, joints, carry, cmd_twist, dt, cfg, weight_shift=weight_shift,
        contact_gate=contact_gate,
        raibert_cmd_symmetric=raibert_cmd_symmetric,
        heading_hold=heading_hold,
        foothold_trim=foothold_trim,
        swing_vel_rescale=swing_vel_rescale,
        swing_accel_ff=swing_accel_ff,
        swing_mass=swing_mass,
        stance_pose=stance_pose,
        swing_start_ground=swing_start_ground,
        body_frame_exact=body_frame_exact,
    )
    feet_body = pre.feet_body
    standing, gait_time, walking = pre.standing, pre.gait_time, pre.walking
    gait, eff_stance = pre.gait, pre.eff_stance
    R_d, x_d, xdot_d, w_d = pre.R_d, pre.x_d, pre.xdot_d, pre.w_d
    plan, traj, foot_ref = pre.plan, pre.traj, pre.foot_ref
    q_ref, tau_swing, p_start = pre.q_ref, pre.tau_swing, pre.p_start
    wmask = walking[..., None]

    # 9. Stance-force controller: single-step balance QP (the reference's
    #    hot path, commander_node.cpp:507-508) or receding-horizon MPC.
    forces_horizon = None
    if forces_override is not None:
        sol = IPMSolution(
            x=jnp.broadcast_to(forces_override,
                               com.x.shape[:-1] + (12,)).astype(dtype),
            z=carry.qp_z, s=carry.qp_s, iterations=jnp.asarray(0),
            gap=jnp.zeros(com.x.shape[:-1], dtype),
            primal_residual=jnp.zeros(com.x.shape[:-1], dtype),
            dual_residual=jnp.zeros(com.x.shape[:-1], dtype),
            converged=jnp.ones(com.x.shape[:-1], bool),
        )
    elif controller == "mpc":
        from quadruped_control_tpu.mpc.horizon import solve_mpc

        hl_mpc = (getattr(foothold_trim, "heading_lead", 0.0)
                  if foothold_trim is not None else 0.0)
        yaw_d_mpc = None
        if not (isinstance(hl_mpc, float) and hl_mpc == 0.0):
            # The servoed desired yaw computed in commander_precursors
            # (heading_lead block) — R_d is a pure-z rotation there.
            yaw_d_mpc = jnp.arctan2(R_d[..., 1, 0], R_d[..., 0, 0])
        xi0, xi_ref, yaw, stance_sched = mpc_precursors(
            com, gait_time, walking, eff_stance, cmd_twist, cfg,
            mpc_horizon, mpc_dt, contact_gate=contact_gate,
            yaw_d=yaw_d_mpc)
        if mpc_backend == "riccati-pallas":
            from quadruped_control_tpu.mpc.pallas_riccati import (
                solve_mpc_fused,
            )

            F, sol = solve_mpc_fused(
                xi0, xi_ref, yaw, p_start, com.x, stance_sched,
                mpc_horizon, mpc_dt, cfg, iterations=mpc_iterations)
        elif mpc_backend == "structured":
            from quadruped_control_tpu.mpc.structured import (
                solve_mpc_structured,
            )

            F, sol = solve_mpc_structured(
                xi0, xi_ref, yaw, p_start, com.x, stance_sched,
                mpc_horizon, mpc_dt, cfg, iterations=mpc_iterations,
                state_weights=mpc_state_weights)
        else:
            F, sol = solve_mpc(
                xi0, xi_ref, yaw, p_start, com.x, stance_sched,
                mpc_horizon, mpc_dt, cfg, iterations=mpc_iterations,
                state_weights=mpc_state_weights)
        sol = sol._replace(
            x=F[..., 0, :],
            s=jnp.broadcast_to(carry.qp_s, carry.qp_s.shape),
            z=jnp.broadcast_to(carry.qp_z, carry.qp_z.shape),
        )
        forces_horizon = F
    elif qp_backend == "fused":
        from quadruped_control_tpu.solver.pallas_fused import (
            solve_balance_qp_fused,
        )

        # Tile height from the (static) batch size: taller tiles hide VPU
        # latency but pad small batches to rows*128.
        n_inst = 1
        for d in com.x.shape[:-1]:
            n_inst *= int(d)
        rows = 16 if n_inst >= 2048 else 8
        sol = solve_balance_qp_fused(
            com.R, R_d, com.x, com.xdot, com.w, x_d, xdot_d, w_d, feet_body,
            eff_stance, cfg.balance, iterations=qp_iterations,
            polish=qp_polish, rows=rows,
        )
    else:
        qp = dyn.build_balance_qp(
            com.R, R_d, com.x, com.xdot, com.w, x_d, xdot_d, w_d, feet_body,
            eff_stance, cfg.balance,
        )
        # Warm-starting across ticks (qpOASES-hotstart analogue) is opt-in.
        # Transition-aware reset: a leg that flipped stance<->swing since
        # the previous tick has its 6 cone rows' carried (s, z) on the wrong
        # side of the new bounds; those rows cold-start while the unchanged
        # rows keep the hotstart economics.
        warm = reset = None
        if qp_warm_start:
            warm = (carry.qp_x, carry.qp_s, carry.qp_z)
            stance_changed = (
                gait.in_stance != carry.planner.prev_in_stance
            ) | ~carry.planner.initialized[..., None]
            reset = jnp.repeat(stance_changed, 6, axis=-1)
        sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=qp_iterations,
                           polish=qp_polish, tol=3e-5, warm_start=warm,
                           warm_reset_mask=reset)
    forces_body = dyn.forces_to_body_frame(sol.x, com.R, eff_stance)

    # 10. Stance torques tau = J^T f; merge by stance mask; clamp
    #     (commander_node.cpp:511-531).
    tau_stance = jacobian_transpose_control(joints.q, forces_body, kin)
    tau = jnp.where(eff_stance[..., None], tau_stance, tau_swing)
    if gravity_comp_tau is not None:
        tau = tau + gravity_comp_tau
    tau = jnp.clip(tau, cfg.balance.torque_min, cfg.balance.torque_max)

    new_carry = CommanderCarry(
        standing=standing,
        gait_time=gait_time,
        planner=PlannerState(
            prev_in_stance=plan.prev_in_stance,
            initialized=plan.initialized,
            traj=traj,
        ),
        qp_x=sol.x,
        qp_s=sol.s,
        qp_z=sol.z,
        ref_pose=pre.ref_pose,
        pose_cmd=pre.pose_cmd,
    )
    out = CommanderOutput(
        torques=tau,
        forces_body=forces_body,
        forces_world=sol.x,
        gait=gait,
        foot_refs_world=foot_ref.position,
        swing_q_ref=q_ref,
        qp_converged=sol.converged,
        forces_horizon=forces_horizon,
    )
    return out, new_carry
