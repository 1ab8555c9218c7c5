"""Fused Pallas kernel: the commander tick's pre-QP stage.

The XLA commander (control/commander.py, reference commander_node.cpp
call stack SURVEY.md §3.1 steps 1-8) is ~200 tiny batched ops — FK einsums,
gait-phase mod arithmetic, Raibert planning, sextic matmuls, IK arctangents,
PD — that cost more wall-clock at closed-loop batch sizes than the fused QP
kernel they feed (measured ~0.3 ms vs ~0.12 ms per tick at batch 1024).
This kernel runs ALL of it as one ``pallas_call`` in the same
(rows, 128)-lane-per-instance layout as solver/pallas_fused.py and
sim/pallas_substep.py, emitting exactly the packed tensors the fused QP
kernel consumes (stance-masked world foot levers ``r``, SRB rhs ``b``,
stance mask, cone parameters) plus the swing-leg PD torques and the updated
controller carry — so a whole-body closed-loop tick becomes three kernel
dispatches (commander-pre -> QP -> substeps) with zero XLA glue between
them (see sim/pallas_tick.py).

Mosaic has no atan/atan2/asin primitives; the IK arctangents, the yaw
extraction, and the so3_log angle use math/symlane.atan2 (polynomial,
max abs error 1.6e-10 — exact to f32).

Parity: reproduces control/commander.commander_precursors step for step,
including the reference quirks (world->body ``R^T p - x`` transform,
commander_node.cpp:491; the kff index-1 yaw feedforward typo,
balance_controller.cpp:137-139; the inclusive stance boundary,
gait.cpp:127). Validated in float64 interpret mode and on-device f32 by
tests/test_pallas_tick.py.

Unsupported (assertion-guarded): ``weight_shift`` (needs erf — opt-in
extension, measured trot no-op). ``contact_gate`` and
``raibert_cmd_symmetric`` ARE supported as compile-time options, and
``mpc_horizon > 0`` makes the kernel additionally emit the packed MPC
precursor block (xi0, levers, the N-step stance schedule sampled in-kernel
from the gait clock, the constant-twist reference) that chains straight
into mpc/pallas_riccati's packed entry — the fused-tick MPC path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from quadruped_control_tpu.config import GRAVITY, ControlConfig
from quadruped_control_tpu.math import symlane as sl
from quadruped_control_tpu.math.symlane import (
    _add,
    _adj3_sym,
    _conc,
    _cross,
    _cst,
    _m3mul,
    _m3T,
    _matTvec,
    _matvec,
    _mul,
    _neg,
    _neg3,
    _smul,
    _vadd,
    _vsmul,
)
from quadruped_control_tpu.ops.trajectory import _A_INV

LANE = 128

# Packed component layouts (k axis of (nb, k, rows, LANE) tiles).
# State comps match sim/pallas_substep: R 0:9 | x 9:12 | u 12:30 | q 30:42.
N_STATE_USED = 42
# Carry comps:
#   0 standing | 1 gait_time | 2:6 prev_in_stance | 6 initialized
#   7:91 traj coeffs [leg*21 + k*3 + axis] | 91:95 traj valid
N_CARRY = 95
C_STANDING, C_GAIT_TIME, C_PREV, C_INIT, C_COEF, C_VALID = 0, 1, 2, 6, 7, 91
N_CMD = 6


def _so3_exp_sym(aa, zero):
    """Rodrigues with math/rotations.so3_exp's exact branch semantics
    (Taylor series below 1e-8) on concrete tiles. Returns a 3x3 list."""
    t2 = aa[0] * aa[0] + aa[1] * aa[1] + aa[2] * aa[2]
    theta = jnp.sqrt(t2)
    taylor = theta < 1e-8
    safe_t2 = jnp.where(taylor, t2 * 0.0 + 1.0, t2)
    a = jnp.where(taylor, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.sqrt(safe_t2))
    b = jnp.where(taylor, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    K = [[zero, -aa[2], aa[1]], [aa[2], zero, -aa[0]], [-aa[1], aa[0], zero]]
    R = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            k2 = zero
            for m in range(3):
                k2 = k2 + K[i][m] * K[m][j]
            v = a * K[i][j] + b * k2
            if i == j:
                v = v + 1.0
            R[i][j] = v
    return R


def _so3_log_sym(E, zero):
    """math/rotations.so3_log on a concrete 3x3 tile matrix: all three
    regimes (small / generic / near pi) as masked dataflow."""
    tr = E[0][0] + E[1][1] + E[2][2]
    cos_t = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    # unskew(E - E^T) = 2 sin(theta) * axis.
    ws = (E[2][1] - E[1][2], E[0][2] - E[2][0], E[1][0] - E[0][1])
    sin_t = 0.5 * jnp.sqrt(ws[0] * ws[0] + ws[1] * ws[1] + ws[2] * ws[2])
    theta = sl.atan2(sin_t, cos_t)

    small = theta < 1e-7
    near_pi = theta > np.pi - 1e-2
    gen_scale = jnp.where(
        small, 0.5 * (1.0 + theta * theta / 6.0),
        0.5 * theta / jnp.where(small | near_pi, sin_t * 0.0 + 1.0, sin_t),
    )
    w_gen = tuple(ws[i] * gen_scale for i in range(3))

    # Near pi: dominant column of B = (R + R^T)/2 + (1 - tr)/2 * I.
    B = [[0.5 * (E[i][j] + E[j][i]) for j in range(3)] for i in range(3)]
    add = 0.5 * (1.0 - tr)
    for i in range(3):
        B[i][i] = B[i][i] + add
    d0, d1, d2 = B[0][0], B[1][1], B[2][2]
    pick0 = (d0 >= d1) & (d0 >= d2)  # jnp.argmax first-max tie-breaking
    pick1 = (~pick0) & (d1 >= d2)
    axis = tuple(
        jnp.where(pick0, B[i][0], jnp.where(pick1, B[i][1], B[i][2]))
        for i in range(3)
    )
    norm = jnp.maximum(
        jnp.sqrt(axis[0] * axis[0] + axis[1] * axis[1] + axis[2] * axis[2]),
        zero + 1e-12,
    )
    axis = tuple(axis[i] / norm for i in range(3))
    dot_ws = axis[0] * ws[0] + axis[1] * ws[1] + axis[2] * ws[2]
    sgn_theta = jnp.where(dot_ws < 0.0, -theta, theta)
    w_pi = tuple(axis[i] * sgn_theta for i in range(3))

    return tuple(jnp.where(near_pi, w_pi[i], w_gen[i]) for i in range(3))


class CommanderConsts:
    """Python-float snapshot of everything the kernel bakes in."""

    def __init__(self, cfg: ControlConfig, dt: float):
        kin = cfg.kinematics
        self.hips = kin.hip_offsets_np()
        self.l1s = [float(v) for v in kin.l1_signed_np()]
        self.l1 = float(kin.l1)
        self.l2 = float(kin.l2)
        self.l3 = float(kin.l3)
        self.sl2 = -float(kin.l2)
        self.sl3 = -float(kin.l3)
        self.left = [1.0, 1.0, -1.0, -1.0]  # ops/kinematics._LEFT_SIGN

        self.dt = float(dt)
        self.dt_cmd = float(cfg.cmd_integration_dt)
        self.stand_h = float(cfg.stand.height)
        self.stand_tol = float(cfg.stand.height_tolerance)

        g = cfg.gait
        self.period = float(g.period)
        self.stance_phase = float(g.stance_phase)
        self.stance_thresh = float(g.stance_phase) + 1e-12  # ops/gait eps
        self.t_stance = float(g.t_stance)
        self.swing_height = float(g.swing_height)
        self.offsets = [float(v) for v in g.offsets]
        self.slope = 1.0 / (1.0 - float(g.stance_phase))
        self.intercept = 1.0 - self.slope

        fp = cfg.foot_planner
        self.fp_hips = fp.hip_offsets_np()
        self.fp_k = float(fp.k)
        self.fp_g = float(fp.gravity)

        jc = cfg.joint_control
        self.kp_j = [float(v) for v in jc.kp]
        self.kd_j = [float(v) for v in jc.kd]
        self.kff_j = [float(v) for v in jc.kff]

        bal = cfg.balance
        self.mass = float(bal.mass)
        self.inertia = [float(v) for v in bal.inertia_diag]
        self.kp_p = [float(v) for v in bal.kp_p]
        self.kd_p = [float(v) for v in bal.kd_p]
        self.kp_w = [float(v) for v in bal.kp_w]
        self.kd_w = [float(v) for v in bal.kd_w]
        self.kff = [float(v) for v in bal.kff]
        self.gravity_z = float(bal.gravity_z_term)
        self.mu = float(bal.mu)
        self.fz_min = float(bal.fz_min)
        self.fz_max = float(bal.fz_max)
        self.tau_min = float(bal.torque_min)
        self.tau_max = float(bal.torque_max)

        self.a_inv = np.asarray(_A_INV)  # (7, 7); only cols 0:3 used


def _fk_sym(c: CommanderConsts, sin, cos):
    """Per-leg FK + the world-frame-ready trig products. Returns
    (feet_body list of 4 3-tuples, per-leg (s23, c23, zl))."""
    feet = []
    trig = []
    for leg in range(4):
        s1, c1 = sin[leg * 3], cos[leg * 3]
        s2, c2 = sin[leg * 3 + 1], cos[leg * 3 + 1]
        s3, c3 = sin[leg * 3 + 2], cos[leg * 3 + 2]
        s23 = _add(_mul(s2, c3), _mul(c2, s3))
        c23 = _add(_mul(c2, c3), _neg(_mul(s2, s3)))
        L1 = c.l1s[leg]
        hx, hy, hz = (float(c.hips[leg, 0]), float(c.hips[leg, 1]),
                      float(c.hips[leg, 2]))
        zl = _add(_smul(c.sl2, c2), _smul(c.sl3, c23))
        px = _add(_smul(c.sl2, s2), _smul(c.sl3, s23), _cst(hx))
        py = _add(_smul(L1, c1), _neg(_mul(s1, zl)), _cst(hy))
        pz = _add(_smul(L1, s1), _mul(c1, zl), _cst(hz))
        feet.append((px, py, pz))
        trig.append((s23, c23, zl))
    return feet, trig


def _jacobian_sym(c: CommanderConsts, leg, s1, c1, s2, c2, s23, c23):
    """Leg Jacobian rows (ops/kinematics.leg_jacobian) in symbolic form."""
    L1, sl2, sl3 = c.l1s[leg], c.sl2, c.sl3
    zl = _add(_smul(sl2, c2), _smul(sl3, c23))
    xl = _add(_smul(sl2, s2), _smul(sl3, s23))
    j01 = zl
    j02 = _smul(sl3, c23)
    j10 = _add(_smul(-L1, s1), _neg(_mul(c1, zl)))
    j11 = _mul(xl, s1)
    j12 = _mul(_smul(sl3, s23), s1)
    j20 = _add(_smul(L1, c1), _neg(_mul(s1, zl)))
    j21 = _neg(_mul(xl, c1))
    j22 = _neg(_mul(_smul(sl3, s23), c1))
    return ((None, j01, j02), (j10, j11, j12), (j20, j21, j22))


def _ik_sym(c: CommanderConsts, leg, p, zero):
    """Analytic leg IK (ops/kinematics.inverse_kinematics) for one leg on
    concrete tiles. ``p`` is the hip-relative target 3-tuple. Returns
    (q0, q1, q2) plus (sin2v, cos2v) of q2 for the Jacobian-inverse step."""
    x, y, z = p
    l1, l2, l3 = c.l1, c.l2, c.l3
    d = (x * x + y * y + z * z - (l1 * l1 + l2 * l2 + l3 * l3)) \
        / (2.0 * l2 * l3)
    d = jnp.clip(d, -1.0, 1.0)
    root = jnp.sqrt(jnp.maximum(y * y + z * z - l1 * l1, zero))
    neg_l1 = zero - l1
    if c.left[leg] > 0:
        q0 = -(sl.atan2(z, -y) + sl.atan2(root, neg_l1))
    else:
        q0 = sl.atan2(z, y) + sl.atan2(root, neg_l1)
    s2v = -jnp.sqrt(jnp.maximum(1.0 - d * d, zero))
    q2 = sl.atan2(s2v, d)
    q1 = -sl.atan2(x, root) - sl.atan2(l3 * s2v, l2 + l3 * d)
    return q0, q1, q2


_TWO_PI = 2.0 * np.pi


def _wrap_2pi(a):
    w = a - jnp.floor(a / _TWO_PI) * _TWO_PI
    return jnp.where(w < 0.0, w + _TWO_PI, w)


def _wrap_pi(a):
    shifted = a + np.pi
    w = shifted - jnp.floor(shifted / _TWO_PI) * _TWO_PI
    w = jnp.where(w < 0.0, w + _TWO_PI, w)
    return w - np.pi


def mpc_block_size(horizon: int) -> int:
    """Comps of the packed MPC-precursor block: xi0 (13) | levers (12) |
    stance schedule (4*N, t-major) | xi_ref (13*N, t-major)."""
    return 25 + 17 * horizon


def commander_pre_sym(c: CommanderConsts, load_state, load_carry, load_cmd,
                      *, contact_gate: float = 0.0,
                      raibert_cmd_symmetric: bool = False,
                      mpc_horizon: int = 0, mpc_dt: float = 0.0):
    """The tile-level commander-pre computation.

    Args:
      c: baked constants.
      load_state / load_carry / load_cmd: index -> tile callables.
    Returns:
      dict with r (12), b (6), st (4, f32 0/1), tau_swing (12),
      carry (N_CARRY), plus q_ref (12) for tests.
    """
    R = [load_state(i) for i in range(9)]
    Rm = (R[0:3], R[3:6], R[6:9])
    x = tuple(load_state(9 + i) for i in range(3))
    u = [load_state(12 + i) for i in range(18)]
    q = [load_state(30 + i) for i in range(12)]
    w_b, v_b, qd = u[0:3], u[3:6], u[6:18]
    zero = x[0] * 0.0
    one = zero + 1.0

    cmd = [load_cmd(i) for i in range(6)]
    standing0 = load_carry(C_STANDING)
    gait_time0 = load_carry(C_GAIT_TIME)
    prev_st = [load_carry(C_PREV + l) for l in range(4)]
    initialized = load_carry(C_INIT)
    coef0 = [[[load_carry(C_COEF + leg * 21 + k * 3 + ax) for ax in range(3)]
              for k in range(7)] for leg in range(4)]
    valid0 = [load_carry(C_VALID + l) for l in range(4)]

    # Measurement (sim/plant.whole_body_com_state): world twist.
    w_w = _matvec(Rm, w_b)
    xdot_w = _matvec(Rm, v_b)

    # 1. FK (commander_node.cpp:383-384).
    sin = [jnp.sin(q[i]) for i in range(12)]
    cos = [jnp.cos(q[i]) for i in range(12)]
    feet_body, _ = _fk_sym(c, sin, cos)
    feet_body = [tuple(_conc(v, zero) for v in f) for f in feet_body]

    # 2. Standing latch + gait clock (commander_node.cpp:387-391, 474-478).
    near = jnp.abs(x[2] - c.stand_h) < c.stand_tol
    standing = jnp.maximum(standing0, jnp.where(near, one, zero))
    running = gait_time0 >= 0.0
    gait_time = jnp.where(
        running, gait_time0 + c.dt,
        jnp.where(standing > 0.5, zero, gait_time0),
    )
    walking = gait_time >= 0.0

    # 3. Desired pose: integrate_twist_yaw (trajectory.cpp:29-69) under the
    #    walking mask, stand target otherwise.
    aa = tuple(cmd[3 + i] * c.dt_cmd for i in range(3))
    Rbbp = _so3_exp_sym(aa, zero)
    v_dt = tuple(cmd[i] * c.dt_cmd for i in range(3))
    tbbp = _matvec(Rbbp, v_dt)
    yaw = sl.atan2(R[3], R[0])  # atan2(R10, R00)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    Rz = [[cy, -sy, None], [sy, cy, None], [None, None, 1.0]]
    Rdw = _m3mul(Rz, Rbbp)
    xdw = _vadd(_matvec(Rz, tbbp), x)

    # Vw = Ad(Twb) @ cmd with the reference's inverse-adjoint quirk
    # (rigid3d.cpp:259-271): lin = R^T (v - x x w), ang = R^T w.
    w_cmd = (cmd[3], cmd[4], cmd[5])
    delta = _vadd((cmd[0], cmd[1], cmd[2]), _neg3(_cross(x, w_cmd)))
    Vw_lin = _matTvec(Rm, delta)
    Vw_ang = _matTvec(Rm, w_cmd)

    eyec = [[1.0 if i == j else None for j in range(3)] for i in range(3)]
    R_d = [[jnp.where(walking, _conc(Rdw[i][j], zero),
                      _conc(eyec[i][j], zero))
            for j in range(3)] for i in range(3)]
    x_d = (
        jnp.where(walking, xdw[0], zero),
        jnp.where(walking, xdw[1], zero),
        zero + c.stand_h,  # height pinned in BOTH branches (:354, :407)
    )
    xdot_d = tuple(jnp.where(walking, _conc(Vw_lin[i], zero), zero)
                   for i in range(3))
    w_d = tuple(jnp.where(walking, _conc(Vw_ang[i], zero), zero)
                for i in range(3))

    # 4. Gait schedule (ops/gait.gait_at_time under the walking mask).
    t_gait = jnp.maximum(gait_time, zero)
    in_stance, phase = [], []
    for leg in range(4):
        ph = c.offsets[leg] + t_gait * (1.0 / c.period)
        ph = ph - jnp.floor(ph)
        # Mask algebra, not select: Mosaic cannot lower select_n to an i1
        # vector (bool-VALUED selects fail to compile; bool conditions are
        # fine). stance = walking ? (ph <= thresh) : True.
        in_stance.append((ph <= c.stance_thresh) | ~walking)
        phase.append(jnp.where(walking, ph, zero))

    # 5. Foothold planning (ops/foot_planner.plan_footholds).
    # replan = initialized ? (prev_stance & swing_now) : swing_now,
    # as mask algebra for the same Mosaic reason.
    swing_now = [~in_stance[leg] for leg in range(4)]
    init_m = initialized > 0.5
    replan = [
        swing_now[leg] & ((prev_st[leg] > 0.5) | ~init_m)
        for leg in range(4)
    ]
    pcom_foot = [_matvec(Rm, feet_body[leg]) for leg in range(4)]
    v_sym = xdot_d if raibert_cmd_symmetric else xdot_w
    p_lin = tuple(
        _add(_smul(c.t_stance / 2.0, v_sym[i]),
             _smul(c.fp_k, _add(xdot_w[i], _neg(xdot_d[i]))))
        for i in range(3)
    )
    lip = 0.5 * jnp.sqrt(jnp.maximum(x[2], zero) * (1.0 / c.fp_g))
    p_lip = tuple(_mul(lip, xdot_w[i]) for i in range(3))
    foothold = []
    for leg in range(4):
        hip_w = _vadd(_matvec(Rm, tuple(_cst(c.fp_hips[leg, i])
                                        for i in range(3))), x)
        tang = _vsmul(c.t_stance / 2.0, _cross(w_w, pcom_foot[leg]))
        fh = _vadd(_vadd(hip_w, _vadd(p_lin, p_lip)), tang)
        fh = (jnp.where(replan[leg], _conc(fh[0], zero), zero),
              jnp.where(replan[leg], _conc(fh[1], zero), zero),
              zero)  # z projected to ground, then replan-masked
        foothold.append(fh)

    # 6. Swing-trajectory replan (ops/trajectory.plan_swing_trajectories):
    #    coeffs = A^-1 [p_start; p_final; p_center; 0...] — 3 MACs per
    #    coefficient since B rows 3-6 are zero.
    p_start = [_vadd(pcom_foot[leg], x) for leg in range(4)]
    coef = [[[None] * 3 for _ in range(7)] for _ in range(4)]
    valid = []
    for leg in range(4):
        pc = tuple(
            0.5 * (_conc(p_start[leg][i], zero) + foothold[leg][i])
            if i < 2 else zero + c.swing_height
            for i in range(3)
        )
        for ax in range(3):
            p0 = _conc(p_start[leg][ax], zero)
            pf = foothold[leg][ax]
            for k in range(7):
                new = _add(
                    _smul(float(c.a_inv[k, 0]), p0),
                    _smul(float(c.a_inv[k, 1]), pf),
                    _smul(float(c.a_inv[k, 2]), pc[ax]),
                )
                coef[leg][k][ax] = jnp.where(
                    replan[leg], _conc(new, zero), coef0[leg][k][ax]
                )
        valid.append(jnp.where(replan[leg], one,
                               jnp.where(valid0[leg] > 0.5, one, zero)))

    # 7. Swing references (ops/trajectory.reference_foot_states) + the
    #    world->body quirk transform + IK + J^-1 (commander steps 7-8).
    q_ref = [None] * 12
    qdot_ref = [None] * 12
    grounded = []
    for leg in range(4):
        t = jnp.clip(c.slope * phase[leg] + c.intercept, 0.0, 1.0)
        pw = [zero, zero, zero]
        vw = [zero, zero, zero]
        tp = one  # t^k
        for k in range(7):
            for ax in range(3):
                pw[ax] = pw[ax] + coef[leg][k][ax] * tp
            tp = tp * t
        tp = one  # t^(k-1) for the derivative
        for k in range(1, 7):
            for ax in range(3):
                vw[ax] = vw[ax] + float(k) * coef[leg][k][ax] * tp
            tp = tp * t
        vmask = valid[leg] > 0.5
        pw = [jnp.where(vmask, pw[ax], zero) for ax in range(3)]
        vw = [jnp.where(vmask, vw[ax], zero) for ax in range(3)]

        # p_b = R^T p_w - x (commander_node.cpp:491 quirk).
        p_b = _vadd(_matTvec(Rm, tuple(pw)), _neg3(x))
        v_b_ref = _matTvec(Rm, tuple(vw))

        # contact gating (opt-in): measured foot height of scheduled-stance
        # legs (see control/commander.py step 7b).
        if contact_gate:
            grounded.append(_conc(p_start[leg][2], zero) < contact_gate)

        hip = tuple(float(c.hips[leg, i]) for i in range(3))
        p_rel = tuple(_conc(_add(p_b[i], _cst(-hip[i]) if hip[i] != 0.0
                                 else None), zero) for i in range(3))
        q0v, q1v, q2v = _ik_sym(c, leg, p_rel, zero)

        if contact_gate:
            # End-of-swing target for gated legs: sextic at t = 1 is the
            # plain coefficient sum.
            pe = [zero, zero, zero]
            for k in range(7):
                for ax in range(3):
                    pe[ax] = pe[ax] + coef[leg][k][ax]
            pe = [jnp.where(vmask, pe[ax], _conc(p_start[leg][ax], zero))
                  for ax in range(3)]
            pe_b = _vadd(_matTvec(Rm, tuple(pe)), _neg3(x))
            pe_rel = tuple(
                _conc(_add(pe_b[i], _cst(-hip[i]) if hip[i] != 0.0
                           else None), zero) for i in range(3))
            qe0, qe1, qe2 = _ik_sym(c, leg, pe_rel, zero)
            gated = in_stance[leg] & ~grounded[leg]
            q0v = jnp.where(gated, qe0, q0v)
            q1v = jnp.where(gated, qe1, q1v)
            q2v = jnp.where(gated, qe2, q2v)

        # J^-1 at q_ref (ops/kinematics.leg_jacobian_inverse): adjugate
        # inverse with the damped-pinv singularity fallback.
        s1r, c1r = jnp.sin(q0v), jnp.cos(q0v)
        s2r, c2r = jnp.sin(q1v), jnp.cos(q1v)
        s23r = jnp.sin(q1v + q2v)
        c23r = jnp.cos(q1v + q2v)
        J = _jacobian_sym(c, leg, s1r, c1r, s2r, c2r, s23r, c23r)
        adj, det = _adj3_sym(J)
        det = _conc(det, zero)
        singular = jnp.abs(det) <= 1e-8
        inv_det = 1.0 / jnp.where(singular, one, det)
        JJt = [[_conc(_add(*[_mul(J[i][k2], J[j][k2]) for k2 in range(3)]),
                      zero) for j in range(3)] for i in range(3)]
        for i in range(3):
            JJt[i][i] = JJt[i][i] + 1e-6
        adj_d, det_d = _adj3_sym(JJt)
        inv_det_d = 1.0 / _conc(det_d, zero)
        qdr = [None] * 3
        for i in range(3):
            # row i of J^-1 = adj[i] * inv_det; damped row i of
            # J^T (JJt + lam)^-1 = sum_k J[k][i] * adj_d[k] * inv_det_d.
            acc_inv = _add(*[_mul(_mul(adj[i][j2], inv_det), v_b_ref[j2])
                             for j2 in range(3)])
            acc_d = None
            for j2 in range(3):
                row = _add(*[_mul(J[k2][i], adj_d[k2][j2])
                             for k2 in range(3)])
                acc_d = _add(acc_d, _mul(_mul(row, inv_det_d),
                                         v_b_ref[j2]))
            qdr[i] = jnp.where(singular, _conc(acc_d, zero),
                               _conc(acc_inv, zero))
        if contact_gate:
            qdr = [jnp.where(gated, zero, qdr[i]) for i in range(3)]

        q_ref[leg * 3 + 0], q_ref[leg * 3 + 1], q_ref[leg * 3 + 2] = (
            q0v, q1v, q2v)
        for i in range(3):
            qdot_ref[leg * 3 + i] = qdr[i]

    # 8. Swing PD (ops/joint_control.joint_pd_control, exact wrap chain).
    tau_swing = [None] * 12
    for i in range(12):
        j = i % 3
        err = _wrap_pi(_wrap_2pi(q_ref[i]) - _wrap_2pi(q[i]))
        tau_swing[i] = (c.kp_j[j] * err
                        + c.kd_j[j] * (qdot_ref[i] - qd[i]) + c.kff_j[j])

    # Effective stance mask for the QP (gate applied if enabled).
    if contact_gate:
        eff_stance = [in_stance[leg] & grounded[leg] for leg in range(4)]
    else:
        eff_stance = in_stance

    # 9. QP precursors (ops/dynamics.pd_accelerations + srb_rhs +
    #    stance-masked world levers — what solve_balance_qp_fused computes
    #    in XLA before its kernel).
    xddot_d = [
        c.kp_p[i] * (x_d[i] - x[i]) + c.kd_p[i] * (xdot_d[i] - xdot_w[i])
        for i in range(3)
    ]
    xddot_d[0] = xddot_d[0] + c.kff[0] * xdot_d[0]
    xddot_d[1] = xddot_d[1] + c.kff[1] * xdot_d[1]
    xddot_d[2] = xddot_d[2] + c.kff[2] * c.mass * GRAVITY

    # R_error = R_d R^T -> so3_log (balance_controller.cpp:133-136).
    Rt = _m3T([[R[0], R[1], R[2]], [R[3], R[4], R[5]], [R[6], R[7], R[8]]])
    E = _m3mul(R_d, Rt)
    E = [[_conc(E[i][j], zero) for j in range(3)] for i in range(3)]
    logv = _so3_log_sym(E, zero)
    wdot_d = [
        c.kp_w[i] * logv[i] + c.kd_w[i] * (w_d[i] - w_w[i])
        for i in range(3)
    ]
    wdot_d[0] = wdot_d[0] + c.kff[3] * w_d[0]
    # Reference typo preserved: index 1 accumulates BOTH kff[4] and kff[5]
    # terms (balance_controller.cpp:137-139).
    wdot_d[1] = wdot_d[1] + c.kff[4] * w_d[1] + c.kff[5] * w_d[2]

    b_out = [None] * 6
    for i in range(3):
        gz = c.gravity_z if i == 2 else 0.0
        b_out[i] = c.mass * (xddot_d[i] + gz)
    # Iw = R diag(Ib) R^T; b_ang = Iw wdot_d + w_d x (Iw w_d).
    Iw = [[_add(*[_smul(c.inertia[k2], _mul(Rm[i][k2], Rm[j][k2]))
                  for k2 in range(3)]) for j in range(3)] for i in range(3)]
    Iw_wdot = _matvec(Iw, tuple(wdot_d))
    Iw_wd = _matvec(Iw, w_d)
    cross_term = _cross(w_d, Iw_wd)
    for i in range(3):
        b_out[3 + i] = _conc(_add(Iw_wdot[i], cross_term[i]), zero)

    r_out = []
    for leg in range(4):
        for ax in range(3):
            r_out.append(jnp.where(eff_stance[leg],
                                   _conc(pcom_foot[leg][ax], zero), zero))

    carry_new = [None] * N_CARRY
    carry_new[C_STANDING] = standing
    carry_new[C_GAIT_TIME] = gait_time
    for leg in range(4):
        carry_new[C_PREV + leg] = jnp.where(in_stance[leg], one, zero)
        carry_new[C_VALID + leg] = valid[leg]
    carry_new[C_INIT] = one
    for leg in range(4):
        for k in range(7):
            for ax in range(3):
                carry_new[C_COEF + leg * 21 + k * 3 + ax] = \
                    coef[leg][k][ax]

    out = dict(
        r=r_out,
        b=[_conc(v, zero) for v in b_out],
        st=[jnp.where(eff_stance[leg], one, zero) for leg in range(4)],
        mu=zero + c.mu,
        fz_min=zero + c.fz_min,
        fz_max=zero + c.fz_max,
        tau_swing=[_conc(v, zero) for v in tau_swing],
        carry=carry_new,
        q_ref=list(q_ref),
    )

    # 10. Optional MPC precursors (control/commander.py's controller="mpc"
    #     stage, commander_node.cpp:507-508's hot-path slot): xi0, the
    #     world foot levers, the N-step stance schedule sampled from the
    #     SAME gait clock that produced this tick's stance mask
    #     (ops/gait.gait_at_time at t0 + mpc_dt*k), and the constant-twist
    #     reference (mpc/horizon.make_reference_trajectory) — everything
    #     the Pallas Riccati kernel consumes, emitted in packed lane
    #     layout so MPC chains as kernel 2 of the fused tick.
    if mpc_horizon:
        Nh = mpc_horizon
        # rpy (math/rotations.matrix_to_rpy): roll = atan2(R21, R22),
        # pitch = asin(-R20) = atan2(-R20, sqrt(1 - R20^2)), yaw as above.
        r20 = _conc(R[6], zero)
        roll = sl.atan2(_conc(R[7], zero), _conc(R[8], zero))
        pitch = sl.atan2(-r20, jnp.sqrt(jnp.maximum(1.0 - r20 * r20,
                                                    zero)))
        yaw_c = _conc(yaw, zero)
        w_wc = [_conc(w_w[i], zero) for i in range(3)]
        xd_wc = [_conc(xdot_w[i], zero) for i in range(3)]
        xi0 = [roll, pitch, yaw_c, _conc(x[0], zero), _conc(x[1], zero),
               _conc(x[2], zero)] + w_wc + xd_wc + [one]
        mpc = list(xi0)
        for leg in range(4):
            for ax in range(3):
                mpc.append(_conc(pcom_foot[leg][ax], zero))
        # Stance schedule: all-stance until the gait clock runs
        # (control/commander.py: where(walking, gait_hor.in_stance, True));
        # with contact gating, step 0 carries the gated mask.
        for t in range(Nh):
            tk = t_gait + mpc_dt * t
            for leg in range(4):
                ph = c.offsets[leg] + tk * (1.0 / c.period)
                ph = ph - jnp.floor(ph)
                stl = (ph <= c.stance_thresh) | ~walking
                if contact_gate and t == 0:
                    stl = stl & eff_stance[leg]
                mpc.append(jnp.where(stl, one, zero))
        # Constant-twist reference from cmd_eff = walking ? cmd : 0.
        vx = jnp.where(walking, _conc(cmd[0], zero), zero)
        vy = jnp.where(walking, _conc(cmd[1], zero), zero)
        wz = jnp.where(walking, _conc(cmd[5], zero), zero)
        for t in range(Nh):
            tt = mpc_dt * (t + 1)
            ref = [zero, zero, yaw_c + tt * wz,
                   xi0[3] + tt * vx, xi0[4] + tt * vy, zero + c.stand_h,
                   zero, zero, wz, vx, vy, zero, one]
            mpc.extend(ref)
        out["mpc"] = mpc
    return out


def _pre_kernel(state_ref, carry_ref, cmd_ref, r_ref, b_ref, st_ref,
                mu_ref, fmin_ref, fmax_ref, tausw_ref, carry_out_ref,
                qref_ref, *maybe_mpc_ref, consts, contact_gate,
                raibert_cmd_symmetric, mpc_horizon=0, mpc_dt=0.0):
    out = commander_pre_sym(
        consts,
        lambda i: state_ref[0, i],
        lambda i: carry_ref[0, i],
        lambda i: cmd_ref[0, i],
        contact_gate=contact_gate,
        raibert_cmd_symmetric=raibert_cmd_symmetric,
        mpc_horizon=mpc_horizon,
        mpc_dt=mpc_dt,
    )
    if mpc_horizon:
        (mpc_ref,) = maybe_mpc_ref
        for i in range(mpc_block_size(mpc_horizon)):
            mpc_ref[0, i] = out["mpc"][i]
    for i in range(12):
        r_ref[0, i] = out["r"][i]
        tausw_ref[0, i] = out["tau_swing"][i]
        qref_ref[0, i] = out["q_ref"][i]
    for i in range(6):
        b_ref[0, i] = out["b"][i]
    for i in range(4):
        st_ref[0, i] = out["st"][i]
    mu_ref[0, 0] = out["mu"]
    fmin_ref[0, 0] = out["fz_min"]
    fmax_ref[0, 0] = out["fz_max"]
    for i in range(N_CARRY):
        carry_out_ref[0, i] = out["carry"][i]


def _spec(k, rows):
    return pl.BlockSpec((1, k, rows, LANE), lambda i: (i, 0, 0, 0))


def commander_pre_pallas_packed(state_p, carry_p, cmd_p, *, consts,
                                rows: int = 8, contact_gate: float = 0.0,
                                raibert_cmd_symmetric: bool = False,
                                mpc_horizon: int = 0, mpc_dt: float = 0.0,
                                interpret: bool = False):
    """Run the commander-pre kernel on PACKED (nb, k, rows, 128) tensors.

    ``state_p`` needs >= N_STATE_USED leading comps laid out as in
    sim/pallas_substep (the full 58-comp substep state tensor works as-is).
    Returns packed (r, b, st, mu, fz_min, fz_max, tau_swing, carry, q_ref).
    With ``mpc_horizon > 0`` a tenth tensor is appended: the packed MPC
    precursor block (see :func:`mpc_block_size`) that
    mpc/pallas_riccati.solve_mpc_qp_riccati_packed consumes directly.
    """
    nb = state_p.shape[0]
    dtype = state_p.dtype
    kern = partial(_pre_kernel, consts=consts,
                   contact_gate=float(contact_gate),
                   raibert_cmd_symmetric=bool(raibert_cmd_symmetric),
                   mpc_horizon=int(mpc_horizon), mpc_dt=float(mpc_dt))
    out_shapes = [
        jax.ShapeDtypeStruct((nb, 12, rows, LANE), dtype),   # r
        jax.ShapeDtypeStruct((nb, 6, rows, LANE), dtype),    # b
        jax.ShapeDtypeStruct((nb, 4, rows, LANE), dtype),    # st
        jax.ShapeDtypeStruct((nb, 1, rows, LANE), dtype),    # mu
        jax.ShapeDtypeStruct((nb, 1, rows, LANE), dtype),    # fz_min
        jax.ShapeDtypeStruct((nb, 1, rows, LANE), dtype),    # fz_max
        jax.ShapeDtypeStruct((nb, 12, rows, LANE), dtype),   # tau_swing
        jax.ShapeDtypeStruct((nb, N_CARRY, rows, LANE), dtype),
        jax.ShapeDtypeStruct((nb, 12, rows, LANE), dtype),   # q_ref
    ]
    out_specs = [_spec(12, rows), _spec(6, rows), _spec(4, rows),
                 _spec(1, rows), _spec(1, rows), _spec(1, rows),
                 _spec(12, rows), _spec(N_CARRY, rows), _spec(12, rows)]
    if mpc_horizon:
        kb = mpc_block_size(mpc_horizon)
        out_shapes.append(jax.ShapeDtypeStruct((nb, kb, rows, LANE), dtype))
        out_specs.append(_spec(kb, rows))
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[_spec(state_p.shape[1], rows), _spec(N_CARRY, rows),
                  _spec(N_CMD, rows)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(state_p, carry_p, cmd_p)


def pack_comps(a, rows: int):
    """(B, k) -> (nb, k, rows, 128), B % (rows*128) == 0."""
    B, k = a.shape
    nb = B // (rows * LANE)
    return a.reshape(nb, rows, LANE, k).transpose(0, 3, 1, 2)


def unpack_comps(a):
    nb, k, rows, lane = a.shape
    return a.transpose(0, 2, 3, 1).reshape(nb * rows * lane, k)


def pack_commander_carry(carry, rows: int, batch: int):
    """control/commander.CommanderCarry -> packed (nb, N_CARRY, rows, 128).

    Only the fields the fused path uses are packed (the QP warm-start
    triple is jnp-backend-only and is dropped)."""
    dtype = carry.gait_time.dtype
    coeffs = carry.planner.traj.coeffs.reshape(batch, 4 * 7 * 3)
    cols = [
        carry.standing.reshape(batch, 1).astype(dtype),
        carry.gait_time.reshape(batch, 1),
        carry.planner.prev_in_stance.reshape(batch, 4).astype(dtype),
        carry.planner.initialized.reshape(batch, 1).astype(dtype),
        coeffs,
        carry.planner.traj.valid.reshape(batch, 4).astype(dtype),
    ]
    return pack_comps(jnp.concatenate(cols, axis=-1), rows)


def unpack_commander_carry(carry_p, batch_shape, template):
    """Packed carry -> CommanderCarry (QP triple taken from ``template``)."""
    from quadruped_control_tpu.control.commander import CommanderCarry
    from quadruped_control_tpu.types import FootTrajCoeffs, PlannerState

    flat = unpack_comps(carry_p)
    B = 1
    for d in batch_shape:
        B *= int(d)
    flat = flat[:B]

    def shp(a, tail=()):
        return a.reshape(batch_shape + tail)

    return CommanderCarry(
        standing=shp(flat[:, C_STANDING]) > 0.5,
        gait_time=shp(flat[:, C_GAIT_TIME]),
        planner=PlannerState(
            prev_in_stance=shp(flat[:, C_PREV:C_PREV + 4], (4,)) > 0.5,
            initialized=shp(flat[:, C_INIT]) > 0.5,
            traj=FootTrajCoeffs(
                coeffs=shp(flat[:, C_COEF:C_COEF + 84], (4, 7, 3)),
                valid=shp(flat[:, C_VALID:C_VALID + 4], (4,)) > 0.5,
            ),
        ),
        qp_x=template.qp_x, qp_s=template.qp_s, qp_z=template.qp_z,
        ref_pose=template.ref_pose,
    )
