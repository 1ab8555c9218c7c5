"""Fused 3-kernel whole-body tick (sim/pallas_tick.py) == the XLA path.

Interpret mode on CPU float64. Parity criteria are chosen per stage:

  - commander-pre kernel outputs vs control/commander.commander_precursors:
    tight (the only approximation is the polynomial atan2, ~1e-10);
  - one full tick from the init state: tight (QP inputs are bitwise-equal
    after the f32 cast, so the whole pipeline agrees to f64 roundoff);
  - later ticks: OBJECTIVE-level QP parity only. The 4-stance GRF QP is
    the documented degenerate family (rank-6 A^T S A + 1e-5 W): two f32
    programs compiled from different jit graphs reassociate differently
    and land on different certified KKT points whose forces differ along
    the near-nullspace (~N-level) at equal objective — exact-x parity is
    not a meaningful criterion there (see ROADMAP.md tail notes).

On-device closed-loop behavior is driven by scripts/verify_fused_tick.py.

HEAVY: the interpret-mode kernels compile into ~40 min of XLA CPU graphs;
the module is skipped unless QCT_HEAVY=1 (ran green 2026-08-19). The
default suite still covers every op these kernels reimplement via the XLA
path; this module only re-proves the fused composition.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("QCT_HEAVY"),
    reason="fused-tick interpret parity is ~40 min of CPU compiles; "
           "set QCT_HEAVY=1 (see module docstring)")

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import (
    CommanderCarry,
    commander_precursors,
    init_commander_carry,
)
from quadruped_control_tpu.control.pallas_commander import (
    CommanderConsts,
    commander_pre_pallas_packed,
    pack_commander_carry,
    pack_comps,
    unpack_commander_carry,
    unpack_comps,
)
from quadruped_control_tpu.math.rotations import so3_exp
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.ops.kinematics import jacobian_transpose_control
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_state,
    make_pallas_stepper,
    mit_cheetah_whole_body_model,
    whole_body_com_state,
)
from quadruped_control_tpu.sim.pallas_tick import (
    init_qp_warm_packed,
    make_fused_tick,
    pack_whole_body_state,
    rollout_whole_body_fused,
    unpack_whole_body_state,
)
from quadruped_control_tpu.solver.pallas_fused import (
    solve_balance_qp_fused,
    srb_rhs,
)
from quadruped_control_tpu.types import ComState, JointState, PlannerState

CFG = mit_cheetah_physical_config()
F64 = jnp.float64
MODEL = mit_cheetah_whole_body_model(CFG, dtype=F64)
ROWS = 8
B = ROWS * 128
DT = 1.0 / CFG.frequency
QP_IT = 10
N_SUB = 4

# Shared builders/jits: the interpret-mode kernels compile into large XLA
# CPU graphs (~minutes each); every test reuses these exact callables so
# each graph compiles ONCE for the whole module.
_CONTACT = ContactConfig()
_TICK = make_fused_tick(MODEL, CFG, _CONTACT, rows=ROWS,
                        qp_iterations=QP_IT, qp_polish=True,
                        qp_warm_start=False, interpret=True)
_STEPPER_TAU = make_pallas_stepper(MODEL, CFG, _CONTACT, rows=ROWS,
                                   interpret=True, prefactor="kernel")
_STEPPER_TAU_XLA = make_pallas_stepper(MODEL, CFG, _CONTACT, rows=ROWS,
                                       interpret=True, prefactor="xla")


@jax.jit
def _composed_step(wb, carry, cmd):
    return _xla_composed_tick(wb, carry, cmd, _STEPPER_TAU)


@jax.jit
def _fused_step(wb, carry, cmd):
    state_p, _ = pack_whole_body_state(wb, ROWS)
    carry_p = pack_commander_carry(carry, ROWS, B)
    state_p, carry_p, _ = _TICK(state_p, carry_p, pack_comps(cmd, ROWS),
                                DT, N_SUB)
    return (unpack_whole_body_state(state_p, (B,)),
            unpack_commander_carry(carry_p, (B,), carry))


def _synth(key):
    """Randomized mid-walk states crossing standing / stance boundaries."""
    ks = jax.random.split(key, 6)
    R = so3_exp(0.15 * jax.random.normal(ks[0], (B, 3)))
    x = jnp.stack([
        0.1 * jax.random.normal(ks[1], (B,)),
        0.1 * jax.random.normal(ks[2], (B,)),
        0.26 + 0.02 * jax.random.normal(ks[3], (B,)),
    ], axis=-1)
    u = 0.5 * jax.random.normal(ks[4], (B, 18))
    q = jnp.array([0.0, 1.0, -1.6]) + 0.3 * jax.random.normal(
        ks[5], (B, 4, 3))
    cmd = jnp.broadcast_to(jnp.array([0.2, 0.05, 0.0, 0.0, 0.0, 0.1]),
                           (B, 6))
    return R, x, u, q, cmd


def _advance_carry(pre, carry):
    return CommanderCarry(
        standing=pre.standing, gait_time=pre.gait_time,
        planner=PlannerState(
            prev_in_stance=pre.plan.prev_in_stance,
            initialized=pre.plan.initialized, traj=pre.traj),
        qp_x=carry.qp_x, qp_s=carry.qp_s, qp_z=carry.qp_z)


def test_commander_pre_kernel_matches_precursors():
    """Kernel A vs commander steps 1-8, lockstep over ticks that cross the
    standing latch, the gait start, and stance->swing edges."""
    consts = CommanderConsts(CFG, DT)
    carry_x = init_commander_carry((B,), dtype=F64)
    carry_p = pack_commander_carry(carry_x, ROWS, B)

    @jax.jit
    def kernel_step(R, x, u, q, cmd, carry_p):
        state_flat = jnp.concatenate(
            [R.reshape(B, 9), x, u, q.reshape(B, 12)], axis=-1)
        return commander_pre_pallas_packed(
            pack_comps(state_flat, ROWS), carry_p, pack_comps(cmd, ROWS),
            consts=consts, rows=ROWS, interpret=True)

    @jax.jit
    def oracle_step(R, x, u, q, cmd, carry_x):
        w_w = (R @ u[:, :3, None])[..., 0]
        xd_w = (R @ u[:, 3:6, None])[..., 0]
        com = ComState(R=R, x=x, xdot=xd_w, w=w_w)
        joints = JointState(q=q, qdot=u[:, 6:].reshape(B, 4, 3))
        pre = commander_precursors(com, joints, carry_x, cmd, DT, CFG)
        xddot_d, wdot_d = dyn.pd_accelerations(
            R, pre.R_d, x, xd_w, w_w, pre.x_d, pre.xdot_d, pre.w_d,
            CFG.balance)
        b = srb_rhs(R, pre.w_d, xddot_d, wdot_d, CFG.balance)
        com_ft = jnp.einsum("bij,blj->bli", R, pre.feet_body)
        r = jnp.where(pre.eff_stance[..., None], com_ft, 0.0)
        return pre, b, r

    key = jax.random.PRNGKey(0)
    for t in range(8):
        key, sub = jax.random.split(key)
        R, x, u, q, cmd = _synth(sub)
        (r_k, b_k, st_k, _mu, _fmin, _fmax, tausw_k, carry_k,
         qref_k) = kernel_step(R, x, u, q, cmd, carry_p)
        pre, b, r = oracle_step(R, x, u, q, cmd, carry_x)

        def close(packed, want, tol, name):
            got = np.asarray(unpack_comps(packed))
            want = np.asarray(want).reshape(B, -1)
            scale = 1.0 + np.abs(want).max()
            np.testing.assert_allclose(got, want, atol=tol * scale,
                                       err_msg=f"t={t} {name}")

        close(r_k, r, 1e-9, "r")
        close(b_k, b, 1e-8, "b")
        close(st_k, pre.eff_stance.astype(F64), 1e-12, "stance")
        close(tausw_k, pre.tau_swing, 1e-7, "tau_swing")
        close(qref_k, pre.q_ref, 1e-8, "q_ref")
        close(carry_k[:, 0:1], pre.standing.astype(F64), 1e-12, "standing")
        close(carry_k[:, 1:2], pre.gait_time, 1e-12, "gait_time")
        close(carry_k[:, 7:91], pre.traj.coeffs.reshape(B, 84), 1e-9,
              "coeffs")
        close(carry_k[:, 91:95], pre.traj.valid.astype(F64), 1e-12,
              "valid")

        carry_x = _advance_carry(pre, carry_x)
        carry_p = carry_k


def _xla_composed_tick(wb, carry, cmd, stepper_tau):
    """The XLA commander + fused-QP kernel + substep kernel composition
    (what commander_step(qp_backend="fused") + the pallas stepper compute),
    with interpret=True plumbed through."""
    com, joints = whole_body_com_state(wb, CFG)
    pre = commander_precursors(com, joints, carry, cmd, DT, CFG)
    sol = solve_balance_qp_fused(
        com.R, pre.R_d, com.x, com.xdot, com.w, pre.x_d, pre.xdot_d,
        pre.w_d, pre.feet_body, pre.eff_stance, CFG.balance,
        iterations=QP_IT, polish=True, rows=ROWS, interpret=True)
    fb = dyn.forces_to_body_frame(sol.x, com.R, pre.eff_stance)
    tau_st = jacobian_transpose_control(joints.q, fb, CFG.kinematics)
    tau = jnp.where(pre.eff_stance[..., None], tau_st, pre.tau_swing)
    tau = jnp.clip(tau, CFG.balance.torque_min, CFG.balance.torque_max)
    wb_new = stepper_tau(wb, tau, DT, N_SUB)
    return wb_new, _advance_carry(pre, carry), pre, sol


def test_fused_tick_matches_xla_composition_from_init():
    """Tick 0 from the laying pose: QP inputs are bitwise-equal after the
    f32 cast, so fused == composed to f64 roundoff."""
    wb = init_whole_body_state(CFG, (B,), dtype=F64)
    rng = np.random.default_rng(3)
    wb = wb._replace(
        q=wb.q + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 4, 3))),
        x=wb.x.at[:, 2].add(jnp.asarray(rng.uniform(-0.005, 0.01, (B,)))))
    carry = init_commander_carry((B,), dtype=F64)
    carry = carry._replace(standing=jnp.arange(B) % 2 == 0,
                           gait_time=jnp.where(jnp.arange(B) % 4 == 0,
                                               0.05, -1.0))
    cmd = jnp.broadcast_to(jnp.array([0.15, 0.0, 0.0, 0.0, 0.0, 0.05],
                                     F64), (B, 6))

    wb_x, carry_x, _, _ = _composed_step(wb, carry, cmd)
    wb_f, carry_f = _fused_step(wb, carry, cmd)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(wb_f, name)),
            np.asarray(getattr(wb_x, name)), atol=1e-9, err_msg=name)
    np.testing.assert_array_equal(np.asarray(carry_f.standing),
                                  np.asarray(carry_x.standing))
    np.testing.assert_allclose(np.asarray(carry_f.gait_time),
                               np.asarray(carry_x.gait_time), atol=1e-12)


def test_fused_tick_qp_objective_parity_mid_walk():
    """After several ticks (carried trajectories, mixed stance patterns),
    the two paths' QP solutions agree at the OBJECTIVE level and both
    satisfy the cone constraints — the correct criterion for the
    degenerate 4-stance family (see module docstring)."""
    wb = init_whole_body_state(CFG, (B,), dtype=F64)
    carry = init_commander_carry((B,), dtype=F64)
    carry = carry._replace(standing=jnp.ones((B,), bool),
                           gait_time=jnp.zeros((B,)))
    cmd = jnp.broadcast_to(jnp.array([0.15, 0.0, 0.0, 0.0, 0.0, 0.0],
                                     F64), (B, 6))

    for _ in range(3):
        wb, carry, pre, sol_x = _composed_step(wb, carry, cmd)

    # Fused QP solution from the same state.
    consts = CommanderConsts(CFG, DT)
    state_p, _ = pack_whole_body_state(wb, ROWS)
    outs = commander_pre_pallas_packed(
        state_p, pack_commander_carry(carry, ROWS, B),
        pack_comps(cmd, ROWS), consts=consts, rows=ROWS, interpret=True)
    from quadruped_control_tpu.solver.pallas_fused import (
        solve_grf_qp_fused_packed,
    )
    xo, so, zo, diag = solve_grf_qp_fused_packed(
        *outs[0:6], s_diag=tuple(CFG.balance.s_diag),
        w_diag=float(CFG.balance.w_diag), iterations=QP_IT, polish=True,
        rows=ROWS, interpret=True)
    x_f = np.asarray(unpack_comps(xo), np.float64)
    conv_f = np.asarray(unpack_comps(diag))[:, 1] > 0.5

    # Next-tick precursors give the QP the two paths both solved.
    com, joints = whole_body_com_state(wb, CFG)
    pre = commander_precursors(com, joints, carry, cmd, DT, CFG)
    qp = dyn.build_balance_qp(
        com.R, pre.R_d, com.x, com.xdot, com.w, pre.x_d, pre.xdot_d,
        pre.w_d, pre.feet_body, pre.eff_stance, CFG.balance)
    sol_x2 = solve_balance_qp_fused(
        com.R, pre.R_d, com.x, com.xdot, com.w, pre.x_d, pre.xdot_d,
        pre.w_d, pre.feet_body, pre.eff_stance, CFG.balance,
        iterations=QP_IT, polish=True, rows=ROWS, interpret=True)
    x_a = np.asarray(sol_x2.x, np.float64)

    Q = np.asarray(qp.Q, np.float64)
    c = np.asarray(qp.c, np.float64)
    G = np.asarray(qp.G, np.float64)
    h = np.asarray(qp.h, np.float64)

    def obj(x):
        return 0.5 * np.einsum("bi,bij,bj->b", x, Q, x) + np.einsum(
            "bi,bi->b", c, x)

    conv_a = np.asarray(sol_x2.converged)
    both = conv_a & conv_f
    assert both.mean() > 0.99
    o_a, o_f = obj(x_a)[both], obj(x_f)[both]
    scale = 1.0 + np.abs(o_a)
    assert np.max(np.abs(o_a - o_f) / scale) < 2e-5
    # Both feasible within the f32 tolerance.
    viol_f = (np.einsum("bij,bj->bi", G, x_f) - h)[both].max()
    assert viol_f < 1e-3


@pytest.mark.parametrize("gravity_comp", [False, True])
def test_stepper_qp_torque_map_matches_xla(gravity_comp):
    """torque_input="qp" prologue == XLA torque mapping (forces_to_body_
    frame + J^T f + stance/swing merge + leg_gravity_torques + clamp),
    then identical substeps (prefactor="xla" for exact factor parity)."""
    from quadruped_control_tpu.sim.dynamics import leg_gravity_torques

    stepper_qp = make_pallas_stepper(
        MODEL, CFG, _CONTACT, rows=ROWS, interpret=True, prefactor="xla",
        torque_input="qp", gravity_comp=gravity_comp)
    stepper_tau = _STEPPER_TAU_XLA
    rng = np.random.default_rng(7)
    Bs = 256
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    wb = wb._replace(
        q=wb.q + jnp.asarray(rng.uniform(-0.3, 0.3, (Bs, 4, 3))),
        u=jnp.asarray(rng.uniform(-1.0, 1.0, (Bs, 18))),
        R=so3_exp(jnp.asarray(0.2 * rng.standard_normal((Bs, 3)))))
    fw = jnp.asarray(rng.uniform(-40, 80, (Bs, 12)))
    tausw = jnp.asarray(rng.uniform(-30, 30, (Bs, 4, 3)))
    st = jnp.asarray(rng.uniform(size=(Bs, 4)) > 0.4)

    fb = dyn.forces_to_body_frame(fw, wb.R, st)
    tau = jnp.where(st[..., None],
                    jacobian_transpose_control(wb.q, fb, CFG.kinematics),
                    tausw)
    if gravity_comp:
        tau = tau + leg_gravity_torques(MODEL, wb.q, wb.R)
    tau = jnp.clip(tau, CFG.balance.torque_min, CFG.balance.torque_max)

    out_qp = stepper_qp(wb, fw, tausw, st, DT, N_SUB)
    out_ref = stepper_tau(wb, tau, DT, N_SUB)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_qp, name)),
            np.asarray(getattr(out_ref, name)), atol=1e-9, err_msg=name)


def test_rollout_whole_body_fused_standup():
    """Closed loop through the fused tick: a short stand-up push from the
    laying pose raises the base and keeps everything finite + converged."""
    Bs = 64  # padded to one 1024-lane tile internally
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    res = rollout_whole_body_fused(wb, carry, cmd, 20, _TICK,
                                   n_substeps=N_SUB, record=True)
    z0 = float(np.asarray(wb.x[:, 2]).mean())
    z1 = float(np.asarray(res.plant.x[:, 2]).mean())
    assert np.isfinite(np.asarray(res.plant.x)).all()
    assert z1 > z0 + 0.005, (z0, z1)
    assert np.asarray(res.trace.qp_converged).mean() > 0.99
    assert res.trace.x.shape == (20, Bs, 3)
    # And the trace in_stance is all-stance before the gait clock runs.
    assert np.asarray(res.trace.in_stance).all()


_TICK_WARM = make_fused_tick(MODEL, CFG, _CONTACT, rows=ROWS,
                             qp_iterations=QP_IT, qp_polish=True,
                             qp_warm_start=True, interpret=True)


def test_warm_tick_first_tick_is_cold_start():
    """The zero/st=-1 warm carry (init_qp_warm_packed) resets every cone
    row, so tick 1 of a qp_warm_start tick is BITWISE the cold tick."""
    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)

    res_c = rollout_whole_body_fused(wb, carry, cmd, 1, _TICK,
                                     n_substeps=N_SUB, record=False)
    res_w = rollout_whole_body_fused(wb, carry, cmd, 1, _TICK_WARM,
                                     n_substeps=N_SUB, record=False)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_w.plant, name)),
            np.asarray(getattr(res_c.plant, name)), err_msg=name)


def test_warm_tick_rollout_standup():
    """Closed loop through the WARM fused tick (the reference's hotstart
    economics in-kernel, balance_controller.cpp:193-195): the stand-up
    push works and the warm barrier keeps converging across stance
    transitions and the standing latch."""
    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    res = rollout_whole_body_fused(wb, carry, cmd, 20, _TICK_WARM,
                                   n_substeps=N_SUB, record=True)
    z0 = float(np.asarray(wb.x[:, 2]).mean())
    z1 = float(np.asarray(res.plant.x[:, 2]).mean())
    assert np.isfinite(np.asarray(res.plant.x)).all()
    assert z1 > z0 + 0.005, (z0, z1)
    assert np.asarray(res.trace.qp_converged).mean() > 0.99


def test_fused_chunked_matches_unchunked():
    """Host-side chunking with the warm carry threaded through
    (rollout_whole_body_fused_chunked) is BITWISE the unchunked scan —
    the chunk boundary must not reset the reference's hotstart economics
    (VERDICT round-1 weak #2)."""
    from quadruped_control_tpu.sim.pallas_tick import (
        rollout_whole_body_fused_chunked,
    )

    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)

    res_u = rollout_whole_body_fused(wb, carry, cmd, 4, _TICK_WARM,
                                     n_substeps=N_SUB, record=True)
    res_c = rollout_whole_body_fused_chunked(wb, carry, cmd, 4, _TICK_WARM,
                                             chunk=2, n_substeps=N_SUB,
                                             record=True)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_c.plant, name)),
            np.asarray(getattr(res_u.plant, name)), err_msg=name)
    # Warm carries agree on the REAL instances (chunk boundaries repack the
    # padding lanes from the fresh-pad pattern, so padded warm values
    # legitimately differ — they never reach a real instance).
    for wc, wu in zip(res_c.warm, res_u.warm):
        np.testing.assert_array_equal(
            np.asarray(unpack_comps(wc))[:Bs],
            np.asarray(unpack_comps(wu))[:Bs])
    np.testing.assert_array_equal(np.asarray(res_c.trace.qp_converged),
                                  np.asarray(res_u.trace.qp_converged))


def test_sharded_fused_rollout_matches_single():
    """shard_map'd fused tick over the 8-device CPU mesh == unsharded
    (communication-free data parallelism; parallel/mesh.py)."""
    from quadruped_control_tpu.parallel.mesh import (
        scenario_mesh,
        shard_rollout_whole_body_fused,
    )

    Bs = 16  # 2 per device; each shard pads to one tile internally
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)

    run = shard_rollout_whole_body_fused(scenario_mesh(), _TICK,
                                         n_substeps=N_SUB)
    res_sh = run(wb, carry, cmd, 3)
    res_1 = rollout_whole_body_fused(wb, carry, cmd, 3, _TICK,
                                     n_substeps=N_SUB, record=False)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_sh.plant, name)),
            np.asarray(getattr(res_1.plant, name)), atol=1e-12,
            err_msg=name)
    np.testing.assert_allclose(np.asarray(res_sh.carry.gait_time),
                               np.asarray(res_1.carry.gait_time),
                               atol=1e-12)


# ---- MPC inside the fused tick (controller="mpc") ----------------------

_MPC_N, _MPC_DT, _MPC_IT = 8, 0.03, 5  # low iterations: wiring parity,
# not MPC convergence (both paths run the SAME Riccati kernel)
_TICK_MPC = make_fused_tick(MODEL, CFG, _CONTACT, rows=ROWS,
                            controller="mpc", mpc_horizon=_MPC_N,
                            mpc_dt=_MPC_DT, mpc_iterations=_MPC_IT,
                            interpret=True)


def test_commander_pre_mpc_block_matches_oracle():
    """The commander-pre kernel's MPC precursor block (xi0, levers,
    in-kernel-sampled stance schedule, constant-twist reference) ==
    control/commander.mpc_precursors, lockstep over mixed states."""
    from quadruped_control_tpu.control.commander import mpc_precursors

    consts = CommanderConsts(CFG, DT)
    carry_x = init_commander_carry((B,), dtype=F64)
    carry_p = pack_commander_carry(carry_x, ROWS, B)

    @jax.jit
    def kernel_step(R, x, u, q, cmd, carry_p):
        state_flat = jnp.concatenate(
            [R.reshape(B, 9), x, u, q.reshape(B, 12)], axis=-1)
        return commander_pre_pallas_packed(
            pack_comps(state_flat, ROWS), carry_p, pack_comps(cmd, ROWS),
            consts=consts, rows=ROWS, mpc_horizon=_MPC_N, mpc_dt=_MPC_DT,
            interpret=True)

    key = jax.random.PRNGKey(11)
    for t in range(4):
        key, sub = jax.random.split(key)
        R, x, u, q, cmd = _synth(sub)
        outs = kernel_step(R, x, u, q, cmd, carry_p)
        mpc_k = np.asarray(unpack_comps(outs[9]))

        w_w = (R @ u[:, :3, None])[..., 0]
        xd_w = (R @ u[:, 3:6, None])[..., 0]
        com = ComState(R=R, x=x, xdot=xd_w, w=w_w)
        joints = JointState(q=q, qdot=u[:, 6:].reshape(B, 4, 3))
        pre = commander_precursors(com, joints, carry_x, cmd, DT, CFG)
        xi0, xi_ref, _yaw, sched = mpc_precursors(
            com, pre.gait_time, pre.walking, pre.eff_stance, cmd, CFG,
            _MPC_N, _MPC_DT)
        levers = pre.p_start - com.x[:, None, :]

        np.testing.assert_allclose(mpc_k[:, :13], np.asarray(xi0),
                                   atol=2e-8, err_msg=f"t={t} xi0")
        np.testing.assert_allclose(mpc_k[:, 13:25],
                                   np.asarray(levers).reshape(B, 12),
                                   atol=1e-9, err_msg=f"t={t} levers")
        np.testing.assert_array_equal(
            mpc_k[:, 25:25 + 4 * _MPC_N],
            np.asarray(sched, np.float64).reshape(B, -1),
            err_msg=f"t={t} schedule")
        np.testing.assert_allclose(
            mpc_k[:, 25 + 4 * _MPC_N:],
            np.asarray(xi_ref).reshape(B, -1), atol=1e-9,
            err_msg=f"t={t} xi_ref")

        carry_x = _advance_carry(pre, carry_x)
        carry_p = outs[7]


@jax.jit
def _mpc_composed_step(wb, carry, cmd):
    """XLA commander (controller="mpc" precursors) + the SAME Riccati
    kernel + the SAME substep kernel — what commander_step(
    controller="mpc", mpc_backend="riccati-pallas") + the pallas stepper
    compute, with interpret=True plumbed through."""
    from quadruped_control_tpu.control.commander import mpc_precursors
    from quadruped_control_tpu.mpc.pallas_riccati import solve_mpc_fused

    com, joints = whole_body_com_state(wb, CFG)
    pre = commander_precursors(com, joints, carry, cmd, DT, CFG)
    xi0, xi_ref, yaw, sched = mpc_precursors(
        com, pre.gait_time, pre.walking, pre.eff_stance, cmd, CFG,
        _MPC_N, _MPC_DT)
    F, _sol = solve_mpc_fused(xi0, xi_ref, yaw, pre.p_start, com.x, sched,
                              _MPC_N, _MPC_DT, CFG, iterations=_MPC_IT,
                              interpret=True)
    f0 = F[..., 0, :].astype(F64)
    fb = dyn.forces_to_body_frame(f0, com.R, pre.eff_stance)
    tau_st = jacobian_transpose_control(joints.q, fb, CFG.kinematics)
    tau = jnp.where(pre.eff_stance[..., None], tau_st, pre.tau_swing)
    tau = jnp.clip(tau, CFG.balance.torque_min, CFG.balance.torque_max)
    wb_new = _STEPPER_TAU(wb, tau, DT, N_SUB)
    return wb_new, _advance_carry(pre, carry)


def test_mpc_fused_tick_matches_composition():
    """One MPC tick from mixed init states: fused (3 kernels) == XLA
    composition. Both sides run the identical f32 Riccati kernel, so
    parity reduces to the precursor block (proven above) + wiring."""
    wb = init_whole_body_state(CFG, (B,), dtype=F64)
    rng = np.random.default_rng(5)
    wb = wb._replace(
        q=wb.q + jnp.asarray(rng.uniform(-0.05, 0.05, (B, 4, 3))),
        x=wb.x.at[:, 2].add(jnp.asarray(rng.uniform(-0.005, 0.01, (B,)))))
    carry = init_commander_carry((B,), dtype=F64)
    carry = carry._replace(standing=jnp.arange(B) % 2 == 0,
                           gait_time=jnp.where(jnp.arange(B) % 4 == 0,
                                               0.05, -1.0))
    cmd = jnp.broadcast_to(jnp.array([0.15, 0.0, 0.0, 0.0, 0.0, 0.05],
                                     F64), (B, 6))

    wb_x, carry_x = _mpc_composed_step(wb, carry, cmd)

    @jax.jit
    def fused(wb, carry, cmd):
        state_p, _ = pack_whole_body_state(wb, ROWS)
        carry_p = pack_commander_carry(carry, ROWS, B)
        state_p, carry_p, _ = _TICK_MPC(state_p, carry_p,
                                        pack_comps(cmd, ROWS), DT, N_SUB)
        return (unpack_whole_body_state(state_p, (B,)),
                unpack_commander_carry(carry_p, (B,), carry))

    wb_f, carry_f = fused(wb, carry, cmd)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(wb_f, name)),
            np.asarray(getattr(wb_x, name)), atol=1e-7, err_msg=name)
    np.testing.assert_array_equal(np.asarray(carry_f.standing),
                                  np.asarray(carry_x.standing))
    np.testing.assert_allclose(np.asarray(carry_f.gait_time),
                               np.asarray(carry_x.gait_time), atol=1e-12)


def test_mpc_fused_tick_rollout_standup():
    """Short stand-up through the fused MPC tick stays finite and keeps
    the commander state machine moving (device behavior is driven by
    scripts/verify_mpc_fused_tick.py)."""
    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    res = rollout_whole_body_fused(wb, carry, cmd, 4, _TICK_MPC,
                                   n_substeps=N_SUB, record=True)
    assert np.isfinite(np.asarray(res.plant.u)).all()
    assert np.isfinite(np.asarray(res.plant.x)).all()
    assert res.warm is None


def test_mpc_fused_decimated_every1_matches_pertick():
    """rollout_whole_body_fused_decimated with mpc_every=1 is BITWISE the
    per-tick fused MPC rollout (the hold loop vanishes), validating the
    group/hold plumbing; mpc_every=2 stays finite with the zero-order
    hold applied."""
    from quadruped_control_tpu.sim.pallas_tick import (
        rollout_whole_body_fused_decimated,
    )

    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    res_p = rollout_whole_body_fused(wb, carry, cmd, 4, _TICK_MPC,
                                     n_substeps=N_SUB, record=False)
    res_d = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC, mpc_every=1, n_substeps=N_SUB,
        record=False)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_d.plant, name)),
            np.asarray(getattr(res_p.plant, name)), err_msg=name)

    res_2 = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC, mpc_every=2, n_substeps=N_SUB,
        record=True)
    assert np.isfinite(np.asarray(res_2.plant.u)).all()
    assert res_2.trace.x.shape[0] == 2  # one entry per MPC group


_TICK_MPC_WARM = make_fused_tick(MODEL, CFG, _CONTACT, rows=ROWS,
                                 controller="mpc", mpc_horizon=_MPC_N,
                                 mpc_dt=_MPC_DT, mpc_iterations=_MPC_IT,
                                 mpc_warm_start=True, interpret=True)


def test_mpc_warm_tick_first_tick_is_cold_start():
    """The zero/schedule=-1 warm carry (init_mpc_warm_packed) resets every
    horizon row, so tick 1 of an mpc_warm_start tick is BITWISE the cold
    MPC tick (same guarantee as the balance-QP warm tick)."""
    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)

    res_c = rollout_whole_body_fused(wb, carry, cmd, 1, _TICK_MPC,
                                     n_substeps=N_SUB, record=False)
    res_w = rollout_whole_body_fused(wb, carry, cmd, 1, _TICK_MPC_WARM,
                                     n_substeps=N_SUB, record=False)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_w.plant, name)),
            np.asarray(getattr(res_c.plant, name)), err_msg=name)


def test_mpc_warm_tick_rollout_standup():
    """Short stand-up through the WARM fused MPC tick: the receding-horizon
    warm start (previous tick's F/s/z + schedule-change cold resets) keeps
    the loop finite and behaviorally on par with the cold tick at equal
    iterations (device economics: scripts/verify_mpc_fused_tick.py)."""
    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    res_w = rollout_whole_body_fused(wb, carry, cmd, 4, _TICK_MPC_WARM,
                                     n_substeps=N_SUB, record=True)
    res_c = rollout_whole_body_fused(wb, carry, cmd, 4, _TICK_MPC,
                                     n_substeps=N_SUB, record=True)
    assert np.isfinite(np.asarray(res_w.plant.u)).all()
    assert np.isfinite(np.asarray(res_w.plant.x)).all()
    assert res_w.warm is not None and len(res_w.warm) == 3
    # Warm vs cold trajectories agree to the solver tolerance (the warm
    # IPM lands on an equal-or-better iterate of the same horizon QP;
    # forces differ only along the documented near-nullspace).
    dz = np.abs(np.asarray(res_w.plant.x[:, 2])
                - np.asarray(res_c.plant.x[:, 2])).max()
    assert dz < 5e-3, dz


def test_mpc_warm_decimated_every1_matches_pertick():
    """Decimated rollout with a WARM MPC tick at mpc_every=1 is BITWISE
    the per-tick warm rollout — the warm carry threads across solve
    groups exactly like the per-tick scan carry."""
    from quadruped_control_tpu.sim.pallas_tick import (
        rollout_whole_body_fused_decimated,
    )

    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    res_p = rollout_whole_body_fused(wb, carry, cmd, 4, _TICK_MPC_WARM,
                                     n_substeps=N_SUB, record=False)
    res_d = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC_WARM, mpc_every=1, n_substeps=N_SUB,
        record=False)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_d.plant, name)),
            np.asarray(getattr(res_p.plant, name)), err_msg=name)

    res_2 = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC_WARM, mpc_every=2, n_substeps=N_SUB,
        record=True)
    assert np.isfinite(np.asarray(res_2.plant.u)).all()


def test_mpc_decimated_hold_mode_horizon():
    """hold_mode="horizon" (held ticks consume the horizon's own F_k,
    VERDICT round-2 #5) reduces BITWISE to "zoh" when the hold window
    fits one horizon step (every k maps to F_0), and stays finite when
    the window outruns the horizon step (mpc_dt == dt -> k maps to F_k).
    """
    from quadruped_control_tpu.sim.pallas_tick import (
        rollout_whole_body_fused_decimated,
    )

    Bs = 64
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)
    # _MPC_DT = 0.03 >= 2 ticks of dt -> all held ticks map to step 0.
    res_z = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC, mpc_every=2, n_substeps=N_SUB,
        record=False, hold_mode="zoh")
    res_h = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC, mpc_every=2, n_substeps=N_SUB,
        record=False, hold_mode="horizon")
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_array_equal(
            np.asarray(getattr(res_h.plant, name)),
            np.asarray(getattr(res_z.plant, name)), err_msg=name)

    # mpc_dt == dt: held tick k applies F_k (the window outruns one
    # horizon step; the map is non-trivial) — must differ from ZOH and
    # stay finite.
    tick_fast = make_fused_tick(MODEL, CFG, _CONTACT, rows=ROWS,
                                controller="mpc", mpc_horizon=4,
                                mpc_dt=float(DT), mpc_iterations=_MPC_IT,
                                interpret=True)
    res_hz = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, tick_fast, mpc_every=4, n_substeps=N_SUB,
        record=False, hold_mode="horizon")
    res_zz = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, tick_fast, mpc_every=4, n_substeps=N_SUB,
        record=False, hold_mode="zoh")
    assert np.isfinite(np.asarray(res_hz.plant.u)).all()
    assert np.abs(np.asarray(res_hz.plant.q)
                  - np.asarray(res_zz.plant.q)).max() > 0.0


def test_sharded_mpc_fused_rollout_matches_single():
    """shard_map'd WARM MPC fused tick (decimated driver — the
    deployment-shape configuration) over the 8-device CPU mesh == the
    unsharded decimated rollout (VERDICT round-2 #6: the MPC-fused tick
    must have a multi-device execution)."""
    from quadruped_control_tpu.parallel.mesh import (
        scenario_mesh,
        shard_rollout_whole_body_fused,
    )
    from quadruped_control_tpu.sim.pallas_tick import (
        rollout_whole_body_fused_decimated,
    )

    Bs = 16  # 2 per device; each shard pads to one tile internally
    wb = init_whole_body_state(CFG, (Bs,), dtype=F64)
    carry = init_commander_carry((Bs,), dtype=F64)
    cmd = jnp.zeros((Bs, 6), F64)

    run = shard_rollout_whole_body_fused(scenario_mesh(), _TICK_MPC_WARM,
                                         n_substeps=N_SUB, mpc_every=2)
    res_sh = run(wb, carry, cmd, 4)
    res_1 = rollout_whole_body_fused_decimated(
        wb, carry, cmd, 4, _TICK_MPC_WARM, mpc_every=2, n_substeps=N_SUB,
        record=False)
    for name in ("R", "x", "u", "q", "anchor"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_sh.plant, name)),
            np.asarray(getattr(res_1.plant, name)), atol=1e-12,
            err_msg=name)
    np.testing.assert_allclose(np.asarray(res_sh.carry.gait_time),
                               np.asarray(res_1.carry.gait_time),
                               atol=1e-12)
