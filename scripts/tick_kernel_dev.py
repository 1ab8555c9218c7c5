#!/usr/bin/env python
"""Dev harness: fused 3-kernel tick vs the XLA-composed reference.

Both paths run ONE tick from identical states along a common stand-up /
trot trajectory (lockstep with reset, so roundoff cannot compound through
contact chaos), in float64 interpret mode.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from quadruped_control_tpu.config import (  # noqa: E402
    mit_cheetah_physical_config,
)
from quadruped_control_tpu.control.commander import (  # noqa: E402
    CommanderCarry,
    commander_precursors,
    init_commander_carry,
)
from quadruped_control_tpu.ops.dynamics import (  # noqa: E402
    forces_to_body_frame,
)
from quadruped_control_tpu.ops.kinematics import (  # noqa: E402
    jacobian_transpose_control,
)
from quadruped_control_tpu.sim import (  # noqa: E402
    ContactConfig,
    init_whole_body_state,
    make_pallas_stepper,
    mit_cheetah_whole_body_model,
    whole_body_com_state,
)
from quadruped_control_tpu.sim.pallas_tick import (  # noqa: E402
    make_fused_tick,
    pack_whole_body_state,
    unpack_whole_body_state,
)
from quadruped_control_tpu.control.pallas_commander import (  # noqa: E402
    pack_comps,
    pack_commander_carry,
    unpack_commander_carry,
)
from quadruped_control_tpu.solver.pallas_fused import (  # noqa: E402
    solve_balance_qp_fused,
)
from quadruped_control_tpu.types import PlannerState  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


ROWS = 8
B = ROWS * 128
N_SUB = 4
QP_IT = 12
TICKS = 6


def main():
    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float64)
    contact = ContactConfig()
    dt = 1.0 / cfg.frequency

    tick = make_fused_tick(model, cfg, contact, rows=ROWS,
                           qp_iterations=QP_IT, qp_polish=True,
                           qp_warm_start=False, interpret=True)
    stepper_tau = make_pallas_stepper(model, cfg, contact, rows=ROWS,
                                      interpret=True, prefactor="kernel")

    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float64)
    # Spread states: perturb heights/joints so lanes differ.
    key = jax.random.PRNGKey(1)
    wb = wb._replace(
        q=wb.q + 0.05 * jax.random.normal(key, wb.q.shape),
        x=wb.x.at[:, 2].add(
            0.01 * jax.random.normal(jax.random.fold_in(key, 1), (B,))),
    )
    carry = init_commander_carry((B,), dtype=jnp.float64)
    # Half the lanes start standing so the gait path is exercised.
    carry = carry._replace(
        standing=jnp.arange(B) % 2 == 0,
        gait_time=jnp.where(jnp.arange(B) % 4 == 0, 0.05, -1.0),
    )
    cmd = jnp.broadcast_to(jnp.array([0.15, 0.0, 0.0, 0.0, 0.0, 0.05],
                                     jnp.float64), (B, 6))

    @jax.jit
    def xla_tick(wb, carry):
        com, joints = whole_body_com_state(wb, cfg)
        pre = commander_precursors(com, joints, carry, cmd, dt, cfg)
        sol = solve_balance_qp_fused(
            com.R, pre.R_d, com.x, com.xdot, com.w, pre.x_d, pre.xdot_d,
            pre.w_d, pre.feet_body, pre.eff_stance, cfg.balance,
            iterations=QP_IT, polish=True, rows=ROWS, interpret=True)
        fb = forces_to_body_frame(sol.x, com.R, pre.eff_stance)
        tau_st = jacobian_transpose_control(joints.q, fb, cfg.kinematics)
        tau = jnp.where(pre.eff_stance[..., None], tau_st, pre.tau_swing)
        tau = jnp.clip(tau, cfg.balance.torque_min, cfg.balance.torque_max)
        wb_new = stepper_tau(wb, tau, dt, N_SUB)
        carry_new = CommanderCarry(
            standing=pre.standing, gait_time=pre.gait_time,
            planner=PlannerState(
                prev_in_stance=pre.plan.prev_in_stance,
                initialized=pre.plan.initialized, traj=pre.traj),
            qp_x=carry.qp_x, qp_s=carry.qp_s, qp_z=carry.qp_z)
        return wb_new, carry_new

    @jax.jit
    def fused_tick_once(wb, carry):
        state_p, _ = pack_whole_body_state(wb, ROWS)
        carry_p = pack_commander_carry(carry, ROWS, B)
        cmd_p = pack_comps(cmd, ROWS)
        state_p, carry_p, _ = tick(state_p, carry_p, cmd_p, dt, N_SUB)
        return (unpack_whole_body_state(state_p, (B,)),
                unpack_commander_carry(carry_p, (B,), carry))

    from quadruped_control_tpu.control.pallas_commander import (
        commander_pre_pallas_packed,
        unpack_comps,
    )
    from quadruped_control_tpu.ops.dynamics import pd_accelerations
    from quadruped_control_tpu.solver.pallas_fused import srb_rhs

    @jax.jit
    def debug_stage(wb, carry):
        """QP inputs + solutions from both paths."""
        com, joints = whole_body_com_state(wb, cfg)
        pre = commander_precursors(com, joints, carry, cmd, dt, cfg)
        xddot_d, wdot_d = pd_accelerations(
            com.R, pre.R_d, com.x, com.xdot, com.w, pre.x_d, pre.xdot_d,
            pre.w_d, cfg.balance)
        b_x = srb_rhs(com.R, pre.w_d, xddot_d, wdot_d, cfg.balance)
        com_ft = jnp.einsum("bij,blj->bli", com.R, pre.feet_body)
        r_x = jnp.where(pre.eff_stance[..., None], com_ft, 0.0)
        sol_x = solve_balance_qp_fused(
            com.R, pre.R_d, com.x, com.xdot, com.w, pre.x_d, pre.xdot_d,
            pre.w_d, pre.feet_body, pre.eff_stance, cfg.balance,
            iterations=QP_IT, polish=True, rows=ROWS, interpret=True)

        state_p, _ = pack_whole_body_state(wb, ROWS)
        carry_p = pack_commander_carry(carry, ROWS, B)
        cmd_p = pack_comps(cmd, ROWS)
        outs = commander_pre_pallas_packed(
            state_p, carry_p, cmd_p, consts=tick.consts, rows=ROWS,
            interpret=True)
        r_f, b_f, st_f = (unpack_comps(outs[0]), unpack_comps(outs[1]),
                          unpack_comps(outs[2]))
        tausw_f = unpack_comps(outs[6])
        from quadruped_control_tpu.solver.pallas_fused import (
            solve_grf_qp_fused_packed,
        )
        xo, so, zo, diag = solve_grf_qp_fused_packed(
            outs[0], outs[1], outs[2], outs[3], outs[4], outs[5],
            s_diag=tuple(cfg.balance.s_diag),
            w_diag=float(cfg.balance.w_diag), iterations=QP_IT,
            polish=True, rows=ROWS, interpret=True)
        return (r_x, b_x, pre.tau_swing.reshape(B, 12), sol_x.x,
                sol_x.converged, r_f, b_f, tausw_f, unpack_comps(xo),
                unpack_comps(diag)[:, 1] > 0.5)

    def dbg(t, wb, carry):
        (r_x, b_x, tsw_x, x_x, cv_x, r_f, b_f, tsw_f, x_f, cv_f) = \
            jax.tree.map(np.asarray, debug_stage(wb, carry))
        for name, a, b in [("r", r_x.reshape(B, 12), r_f),
                           ("b", b_x, b_f), ("tau_sw", tsw_x, tsw_f),
                           ("qp.x", x_x, x_f)]:
            d = np.abs(a - b).max()
            log(f"  dbg t={t} {name}: max abs diff {d:.3e} "
                f"(scale {np.abs(a).max():.3g})")
        log(f"  dbg t={t} conv: xla {cv_x.mean():.4f} fused "
            f"{cv_f.mean():.4f} mismatch {(cv_x != cv_f).mean():.4f}")

    worst = 0.0
    for t in range(TICKS):
        if t == 1:
            dbg(t, wb, carry)
        wb_x, carry_x = xla_tick(wb, carry)
        wb_f, carry_f = fused_tick_once(wb, carry)

        for name, a, b in [
            ("R", wb_x.R, wb_f.R), ("x", wb_x.x, wb_f.x),
            ("u", wb_x.u, wb_f.u), ("q", wb_x.q, wb_f.q),
            ("anchor", wb_x.anchor, wb_f.anchor),
            ("gait_time", carry_x.gait_time, carry_f.gait_time),
            ("coeffs", carry_x.planner.traj.coeffs,
             carry_f.planner.traj.coeffs),
        ]:
            a = np.asarray(a, np.float64)
            bb = np.asarray(b, np.float64)
            scale = 1.0 + np.max(np.abs(a))
            per_lane = np.abs(a - bb).reshape(B, -1).max(axis=1) / scale
            rel = float(per_lane.max())
            p99 = float(np.quantile(per_lane, 0.99))
            frac_bad = float((per_lane > 1e-8).mean())
            worst = max(worst, rel)
            if p99 > 2e-6 or rel > 1e-3:
                idx = np.unravel_index(np.argmax(np.abs(a - bb)), a.shape)
                log(f"t={t} {name}: max {rel:.3e} p99 {p99:.3e} "
                    f"frac>1e-8 {frac_bad:.4f} at {idx} "
                    f"xla {a[idx]:.9g} fused {bb[idx]:.9g}")
                return 1
            if rel > 1e-6:
                log(f"  t={t} {name}: isolated lanes max {rel:.2e} "
                    f"p99 {p99:.2e} frac>1e-8 {frac_bad:.4f}")
        for name, a, b in [
            ("standing", carry_x.standing, carry_f.standing),
            ("prev", carry_x.planner.prev_in_stance,
             carry_f.planner.prev_in_stance),
            ("valid", carry_x.planner.traj.valid,
             carry_f.planner.traj.valid),
        ]:
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                log(f"t={t} {name}: BOOL MISMATCH")
                return 1
        log(f"tick {t} ok (worst so far {worst:.3e})")
        # advance along the XLA trajectory
        wb, carry = wb_x, carry_x

    log(f"ALL {TICKS} TICKS PASS, worst rel {worst:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
