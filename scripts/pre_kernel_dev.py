#!/usr/bin/env python
"""Dev harness: commander-pre kernel vs commander_precursors, interpret f64.

Runs both in lockstep over synthetic state streams that cross standing /
gait-start / stance-swing edges, comparing every output each tick.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from quadruped_control_tpu.config import mit_cheetah_physical_config  # noqa: E402
from quadruped_control_tpu.control.commander import (  # noqa: E402
    commander_precursors,
    init_commander_carry,
)
from quadruped_control_tpu.control.pallas_commander import (  # noqa: E402
    CommanderConsts,
    commander_pre_pallas_packed,
    pack_comps,
    pack_commander_carry,
    unpack_comps,
)
from quadruped_control_tpu.math.rotations import so3_exp  # noqa: E402
from quadruped_control_tpu.ops import dynamics as dyn  # noqa: E402
from quadruped_control_tpu.solver.pallas_fused import srb_rhs  # noqa: E402
from quadruped_control_tpu.types import ComState, JointState  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


ROWS = 8
B = ROWS * 128
DT = 1.0 / 300.0


def synth_state(key, t):
    ks = jax.random.split(key, 8)
    rpy_scale = 0.15
    aa = rpy_scale * jax.random.normal(ks[0], (B, 3))
    R = so3_exp(aa)
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


def main():
    cfg = mit_cheetah_physical_config()
    consts = CommanderConsts(cfg, DT)

    carry_x = init_commander_carry((B,), dtype=jnp.float64)
    carry_p = pack_commander_carry(carry_x, ROWS, B)

    @jax.jit
    def kernel_step(R, x, u, q, cmd, carry_p):
        state_flat = jnp.concatenate([
            R.reshape(B, 9), x, u, q.reshape(B, 12)], axis=-1)
        return commander_pre_pallas_packed(
            pack_comps(state_flat, ROWS), carry_p,
            pack_comps(cmd, ROWS), consts=consts, rows=ROWS,
            interpret=True)

    @jax.jit
    def oracle_step(R, x, u, q, cmd, carry_x):
        w_w = (R @ u[:, :3, None])[..., 0]
        xd_w = (R @ u[:, 3:6, None])[..., 0]
        com = ComState(R=R, x=x, xdot=xd_w, w=w_w)
        joints = JointState(q=q, qdot=u[:, 6:].reshape(B, 4, 3))
        pre = commander_precursors(com, joints, carry_x, cmd, DT, cfg)
        xddot_d, wdot_d = dyn.pd_accelerations(
            R, pre.R_d, x, xd_w, w_w, pre.x_d, pre.xdot_d, pre.w_d,
            cfg.balance)
        b_x = srb_rhs(R, pre.w_d, xddot_d, wdot_d, cfg.balance)
        com_ft = jnp.einsum("bij,blj->bli", R, pre.feet_body)
        r_x = jnp.where(pre.eff_stance[..., None], com_ft, 0.0)
        return pre, b_x, r_x

    key = jax.random.PRNGKey(0)
    worst = {}
    for t in range(30):
        key, sub = jax.random.split(key)
        R, x, u, q, cmd = synth_state(sub, t)

        outs = kernel_step(R, x, u, q, cmd, carry_p)
        r_k, b_k, st_k, mu_k, fmin_k, fmax_k, tausw_k, carry_k, qref_k = outs
        pre, b_x, r_x = oracle_step(R, x, u, q, cmd, carry_x)

        def cmp(name, kernel_packed, oracle, tol):
            got = unpack_comps(kernel_packed)
            want = np.asarray(oracle).reshape(B, -1)
            err = float(np.max(np.abs(np.asarray(got) - want)))
            scale = 1.0 + float(np.max(np.abs(want)))
            rel = err / scale
            worst[name] = max(worst.get(name, 0.0), rel)
            if rel > tol:
                idx = np.unravel_index(
                    np.argmax(np.abs(np.asarray(got) - want)), want.shape)
                log(f"t={t} {name}: REL ERR {rel:.3e} at {idx} "
                    f"got {np.asarray(got)[idx]:.9g} want {want[idx]:.9g}")
                return False
            return True

        ok = True
        ok &= cmp("r", r_k, r_x, 1e-9)
        ok &= cmp("b", b_k, b_x, 1e-8)
        ok &= cmp("st", st_k, pre.eff_stance.astype(jnp.float64), 0.0)
        ok &= cmp("tau_swing", tausw_k, pre.tau_swing, 1e-7)
        ok &= cmp("q_ref", qref_k, pre.q_ref, 1e-8)
        # carry pieces
        cflat = unpack_comps(carry_k)
        ok &= cmp("c.standing", carry_k[:, 0:1],
                  pre.standing.astype(jnp.float64), 0.0)
        ok &= cmp("c.gait_time", carry_k[:, 1:2], pre.gait_time, 1e-12)
        ok &= cmp("c.prev", carry_k[:, 2:6],
                  pre.gait.in_stance.astype(jnp.float64), 0.0)
        ok &= cmp("c.coef", carry_k[:, 7:91],
                  pre.traj.coeffs.reshape(B, 84), 1e-10)
        ok &= cmp("c.valid", carry_k[:, 91:95],
                  pre.traj.valid.astype(jnp.float64), 0.0)
        if not ok:
            log(f"FAILED at tick {t}")
            return 1

        # advance carries in lockstep
        from quadruped_control_tpu.control.commander import CommanderCarry
        from quadruped_control_tpu.types import PlannerState
        carry_x = CommanderCarry(
            standing=pre.standing, gait_time=pre.gait_time,
            planner=PlannerState(
                prev_in_stance=pre.plan.prev_in_stance,
                initialized=pre.plan.initialized, traj=pre.traj),
            qp_x=carry_x.qp_x, qp_s=carry_x.qp_s, qp_z=carry_x.qp_z)
        carry_p = carry_k
        del cflat

    log("ALL TICKS PASS")
    for k, v in sorted(worst.items()):
        log(f"  worst {k}: {v:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
