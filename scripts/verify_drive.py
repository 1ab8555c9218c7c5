#!/usr/bin/env python
"""Verification drive: exercise the NEW public surfaces on the real TPU in
float32 — the fused balance solve (solver/pallas_fused.py) on a standing
scenario with physical checks, and the structured Riccati MPC
(mpc/structured.py) on a hover problem."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import (
    mit_cheetah_config,
    mit_cheetah_physical_config,
)
from quadruped_control_tpu.mpc.structured import solve_mpc_structured
from quadruped_control_tpu.mpc.horizon import NX, make_reference_trajectory
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.utils.scenarios import standing_feet

B = 1024
N = 8
DT = 0.03


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfg = mit_cheetah_physical_config()
    dtype = jnp.float32

    @jax.jit
    def drive():
        # --- fused balance solve: B standing instances, all legs stance ---
        feet = jnp.broadcast_to(standing_feet(cfg, dtype), (B, 4, 3))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
        x = jnp.zeros((B, 3), dtype).at[:, 2].set(0.26)
        zero3 = jnp.zeros((B, 3), dtype)
        stance = jnp.ones((B, 4), dtype=bool)
        sol = solve_balance_qp_fused(
            eye, eye, x, zero3, zero3, x, zero3, zero3, feet, stance,
            cfg.balance)
        f = sol.x.reshape(B, 4, 3)
        # --- structured MPC hover ---
        xi0 = jnp.zeros(NX, dtype).at[5].set(0.22).at[12].set(1.0)
        feet_w = standing_feet(cfg, dtype) + jnp.array([0, 0, 0.26], dtype)
        ref = make_reference_trajectory(xi0, jnp.zeros(6, dtype), N, DT)
        F, msol = solve_mpc_structured(
            xi0, ref, jnp.asarray(0.0, dtype), feet_w,
            jnp.array([0, 0, 0.26], dtype), jnp.ones((N, 4), dtype=bool),
            N, DT, cfg, iterations=30)
        return f, sol.converged, F, msol.converged

    f, conv, F, mconv = jax.block_until_ready(drive())

    # --- two-phase fused solve + commander fused backend -----------------
    from quadruped_control_tpu.control.commander import (
        commander_step,
        init_commander_carry,
    )
    from quadruped_control_tpu.control.plant import init_plant_state
    from quadruped_control_tpu.utils.scenarios import grf_scenarios

    @jax.jit
    def drive2(key):
        s = grf_scenarios(key, 16384, cfg, dtype=jnp.float32)
        sol2 = solve_balance_qp_fused(
            s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
            s.stance, cfg.balance, rows=16, two_phase=True,
            polish_sweeps=2, split=True)
        plant = init_plant_state(cfg, (1024,), dtype=jnp.float32)
        carry = init_commander_carry((1024,), dtype=jnp.float32)
        cmd = jnp.zeros((1024, 6), jnp.float32)
        out, _ = commander_step(plant.com, plant.joints, carry, cmd,
                                1.0 / cfg.frequency, cfg,
                                qp_backend="fused")
        return sol2.converged, out.torques

    # --- Pallas Riccati MPC kernel ----------------------------------------
    from quadruped_control_tpu.mpc.pallas_riccati import solve_mpc_fused

    @jax.jit
    def drive3():
        Bm = 1024
        xi0 = jnp.zeros((Bm, NX), dtype).at[:, 5].set(0.22)
        xi0 = xi0.at[:, 12].set(1.0)
        ref = make_reference_trajectory(xi0, jnp.zeros((Bm, 6), dtype),
                                        N, DT)
        feet_w = jnp.broadcast_to(
            standing_feet(cfg, dtype) + jnp.array([0, 0, 0.26], dtype),
            (Bm, 4, 3))
        Fm, msol2 = solve_mpc_fused(
            xi0, ref, jnp.zeros((Bm,), dtype), feet_w,
            jnp.tile(jnp.array([0, 0, 0.26], dtype), (Bm, 1)),
            jnp.ones((Bm, N, 4), dtype=bool), N, DT, cfg, iterations=40)
        return Fm, msol2.converged

    Fm3, mconv3 = jax.block_until_ready(drive3())
    Fm3 = np.asarray(Fm3).reshape(-1, N, 4, 3)
    print(f"riccati kernel: conv {float(np.mean(np.asarray(mconv3))):.4f}, "
          f"step-0 sum fz {Fm3[0, 0, :, 2].sum():.1f} N, finite "
          f"{np.all(np.isfinite(Fm3))}", file=sys.stderr)
    assert np.all(np.isfinite(Fm3))
    assert float(np.mean(np.asarray(mconv3))) > 0.98
    assert Fm3[0, 0, :, 2].sum() > 11 * 9.81  # pushes harder when low

    conv2, tau = jax.block_until_ready(drive2(jax.random.key(7)))
    print(f"two-phase: conv {float(np.mean(np.asarray(conv2))):.4f}; "
          f"commander-fused torques finite "
          f"{bool(np.all(np.isfinite(np.asarray(tau))))}, max "
          f"{float(np.max(np.abs(np.asarray(tau)))):.2f} N*m",
          file=sys.stderr)
    assert float(np.mean(np.asarray(conv2))) > 0.99
    assert np.all(np.isfinite(np.asarray(tau)))
    assert float(np.max(np.abs(np.asarray(tau)))) <= 20.0 + 1e-5
    f = np.asarray(f)
    total_fz = f[..., 2].sum(-1)
    print(f"fused: conv {np.mean(conv):.4f}, sum fz mean "
          f"{total_fz.mean():.2f} N (mg = {11 * 9.81:.2f}), "
          f"fz range [{f[..., 2].min():.1f}, {f[..., 2].max():.1f}]",
          file=sys.stderr)
    assert np.mean(conv) > 0.99
    assert abs(total_fz.mean() - 11 * 9.81) < 5.0
    assert f[..., 2].min() > 9.9 and f[..., 2].max() < 120.1

    Fm = np.asarray(F).reshape(N, 4, 3)
    print(f"structured MPC: conv {bool(mconv)}, step-0 sum fz "
          f"{Fm[0, :, 2].sum():.1f} N, finite {np.all(np.isfinite(Fm))}",
          file=sys.stderr)
    assert np.all(np.isfinite(Fm))
    # Starting 4 cm low the plan pushes harder than weight initially.
    assert Fm[0, :, 2].sum() > 11 * 9.81
    print("VERIFY OK", file=sys.stderr)


if __name__ == "__main__":
    main()
