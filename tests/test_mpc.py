"""Receding-horizon MPC tests (BASELINE config 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.mpc.horizon import (
    NX,
    build_mpc_qp,
    make_reference_trajectory,
    solve_mpc,
    srb_discrete_dynamics,
)
from quadruped_control_tpu.solver.reference import solve_qp_active_set
from quadruped_control_tpu.utils.scenarios import standing_feet

CFG = mit_cheetah_physical_config()
DT = 0.03  # 30 ms MPC step (Di Carlo-style)


def hover_state(dtype=jnp.float64):
    xi0 = jnp.zeros(NX, dtype=dtype)
    xi0 = xi0.at[5].set(0.26).at[12].set(1.0)
    return xi0


def standing_setup(N, dtype=jnp.float64):
    xi0 = hover_state(dtype)
    feet_b = standing_feet(CFG, dtype)
    feet_w = feet_b + jnp.array([0.0, 0.0, 0.26], dtype=dtype)
    x_com = jnp.array([0.0, 0.0, 0.26], dtype=dtype)
    stance = jnp.ones((N, 4), dtype=bool)
    cmd = jnp.zeros(6, dtype=dtype)
    ref = make_reference_trajectory(xi0, cmd, N, DT)
    return xi0, ref, feet_w, x_com, stance


def test_dynamics_matrices_structure():
    A, B = srb_discrete_dynamics(
        jnp.asarray(0.3), standing_feet(CFG, jnp.float64) + jnp.array([0, 0, 0.26]),
        jnp.array([0.0, 0.0, 0.26]), DT, CFG,
    )
    assert A.shape == (NX, NX) and B.shape == (NX, 12)
    # Gravity affine term.
    np.testing.assert_allclose(float(A[11, 12]), -DT * 9.81)
    # Force-to-acceleration blocks.
    np.testing.assert_allclose(
        np.asarray(B[9:12, 0:3]), DT / 11.0 * np.eye(3), atol=1e-12
    )


def test_hover_forces_support_weight():
    """All-stance hover: total fz per step ~ m g, split across legs."""
    N = 8
    xi0, ref, feet_w, x_com, stance = standing_setup(N)
    F, sol = solve_mpc(xi0, ref, jnp.asarray(0.0), feet_w, x_com, stance,
                       N, DT, CFG)
    f = np.asarray(F).reshape(N, 4, 3)
    total_fz = f[..., 2].sum(axis=-1)
    np.testing.assert_allclose(total_fz, 11.0 * 9.81, rtol=0.05)
    assert np.all(f[..., 2] >= CFG.balance.fz_min - 1e-6)
    assert np.all(f[..., 2] <= CFG.balance.fz_max + 1e-6)


def test_mpc_matches_oracle_small_horizon():
    N = 4
    xi0, ref, feet_w, x_com, stance = standing_setup(N)
    # Perturb the initial state so constraints matter.
    xi0 = xi0.at[5].set(0.22).at[9].set(0.3).at[0].set(0.1)
    qp = build_mpc_qp(xi0, ref, jnp.asarray(0.0), feet_w, x_com, stance,
                      N, DT, CFG)
    F, sol = solve_mpc(xi0, ref, jnp.asarray(0.0), feet_w, x_com, stance,
                       N, DT, CFG, iterations=40)

    x0 = np.zeros(12 * N)
    x0[2::3] = 65.0  # mid fz on every leg/step
    ref_sol = solve_qp_active_set(
        np.asarray(qp.H), np.asarray(qp.c), np.asarray(qp.G),
        np.asarray(qp.h), x0=x0, max_iter=500,
    )
    assert ref_sol.status == "optimal" and ref_sol.kkt_error < 1e-6
    obj_ipm = 0.5 * np.asarray(sol.x) @ np.asarray(qp.H) @ np.asarray(sol.x) \
        + np.asarray(qp.c) @ np.asarray(sol.x)
    obj_ref = 0.5 * ref_sol.x @ np.asarray(qp.H) @ ref_sol.x \
        + np.asarray(qp.c) @ ref_sol.x
    assert abs(obj_ipm - obj_ref) < 1e-5 * (1 + abs(obj_ref))


def test_mpc_rollout_recovers_height():
    """Closed-loop on the linearized model: starting low, the MPC plan
    drives the height to the reference."""
    N = 12
    xi0, ref, feet_w, x_com, stance = standing_setup(N)
    xi0 = xi0.at[5].set(0.20)
    F, sol = solve_mpc(xi0, ref, jnp.asarray(0.0), feet_w, x_com, stance,
                       N, DT, CFG, iterations=40)
    A, B = srb_discrete_dynamics(jnp.asarray(0.0), feet_w, x_com, DT, CFG)
    xi = np.asarray(xi0)
    heights = []
    for t in range(N):
        xi = np.asarray(A) @ xi + np.asarray(B) @ np.asarray(F[t])
        heights.append(xi[5])
    assert abs(heights[-1] - 0.26) < 0.02, heights


def test_mpc_trot_schedule_swing_forces_zero():
    N = 6
    xi0, ref, feet_w, x_com, _ = standing_setup(N)
    # Alternating trot pairs over the horizon.
    stance = jnp.asarray(
        np.array([[True, False, False, True] if t % 2 == 0 else
                  [False, True, True, False] for t in range(N)])
    )
    F, sol = solve_mpc(xi0, ref, jnp.asarray(0.0), feet_w, x_com, stance,
                       N, DT, CFG, iterations=40)
    f = np.asarray(F).reshape(N, 4, 3)
    swing = ~np.asarray(stance)
    assert np.max(np.abs(f[swing])) < 1e-6


def test_mpc_batched():
    N = 4
    xi0, ref, feet_w, x_com, stance = standing_setup(N)
    B = 3
    xi0_b = jnp.tile(xi0, (B, 1)).at[:, 5].set(jnp.array([0.20, 0.26, 0.30]))
    ref_b = jnp.tile(ref, (B, 1, 1))
    feet_b = jnp.tile(feet_w, (B, 1, 1))
    x_b = jnp.tile(x_com, (B, 1))
    stance_b = jnp.tile(stance, (B, 1, 1))
    yaw_b = jnp.zeros(B, dtype=xi0.dtype)
    F, sol = solve_mpc(xi0_b, ref_b, yaw_b, feet_b, x_b, stance_b, N, DT, CFG)
    assert F.shape == (B, N, 12)
    assert np.all(np.isfinite(np.asarray(F)))
