"""Structured (Riccati) MPC solver tests: operator identities vs the
condensed matrices, KKT-solve equivalence, and end-to-end parity with the
condensed path + float64 oracle."""

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.mpc import structured as ms
from quadruped_control_tpu.mpc.horizon import (
    build_mpc_qp,
    make_reference_trajectory,
    solve_mpc,
)
from quadruped_control_tpu.solver.reference import solve_qp_active_set
from quadruped_control_tpu.utils.scenarios import standing_feet

CFG = mit_cheetah_physical_config()
DT = 0.03


def setup(N, dtype=jnp.float64, trot=False, perturb=True):
    xi0 = jnp.zeros(ms.NX, dtype=dtype).at[5].set(0.26).at[12].set(1.0)
    if perturb:
        xi0 = xi0.at[5].set(0.22).at[9].set(0.3).at[0].set(0.1)
    feet_b = standing_feet(CFG, dtype)
    feet_w = feet_b + jnp.array([0.0, 0.0, 0.26], dtype=dtype)
    x_com = jnp.array([0.0, 0.0, 0.26], dtype=dtype)
    if trot:
        stance = jnp.asarray(
            np.array([[True, False, False, True] if t % 2 == 0 else
                      [False, True, True, False] for t in range(N)])
        )
    else:
        stance = jnp.ones((N, 4), dtype=bool)
    cmd = jnp.zeros(6, dtype=dtype)
    ref = make_reference_trajectory(xi0, cmd, N, DT)
    return xi0, ref, feet_w, x_com, stance


def _both_forms(N, **kw):
    xi0, ref, feet_w, x_com, stance = setup(N, **kw)
    yaw = jnp.asarray(0.0, xi0.dtype)
    qp = build_mpc_qp(xi0, ref, yaw, feet_w, x_com, stance, N, DT, CFG)
    data = ms.build_mpc_structured(xi0, ref, yaw, feet_w, x_com, stance,
                                   N, DT, CFG)
    return qp, data, (xi0, ref, yaw, feet_w, x_com, stance)


def test_hvp_and_linear_cost_match_condensed(rng):
    N = 6
    qp, data, _ = _both_forms(N, trot=True)
    H = np.asarray(qp.H)
    c = np.asarray(qp.c)

    F = jnp.asarray(rng.normal(size=(N, 12)))
    hv = np.asarray(ms._hvp(data, F)).reshape(-1)
    np.testing.assert_allclose(hv, H @ np.asarray(F).reshape(-1),
                               rtol=1e-9, atol=1e-9)
    cv = np.asarray(ms._linear_cost(data)).reshape(-1)
    np.testing.assert_allclose(cv, c, rtol=1e-9, atol=1e-9)
    # Constraint data identical.
    np.testing.assert_allclose(
        np.asarray(data.h).reshape(-1), np.asarray(qp.h))
    Gd = np.zeros((24 * N, 12 * N))
    for t in range(N):
        Gd[24 * t:24 * t + 24, 12 * t:12 * t + 12] = np.asarray(data.G[t])
    np.testing.assert_allclose(Gd, np.asarray(qp.G))


def test_riccati_solves_regularized_newton_system(rng):
    """(H + G^T D G) dF = rhs via Riccati == dense solve."""
    N = 5
    qp, data, _ = _both_forms(N)
    H = np.asarray(qp.H)
    G = np.asarray(qp.G)
    d = np.abs(rng.normal(size=G.shape[0])) + 0.1
    M = H + G.T @ (d[:, None] * G)
    rhs = rng.normal(size=12 * N)

    GtDG = jnp.einsum(
        "tki,tk,tkj->tij",
        jnp.asarray(data.G), jnp.asarray(d.reshape(N, 24)),
        jnp.asarray(data.G))
    Rts = 2.0 * data.alpha * jnp.eye(12, dtype=jnp.float64) + GtDG
    dF = ms._riccati_solve(data, Rts, jnp.asarray(rhs.reshape(N, 12)),
                           jnp.asarray(0.0))
    ref = np.linalg.solve(M, rhs)
    np.testing.assert_allclose(np.asarray(dF).reshape(-1), ref,
                               rtol=1e-8, atol=1e-9)


def test_structured_matches_condensed_and_oracle():
    N = 4
    qp, data, args = _both_forms(N)
    xi0, ref, yaw, feet_w, x_com, stance = args
    F_s, sol_s = ms.solve_mpc_structured(xi0, ref, yaw, feet_w, x_com,
                                         stance, N, DT, CFG, iterations=40)
    F_c, sol_c = solve_mpc(xi0, ref, yaw, feet_w, x_com, stance, N, DT, CFG,
                           iterations=40)

    H, c = np.asarray(qp.H), np.asarray(qp.c)

    def obj(x):
        x = np.asarray(x).reshape(-1)
        return 0.5 * x @ H @ x + c @ x

    x0 = np.zeros(12 * N)
    x0[2::3] = 65.0
    ora = solve_qp_active_set(H, c, np.asarray(qp.G), np.asarray(qp.h),
                              x0=x0, max_iter=500)
    assert ora.status == "optimal" and ora.kkt_error < 1e-6
    scale = 1 + abs(obj(ora.x))
    assert abs(obj(F_s) - obj(ora.x)) < 1e-6 * scale
    assert abs(obj(F_c) - obj(ora.x)) < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(F_s).reshape(-1),
                               np.asarray(sol_s.x), rtol=1e-12)
    assert bool(sol_s.converged)


def test_structured_trot_swing_forces_zero():
    N = 6
    _, _, args = _both_forms(N, trot=True, perturb=False)
    xi0, ref, yaw, feet_w, x_com, stance = args
    F, sol = ms.solve_mpc_structured(xi0, ref, yaw, feet_w, x_com, stance,
                                     N, DT, CFG, iterations=40)
    f = np.asarray(F).reshape(N, 4, 3)
    swing = ~np.asarray(stance)
    assert np.max(np.abs(f[swing])) < 1e-6
    total_fz = f[..., 2].sum(axis=-1)
    # Two stance legs carry ~mg after the transient.
    assert np.all(total_fz > 0.0)


def test_structured_batched_long_horizon():
    """N = 16, batched: the O(N) path handles horizons the condensed path
    would pay (12N)^3 for; also exercises f32."""
    N = 16
    _, _, args = _both_forms(N)
    xi0, ref, yaw, feet_w, x_com, stance = args
    B = 4
    dtype = jnp.float32
    xi0_b = jnp.tile(xi0, (B, 1)).astype(dtype)
    xi0_b = xi0_b.at[:, 5].set(jnp.array([0.20, 0.24, 0.26, 0.30], dtype))
    ref_b = jnp.tile(ref, (B, 1, 1)).astype(dtype)
    feet_b = jnp.tile(feet_w, (B, 1, 1)).astype(dtype)
    x_b = jnp.tile(x_com, (B, 1)).astype(dtype)
    stance_b = jnp.tile(stance, (B, 1, 1))
    yaw_b = jnp.zeros(B, dtype=dtype)
    F, sol = ms.solve_mpc_structured(xi0_b, ref_b, yaw_b, feet_b, x_b,
                                     stance_b, N, DT, CFG, iterations=30)
    assert F.shape == (B, N, 12)
    assert np.all(np.isfinite(np.asarray(F)))
    # f32 objective parity vs the f64 structured solve on instance 0.
    F64, _ = ms.solve_mpc_structured(
        xi0_b[0].astype(jnp.float64), ref_b[0].astype(jnp.float64),
        jnp.asarray(0.0, jnp.float64), feet_b[0].astype(jnp.float64),
        x_b[0].astype(jnp.float64), stance_b[0], N, DT, CFG, iterations=40)
    qp = build_mpc_qp(xi0_b[0].astype(jnp.float64),
                      ref_b[0].astype(jnp.float64), jnp.asarray(0.0),
                      feet_b[0].astype(jnp.float64),
                      x_b[0].astype(jnp.float64), stance_b[0], N, DT, CFG)
    H, c = np.asarray(qp.H), np.asarray(qp.c)

    def obj(x):
        x = np.asarray(x, np.float64).reshape(-1)
        return 0.5 * x @ H @ x + c @ x

    # f32 over a 16-step horizon: the conv-flag tolerance is 3e-4 (see
    # solve_mpc's tol note); objective parity lands ~1e-4.
    rel = abs(obj(F[0]) - obj(F64)) / (1 + abs(obj(F64)))
    assert rel < 2e-4, rel


def test_structured_warm_start_receding_horizon():
    """Warm-starting from the previous tick's (shifted) plan reaches the
    optimum in a short schedule — the MPC-stream hotstart analogue."""
    N = 8
    qp, data, args = _both_forms(N)
    xi0, ref, yaw, feet_w, x_com, stance = args
    F0, sol0 = ms.solve_mpc_structured(xi0, ref, yaw, feet_w, x_com, stance,
                                       N, DT, CFG, iterations=40)
    assert bool(sol0.converged)

    # Next tick: slightly advanced initial state (one step of the plan).
    from quadruped_control_tpu.mpc.horizon import srb_discrete_dynamics
    A, B = srb_discrete_dynamics(yaw, feet_w, x_com, DT, CFG)
    xi1 = A @ xi0 + B @ F0[0]
    data1 = ms.build_mpc_structured(xi1, ref, yaw, feet_w, x_com, stance,
                                    N, DT, CFG)
    ref_sol = ms.solve_mpc_qp_structured(data1, iterations=40)[1]

    warm = (F0, sol0.s, sol0.z)
    F_w, sol_w = ms.solve_mpc_qp_structured(data1, iterations=8,
                                            warm_start=warm)
    H = np.asarray(qp.H)  # same dynamics/weights -> same H
    c1 = np.asarray(ms._linear_cost(data1)).reshape(-1)

    def obj(x):
        x = np.asarray(x).reshape(-1)
        return 0.5 * x @ H @ x + c1 @ x

    rel = abs(obj(F_w) - obj(ref_sol.x)) / (1 + abs(obj(ref_sol.x)))
    assert rel < 1e-7, rel


def test_structured_mpc_is_differentiable():
    """The O(N) Riccati IPM is pure jnp with static trip counts, so reverse
    AD flows through the whole MPC solve (policy-gradient / morphology
    tuning through the controller). Checked against central differences."""
    import jax

    N = 4
    xi0, ref, feet_w, x_com, stance = setup(N)
    yaw = jnp.asarray(0.0, xi0.dtype)

    def loss(xi0_):
        F, _ = ms.solve_mpc_structured(xi0_, ref, yaw, feet_w, x_com,
                                       stance, N, DT, CFG, iterations=25)
        return jnp.sum(F[0] ** 2)

    g = jax.grad(loss)(xi0)
    assert np.all(np.isfinite(np.asarray(g)))
    for i in (5, 9):
        e = jnp.zeros_like(xi0).at[i].set(1e-6)
        fd = (loss(xi0 + e) - loss(xi0 - e)) / 2e-6
        rel = abs(float(fd - g[i])) / (1.0 + abs(float(fd)))
        assert rel < 1e-6, (i, float(fd), float(g[i]))
