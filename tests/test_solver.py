"""Batched IPM vs the float64 active-set oracle.

Two layers of validation (SURVEY.md §4):
  1. Generic random SPD QPs — IPM vs oracle, oracle self-certified by KKT.
  2. The GRF family — scenarios mirroring BASELINE configs 1-3 (static
     stance, body-pose sweeps, trot contact schedules), including a parity
     proof that the TPU formulation (masked A columns + 24 one-sided rows)
     yields the same stance forces as the reference's formulation
     (12x20 two-sided with equality-pinned swing legs,
     balance_controller.cpp:274-330) reduced by elimination.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot

import jax.numpy as jnp

from quadruped_control_tpu.config import BalanceConfig, KinematicsConfig
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.ops.kinematics import forward_kinematics
from quadruped_control_tpu.solver import reference as oracle
from quadruped_control_tpu.solver.ipm import qp_objective, solve_qp_ipm

BAL = BalanceConfig()
KIN = KinematicsConfig()


# --------------------------------------------------------------------------
# Generic random QPs
# --------------------------------------------------------------------------
def random_qp(rng, n=12, m=24):
    Z = rng.normal(size=(n, n))
    Q = Z @ Z.T + 0.1 * np.eye(n)
    c = rng.normal(size=n)
    G = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n)
    h = G @ x_feas + rng.uniform(0.1, 2.0, size=m)
    return Q, c, G, h, x_feas


def test_ipm_matches_oracle_random(rng):
    for trial in range(20):
        Q, c, G, h, x_feas = random_qp(rng)
        sol_as = oracle.solve_qp_active_set(Q, c, G, h, x0=x_feas)
        assert sol_as.status == "optimal"
        assert sol_as.kkt_error < 1e-8

        sol_ip = solve_qp_ipm(
            jnp.asarray(Q), jnp.asarray(c), jnp.asarray(G), jnp.asarray(h),
            iterations=30,
        )
        assert bool(sol_ip.converged), f"trial {trial}: {sol_ip}"
        np.testing.assert_allclose(
            np.asarray(sol_ip.x), sol_as.x, atol=1e-6,
            err_msg=f"trial {trial}",
        )
        obj_ip = float(qp_objective(jnp.asarray(Q), jnp.asarray(c), sol_ip.x))
        obj_as = 0.5 * sol_as.x @ Q @ sol_as.x + c @ sol_as.x
        assert abs(obj_ip - obj_as) <= 1e-6 * (1.0 + abs(obj_as))


def test_ipm_batched_consistency(rng):
    """Batched solve == loop of single solves."""
    qps = [random_qp(rng) for _ in range(8)]
    Q = jnp.asarray(np.stack([q[0] for q in qps]))
    c = jnp.asarray(np.stack([q[1] for q in qps]))
    G = jnp.asarray(np.stack([q[2] for q in qps]))
    h = jnp.asarray(np.stack([q[3] for q in qps]))
    batch = solve_qp_ipm(Q, c, G, h, iterations=30)
    for i in range(8):
        single = solve_qp_ipm(Q[i], c[i], G[i], h[i], iterations=30)
        np.testing.assert_allclose(
            np.asarray(batch.x[i]), np.asarray(single.x), atol=1e-9
        )


# --------------------------------------------------------------------------
# GRF scenario generation (shared with the benchmark harness)
# --------------------------------------------------------------------------
def standing_feet():
    q0 = jnp.asarray(np.tile([0.0, 1.61, -2.78], (4, 1)))
    return forward_kinematics(q0, KIN)


def grf_scenarios(rng, n, kind="mixed"):
    """Batch of (state, target, stance) tuples: BASELINE configs 1-3."""
    feet = np.asarray(standing_feet())
    scenarios = []
    for i in range(n):
        if kind == "stance" or (kind == "mixed" and i % 3 == 0):
            # Config 1: laying-to-standing, all-stance.
            R = np.eye(3)
            x = np.array([0.0, 0.0, rng.uniform(0.08, 0.3)])
            stance = np.ones(4, bool)
            xdot = np.zeros(3)
            w = np.zeros(3)
        elif kind == "pose" or (kind == "mixed" and i % 3 == 1):
            # Config 2: body-pose tracking sweep.
            R = Rot.from_euler("xyz", rng.uniform(-0.25, 0.25, 3)).as_matrix()
            x = np.array([0, 0, 0.26]) + rng.normal(size=3) * 0.02
            stance = np.ones(4, bool)
            xdot = rng.normal(size=3) * 0.3
            w = rng.normal(size=3) * 0.3
        else:
            # Config 3: trot two-leg stance.
            R = Rot.from_euler("xyz", rng.uniform(-0.1, 0.1, 3)).as_matrix()
            x = np.array([0, 0, 0.26]) + rng.normal(size=3) * 0.01
            stance = (
                np.array([True, False, False, True])
                if rng.uniform() < 0.5
                else np.array([False, True, True, False])
            )
            xdot = rng.normal(size=3) * 0.4
            w = rng.normal(size=3) * 0.2
        scenarios.append(
            dict(
                R=R, x=x, xdot=xdot, w=w,
                R_d=np.eye(3), x_d=np.array([0.0, 0.0, 0.26]),
                xdot_d=rng.normal(size=3) * 0.2, w_d=rng.normal(size=3) * 0.1,
                feet=feet + rng.normal(size=(4, 3)) * 0.01,
                stance=stance,
            )
        )
    return scenarios


def build_batch(scenarios):
    def stack(key):
        return jnp.asarray(np.stack([s[key] for s in scenarios]))

    qp = dyn.build_balance_qp(
        stack("R"), stack("R_d"), stack("x"), stack("xdot"), stack("w"),
        stack("x_d"), stack("xdot_d"), stack("w_d"), stack("feet"),
        jnp.asarray(np.stack([s["stance"] for s in scenarios])), BAL,
    )
    return qp, np.stack([s["stance"] for s in scenarios])


# --------------------------------------------------------------------------
# Reference-formulation parity
# --------------------------------------------------------------------------
def reference_qp_reduced(scenario):
    """The reference's QP (balance_controller.cpp:144-161, 274-330) with
    swing forces eliminated by substitution (exactly what its 0..0 equality
    rows enforce), in float64. Returns (Q_sub, c_sub, G_sub, h_sub, idx)."""
    cfg = BAL
    R, x = scenario["R"], scenario["x"]
    feet, stance = scenario["feet"], scenario["stance"]

    xddot_d, wdot_d = (
        np.asarray(a)
        for a in dyn.pd_accelerations(
            jnp.asarray(R), jnp.asarray(scenario["R_d"]), jnp.asarray(x),
            jnp.asarray(scenario["xdot"]), jnp.asarray(scenario["w"]),
            jnp.asarray(scenario["x_d"]), jnp.asarray(scenario["xdot_d"]),
            jnp.asarray(scenario["w_d"]), cfg,
        )
    )
    w_d = scenario["w_d"]

    # Unmasked A exactly as the reference builds it (all four legs).
    com_ft = (R @ np.asarray(feet).T).T
    A = np.zeros((6, 12))
    for leg in range(4):
        A[:3, 3 * leg : 3 * leg + 3] = np.eye(3)
        p = com_ft[leg]
        A[3:, 3 * leg : 3 * leg + 3] = np.array(
            [[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]]
        )
    Iw = R @ np.diag(cfg.inertia_diag) @ R.T
    b = np.concatenate(
        [
            cfg.mass * (xddot_d + np.array([0, 0, -9.81])),
            Iw @ wdot_d + np.cross(w_d, Iw @ w_d),
        ]
    )
    S = np.diag(cfg.s_diag)
    Q = 2.0 * (A.T @ S @ A + cfg.w_diag * np.eye(12))
    c = -2.0 * A.T @ S @ b

    # Reference 5x3 cone block Cf (balance_controller.cpp:278-282).
    mu = cfg.mu
    Cf = np.array(
        [[1, 0, -mu], [0, 1, -mu], [0, 1, mu], [1, 0, mu], [0, 0, 1.0]]
    )
    big = 1e6
    lbf = np.array([-big, -big, 0.0, 0.0, cfg.fz_min])
    ubf = np.array([0.0, 0.0, big, big, cfg.fz_max])

    # Eliminate swing variables (their rows force f = 0).
    idx = np.flatnonzero(np.repeat(stance, 3))
    Q_sub = Q[np.ix_(idx, idx)]
    c_sub = c[idx]
    G_rows, h_rows = [], []
    for leg in range(4):
        if not stance[leg]:
            continue
        cols = [3 * leg, 3 * leg + 1, 3 * leg + 2]
        sub_cols = [np.searchsorted(idx, c0) for c0 in cols]
        block = np.zeros((5, len(idx)))
        block[:, sub_cols] = Cf
        G_rows.append(block)
        h_rows.append(ubf)
        G_rows.append(-block)
        h_rows.append(-lbf)
    G_sub = np.concatenate(G_rows)
    h_sub = np.concatenate(h_rows)
    return Q_sub, c_sub, G_sub, h_sub, idx


def test_formulation_parity_with_reference(rng):
    """TPU formulation == reference formulation on stance forces, for
    all-stance and trot scenarios."""
    scenarios = grf_scenarios(rng, 12, kind="mixed")
    qp, stance = build_batch(scenarios)

    for i, sc in enumerate(scenarios):
        # Solve the reference-form reduced QP with the f64 oracle.
        Q_r, c_r, G_r, h_r, idx = reference_qp_reduced(sc)
        x0 = np.zeros(len(idx))
        x0[2::3] = 0.5 * (BAL.fz_min + BAL.fz_max)
        sol_ref = oracle.solve_qp_active_set(Q_r, c_r, G_r, h_r, x0=x0)
        assert sol_ref.status == "optimal" and sol_ref.kkt_error < 1e-7

        # Solve the TPU-form QP with the oracle as well.
        x0_full = oracle.grf_feasible_point(sc["stance"], BAL.fz_min, BAL.fz_max)
        sol_tpu = oracle.solve_qp_active_set(
            np.asarray(qp.Q[i]), np.asarray(qp.c[i]), np.asarray(qp.G[i]),
            np.asarray(qp.h[i]), x0=x0_full,
        )
        assert sol_tpu.status == "optimal" and sol_tpu.kkt_error < 1e-7

        # Stance components must agree; swing components must vanish.
        np.testing.assert_allclose(
            sol_tpu.x[idx], sol_ref.x, atol=1e-7, err_msg=f"scenario {i}"
        )
        swing_idx = np.setdiff1d(np.arange(12), idx)
        np.testing.assert_allclose(sol_tpu.x[swing_idx], 0.0, atol=1e-8)


def test_ipm_on_grf_scenarios(rng):
    """IPM (the TPU path) vs oracle on the GRF batch — the north-star
    1e-6 objective parity, in float64."""
    scenarios = grf_scenarios(rng, 24, kind="mixed")
    qp, stance = build_batch(scenarios)
    sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=30)
    assert bool(jnp.all(sol.converged)), np.asarray(sol.gap)

    x_star, obj_star, kkt = oracle.solve_qp_batch_oracle(
        qp.Q, qp.c, qp.G, qp.h, stance, BAL.fz_min, BAL.fz_max
    )
    assert np.max(kkt) < 1e-7
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-5)
    obj_ipm = np.asarray(qp_objective(qp.Q, qp.c, sol.x))
    gap = np.abs(obj_ipm - obj_star) / (1.0 + np.abs(obj_star))
    assert np.max(gap) < 1e-6, gap


def test_stance_forces_physical(rng):
    """Standing balance: stance fz within [fz_min, fz_max], total normal
    force ~ m g when hovering at the target."""
    feet = standing_feet()
    qp = dyn.build_balance_qp(
        jnp.eye(3), jnp.eye(3),
        jnp.array([0.0, 0.0, 0.26]), jnp.zeros(3), jnp.zeros(3),
        jnp.array([0.0, 0.0, 0.26]), jnp.zeros(3), jnp.zeros(3),
        feet, jnp.ones(4, bool), BAL,
    )
    sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=30)
    f = np.asarray(sol.x).reshape(4, 3)
    assert np.all(f[:, 2] >= BAL.fz_min - 1e-6)
    assert np.all(f[:, 2] <= BAL.fz_max + 1e-6)
    # Weight support: at the target pose the PD terms vanish and
    # b_z = m*(kff[2]*m*g - g) (the reference's odd kff feedforward,
    # balance_controller.cpp:129) — the QP tracks it exactly.
    expected = BAL.mass * (BAL.kff[2] * BAL.mass * 9.81 - 9.81)
    # rtol 1e-4: the W-regularization term biases ||Af-b|| away from zero by
    # O(w_diag/s_diag), so the tracked wrench is not exactly b.
    np.testing.assert_allclose(f[:, 2].sum(), expected, rtol=1e-4)
    # Body-frame forces point up into the body (negated world force).
    fb = np.asarray(
        dyn.forces_to_body_frame(sol.x, jnp.eye(3), jnp.ones(4, bool))
    )
    np.testing.assert_allclose(fb, -f, atol=1e-9)


def test_prox_restart_certifies_against_original_kkt():
    """solve_qp_prox: subproblems are regularized, but the converged mask
    must certify the ORIGINAL problem — cross-checked in float64 — and the
    solution must match the active-set oracle."""
    import jax
    import numpy as np

    from quadruped_control_tpu.config import mit_cheetah_config
    from quadruped_control_tpu.solver.ipm import solve_qp_prox
    from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle
    from quadruped_control_tpu.utils.scenarios import (
        assemble_qp_batch,
        grf_scenarios,
    )

    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(11), 32, cfg, dtype=jnp.float32)
    qp = assemble_qp_batch(s, cfg)
    Q, c, G, h = (jnp.asarray(a, jnp.float32) for a in
                  (qp.Q, qp.c, qp.G, qp.h))
    sol = solve_qp_prox(Q, c, G, h, rho_rel=1e-2, prox_steps=3,
                        iterations=25, tol=3e-5)
    assert float(jnp.mean(sol.converged.astype(jnp.float32))) > 0.9

    x_star, obj_star, _ = solve_qp_batch_oracle(
        np.asarray(qp.Q), np.asarray(qp.c), np.asarray(qp.G),
        np.asarray(qp.h), np.asarray(s.stance),
        cfg.balance.fz_min, cfg.balance.fz_max)
    x = np.asarray(sol.x, np.float64)
    Qd, cd = np.asarray(qp.Q, np.float64), np.asarray(qp.c, np.float64)
    obj = 0.5 * np.einsum("bi,bij,bj->b", x, Qd, x) + \
        np.einsum("bi,bi->b", cd, x)
    rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
    conv = np.asarray(sol.converged)
    assert np.median(rel) < 1e-6
    assert rel[conv].max() < 1e-4

    # The certification recomputes the ORIGINAL residuals: verify in f64.
    z = np.asarray(sol.z, np.float64)
    dr = np.abs(np.einsum("bij,bj->bi", Qd, x) + cd
                + np.einsum("bij,bi->bj", np.asarray(qp.G, np.float64), z)
                ).max(1)
    scale = 1.0 + np.abs(cd).max(1)
    reported = np.asarray(sol.dual_residual, np.float64)
    np.testing.assert_allclose(reported[conv], dr[conv],
                               rtol=1e-3, atol=1e-4)


def test_flatness_certificate():
    """certify_flatness (solver/reference.py) classifies f32 answers
    against the f64 oracle: the oracle's own solution certifies flat with
    ~0 gap; a displacement along the cheapest curvature direction stays
    flat while a unit random displacement does not — the instrument behind
    the bench tail decomposition (VERDICT round-4 #5)."""
    import jax

    from quadruped_control_tpu.config import mit_cheetah_config
    from quadruped_control_tpu.solver.reference import certify_flatness
    from quadruped_control_tpu.utils.scenarios import (
        assemble_qp_batch,
        grf_scenarios,
    )

    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(5), 6, cfg, dtype=jnp.float64)
    qp = assemble_qp_batch(s, cfg)
    Q, c, G, h = (np.asarray(a, np.float64) for a in
                  (qp.Q, qp.c, qp.G, qp.h))
    stance = np.asarray(s.stance)
    certs, x_star, obj_star = certify_flatness(
        Q, c, G, h, x_star0 := np.zeros_like(c), stance,
        cfg.balance.fz_min, cfg.balance.fz_max)
    # zero-force answer: badly suboptimal, certificates must say NOT flat
    assert not any(cc.flat for cc in certs)

    certs2, _, _ = certify_flatness(
        Q, c, G, h, x_star, stance,
        cfg.balance.fz_min, cfg.balance.fz_max)
    assert all(cc.flat for cc in certs2)
    assert max(abs(cc.obj_rel_gap) for cc in certs2) < 1e-12

    # Displace along the smallest-curvature eigenvector: a sizeable force
    # move costs only ~lambda_min of objective — exactly the flat-valley
    # anatomy of the 4-stance family; the certificate's curvature term
    # accounts for the whole (tiny) gap.
    w, V = np.linalg.eigh(Q[0])
    d = V[:, 0] * 0.1  # 0.1 N-scale move along the flattest direction
    certs3, _, _ = certify_flatness(
        Q[:1], c[:1], G[:1], h[:1], (x_star[0] + d)[None], stance[:1],
        cfg.balance.fz_min, cfg.balance.fz_max)
    cc = certs3[0]
    assert cc.dist > 0.05
    # gap = curvature part + first-order part (active-set pressure); the
    # curvature part alone is the w_diag-regularizer scale
    assert cc.curv_rel < 1e-4, cc
