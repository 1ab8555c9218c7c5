"""Swing trajectories, twist integration, support polygon (trajectory.cpp)."""

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import GaitConfig
from quadruped_control_tpu.ops import trajectory as traj
from quadruped_control_tpu.types import FootTrajCoeffs, Gait

CFG = GaitConfig()


def test_sextic_boundary_conditions(rng):
    p0 = rng.normal(size=(4, 3))
    pf = rng.normal(size=(4, 3))
    pc = 0.5 * (p0 + pf)
    pc[:, 2] = CFG.swing_height
    coeffs = traj.sextic_coefficients(
        jnp.asarray(p0), jnp.asarray(pc), jnp.asarray(pf)
    )
    s0 = traj.sextic_track(coeffs, jnp.zeros(4))
    s1 = traj.sextic_track(coeffs, jnp.ones(4))
    sc = traj.sextic_track(coeffs, jnp.full(4, 0.5))
    np.testing.assert_allclose(np.asarray(s0.position), p0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1.position), pf, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sc.position), pc, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s0.velocity), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1.velocity), 0.0, atol=1e-10)

    # Zero end accelerations: second derivative via autodiff.
    def pos(t, leg):
        return traj.sextic_track(coeffs[leg], t).position

    for leg in range(4):
        acc0 = jax.jacfwd(jax.jacfwd(pos))(0.0, leg)
        acc1 = jax.jacfwd(jax.jacfwd(pos))(1.0, leg)
        np.testing.assert_allclose(np.asarray(acc0), 0.0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(acc1), 0.0, atol=1e-8)


def test_velocity_is_position_derivative(rng):
    p0, pc, pf = (jnp.asarray(rng.normal(size=3)) for _ in range(3))
    coeffs = traj.sextic_coefficients(p0, pc, pf)
    for t in [0.1, 0.33, 0.77]:
        v_ad = jax.jacfwd(lambda tt: traj.sextic_track(coeffs, tt).position)(t)
        v = traj.sextic_track(coeffs, t).velocity
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ad), atol=1e-10)


def test_phase_to_time_mapping():
    """t = clamp(slope*phase + intercept, 0, 1) with slope = 1/(1-sp)
    (trajectory.cpp:300-307, 373)."""
    sp = CFG.stance_phase
    assert float(traj.swing_time_of_phase(jnp.asarray(sp), CFG)) == 0.0
    assert float(traj.swing_time_of_phase(jnp.asarray(1.0), CFG)) == 1.0
    assert float(traj.swing_time_of_phase(jnp.asarray(0.0), CFG)) == 0.0  # clamped
    mid = sp + 0.5 * (1.0 - sp)
    np.testing.assert_allclose(
        float(traj.swing_time_of_phase(jnp.asarray(mid), CFG)), 0.5, atol=1e-12
    )


def test_plan_and_reference_states_masking(rng):
    p_start = jnp.asarray(rng.normal(size=(4, 3)))
    p_final = jnp.asarray(rng.normal(size=(4, 3)))
    empty = FootTrajCoeffs(coeffs=jnp.zeros((4, 7, 3)), valid=jnp.zeros(4, bool))
    replan = jnp.array([False, True, True, False])
    planned = traj.plan_swing_trajectories(empty, p_start, p_final, replan, CFG)
    np.testing.assert_array_equal(np.asarray(planned.valid), np.asarray(replan))

    gait = Gait(in_stance=~replan, phase=jnp.full(4, 1.0 - 1e-9))
    st = traj.reference_foot_states(planned, gait, CFG)
    # Valid legs track the trajectory end; invalid legs return zeros
    # (the reference's lookup-miss path, trajectory.cpp:382-388).
    np.testing.assert_allclose(
        np.asarray(st.position)[1:3], np.asarray(p_final)[1:3], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(st.position)[[0, 3]], 0.0)
    # Apex at z = swing_height mid-swing.
    mid = traj.sextic_track(planned.coeffs[1], 0.5)
    np.testing.assert_allclose(float(mid.position[2]), CFG.swing_height, atol=1e-10)


def integrate_twist_yaw_oracle(Rwb, x, u, dt):
    """Independent float64 reimplementation of trajectory.cpp:29-69."""
    delta_aa = np.asarray(u[3:]) * dt
    angle = np.linalg.norm(delta_aa)
    if abs(angle) < 1e-12:
        Rbbp = np.eye(3)
        tbbp = np.asarray(u[:3]) * dt
    else:
        Rbbp = R.from_rotvec(delta_aa).as_matrix()
        tbbp = Rbbp @ (np.asarray(u[:3]) * dt)
    yaw = R.from_matrix(Rwb).as_euler("xyz")[2]  # extrinsic xyz == rpy
    Rwb_yaw = R.from_euler("z", yaw).as_matrix()
    return Rwb_yaw @ Rbbp, Rwb_yaw @ tbbp + x


def test_integrate_twist_yaw(rng):
    for _ in range(10):
        Rwb = R.from_euler("xyz", rng.uniform(-0.3, 0.3, 3)).as_matrix()
        x = rng.normal(size=3)
        u = rng.normal(size=6)
        R_got, x_got = traj.integrate_twist_yaw(
            jnp.asarray(Rwb), jnp.asarray(x), jnp.asarray(u), 0.001
        )
        R_want, x_want = integrate_twist_yaw_oracle(Rwb, x, u, 0.001)
        np.testing.assert_allclose(np.asarray(R_got), R_want, atol=1e-9)
        np.testing.assert_allclose(np.asarray(x_got), x_want, atol=1e-9)


def test_integrate_twist_yaw_zero_rotation():
    """The almost_equal(angle, 0) branch (trajectory.cpp:41-44)."""
    Rwb = np.eye(3)
    u = jnp.asarray(np.array([0.2, 0.1, 0.0, 0.0, 0.0, 0.0]))
    R_got, x_got = traj.integrate_twist_yaw(
        jnp.asarray(Rwb), jnp.zeros(3), u, 0.001
    )
    np.testing.assert_allclose(np.asarray(R_got), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(x_got), [0.0002, 0.0001, 0.0], atol=1e-12
    )


def support_polygon_oracle(ss, se, ws, we, feet, in_stance, phase):
    """Independent float64 loop implementation of trajectory.cpp:81-147."""
    from math import erf, sqrt

    adj = {0: (1, 2), 1: (3, 0), 3: (2, 1), 2: (0, 3)}  # leg -> (cw, ccw)
    root2 = sqrt(2.0)
    weight = np.zeros(4)
    for leg in range(4):
        p = phase[leg]
        if in_stance[leg]:
            weight[leg] = 0.5 * (
                erf(p / (ss[leg] * root2 + 1e-12))
                + erf((1 - p) / (se[leg] * root2 + 1e-12))
            )
        else:
            weight[leg] = 0.5 * (
                2.0
                + erf(-p / (ws[leg] * root2 + 1e-12))
                + erf((p - 1) / (we[leg] * root2 + 1e-12))
            )
    supports = np.zeros((4, 2))
    for leg in range(4):
        cw, ccw = adj[leg]
        w = weight[leg]
        zeta_m = feet[leg, :2] * w + feet[cw, :2] * (1 - w)
        zeta_p = feet[leg, :2] * w + feet[ccw, :2] * (1 - w)
        supports[leg] = (
            w * feet[leg, :2] + weight[cw] * zeta_m + weight[ccw] * zeta_p
        ) / (w + weight[cw] + weight[ccw])
    return supports.mean(axis=0)


def test_support_polygon_matches_oracle(rng):
    ss = rng.uniform(0.05, 0.2, 4)
    se = rng.uniform(0.05, 0.2, 4)
    ws = rng.uniform(0.05, 0.2, 4)
    we = rng.uniform(0.05, 0.2, 4)
    feet = rng.normal(size=(4, 3))
    in_stance = np.array([True, False, True, False])
    phase = rng.uniform(0.05, 0.95, 4)
    gait = Gait(in_stance=jnp.asarray(in_stance), phase=jnp.asarray(phase))
    got = np.asarray(
        traj.support_polygon_position(
            jnp.asarray(ss), jnp.asarray(se), jnp.asarray(ws), jnp.asarray(we),
            jnp.asarray(feet), gait,
        )
    )
    want = support_polygon_oracle(ss, se, ws, we, feet, in_stance, phase)
    np.testing.assert_allclose(got, want, atol=1e-12)
