"""Kinematics vs independent oracles.

FK oracle: the kinematic chain rebuilt from scratch with scipy rotations
(hip Rx(t1), thigh Ry(t2), calf Ry(t3) with signed link offsets) — derived
independently of the closed-form expressions in kinematics.cpp:96-100.
Jacobian oracle: jax.jacfwd of the FK. IK contract: FK(IK(p)) == p on the
reachable set with the reference's knee-bent-backwards branch.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import KinematicsConfig
from quadruped_control_tpu.ops import kinematics as kin

CFG = KinematicsConfig()

HIPS = np.array(
    [[-0.196, 0.050, 0.0], [0.196, 0.050, 0.0],
     [-0.196, -0.050, 0.0], [0.196, -0.050, 0.0]]
)
# Signed l1 per leg (left +, right -); l2, l3 enter as -l2, -l3.
SL1 = np.array([0.077, 0.077, -0.077, -0.077])


def fk_oracle_leg(leg, q):
    """Chain: hip offset + Rx(t1)*(0,sl1,0) + Rx(t1)Ry(t2)*(0,0,-l2)
    + Rx(t1)Ry(t2+t3)*(0,0,-l3)."""
    t1, t2, t3 = q
    Rx = R.from_euler("x", t1).as_matrix()
    Ry2 = R.from_euler("y", t2).as_matrix()
    Ry23 = R.from_euler("y", t2 + t3).as_matrix()
    p = (
        HIPS[leg]
        + Rx @ np.array([0.0, SL1[leg], 0.0])
        + Rx @ Ry2 @ np.array([0.0, 0.0, -CFG.l2])
        + Rx @ Ry23 @ np.array([0.0, 0.0, -CFG.l3])
    )
    return p


def sample_reachable_q(rng, n):
    """Joint samples in the gait's working range (reference init pose is
    thigh 1.61, calf -2.78; knee always bent the same way)."""
    t1 = rng.uniform(-0.5, 0.5, size=(n, 4))
    t2 = rng.uniform(0.4, 1.8, size=(n, 4))
    t3 = rng.uniform(-2.6, -0.8, size=(n, 4))
    return np.stack([t1, t2, t3], axis=-1)


def test_fk_matches_independent_chain(rng):
    q = sample_reachable_q(rng, 16)
    got = np.asarray(kin.forward_kinematics(jnp.asarray(q)))
    for i in range(16):
        for leg in range(4):
            np.testing.assert_allclose(
                got[i, leg], fk_oracle_leg(leg, q[i, leg]), atol=1e-12,
                err_msg=f"leg {leg}",
            )


def test_fk_reference_notebook_config():
    """The sympy-notebook verification point q=(0.63, 1.04, -1.60)
    (kinematics.cpp:49-58)."""
    q = np.tile(np.array([0.63, 1.04, -1.60]), (4, 1))
    got = np.asarray(kin.forward_kinematics(jnp.asarray(q)))
    for leg in range(4):
        np.testing.assert_allclose(got[leg], fk_oracle_leg(leg, q[leg]), atol=1e-12)


def test_jacobian_matches_autodiff(rng):
    q = sample_reachable_q(rng, 8)
    J = np.asarray(kin.leg_jacobian(jnp.asarray(q)))

    def fk_flat(qleg, leg):
        qfull = jnp.zeros((4, 3), dtype=qleg.dtype).at[leg].set(qleg)
        return kin.forward_kinematics(qfull)[leg]

    for i in range(8):
        for leg in range(4):
            J_ad = np.asarray(
                jax.jacfwd(fk_flat)(jnp.asarray(q[i, leg]), leg)
            )
            np.testing.assert_allclose(J[i, leg], J_ad, atol=1e-9)


def test_ik_fk_roundtrip(rng):
    q = sample_reachable_q(rng, 32)
    p = kin.forward_kinematics(jnp.asarray(q))
    q_back = kin.inverse_kinematics(p)
    p_back = kin.forward_kinematics(q_back)
    np.testing.assert_allclose(np.asarray(p_back), np.asarray(p), atol=1e-9)


def test_ik_clamps_unreachable():
    """Targets beyond leg length must clamp (d > 1 branch,
    kinematics.cpp:133-136), not NaN."""
    far = jnp.asarray(np.tile(np.array([0.0, 0.0, -2.0]), (4, 1)) + HIPS)
    q = kin.inverse_kinematics(far)
    assert np.all(np.isfinite(np.asarray(q)))
    # Fully extended: q2 == atan2(-0, 1) == 0.
    np.testing.assert_allclose(np.asarray(q)[:, 2], 0.0, atol=1e-7)


def test_jacobian_inverse(rng):
    q = sample_reachable_q(rng, 8)
    J = np.asarray(kin.leg_jacobian(jnp.asarray(q)))
    Jinv = np.asarray(kin.leg_jacobian_inverse(jnp.asarray(q)))
    eye = np.eye(3)
    for i in range(8):
        for leg in range(4):
            np.testing.assert_allclose(J[i, leg] @ Jinv[i, leg], eye, atol=1e-8)


def test_jacobian_inverse_singular_is_finite():
    """At full extension J is singular; the damped fallback
    (kinematics.cpp:190-204 inv->pinv->J^T ladder) must stay finite."""
    q = jnp.asarray(np.tile(np.array([0.0, 0.0, 0.0]), (4, 1)))
    Jinv = kin.leg_jacobian_inverse(q)
    assert np.all(np.isfinite(np.asarray(Jinv)))


def test_jacobian_transpose_control(rng):
    q = sample_reachable_q(rng, 4)
    f = rng.normal(size=(4, 4, 3))
    tau = np.asarray(
        kin.jacobian_transpose_control(jnp.asarray(q), jnp.asarray(f))
    )
    J = np.asarray(kin.leg_jacobian(jnp.asarray(q)))
    for i in range(4):
        for leg in range(4):
            np.testing.assert_allclose(
                tau[i, leg], J[i, leg].T @ f[i, leg], atol=1e-12
            )
