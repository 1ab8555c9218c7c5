"""Rotation/transform primitives vs scipy.spatial.transform oracles."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from quadruped_control_tpu.math import rotations as rot


def random_rotations(rng, n, max_angle=np.pi - 0.05):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0.0, max_angle, size=(n, 1))
    return R.from_rotvec(axes * angles)


def test_skew_unskew(rng):
    v = rng.normal(size=(5, 3))
    S = rot.skew(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(S), -np.swapaxes(np.asarray(S), -1, -2))
    for i in range(5):
        w_i = rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(S[i] @ jnp.asarray(w_i)), np.cross(v[i], w_i), atol=1e-12
        )
    u = rng.normal(size=3)
    w = rng.normal(size=3)
    np.testing.assert_allclose(
        np.asarray(rot.skew(jnp.asarray(u)) @ jnp.asarray(w)),
        np.cross(u, w), atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(rot.unskew(rot.skew(jnp.asarray(u)))), u)


def test_quat_matrix_roundtrip(rng):
    rs = random_rotations(rng, 64)
    q_scipy = rs.as_quat()  # xyzw
    q_wxyz = jnp.asarray(np.roll(q_scipy, 1, axis=-1))
    M = rot.quat_to_matrix(q_wxyz)
    np.testing.assert_allclose(np.asarray(M), rs.as_matrix(), atol=1e-12)

    q_back = rot.matrix_to_quat(M)
    # Same rotation up to sign; matrix_to_quat canonicalizes w >= 0.
    sign = np.sign(np.asarray(q_back)[:, :1] * np.asarray(q_wxyz)[:, :1])
    sign[sign == 0] = 1.0
    np.testing.assert_allclose(np.asarray(q_back), np.asarray(q_wxyz) * sign, atol=1e-9)


def test_matrix_to_quat_near_pi(rng):
    # The trace-only formula fails here; the pivoted construction must not.
    for axis in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, -0.8, 0.0]):
        r = R.from_rotvec(np.array(axis, dtype=float) * (np.pi - 1e-7))
        q = rot.matrix_to_quat(jnp.asarray(r.as_matrix()))
        np.testing.assert_allclose(
            np.asarray(rot.quat_to_matrix(q)), r.as_matrix(), atol=1e-7
        )


def test_quat_multiply_rotate(rng):
    r1, r2 = random_rotations(rng, 2)
    q1 = jnp.asarray(np.roll(r1.as_quat(), 1))
    q2 = jnp.asarray(np.roll(r2.as_quat(), 1))
    q12 = rot.quat_multiply(q1, q2)
    np.testing.assert_allclose(
        np.asarray(rot.quat_to_matrix(q12)), (r1 * r2).as_matrix(), atol=1e-12
    )
    v = rng.normal(size=3)
    np.testing.assert_allclose(
        np.asarray(rot.quat_rotate(q1, jnp.asarray(v))), r1.apply(v), atol=1e-12
    )


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(32, 3))
    w *= rng.uniform(0.0, np.pi - 0.1, size=(32, 1)) / np.linalg.norm(
        w, axis=-1, keepdims=True
    )
    Rm = rot.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(Rm), R.from_rotvec(w).as_matrix(), atol=1e-12
    )
    w_back = rot.so3_log(Rm)
    np.testing.assert_allclose(np.asarray(w_back), w, atol=1e-8)


def test_so3_log_small_and_pi():
    # Identity.
    np.testing.assert_allclose(
        np.asarray(rot.so3_log(jnp.eye(3))), np.zeros(3), atol=1e-12
    )
    # Tiny angle.
    w = np.array([1e-9, -2e-9, 3e-10])
    np.testing.assert_allclose(
        np.asarray(rot.so3_log(jnp.asarray(R.from_rotvec(w).as_matrix()))),
        w, atol=1e-15,
    )
    # Near pi: angle must match and axis must match up to sign at exactly pi.
    for axis in ([0, 0, 1.0], [0.36, 0.48, 0.8]):
        axis = np.asarray(axis) / np.linalg.norm(axis)
        w = axis * (np.pi - 1e-6)
        got = np.asarray(rot.so3_log(jnp.asarray(R.from_rotvec(w).as_matrix())))
        np.testing.assert_allclose(got, w, atol=1e-5)


def test_rpy_matches_scipy(rng):
    rpy = rng.uniform(-1.2, 1.2, size=(16, 3))
    M = rot.rpy_to_matrix(jnp.asarray(rpy))
    # Drake RollPitchYaw == extrinsic xyz: R = Rz(y) Ry(p) Rx(r).
    np.testing.assert_allclose(
        np.asarray(M), R.from_euler("xyz", rpy).as_matrix(), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(rot.matrix_to_rpy(M)), rpy, atol=1e-9)


def test_transform_compose_apply_inverse(rng):
    r1, r2 = random_rotations(rng, 2)
    p1, p2, v = rng.normal(size=(3, 3))
    Rc, pc = rot.transform_compose(
        jnp.asarray(r1.as_matrix()), jnp.asarray(p1),
        jnp.asarray(r2.as_matrix()), jnp.asarray(p2),
    )
    np.testing.assert_allclose(np.asarray(Rc), (r1 * r2).as_matrix(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pc), r1.apply(p2) + p1, atol=1e-12)

    Ri, pi = rot.transform_inverse(jnp.asarray(r1.as_matrix()), jnp.asarray(p1))
    out = rot.transform_apply(Ri, pi, rot.transform_apply(
        jnp.asarray(r1.as_matrix()), jnp.asarray(p1), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-12)


def test_adjoint_matches_reference_structure(rng):
    """The reference adjoint (rigid3d.cpp:259-271) is
    [[R^T, -R^T [p]x], [0, R^T]] — verify block-for-block."""
    r = R.from_rotvec(rng.normal(size=3))
    p = rng.normal(size=3)
    Ad = np.asarray(rot.transform_adjoint(jnp.asarray(r.as_matrix()), jnp.asarray(p)))
    Rt = r.as_matrix().T
    np.testing.assert_allclose(Ad[:3, :3], Rt, atol=1e-12)
    np.testing.assert_allclose(Ad[3:, 3:], Rt, atol=1e-12)
    np.testing.assert_allclose(Ad[3:, :3], np.zeros((3, 3)), atol=1e-12)
    px = np.asarray(rot.skew(jnp.asarray(p)))
    np.testing.assert_allclose(Ad[:3, 3:], -Rt @ px, atol=1e-12)


def test_vmap_batching(rng):
    import jax

    rs = random_rotations(rng, 8)
    M = jnp.asarray(rs.as_matrix())
    single = jnp.stack([rot.so3_log(M[i]) for i in range(8)])
    batched = rot.so3_log(M)
    vmapped = jax.vmap(rot.so3_log)(M)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(single), atol=1e-12)
