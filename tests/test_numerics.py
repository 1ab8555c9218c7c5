"""Angle wrapping vs the reference's fmod-based formulas (numerics.cpp)."""

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.math import numerics


def ref_normalize_2pi(angle):
    q = np.floor(angle / (2 * np.pi))
    angle = angle - q * 2 * np.pi
    if angle < 0:
        angle += 2 * np.pi
    return angle


def ref_normalize_pi(rad):
    q = np.floor((rad + np.pi) / (2 * np.pi))
    rad = (rad + np.pi) - q * 2 * np.pi
    if rad < 0:
        rad += 2 * np.pi
    return rad - np.pi


def test_normalize_matches_reference(rng):
    angles = rng.uniform(-20.0, 20.0, size=200)
    got_2pi = np.asarray(numerics.normalize_angle_2pi(jnp.asarray(angles)))
    got_pi = np.asarray(numerics.normalize_angle_pi(jnp.asarray(angles)))
    want_2pi = np.array([ref_normalize_2pi(a) for a in angles])
    want_pi = np.array([ref_normalize_pi(a) for a in angles])
    np.testing.assert_allclose(got_2pi, want_2pi, atol=1e-12)
    np.testing.assert_allclose(got_pi, want_pi, atol=1e-12)
    assert np.all(got_2pi >= 0) and np.all(got_2pi < 2 * np.pi)
    assert np.all(got_pi > -np.pi - 1e-12) and np.all(got_pi <= np.pi + 1e-12)


def test_almost_equal():
    assert bool(numerics.almost_equal(1.0, 1.0 + 1e-13))
    assert not bool(numerics.almost_equal(1.0, 1.0 + 1e-11))
    assert bool(numerics.almost_equal(0.26, 0.262, 0.005))
