"""Swing-leg joint PD control (joint_controller.cpp:21-39)."""

import numpy as np

import jax.numpy as jnp

from quadruped_control_tpu.config import JointControlConfig
from quadruped_control_tpu.ops.joint_control import joint_pd_control

CFG = JointControlConfig()  # kp [40,40,50], kd [1,1,1], kff 0


def ref_wrap_2pi(a):
    q = np.floor(a / (2 * np.pi))
    a = a - q * 2 * np.pi
    return a + 2 * np.pi if a < 0 else a


def ref_wrap_pi(a):
    q = np.floor((a + np.pi) / (2 * np.pi))
    a = (a + np.pi) - q * 2 * np.pi
    if a < 0:
        a += 2 * np.pi
    return a - np.pi


def test_pd_matches_reference_formula(rng):
    q_ref = rng.uniform(-4, 4, size=(4, 3))
    q = rng.uniform(-4, 4, size=(4, 3))
    qd_ref = rng.normal(size=(4, 3))
    qd = rng.normal(size=(4, 3))
    tau = np.asarray(
        joint_pd_control(
            jnp.asarray(q_ref), jnp.asarray(qd_ref), jnp.asarray(q),
            jnp.asarray(qd), CFG,
        )
    )
    kp = np.array(CFG.kp)
    kd = np.array(CFG.kd)
    for leg in range(4):
        for j in range(3):
            err = ref_wrap_pi(ref_wrap_2pi(q_ref[leg, j]) - ref_wrap_2pi(q[leg, j]))
            want = kp[j] * err + kd[j] * (qd_ref[leg, j] - qd[leg, j]) + CFG.kff[j]
            np.testing.assert_allclose(tau[leg, j], want, atol=1e-10)


def test_wraparound_error():
    """Error across the +-pi seam takes the short way."""
    q_ref = jnp.full((4, 3), 3.1)
    q = jnp.full((4, 3), -3.1)
    tau = np.asarray(joint_pd_control(q_ref, jnp.zeros((4, 3)), q,
                                      jnp.zeros((4, 3)), CFG))
    # Short-way error is -(2*pi - 6.2) ~ -0.083, not +6.2.
    err = -(2 * np.pi - 6.2)
    np.testing.assert_allclose(tau[:, 0], 40.0 * err, atol=1e-9)
