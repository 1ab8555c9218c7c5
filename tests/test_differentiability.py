"""Differentiability smoke tests.

The whole stack is built from differentiable JAX ops; gradients through the
kinematics pipeline and through the (fixed-iteration) IPM barrier loop
enable gradient-based gain/gait/morphology tuning — a capability class the
reference cannot touch. The polish path contains certified selects (piecewise
constant in places), so optimization flows use polish=False.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import (
    mit_cheetah_config,
    teleop_walking_limits,
)
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.ops.kinematics import forward_kinematics
from quadruped_control_tpu.solver.ipm import solve_qp_ipm


def test_grad_through_kinematics():
    cfg = mit_cheetah_config()
    q = jnp.asarray(np.tile([0.1, 1.2, -2.0], (4, 1)))

    def height(qq):
        return jnp.sum(forward_kinematics(qq, cfg.kinematics)[..., 2])

    g = jax.grad(height)(q)
    assert np.all(np.isfinite(np.asarray(g)))
    # Finite-difference check on one coordinate.
    eps = 1e-6
    qp = q.at[1, 1].add(eps)
    fd = (height(qp) - height(q)) / eps
    np.testing.assert_allclose(float(g[1, 1]), float(fd), rtol=1e-4)


def test_grad_through_qp_solve():
    """d(forces)/d(mass) through assembly + fixed-iteration barrier solve."""
    cfg = mit_cheetah_config()
    q0 = jnp.asarray(np.tile([0.0, 1.61, -2.78], (4, 1)))
    feet = forward_kinematics(q0, cfg.kinematics)
    eye = jnp.eye(3)
    x = jnp.array([0.0, 0.0, 0.26])
    zeros = jnp.zeros(3)
    stance = jnp.ones(4, bool)

    def total_fz(mass):
        qp = dyn.build_balance_qp(eye, eye, x, zeros, zeros, x, zeros, zeros,
                                  feet, stance, cfg.balance, mass=mass)
        sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=15,
                           polish=False)
        return jnp.sum(sol.x[2::3])

    m0 = jnp.asarray(11.0)
    g = jax.grad(total_fz)(m0)
    assert np.isfinite(float(g))
    fd = (total_fz(m0 + 1e-4) - total_fz(m0 - 1e-4)) / 2e-4
    # The interior solution tracks b_z = m(kff2*m*g - g): d/dm is smooth.
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)


def test_teleop_clamp():
    lim = teleop_walking_limits()
    t = jnp.array([0.5, -0.5, 0.0, 0.0, 0.0, 0.2])
    c = np.asarray(lim.clamp(t))
    np.testing.assert_allclose(c, [0.2, -0.1, 0, 0, 0, 0.05], atol=1e-12)
