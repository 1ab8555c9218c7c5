"""Unit tests for the fused commander tick (control/commander.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import (
    commander_step,
    init_commander_carry,
)
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.ops.kinematics import leg_jacobian

CFG = mit_cheetah_physical_config()
DT = 1.0 / CFG.frequency


def tick(height, standing=False, cmd=None):
    plant = init_plant_state(CFG, (), dtype=jnp.float64, height=height)
    carry = init_commander_carry((), dtype=jnp.float64)
    if standing:
        carry = carry._replace(standing=jnp.asarray(True),
                               gait_time=jnp.asarray(0.5))
    cmd = jnp.zeros(6, dtype=jnp.float64) if cmd is None else cmd
    out, carry2 = commander_step(plant.com, plant.joints, carry, cmd, DT, CFG,
                                 qp_iterations=20)
    return plant, out, carry2


def test_stance_mode_before_standing():
    """Below the stand height: all legs stance, gait clock not running
    (commander_node.cpp:369, 387-391)."""
    plant, out, carry2 = tick(height=0.06)
    assert np.all(np.asarray(out.gait.in_stance))
    assert not bool(carry2.standing)
    assert float(carry2.gait_time) < 0.0


def test_standing_detection_latches():
    """At the stand height (+-5 mm) the standing flag sets and the gait
    clock starts."""
    plant, out, carry2 = tick(height=0.26)
    assert bool(carry2.standing)
    assert float(carry2.gait_time) >= 0.0


def test_stance_torques_are_jacobian_transpose():
    """In all-stance mode, torques must equal J^T f_body clamped
    (commander_node.cpp:511-531)."""
    plant, out, carry2 = tick(height=0.06)
    J = np.asarray(leg_jacobian(plant.joints.q, CFG.kinematics))
    fb = np.asarray(out.forces_body)
    tau_expect = np.einsum("lji,lj->li", J, fb)
    tau_expect = np.clip(tau_expect, -20.0, 20.0)
    np.testing.assert_allclose(np.asarray(out.torques), tau_expect, atol=1e-8)


def test_walking_mode_has_swing_legs():
    """With the gait clock at mid-swing phase, the trot pairs split."""
    plant, out, carry2 = tick(height=0.26, standing=True)
    stance = np.asarray(out.gait.in_stance)
    assert stance.sum() in (0, 2, 4)
    # offsets [0,.5,.5,0]: RL/FR together, FL/RR together.
    assert stance[0] == stance[3] and stance[1] == stance[2]


def test_swing_forces_zero():
    plant, out, carry2 = tick(height=0.26, standing=True)
    fb = np.asarray(out.forces_body)
    stance = np.asarray(out.gait.in_stance)
    assert np.all(fb[~stance] == 0.0)


def test_torque_limits_enforced():
    cmd = jnp.asarray(np.array([0.5, 0.3, 0, 0, 0, 0.2]))
    plant, out, carry2 = tick(height=0.26, standing=True, cmd=cmd)
    tau = np.asarray(out.torques)
    assert np.all(np.abs(tau) <= 20.0 + 1e-12)


def test_vmap_batch_matches_single():
    plants = [init_plant_state(CFG, (), dtype=jnp.float64, height=h)
              for h in (0.06, 0.26)]
    carry = init_commander_carry((2,), dtype=jnp.float64)
    com = jax.tree.map(lambda *a: jnp.stack(a), *[p.com for p in plants])
    joints = jax.tree.map(lambda *a: jnp.stack(a), *[p.joints for p in plants])
    cmd = jnp.zeros((2, 6), dtype=jnp.float64)
    out_b, _ = commander_step(com, joints, carry, cmd, DT, CFG,
                              qp_iterations=20)
    for i, h in enumerate((0.06, 0.26)):
        _, out_s, _ = tick(height=h)
        np.testing.assert_allclose(
            np.asarray(out_b.torques[i]), np.asarray(out_s.torques), atol=1e-6
        )
