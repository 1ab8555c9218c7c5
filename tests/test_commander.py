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


def _walking_state(gait_time=0.9):
    plant = init_plant_state(CFG, (), dtype=jnp.float64, height=0.26)
    carry = init_commander_carry((), dtype=jnp.float64)
    carry = carry._replace(standing=jnp.asarray(True),
                           gait_time=jnp.asarray(gait_time))
    return plant, carry


def test_swing_vel_rescale_scales_qdot_ref():
    """swing_vel_rescale=True multiplies the swing velocity feedforward by
    exactly 1/t_swing (the physical-units correction of the reference's
    normalized-time sdot quirk, trajectory.cpp:239-254); a float gives
    that explicit multiplier. q_ref is untouched."""
    from quadruped_control_tpu.control.commander import commander_precursors

    plant, carry = _walking_state()
    cmd = jnp.zeros(6, jnp.float64).at[0].set(0.3)
    # one planned tick first so trajectories are valid
    _, carry = commander_step(plant.com, plant.joints, carry, cmd, DT, CFG)
    base = commander_precursors(plant.com, plant.joints, carry, cmd, DT, CFG)
    resc = commander_precursors(plant.com, plant.joints, carry, cmd, DT, CFG,
                                swing_vel_rescale=True)
    half = commander_precursors(plant.com, plant.joints, carry, cmd, DT, CFG,
                                swing_vel_rescale=3.0)
    np.testing.assert_allclose(np.asarray(resc.q_ref),
                               np.asarray(base.q_ref), rtol=0)
    swing = ~np.asarray(base.gait.in_stance)
    assert swing.any()
    qd_b = np.asarray(base.qdot_ref)[swing]
    qd_r = np.asarray(resc.qdot_ref)[swing]
    qd_h = np.asarray(half.qdot_ref)[swing]
    assert np.abs(qd_b).max() > 1e-6
    np.testing.assert_allclose(qd_r, qd_b / CFG.gait.t_swing, rtol=1e-12)
    np.testing.assert_allclose(qd_h, qd_b * 3.0, rtol=1e-12)


def test_swing_accel_ff_adds_inertia_torque():
    """swing_accel_ff adds D(q) @ Jinv @ a_ref/t_swing^2 to the swing
    torques (zero at the sextic boundaries); requires swing_mass."""
    from quadruped_control_tpu.config import mit_cheetah_whole_body_config
    from quadruped_control_tpu.control.commander import commander_precursors
    from quadruped_control_tpu.sim import mit_cheetah_whole_body_model
    from quadruped_control_tpu.sim.dynamics import leg_mass_matrices

    cfg = mit_cheetah_whole_body_config()
    dt = 1.0 / cfg.frequency
    plant = init_plant_state(cfg, (), dtype=jnp.float64, height=0.26)
    carry = init_commander_carry((), dtype=jnp.float64)
    carry = carry._replace(standing=jnp.asarray(True),
                           gait_time=jnp.asarray(0.3))
    cmd = jnp.zeros(6, jnp.float64).at[0].set(0.3)
    _, carry = commander_step(plant.com, plant.joints, carry, cmd, dt, cfg)
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float64)
    mass = leg_mass_matrices(model, plant.joints.q)
    base = commander_precursors(plant.com, plant.joints, carry, cmd, dt, cfg)
    ff = commander_precursors(plant.com, plant.joints, carry, cmd, dt, cfg,
                              swing_accel_ff=True, swing_mass=mass)
    swing = ~np.asarray(base.gait.in_stance)
    assert swing.any()
    d = np.asarray(ff.tau_swing - base.tau_swing)
    # mid-swing: nonzero feedforward on swing legs only matters (stance
    # rows are masked downstream); torques stay bounded
    assert np.abs(d[swing]).max() > 1e-4
    assert np.abs(d).max() < 60.0
    with pytest.raises(ValueError, match="swing_mass"):
        commander_precursors(plant.com, plant.joints, carry, cmd, dt, cfg,
                             swing_accel_ff=True)


def test_stance_pose_mode_integrates_and_clamps():
    """stance_pose: the gait clock never starts, commanded rates integrate
    into carry.pose_cmd (clamped to StancePoseConfig), and R_d/x_d track
    the posed reference (teleop_ps4_stance.yaml genre)."""
    from quadruped_control_tpu.config import StancePoseConfig

    plant = init_plant_state(CFG, (), dtype=jnp.float64, height=0.26)
    carry = init_commander_carry((), dtype=jnp.float64, pose_cmd=True)
    carry = carry._replace(standing=jnp.asarray(True))
    cmd = jnp.zeros(6, jnp.float64).at[3].set(0.4).at[2].set(-0.1)
    c = carry
    for _ in range(50):  # 50 ticks at 0.4 rad/s -> clamped by roll_max 0.3
        out, c = commander_step(plant.com, plant.joints, c, cmd, DT, CFG,
                                stance_pose=True)
    pc = np.asarray(c.pose_cmd)
    spc = StancePoseConfig()
    # gait never started; all-stance support
    assert float(c.gait_time) < 0.0
    assert np.asarray(out.gait.in_stance).all()
    # roll integrated 0.4 * 50 * DT, z dropped 0.1 * 50 * DT (within clamps)
    np.testing.assert_allclose(pc[0], min(0.4 * 50 * DT, spc.roll_max),
                               rtol=1e-9)
    np.testing.assert_allclose(pc[3], max(-0.1 * 50 * DT, spc.dz_min),
                               rtol=1e-9)
    assert abs(pc[1]) < 1e-12 and abs(pc[2]) < 1e-12
    # keep integrating far past the clamp: saturates exactly
    for _ in range(400):
        out, c = commander_step(plant.com, plant.joints, c, cmd, DT, CFG,
                                stance_pose=True)
    pc = np.asarray(c.pose_cmd)
    np.testing.assert_allclose(pc[0], spc.roll_max, rtol=1e-12)
    np.testing.assert_allclose(pc[3], spc.dz_min, rtol=1e-12)
    with pytest.raises(ValueError, match="pose_cmd"):
        commander_step(plant.com, plant.joints,
                       init_commander_carry((), dtype=jnp.float64),
                       cmd, DT, CFG, stance_pose=True)
