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


def test_swing_start_ground_anchors_plan():
    """swing_start_ground=True plans replanned swing sextics from the
    ground-projected start (z clamped to <= 0) while the TRACKED start
    p_start stays the measured foot — the round-5 swing-lag ratchet
    instrument (a late touchdown otherwise lifts the next plan by the
    leftover foot height, commander_node.cpp:451-461 planned-from-
    measured rule). Feet on the ground: bitwise no-op."""
    from quadruped_control_tpu.control.commander import commander_precursors
    from quadruped_control_tpu.ops.trajectory import sextic_track

    plant, carry = _walking_state(gait_time=0.9)
    cmd = jnp.zeros(6, jnp.float64).at[0].set(0.3)
    # Fresh planner carry: legs in swing NOW replan this tick
    # (foot_planner.py replan = swing_now when uninitialized).
    lifted = plant.com._replace(x=plant.com.x.at[2].add(0.05))
    base = commander_precursors(lifted, plant.joints, carry, cmd, DT, CFG)
    clmp = commander_precursors(lifted, plant.joints, carry, cmd, DT, CFG,
                                swing_start_ground=True)
    swing = ~np.asarray(base.gait.in_stance)
    assert swing.any()
    # Tracking start unchanged: the measured feet sit ~5 cm up.
    np.testing.assert_allclose(np.asarray(clmp.p_start),
                               np.asarray(base.p_start), rtol=0)
    assert (np.asarray(base.p_start[..., 2])[swing] > 0.04).all()
    # The PLAN start (sextic at t=0): measured height vs clamped to 0.
    t0 = jnp.zeros(4, jnp.float64)
    z0_base = np.asarray(sextic_track(base.traj.coeffs, t0).position[..., 2])
    z0_clmp = np.asarray(sextic_track(clmp.traj.coeffs, t0).position[..., 2])
    np.testing.assert_allclose(z0_base[swing],
                               np.asarray(base.p_start[..., 2])[swing],
                               atol=1e-9)
    np.testing.assert_allclose(z0_clmp[swing], 0.0, atol=1e-9)
    # Feet at/below the ground plane: the instrument is a no-op. (The
    # synthetic init pose holds the feet ~0.18 m up, so push the base
    # down far enough that every foot sits below z = 0.)
    sunk = plant.com._replace(x=plant.com.x.at[2].add(-0.2))
    b2 = commander_precursors(sunk, plant.joints, carry, cmd, DT, CFG)
    assert (np.asarray(b2.p_start[..., 2]) < 0.0).all()
    c2 = commander_precursors(sunk, plant.joints, carry, cmd, DT, CFG,
                              swing_start_ground=True)
    np.testing.assert_allclose(np.asarray(c2.traj.coeffs),
                               np.asarray(b2.traj.coeffs), rtol=0)
    np.testing.assert_allclose(np.asarray(c2.tau_swing),
                               np.asarray(b2.tau_swing), rtol=0)


def test_body_frame_exact_transform():
    """body_frame_exact=True converts the world swing reference with the
    exact p_b = R^T (p_w - x); default preserves the reference's quirk
    p_b = R^T p_w - x (commander_node.cpp:491). The quirk's error
    (R^T - I) x grows with distance traveled — the round-5 root cause of
    the swing-lag ratchet (PARITY.md). At R = I the two are bitwise
    equal; far from the origin with attitude they must differ."""
    from quadruped_control_tpu.control.commander import commander_precursors
    from quadruped_control_tpu.math.rotations import rpy_to_matrix
    from quadruped_control_tpu.ops.kinematics import inverse_kinematics

    plant, carry = _walking_state(gait_time=0.9)
    cmd = jnp.zeros(6, jnp.float64).at[0].set(0.3)
    # R = I (any x): bitwise identical, quirk == exact.
    far = plant.com._replace(x=jnp.array([2.0, -0.7, 0.26], jnp.float64))
    b0 = commander_precursors(far, plant.joints, carry, cmd, DT, CFG)
    e0 = commander_precursors(far, plant.joints, carry, cmd, DT, CFG,
                              body_frame_exact=True)
    np.testing.assert_allclose(np.asarray(e0.q_ref), np.asarray(b0.q_ref),
                               rtol=0)
    # Attitude + range: the exact path must match the hand-computed
    # R^T (p - x) IK and differ from the quirk by ~ (R^T - I) x.
    R = rpy_to_matrix(jnp.array([0.0, -0.03, 0.2], jnp.float64))
    tilted = far._replace(R=R)
    b1 = commander_precursors(tilted, plant.joints, carry, cmd, DT, CFG)
    e1 = commander_precursors(tilted, plant.joints, carry, cmd, DT, CFG,
                              body_frame_exact=True)
    np.testing.assert_allclose(np.asarray(e1.foot_ref.position),
                               np.asarray(b1.foot_ref.position), rtol=0)
    p_exact = jnp.einsum("ji,lj->li", R,
                         e1.foot_ref.position - tilted.x[None, :])
    q_expect = inverse_kinematics(p_exact, CFG.kinematics)
    swing = ~np.asarray(b1.gait.in_stance)
    assert swing.any()
    np.testing.assert_allclose(np.asarray(e1.q_ref)[swing],
                               np.asarray(q_expect)[swing], atol=1e-12)
    # The quirk's foot-level error at this pose/range is centimeters.
    d = np.abs(np.asarray(e1.q_ref) - np.asarray(b1.q_ref))[swing]
    assert d.max() > 1e-3


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
