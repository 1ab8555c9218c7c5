"""Demo-genre whole-body tests on FULL articulated physics.

Split from tests/test_whole_body_loop.py (round 5) so xdist loadscope
balances the whole-body CPU load across workers: this module carries the
scheduled demo-genre scans (gait transitions, fwd-AND-back on both
substrates, sideways, yaw anatomy, stance posing) around the shared
module-scoped r4_stand prefix; test_whole_body_loop keeps the core
closed-loop oracles and test_whole_body_range the round-5 frontier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_control_tpu.math.rotations import matrix_to_rpy
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)

from test_whole_body_loop import N_SUB, _r4_operating_point

DT = jnp.float64
CONTACT = ContactConfig()


def test_whole_body_gait_transition_scheduled():
    """The reference's live-teleop genre on FULL physics: ONE scheduled
    rollout (cmd changing per tick, commander_node.cpp:191-202) that
    stands, steps into the 0.2 m/s trot, then decelerates back to a
    stand — speed-up AND slow-down transitions surviving closed loop.

    Runs on the SYNTHESIZED model (the round-2 robustness-swept
    substrate) at the ROUND-3 operating point — kept as the continuity/
    robustness variant. Round 4 superseded the flagship: the URDF-true
    model with the reference's own joint gains runs the full fwd-AND-BACK
    demo steadier than this (test_whole_body_fwd_and_back_urdf; the
    round-3 'URDF falls at the 0->0.2 step' was a swing-PD gain mismatch,
    PARITY.md "Model fidelity"), and pilot-less full-physics REVERSE
    excursions now work (test_whole_body_fwd_and_back_scheduled)."""
    from quadruped_control_tpu.config import mit_cheetah_whole_body_config
    from quadruped_control_tpu.control.rollout import piecewise_command

    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=DT)
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=8,
              mpc_dt=0.03, mpc_iterations=15, gravity_comp=True,
              n_substeps=N_SUB)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    f = cfg.frequency
    sched = piecewise_command(
        [(6.0, [0, 0, 0, 0, 0, 0]),       # stand up + in-place gait
         (5.0, [0.2, 0, 0, 0, 0, 0]),     # trot forward (demo speed)
         (3.0, [0, 0, 0, 0, 0, 0])],      # decelerate to a stand
        f, dtype=DT)
    res = rollout_whole_body(plant, carry, sched, sched.shape[0], cfg,
                             model, CONTACT, cmd_schedule=True, **kw)
    x = np.asarray(res.trace.x)
    assert np.isfinite(x).all()
    i_fwd, i_dec = int(6 * f), int(11 * f)
    fwd = x[i_dec - 1, 0] - x[i_fwd, 0]
    assert fwd > 0.3, fwd
    # After the stop the robot keeps standing nearby (bounded drift).
    drift = abs(x[-1, 0] - x[int(11.5 * f), 0])
    assert drift < 0.4, drift
    # Height held through BOTH transitions (step transients allowed).
    z = x[i_fwd:, 2]
    assert abs(z - cfg.stand.height).max() < 0.08, (z.min(), z.max())
    rpy = np.asarray(matrix_to_rpy(res.plant.R))
    assert abs(rpy[0]) < 0.3 and abs(rpy[1]) < 0.3, rpy


def test_whole_body_fwd_and_back_scheduled():
    """The reference's FULL demo genre — forward AND BACKWARD walking at
    0.2 m/s (README.md:57, transition_backwards.gif) — in ONE scheduled
    full-physics rollout, PILOT-LESS.

    The reference's backward demo is human-piloted (teleop_ps4_walking.
    yaml); round 3 measured pilot-less reverse falling in 2-4 s at any
    speed. Round 4 fixed the anatomy (PARITY.md "Reverse-walking
    anatomy"): (1) the MPC's default pitch weight leaves a velocity-
    dependent pitch bias (-0.33 rad in place, -0.6 in reverse) that
    couples into roll — x20 pitch weight holds it at -0.1; (2) a
    full-gait-cycle MPC horizon (24 x 0.02 s) pre-leans for the diagonal-
    support windows; (3) raibert_cmd_symmetric kills foothold scatter;
    (4) the foothold-trim regulator closes heading/cross-track through
    stance geometry (the pilot analogue). Sustained reverse still falls
    at ~5-6 s (trip events -> swing-leg windmill past the q2 = pi wrap);
    the demo-genre EXCURSION below sits well inside that envelope
    (reverse 2.5 s = 17 gait cycles; measured margins: roll 0.05 vs the
    1.0 fall threshold, survives 3.0 s variant too)."""
    from quadruped_control_tpu.config import (
        FootholdTrimConfig,
        mit_cheetah_whole_body_config,
    )
    from quadruped_control_tpu.control.rollout import piecewise_command

    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=DT)
    f = cfg.frequency
    wts = jnp.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                     1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], DT)
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=24,
              mpc_dt=0.02, mpc_iterations=25, gravity_comp=True,
              raibert_cmd_symmetric=True,
              foothold_trim=FootholdTrimConfig(yaw_gain=0.6, lat_gain=0.2),
              mpc_state_weights=wts, n_substeps=N_SUB)
    sched = piecewise_command(
        [(4.0, [0, 0, 0, 0, 0, 0]),
         (3.0, [0.2, 0, 0, 0, 0, 0]),     # forward at the demo speed
         (2.0, [0, 0, 0, 0, 0, 0]),
         (2.5, [-0.2, 0, 0, 0, 0, 0]),    # BACKWARD at the demo speed
         (3.0, [0, 0, 0, 0, 0, 0])], f, dtype=DT)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    res = rollout_whole_body(plant, carry, sched, sched.shape[0], cfg,
                             model, ContactConfig(), cmd_schedule=True,
                             **kw)
    x = np.asarray(res.trace.x)
    assert np.isfinite(x).all()
    t = lambda s: int(s * f)  # noqa: E731
    fwd = x[t(7) - 1, 0] - x[t(4), 0]
    back = x[t(11.5) - 1, 0] - x[t(9), 0]
    assert fwd > 0.35, fwd          # measured +0.51 m
    assert back < -0.35, back       # measured -0.55 m
    z = x[t(2):, 2]
    assert abs(z - cfg.stand.height).max() < 0.04, (z.min(), z.max())
    R = np.asarray(res.trace.R[t(2)::30])
    rpy = np.stack([matrix_to_rpy(R[k]) for k in range(len(R))])
    assert np.abs(rpy[:, 0]).max() < 0.15, np.abs(rpy[:, 0]).max()
    assert np.abs(rpy[:, 1]).max() < 0.2, np.abs(rpy[:, 1]).max()
    assert abs(rpy[-1, 2]) < 0.15, rpy[-1, 2]  # heading held, pilot-less
    assert np.abs(x[:, 1]).max() < 0.12, np.abs(x[:, 1]).max()
    assert bool(res.carry.standing)


def test_whole_body_fwd_and_back_urdf():
    """The flagship demo on the URDF-TRUE model (VERDICT round-3 #2):
    the reference's fwd-AND-back genre, pilot-less, on the published
    Mini Cheetah inertials — with the reference's OWN joint gains.

    Round 3's 'URDF model falls at the 0->0.2 step' was a GAIN MISMATCH,
    not a model deficiency: mit_cheetah_whole_body_config stiffens the
    swing PD (kp 80/80/100, kd 2) for the synthesized model's heavy rod
    legs, which OVERDRIVES the URDF's hip-concentrated, 2.4x-lighter
    distal legs (measured: falls at 6-9 s forward; kd 4 falls in 0.3 s).
    With the reference's gains (40/40/50, kd 1 — tuned for the real URDF
    that Drake simulates, mit_cheetah_config.yaml:50-53) + the round-4
    operating point, the URDF model is the STEADIEST substrate measured:
    height band +-1 mm (synthesized: +-3 mm), |roll|max 0.042
    (synthesized 0.05), |pitch|max 0.022 post-stand-up, post-stop drift
    1 cm. Ref: drake_interface_node.cpp:184-191 (the reference simulates
    the real URDF, not a synthesized stand-in)."""
    import dataclasses

    from quadruped_control_tpu.config import (
        JointControlConfig,
        mit_cheetah_whole_body_config,
    )
    from quadruped_control_tpu.control.rollout import piecewise_command
    from quadruped_control_tpu.sim import mit_cheetah_urdf_model

    cfg = dataclasses.replace(mit_cheetah_whole_body_config(),
                              joint_control=JointControlConfig())
    model = mit_cheetah_urdf_model(cfg, dtype=DT)
    kw = _r4_operating_point(cfg)
    f = cfg.frequency
    sched = piecewise_command(
        [(4.0, [0, 0, 0, 0, 0, 0]),
         (3.0, [0.2, 0, 0, 0, 0, 0]),
         (2.0, [0, 0, 0, 0, 0, 0]),
         (2.5, [-0.2, 0, 0, 0, 0, 0]),
         (3.0, [0, 0, 0, 0, 0, 0])], f, dtype=DT)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    res = rollout_whole_body(plant, carry, sched, sched.shape[0], cfg,
                             model, ContactConfig(), cmd_schedule=True,
                             **kw)
    x = np.asarray(res.trace.x)
    assert np.isfinite(x).all()
    t = lambda s: int(s * f)  # noqa: E731
    fwd = x[t(7) - 1, 0] - x[t(4), 0]
    back = x[t(11.5) - 1, 0] - x[t(9), 0]
    assert fwd > 0.4, fwd           # measured +0.602 m
    assert back < -0.35, back       # measured -0.519 m
    z = x[t(3):, 2]
    assert abs(z - cfg.stand.height).max() < 0.02, (z.min(), z.max())
    R = np.asarray(res.trace.R[t(3)::30])
    rpy = np.stack([matrix_to_rpy(R[k]) for k in range(len(R))])
    assert np.abs(rpy[:, 0]).max() < 0.1, np.abs(rpy[:, 0]).max()
    assert np.abs(rpy[:, 1]).max() < 0.1, np.abs(rpy[:, 1]).max()
    assert abs(rpy[-1, 2]) < 0.1, rpy[-1, 2]
    assert bool(res.carry.standing)



@pytest.fixture(scope="module")
def r4_stand():
    """Shared 900-tick stand-up prefix for every demo test that starts
    from the synthesized substrate at the round-4 operating point
    (VERDICT round-4 weak #4: five demo-genre tests re-ran identical
    stand-ups from scratch; the rollout is deterministic, so a
    module-scoped prefix is bit-identical to each test running it
    itself). Returns (cfg, model, kw, standing rollout result)."""
    from quadruped_control_tpu.config import mit_cheetah_whole_body_config

    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=DT)
    kw = _r4_operating_point(cfg)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT), 900, cfg,
                             model, CONTACT, **kw)
    assert bool(res.carry.standing)
    return cfg, model, kw, res


def test_whole_body_sideways(r4_stand):
    """Sideways walking at the reference's published 0.1 m/s
    (README.md:63, teleop vy limit) on FULL physics: tracked to 1%,
    upright, height held — measured vy 0.101, |roll|max 0.088 under the
    round-4 operating point (the round-3 OP also survives but with a
    0.46 rad pitch bias and vy 25% high)."""
    cfg, model, kw, res = r4_stand
    f = cfg.frequency
    cmd = jnp.zeros(6, DT).at[1].set(0.1)
    r2 = rollout_whole_body(res.plant, res.carry, cmd, int(8 * f), cfg,
                            model, CONTACT, **kw)
    x = np.asarray(r2.trace.x)
    assert np.isfinite(x).all()
    vy = (x[-1, 1] - x[int(f), 1]) / 7.0
    assert 0.07 < vy < 0.13, vy
    assert abs(x[:, 2] - cfg.stand.height).max() < 0.04
    # fore-aft crab drift bounded (measured -0.031 m/s)
    assert abs(x[-1, 0] - x[int(f), 0]) / 7.0 < 0.06
    R = np.asarray(r2.trace.R[::30])
    rpy = np.stack([matrix_to_rpy(R[k]) for k in range(len(R))])
    assert np.abs(rpy[:, 0]).max() < 0.2, np.abs(rpy[:, 0]).max()
    assert np.abs(rpy[:, 1]).max() < 0.2, np.abs(rpy[:, 1]).max()


def test_whole_body_yaw_in_place(r4_stand):
    """Turning in place on FULL physics: commanded wz = 0.02 rad/s for
    8 s turns the robot in the commanded direction, upright, height held.

    Measured envelope (round-4 yaw labs): the in-place turn runs ~2x the
    commanded rate (yaw is rate-commanded with the desired pose
    re-anchored every tick, commander_node.cpp:399-412 — there is no
    absolute heading loop to trim the gait's own yaw impulses; the
    foothold-trim yaw channel is too weak to close the gap in place), and
    wz = 0.05 in place is measurably UNSTABLE on this SYNTHESIZED
    substrate under every round-4 instrument (trim gains, MPC yaw weight
    x10, symmetric tangential term). The reference's published
    "0.05 rad/s" (README.md:63) is its teleop CLAMP
    (teleop_ps4_walking.yaml), driven by a human — not a validated
    autonomous operating point; the SRB surrogate tracks it
    (tests/test_rollout.py::test_walk_yaw_*).

    This test PINS that reference-exact (servo-less) anatomy. Round 5
    SOLVED accurate yaw on the URDF substrate: the absolute-heading
    servo realizes wz=0.05 in place to 1% and while walking to 6%
    (`test_whole_body_yaw_servo_in_place`,
    `test_whole_body_turn_while_walking`)."""
    cfg, model, kw, res = r4_stand
    f = cfg.frequency
    cmd = jnp.zeros(6, DT).at[5].set(0.02)
    r2 = rollout_whole_body(res.plant, res.carry, cmd, int(8 * f), cfg,
                            model, CONTACT, **kw)
    x = np.asarray(r2.trace.x)
    assert np.isfinite(x).all()
    R = np.asarray(r2.trace.R[::30])
    rpy = np.stack([matrix_to_rpy(R[k]) for k in range(len(R))])
    # turned in the commanded direction (>= commanded 0.16 rad; the
    # measured ~2x rate overshoot is documented above)
    assert 0.12 < rpy[-1, 2] < 0.6, rpy[-1, 2]
    assert np.abs(rpy[:, 0]).max() < 0.35, np.abs(rpy[:, 0]).max()
    assert abs(x[:, 2] - cfg.stand.height).max() < 0.04
    # station drift bounded (measured ~0.25 m over 8 s — position is
    # UNREGULATED by design: the desired pose re-anchors to measured
    # every tick, commander_node.cpp:399-412; the trim's cross-track
    # channel only trims the path-lateral direction)
    assert np.abs(x[:, :2]).max() < 0.4, np.abs(x[:, :2]).max()


def test_whole_body_stance_pose():
    """The reference's stance body-posing demo genre on FULL physics
    (round-5 VERDICT #4): roll / pitch / yaw / height excursions on the
    PS4 stance mapping (teleop_ps4_stance.yaml:5-14, media
    body_control.gif / stance.gif), pilot-less, through the commander's
    stance_pose rate integrator, tracked by the balance QP on all-stance
    support. URDF-true substrate + the reference's own joint gains.

    Measured on TPU f32 (scripts/stance_pose_demo.py): roll/pitch/yaw
    holds +0.200/+0.196/+0.200 vs the +0.2 target, z holds 0.200/0.301
    vs 0.20/0.30, station drift < 0.2 mm, ends flat at 0.26 m."""
    import dataclasses
    import sys

    from quadruped_control_tpu.config import (
        JointControlConfig,
        mit_cheetah_whole_body_config,
    )
    from quadruped_control_tpu.sim import mit_cheetah_urdf_model

    sys.path.insert(0, "scripts")
    from stance_pose_demo import pose_schedule

    cfg = dataclasses.replace(mit_cheetah_whole_body_config(),
                              joint_control=JointControlConfig())
    model = mit_cheetah_urdf_model(cfg, dtype=DT)
    f = cfg.frequency
    sched = pose_schedule(f, DT)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    res = rollout_whole_body(plant, carry, sched, sched.shape[0], cfg,
                             model, ContactConfig(), cmd_schedule=True,
                             n_substeps=N_SUB, gravity_comp=True,
                             stance_pose=True)
    x = np.asarray(res.trace.x)
    R = np.asarray(res.trace.R)
    assert np.isfinite(x).all()
    t = lambda s: int(s * f)  # noqa: E731
    # Each channel's held excursion tracks the +0.2 target.
    for name, k, ch in (("roll", t(5.4), 0), ("pitch", t(7.4), 1),
                        ("yaw", t(9.4), 2)):
        v = float(matrix_to_rpy(R[k])[ch])
        assert abs(v - 0.2) < 0.04, (name, v)
    assert abs(x[t(11.2), 2] - 0.20) < 0.012, x[t(11.2), 2]
    assert abs(x[t(12.8), 2] - 0.30) < 0.012, x[t(12.8), 2]
    # Returns to the flat stand; the station never moves (all-stance).
    rpy_end = np.asarray(matrix_to_rpy(res.plant.R))
    assert np.abs(rpy_end).max() < 0.03, rpy_end
    assert abs(float(res.plant.x[2]) - cfg.stand.height) < 0.01
    assert np.abs(x[:, :2]).max() < 0.05
    # The gait clock never ran: this is all-stance balance control.
    assert float(np.asarray(res.carry.gait_time).max()) < 0.0
