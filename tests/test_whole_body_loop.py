"""Closed-loop behavior on FULL articulated-body physics.

The whole-body analogue of tests/test_rollout.py (which closes the loop
through the SRB surrogate): the commander's torque output drives the
13-body plant through compliant contact — the same validation the
reference performs against Drake (README.md:54-63, stand-up + 0.2 m/s
walking), with leg dynamics, foot slip, and impacts all real.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.math.rotations import matrix_to_rpy
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_rollout,
    mit_cheetah_whole_body_model,
    rollout_whole_body,
)

CFG = mit_cheetah_physical_config()
DT = jnp.float64
MODEL = mit_cheetah_whole_body_model(CFG, dtype=DT)
CONTACT = ContactConfig()
N_SUB = 10  # 0.33 ms physics step keeps the CPU suite fast; the shipped
# default (0.1 ms, physics.yaml parity) is exercised in test_whole_body.


def test_standup_whole_body():
    """Laying -> standing at 0.26 m through real leg dynamics + contact:
    the reference's stand_up demo (SURVEY.md §3.3) on full physics."""
    plant, carry = init_whole_body_rollout(CFG, dtype=DT)
    cmd = jnp.zeros(6, DT)
    res = rollout_whole_body(plant, carry, cmd, 600, CFG, MODEL, CONTACT,
                             n_substeps=N_SUB)
    z = float(res.plant.x[2])
    assert abs(z - CFG.stand.height) < 0.015, z
    assert bool(res.carry.standing)
    rpy = np.asarray(matrix_to_rpy(res.plant.R))
    assert abs(rpy[0]) < 0.05 and abs(rpy[1]) < 0.05
    assert np.asarray(res.trace.qp_converged).mean() > 0.95
    # Torques within the commander's clamp (commander_node.cpp:526).
    assert np.asarray(res.trace.torque_max).max() <= 20.0 + 1e-9


def test_walk_whole_body_tracks_02():
    """Trot at the reference's gait-transition speed (0.2 m/s,
    README.md:57) on full physics: height held, lateral drift bounded,
    forward speed tracked."""
    plant, carry = init_whole_body_rollout(CFG, dtype=DT)
    # m_update="substep": the slow reference trot is marginally stable on
    # full physics (see PARITY.md); this pins the validated configuration.
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT), 900, CFG,
                             MODEL, CONTACT, n_substeps=N_SUB,
                             m_update="substep")
    cmd = jnp.zeros(6, DT).at[0].set(0.2)
    r2 = rollout_whole_body(res.plant, res.carry, cmd, 1500, CFG, MODEL,
                            CONTACT, n_substeps=N_SUB,
                            m_update="substep")
    z = np.asarray(r2.trace.x[..., 2])
    x = np.asarray(r2.trace.x[..., 0])
    y = np.asarray(r2.trace.x[..., 1])
    assert np.isfinite(z).all()
    # steady-state speed over the last 4 s
    vx = (x[-1] - x[300]) / (1200 / CFG.frequency)
    assert 0.15 < vx < 0.25, vx
    assert abs(z[300:].min() - CFG.stand.height) < 0.05
    assert abs(z[300:].max() - CFG.stand.height) < 0.05
    assert np.abs(y).max() < 0.3
    rpy = np.asarray(matrix_to_rpy(r2.plant.R))
    assert abs(rpy[0]) < 0.3


def test_whole_body_mpc_trot_robust_point():
    """The shipped full-physics operating point
    (mit_cheetah_whole_body_config + MPC + gravity compensation) trots at
    0.2 m/s — measured robust across every contact/integration variant in
    the stabilization grids (see PARITY.md)."""
    from quadruped_control_tpu.config import mit_cheetah_whole_body_config

    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=DT)
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=8,
              mpc_dt=0.03, mpc_iterations=15, gravity_comp=True,
              n_substeps=N_SUB)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT), 900, cfg,
                             model, CONTACT, **kw)
    assert bool(res.carry.standing)
    cmd = jnp.zeros(6, DT).at[0].set(0.2)
    r2 = rollout_whole_body(res.plant, res.carry, cmd, 1200, cfg, model,
                            CONTACT, **kw)
    z = np.asarray(r2.trace.x[..., 2])
    x = np.asarray(r2.trace.x[..., 0])
    vx = (x[-1] - x[300]) / (900 / cfg.frequency)
    assert 0.12 < vx < 0.22, vx
    assert abs(z[300:].min() - cfg.stand.height) < 0.06
    assert abs(z[300:].max() - cfg.stand.height) < 0.06
    rpy = np.asarray(matrix_to_rpy(r2.plant.R))
    assert abs(rpy[0]) < 0.3


def test_whole_body_batched_scenarios():
    """Batched closed loop: scenarios evolve independently (one falling
    robot cannot poison the batch — same guarantee as the surrogate)."""
    plant, carry = init_whole_body_rollout(CFG, (4,), dtype=DT)
    # Scenario 3 is pushed hard sideways at start (will stumble/fall).
    u = plant.u.at[3, 4].set(2.0)
    plant = plant._replace(u=u)
    cmd = jnp.zeros((4, 6), DT)
    res = rollout_whole_body(plant, carry, cmd, 300, CFG, MODEL, CONTACT,
                             n_substeps=N_SUB)
    assert np.isfinite(np.asarray(res.plant.x)).all()
    assert np.isfinite(np.asarray(res.plant.u)).all()
    # Undisturbed scenarios agree with each other.
    np.testing.assert_allclose(
        np.asarray(res.plant.x[0]), np.asarray(res.plant.x[1]), atol=1e-9
    )


def _r4_operating_point(cfg):
    """The round-4 demo operating point (see
    test_whole_body_fwd_and_back_scheduled): x20 MPC pitch weight,
    full-gait-cycle horizon, symmetric Raibert travel, foothold trim."""
    from quadruped_control_tpu.config import FootholdTrimConfig

    wts = jnp.array([50.0, 1000.0, 10.0, 1.0, 1.0, 100.0,
                     1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], DT)
    return dict(controller="mpc", mpc_backend="structured", mpc_horizon=24,
                mpc_dt=0.02, mpc_iterations=25, gravity_comp=True,
                raibert_cmd_symmetric=True,
                foothold_trim=FootholdTrimConfig(yaw_gain=0.6,
                                                 lat_gain=0.2),
                mpc_state_weights=wts, n_substeps=N_SUB)


def test_whole_body_post_fall_finite():
    """A fully fallen whole-body scenario stays FINITE forever (round-4
    substep guard, sim/plant.py): velocity clamp + freeze-on-nonfinite.
    Round 3 documented the engine NaN-ing ~0.3 s after a full fall
    (PARITY.md "Beyond-envelope behavior"); now one crashed scenario can
    never poison a batched sweep — the SRB surrogate's guarantee, matched.
    Scenario 0 (undisturbed) must stand up normally alongside."""
    plant, carry = init_whole_body_rollout(CFG, (2,), dtype=DT)
    # Violent roll + lateral push: guaranteed full fall.
    u = plant.u.at[1, 0].set(12.0).at[1, 4].set(4.0)
    plant = plant._replace(u=u)
    res = rollout_whole_body(plant, carry, jnp.zeros((2, 6), DT), 900,
                             CFG, MODEL, CONTACT, n_substeps=N_SUB)
    assert np.isfinite(np.asarray(res.trace.x)).all()
    assert np.isfinite(np.asarray(res.plant.u)).all()
    assert np.isfinite(np.asarray(res.plant.R)).all()
    # The pushed scenario actually fell (not upright)...
    assert float(res.plant.R[1, 2, 2]) < 0.9 or float(
        res.plant.x[1, 2]) < 0.15
    # ...while the undisturbed one stood up unaffected.
    assert bool(res.carry.standing[0])
    assert abs(float(res.plant.x[0, 2]) - CFG.stand.height) < 0.015


def test_urdf_model_values_and_standup():
    """mit_cheetah_urdf_model pins the PUBLISHED Mini Cheetah inertials
    (Katz et al. 2019 / mit_cheetah_description; PARITY.md "Model
    fidelity") and fixes the synthesized model's asymmetric stand: the
    robot stands up essentially in place (x drift |dx| < 2 cm vs the
    synthesized model's measured -5.1 cm crouch) and holds the in-place
    gait. The published body inertia matches the reference's SRB config
    EXACTLY — the corroboration that these are the right numbers."""
    from quadruped_control_tpu.config import mit_cheetah_whole_body_config
    from quadruped_control_tpu.sim import mit_cheetah_urdf_model

    cfg = mit_cheetah_whole_body_config()
    model = mit_cheetah_urdf_model(cfg, dtype=DT)
    # Data pins: published values, trunk-padded to the controller's mass.
    np.testing.assert_allclose(np.asarray(model.link_mass[0]),
                               [0.54, 0.634, 0.064], rtol=0)
    assert abs(float(model.trunk_mass)
               + 4 * (0.54 + 0.634 + 0.064) - cfg.balance.mass) < 1e-9
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(model.trunk_inertia)),
        cfg.balance.inertia_diag, rtol=0)
    np.testing.assert_allclose(np.asarray(model.armature),
                               33e-6 * 36.0, rtol=1e-12)

    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=8,
              mpc_dt=0.03, mpc_iterations=15, gravity_comp=True,
              n_substeps=N_SUB)
    plant, carry = init_whole_body_rollout(cfg, dtype=DT)
    res = rollout_whole_body(plant, carry, jnp.zeros(6, DT), 900, cfg,
                             model, CONTACT, **kw)
    assert bool(res.carry.standing)
    z = float(res.plant.x[2])
    assert abs(z - cfg.stand.height) < 0.01, z
    assert abs(float(res.plant.x[0])) < 0.02, float(res.plant.x[0])
    rpy = np.asarray(matrix_to_rpy(res.plant.R))
    assert abs(rpy[0]) < 0.1 and abs(rpy[1]) < 0.15, rpy


def test_leg_inertial_sensitivity():
    """Whole-body behavior claims survive -30%/+15% leg inertials.

    The reference gets leg inertials from the URDF via Drake
    (drake_interface_node.cpp:184-191); sim/model.py SYNTHESIZES them
    (thin-rod approximations around Mini-Cheetah-like link masses, module
    docstring). This bounds the modeling risk: the shipped operating
    point (whole-body config + MPC + gravity compensation) must stand up
    and trot with every leg link scaled 0.7x and 1.15x (rod inertias
    scale with mass; trunk mass rebalances to keep the 11 kg total).
    Measured envelope edges (documented in PARITY.md "Model fidelity"):
    1.2x falls during the trot, 1.3x latches stand-up at 0.263 m but
    sinks under the sustained in-place gait — the claims hold across the
    plausible range of the synthesis error, not arbitrarily far.
    """
    from quadruped_control_tpu.config import mit_cheetah_whole_body_config

    cfg = mit_cheetah_whole_body_config()
    kw = dict(controller="mpc", mpc_backend="structured", mpc_horizon=8,
              mpc_dt=0.03, mpc_iterations=15, gravity_comp=True,
              n_substeps=N_SUB)
    for scale in (0.7, 1.15):
        model = mit_cheetah_whole_body_model(
            cfg, dtype=DT, abad_mass=scale * 0.54,
            thigh_mass=scale * 0.634, shank_mass=scale * 0.151)
        plant, carry = init_whole_body_rollout(cfg, dtype=DT)
        res = rollout_whole_body(plant, carry, jnp.zeros(6, DT), 600, cfg,
                                 model, CONTACT, **kw)
        z = float(res.plant.x[2])
        assert abs(z - cfg.stand.height) < 0.02, (scale, z)
        assert bool(res.carry.standing), scale
        cmd = jnp.zeros(6, DT).at[0].set(0.2)
        r2 = rollout_whole_body(res.plant, res.carry, cmd, 500, cfg,
                                model, CONTACT, **kw)
        x2 = np.asarray(r2.trace.x)
        assert np.isfinite(x2).all(), scale
        assert x2[-1, 0] > 0.05, (scale, x2[-1, 0])  # moves forward
        assert abs(x2[300:, 2].mean() - cfg.stand.height) < 0.06, scale
        rpy = np.asarray(matrix_to_rpy(r2.plant.R))
        assert abs(rpy[0]) < 0.3 and abs(rpy[1]) < 0.3, (scale, rpy)


