"""Whole-body dynamics validation against first-principles oracles.

The reference has no physics of its own to test against (Drake is the
oracle there); here the articulated-dynamics engine is validated against
structural invariants any correct implementation must satisfy:

  - mass-matrix symmetry/SPD and its closed-form composite blocks,
  - gravity bias == gradient of potential energy (independent autodiff
    oracle through the FK-only COM map),
  - static bias == total gravity wrench,
  - energy conservation in torque-free flight,
  - Newton's law for linear momentum under gravity + angular momentum
    conservation about the COM (uniform field exerts no torque there),
  - compliant contact statics (penetration at rest == weight / stiffness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_control_tpu.config import GRAVITY, mit_cheetah_physical_config
from quadruped_control_tpu.sim import (
    ContactConfig,
    WholeBodyState,
    body_coms_world,
    init_whole_body_state,
    mass_matrix,
    mit_cheetah_whole_body_model,
    precompute_leg_kinematics,
    rnea,
    rnea_bias,
    total_mass,
    whole_body_step,
)

CFG = mit_cheetah_physical_config()
MODEL = mit_cheetah_whole_body_model(CFG, dtype=jnp.float64)
DT = jnp.float64


def _rand_q(rng, batch=()):
    return jnp.asarray(
        rng.uniform(-1.2, 1.2, size=batch + (4, 3)), DT
    )


def _potential_energy(q, R, x):
    trunk_com, link_coms = body_coms_world(MODEL, q, R, x)
    pe = MODEL.trunk_mass * GRAVITY * trunk_com[..., 2]
    pe = pe + jnp.sum(
        MODEL.link_mass * GRAVITY * link_coms[..., 2], axis=(-1, -2)
    )
    return pe


def _kinetic_energy(q, u):
    kin = precompute_leg_kinematics(MODEL, q)
    M = mass_matrix(MODEL, kin, q.shape[:-2], DT)
    return 0.5 * jnp.einsum("...i,...ij,...j->...", u, M, u)


def test_mass_matrix_structure(rng):
    q = _rand_q(rng, (5,))
    kin = precompute_leg_kinematics(MODEL, q)
    M = np.asarray(mass_matrix(MODEL, kin, (5,), DT))

    assert np.allclose(M, np.swapaxes(M, -1, -2), atol=1e-12)
    eigs = np.linalg.eigvalsh(M)
    assert np.all(eigs > 0), f"min eig {eigs.min()}"

    # Composite-inertia closed forms: the linear-linear block is the total
    # mass times identity; the angular-linear coupling is m_tot * skew(c)
    # with c the robot COM in base coords.
    m_tot = float(total_mass(MODEL))
    assert np.allclose(M[:, 3:6, 3:6], m_tot * np.eye(3), atol=1e-10)

    R0 = jnp.broadcast_to(jnp.eye(3, dtype=DT), (5, 3, 3))
    x0 = jnp.zeros((5, 3), DT)
    trunk_com, link_coms = body_coms_world(MODEL, q, R0, x0)
    c = (
        np.asarray(MODEL.trunk_mass) * np.asarray(trunk_com)
        + np.einsum(
            "lj,nljk->nk", np.asarray(MODEL.link_mass),
            np.asarray(link_coms),
        )
    ) / m_tot
    for n in range(5):
        cx = np.array(
            [
                [0.0, -c[n, 2], c[n, 1]],
                [c[n, 2], 0.0, -c[n, 0]],
                [-c[n, 1], c[n, 0], 0.0],
            ]
        )
        assert np.allclose(M[n, :3, 3:6], m_tot * cx, atol=1e-10)


def test_gravity_bias_is_potential_gradient(rng):
    """h(q, u=0) joint part == dV/dq — an autodiff oracle that shares no
    code with the RNEA backward pass (it goes through the COM FK map)."""
    q = _rand_q(rng)
    R = jnp.eye(3, dtype=DT)
    x = jnp.zeros(3, DT)
    kin = precompute_leg_kinematics(MODEL, q)
    h = rnea_bias(MODEL, kin, R, jnp.zeros(6, DT), jnp.zeros((4, 3), DT))

    dVdq = jax.grad(lambda qq: _potential_energy(qq, R, x))(q)
    np.testing.assert_allclose(
        np.asarray(h[6:]).reshape(4, 3), np.asarray(dVdq), atol=1e-10
    )


def test_static_bias_is_gravity_wrench(rng):
    """Base rows of h at rest equal minus the total gravity wrench at the
    base origin (tilted base included)."""
    q = _rand_q(rng)
    # A non-trivial base orientation.
    from quadruped_control_tpu.math.rotations import so3_exp

    R = so3_exp(jnp.asarray([0.3, -0.2, 0.7], DT))
    x = jnp.asarray([0.1, -0.2, 0.5], DT)
    kin = precompute_leg_kinematics(MODEL, q)
    h = rnea_bias(MODEL, kin, R, jnp.zeros(6, DT), jnp.zeros((4, 3), DT))

    m_tot = total_mass(MODEL)
    trunk_com, link_coms = body_coms_world(MODEL, q, R, x)
    com_w = (
        MODEL.trunk_mass * trunk_com
        + jnp.einsum("lj,ljk->k", MODEL.link_mass, link_coms)
    ) / m_tot
    g_w = jnp.asarray([0.0, 0.0, -GRAVITY * m_tot], DT)
    f_b = R.T @ g_w
    c_b = R.T @ (com_w - x)
    np.testing.assert_allclose(
        np.asarray(h[:3]), np.asarray(-jnp.cross(c_b, f_b)), atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(h[3:6]), np.asarray(-f_b),
                               atol=1e-10)


def test_energy_conservation_free_flight(rng):
    """Torque-free tumbling flight conserves E = KE + PE."""
    q = _rand_q(rng)
    u0 = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-3.0, 3.0, 3),  # omega
                rng.uniform(-1.0, 1.0, 3),  # v
                rng.uniform(-2.0, 2.0, 12),
            ]
        ),
        DT,
    )
    state = WholeBodyState(
        R=jnp.eye(3, dtype=DT),
        x=jnp.asarray([0.0, 0.0, 50.0], DT),
        u=u0,
        q=q,
        anchor=jnp.zeros((8, 2), DT),
    )
    # Disable damping/armature losses for the conservation check.
    model = MODEL._replace(
        joint_damping=jnp.zeros((4, 3), DT),
        armature=jnp.zeros((4, 3), DT),
    )

    def energy(s):
        kin = precompute_leg_kinematics(model, s.q)
        M = mass_matrix(model, kin, (), DT)
        ke = 0.5 * s.u @ M @ s.u
        trunk_com, link_coms = body_coms_world(model, s.q, s.R, s.x)
        pe = model.trunk_mass * GRAVITY * trunk_com[2] + jnp.sum(
            model.link_mass * GRAVITY * link_coms[..., 2]
        )
        return float(ke + pe)

    e0 = energy(state)
    contact = ContactConfig(substep_dt=2.0e-5)
    tau = jnp.zeros((4, 3), DT)
    step = jax.jit(
        lambda s: whole_body_step(s, tau, 0.01, model, CFG, contact)
    )
    for _ in range(5):  # 50 ms of flight
        state = step(state)
    e1 = energy(state)
    assert abs(e1 - e0) / abs(e0) < 2e-5, (e0, e1)
    assert float(state.x[2]) > 5.0  # never touched ground


def test_momentum_laws_free_flight(rng):
    """Linear momentum obeys dp/dt = m g; angular momentum about the COM is
    conserved in a uniform field."""
    q = _rand_q(rng)
    u0 = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-2.0, 2.0, 3),
                rng.uniform(-1.0, 1.0, 3),
                rng.uniform(-2.0, 2.0, 12),
            ]
        ),
        DT,
    )
    state = WholeBodyState(
        R=jnp.eye(3, dtype=DT),
        x=jnp.asarray([0.0, 0.0, 50.0], DT),
        u=u0,
        q=q,
        anchor=jnp.zeros((8, 2), DT),
    )
    model = MODEL._replace(
        joint_damping=jnp.zeros((4, 3), DT),
        armature=jnp.zeros((4, 3), DT),
    )
    m_tot = float(total_mass(model))

    def momenta(s):
        kin = precompute_leg_kinematics(model, s.q)
        M = mass_matrix(model, kin, (), DT)
        hgen = M @ s.u
        hw_b, hv_b = hgen[:3], hgen[3:6]
        p_w = s.R @ hv_b  # linear momentum, world
        L_origin = s.R @ hw_b + jnp.cross(s.x, p_w)  # ang. mom. @ world 0
        trunk_com, link_coms = body_coms_world(model, s.q, s.R, s.x)
        com = (
            model.trunk_mass * trunk_com
            + jnp.einsum("lj,ljk->k", model.link_mass, link_coms)
        ) / m_tot
        L_com = L_origin - jnp.cross(com, p_w)
        return np.asarray(p_w), np.asarray(L_com)

    p0, L0 = momenta(state)
    contact = ContactConfig(substep_dt=2.0e-5)
    tau = jnp.zeros((4, 3), DT)
    T = 0.05
    step = jax.jit(
        lambda s: whole_body_step(s, tau, T, model, CFG, contact)
    )
    state = step(state)
    p1, L1 = momenta(state)

    # Semi-implicit Euler conserves these only to O(dt): the tolerance is
    # the integrator's, not the dynamics' (energy test pins the physics).
    expected_dp = np.array([0.0, 0.0, -m_tot * GRAVITY * T])
    np.testing.assert_allclose(p1 - p0, expected_dp, atol=1e-3)
    np.testing.assert_allclose(L1, L0, atol=1e-3)


def test_contact_statics():
    """A robot held stiff (joint PD about a standing pose, feet under the
    hips) settles with total normal force == weight, i.e. mean penetration
    == weight / (k * n_feet)."""
    from quadruped_control_tpu.ops.kinematics import inverse_kinematics

    contact = ContactConfig()
    hips = CFG.kinematics.hip_offsets(DT)
    l1s = CFG.kinematics.l1_signed(DT)
    feet_b = hips.at[..., 1].add(l1s).at[..., 2].set(-0.24)
    q_hold = inverse_kinematics(feet_b, CFG.kinematics)
    state = init_whole_body_state(CFG, dtype=DT, q0=(0.0, 0.0, 0.0))
    state = state._replace(
        q=q_hold, x=state.x.at[2].set(0.241)
    )

    def pd_tau(s):
        qdot = s.u[6:].reshape(4, 3)
        return 150.0 * (q_hold - s.q) - 3.0 * qdot

    step = jax.jit(
        lambda s: whole_body_step(s, pd_tau(s), 0.001, MODEL, CFG, contact)
    )
    for _ in range(800):  # 0.8 s to settle at a 1 kHz PD
        state = step(state)

    assert np.all(np.isfinite(np.asarray(state.x)))
    speed = float(jnp.linalg.norm(state.u[:6]))
    assert speed < 5e-2, speed

    # Feet penetration at rest: weight shared over 4 feet.
    from quadruped_control_tpu.ops.kinematics import forward_kinematics

    feet_b = forward_kinematics(state.q, CFG.kinematics)
    feet_w = (state.R @ feet_b[..., None])[..., 0] + state.x
    m_tot = float(total_mass(MODEL))
    expected_phi = m_tot * GRAVITY / (4.0 * contact.stiffness)
    phi = -np.asarray(feet_w[..., 2])
    assert np.all(phi > 0.2 * expected_phi)
    assert np.all(phi < 3.0 * expected_phi)
    np.testing.assert_allclose(
        phi.mean(), expected_phi, rtol=0.35,
    )


def test_batched_matches_single(rng):
    """vmap/batch semantics: a batch of identical states steps identically
    to the single instance (pure function, no cross-talk)."""
    state = init_whole_body_state(CFG, (3,), dtype=DT)
    tau = jnp.asarray(rng.uniform(-5, 5, (4, 3)), DT)
    taus = jnp.broadcast_to(tau, (3, 4, 3))
    contact = ContactConfig()
    out_b = whole_body_step(state, taus, 0.01, MODEL, CFG, contact)
    single = jax.tree.map(lambda a: a[0], state)
    out_s = whole_body_step(single, tau, 0.01, MODEL, CFG, contact)
    for a, b in zip(jax.tree.leaves(out_b), jax.tree.leaves(out_s)):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b),
                                   atol=1e-12)


def test_structured_solve_matches_dense(rng):
    """The Schur-complement tree solve equals a dense solve of M u = r."""
    from quadruped_control_tpu.sim.dynamics import solve_mass_matrix

    q = _rand_q(rng, (7,))
    kin = precompute_leg_kinematics(MODEL, q)
    M = mass_matrix(MODEL, kin, (7,), DT)
    r = jnp.asarray(rng.normal(size=(7, 18)), DT)
    u_struct = solve_mass_matrix(M, r)
    u_dense = jnp.linalg.solve(M, r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(u_struct), np.asarray(u_dense),
                               rtol=1e-9, atol=1e-11)
    # And the off-diagonal leg-leg coupling really is zero (the sparsity
    # the solve relies on).
    D = np.asarray(M)[:, 6:, 6:]
    for a in range(4):
        for b in range(4):
            if a != b:
                blk = D[:, 3 * a:3 * a + 3, 3 * b:3 * b + 3]
                assert np.abs(blk).max() < 1e-12


def test_armature_and_damping_effects(rng):
    """Armature adds exactly to the joint diagonal of M; damping opposes
    joint motion."""
    q = _rand_q(rng)
    kin = precompute_leg_kinematics(MODEL, q)
    M = mass_matrix(MODEL, kin, (), DT)
    model0 = MODEL._replace(armature=jnp.zeros((4, 3), DT))
    M0 = mass_matrix(model0, kin, (), DT)
    diff = np.asarray(M - M0)
    expected = np.zeros((18, 18))
    expected[6:, 6:] = np.diag(np.asarray(MODEL.armature).reshape(12))
    np.testing.assert_allclose(diff, expected, atol=1e-12)


def test_lagrangian_oracle_script():
    """The independent sympy Euler-Lagrange derivation
    (scripts/derive_dynamics.py) agrees with the engine's RNEA/CRBA at
    machine precision — the external-authority role Drake plays for the
    reference (drake_interface_node.cpp:96-391), kept runnable and pinned.
    ~2.5 min (symbolic build dominates)."""
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    res = subprocess.run(
        [sys.executable, str(repo / "scripts" / "derive_dynamics.py")],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ,
             "PYTHONPATH": f"{repo}:" + __import__("os").environ.get(
                 "PYTHONPATH", "")},
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PASS: Lagrangian == RNEA/CRBA" in res.stdout, res.stdout
