#!/usr/bin/env python
"""Independent symbolic (Lagrangian) derivation of the whole-body dynamics.

The physics engine (sim/dynamics.py: spatial-algebra RNEA + unit-accel
mass matrix) is validated in-repo by energy/momentum/autodiff oracles,
but those share the engine's own spatial-algebra conventions. The
reference leans on Drake as an external authority
(drake_interface_node.cpp:96-391); this script plays that role the way
scripts/derive_kinematics.py does for FK: an INDEPENDENT derivation from
first principles — sympy Euler-Lagrange on explicit coordinates — checked
against the engine at random states in float64.

Subtree: floating base + the RL leg (9 DoF); the other three legs are
zeroed (massless links, zero armature), which reduces the full 13-body
tree functions exactly to the subtree. Derivation route:

  coordinates  z = [roll, pitch, yaw, px, py, pz, q1, q2, q3]
  kinetic      T = sum_bodies 1/2 m |c_dot_w|^2 + 1/2 w_l^T I_c w_l
               (+ 1/2 armature qdot_j^2 reflected rotor energy)
  potential    V = g sum_bodies m c_z
  Euler-Lagr.  f_z = d/dt(dT/dz_dot) - dT/dz + dV/dz

The engine works in QUASI-VELOCITIES u = [w_b (base coords), v_b
(base-origin velocity, base coords), qdot] (sim/dynamics.py module
docstring), related by u = A(z) z_dot. Frame-invariance of virtual work
gives the exact crosswalk used for the assertions:

  f_z == A(z)^T tau_engine(u, u_dot),   u = A z_dot,
                                        u_dot = A z_ddot + A_dot z_dot
  M_coord == A^T M_engine A             (kinetic-energy invariance)

Run: PYTHONPATH="$PYTHONPATH:." python scripts/derive_dynamics.py
(pinned by tests/test_whole_body.py::test_lagrangian_oracle_script)
"""

import sys

import numpy as np
import sympy as sp


def build_symbolic(consts):
    """Build lambdified f_z(z, zd, zdd), M_coord(z), A(z), Adot(z, zd)."""
    t = sp.Symbol("t")
    names = ["phi", "th", "psi", "px", "py", "pz", "q1", "q2", "q3"]
    zf = [sp.Function(n)(t) for n in names]
    phi, th, psi, px, py, pz, q1, q2, q3 = zf
    zd = [f.diff(t) for f in zf]
    zdd = [f.diff(t, 2) for f in zf]

    def rx(a):
        return sp.Matrix([[1, 0, 0],
                          [0, sp.cos(a), -sp.sin(a)],
                          [0, sp.sin(a), sp.cos(a)]])

    def ry(a):
        return sp.Matrix([[sp.cos(a), 0, sp.sin(a)],
                          [0, 1, 0],
                          [-sp.sin(a), 0, sp.cos(a)]])

    def rz(a):
        return sp.Matrix([[sp.cos(a), -sp.sin(a), 0],
                          [sp.sin(a), sp.cos(a), 0],
                          [0, 0, 1]])

    R_wb = rz(psi) * ry(th) * rx(phi)  # world-from-base
    p = sp.Matrix([px, py, pz])

    # Body angular velocity in base coords — the closed Euler-rate form
    # for the ZYX (yaw-pitch-roll) composition (standard; independent of
    # the engine's Rodrigues/unskew machinery).
    w_b = sp.Matrix([
        phi.diff(t) - psi.diff(t) * sp.sin(th),
        th.diff(t) * sp.cos(phi) + psi.diff(t) * sp.cos(th) * sp.sin(phi),
        -th.diff(t) * sp.sin(phi) + psi.diff(t) * sp.cos(th) * sp.cos(phi),
    ])
    v_b = R_wb.T * p.diff(t)  # base-origin velocity, base coords

    m0, I0 = consts["trunk_mass"], sp.Matrix(consts["trunk_inertia"])
    T = (m0 * (v_b.T * v_b)[0, 0] / 2 + (w_b.T * I0 * w_b)[0, 0] / 2)
    g = consts["gravity"]
    V = g * m0 * pz

    # RL leg chain: abad (x-axis) at the hip offset, thigh (y) at
    # (0, l1s, 0), knee (y) at (0, 0, -l2) — model.joint_offsets/axes.
    # Velocities recurse in LINK frames (textbook rigid-chain kinematics)
    # so every symbolic expression stays a product of few trig factors —
    # the naive diff-of-world-positions route explodes past practicality.
    hip = sp.Matrix(consts["hip"])
    offs = [hip, sp.Matrix([0, consts["l1s"], 0]),
            sp.Matrix([0, 0, -consts["l2"]])]
    rots = [rx(q1), ry(q2), ry(q3)]
    axes = [sp.Matrix([1, 0, 0]), sp.Matrix([0, 1, 0]),
            sp.Matrix([0, 1, 0])]
    qs = [q1, q2, q3]

    w_j, v_j = w_b, v_b          # in the current (parent) frame
    R_wl, o_w = R_wb, p          # world pose for the potential only
    for j in range(3):
        Rj = rots[j]
        v_j = Rj.T * (v_j + w_j.cross(offs[j]))
        w_j = Rj.T * w_j + axes[j] * qs[j].diff(t)
        o_w = o_w + R_wl * offs[j]
        R_wl = R_wl * Rj
        m = consts["link_mass"][j]
        c_l = sp.Matrix(consts["link_com"][j])
        I_c = sp.Matrix(consts["link_inertia"][j])
        v_c = v_j + w_j.cross(c_l)
        T = T + (m * (v_c.T * v_c)[0, 0] / 2
                 + (w_j.T * I_c * w_j)[0, 0] / 2)
        V = V + g * m * (o_w + R_wl * c_l)[2]
    for j, qj in enumerate(qs):
        T = T + consts["armature"][j] * qj.diff(t) ** 2 / 2

    # Euler-Lagrange.
    f_z = sp.Matrix([
        (sp.diff(T, zdi).diff(t) - sp.diff(T, zi) + sp.diff(V, zi))
        for zi, zdi in zip(zf, zd)
    ])

    # Coordinate-space mass matrix = Hessian of T in z_dot.
    M_c = sp.Matrix([[sp.diff(sp.diff(T, zd[i]), zd[j])
                      for j in range(9)] for i in range(9)])

    # Quasi-velocity map u = A z_dot: u = [w_b; R^T p_dot; qdot].
    v_b = R_wb.T * p.diff(t)
    u_expr = sp.Matrix.vstack(w_b, v_b,
                              sp.Matrix([q1.diff(t), q2.diff(t),
                                         q3.diff(t)]))
    A = sp.Matrix([[sp.diff(u_expr[i], zd[j]) for j in range(9)]
                   for i in range(9)])
    Adot = A.diff(t)

    # Lambdify on plain symbols (substitute Function -> Symbol).
    zs = sp.symbols("z0:9")
    zds = sp.symbols("zd0:9")
    zdds = sp.symbols("zdd0:9")
    sub = {}
    for i in range(9):
        sub[zdd[i]] = zdds[i]
        sub[zd[i]] = zds[i]
        sub[zf[i]] = zs[i]

    f_fz = sp.lambdify((zs, zds, zdds), f_z.subs(sub), "numpy")
    f_Mc = sp.lambdify((zs,), M_c.subs(sub), "numpy")
    f_A = sp.lambdify((zs,), A.subs(sub), "numpy")
    f_Adot = sp.lambdify((zs, zds), Adot.subs(sub), "numpy")
    return f_fz, f_Mc, f_A, f_Adot


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from quadruped_control_tpu.config import (
        GRAVITY,
        mit_cheetah_physical_config,
    )
    from quadruped_control_tpu.math.rotations import rpy_to_matrix
    from quadruped_control_tpu.sim.dynamics import (
        mass_matrix,
        precompute_leg_kinematics,
        rnea,
    )
    from quadruped_control_tpu.sim.model import mit_cheetah_whole_body_model

    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float64)
    # Zero legs 1..3 -> the full tree reduces to base + RL.
    mask = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float64)
    model = model._replace(
        link_mass=model.link_mass * mask[:, None],
        link_inertia=model.link_inertia * mask[:, None, None, None],
        armature=model.armature * mask[:, None],
    )

    consts = dict(
        trunk_mass=float(model.trunk_mass),
        trunk_inertia=np.asarray(model.trunk_inertia),
        gravity=float(GRAVITY),
        hip=np.asarray(model.joint_offsets[0, 0]),
        l1s=float(model.joint_offsets[0, 1, 1]),
        l2=-float(model.joint_offsets[0, 2, 2]),
        link_mass=[float(m) for m in np.asarray(model.link_mass[0])],
        link_com=[np.asarray(model.link_com[0, j]) for j in range(3)],
        link_inertia=[np.asarray(model.link_inertia[0, j])
                      for j in range(3)],
        armature=[float(a) for a in np.asarray(model.armature[0])],
    )
    print("deriving Euler-Lagrange equations (9 DoF, symbolic)...")
    f_fz, f_Mc, f_A, f_Adot = build_symbolic(consts)

    rng = np.random.default_rng(7)
    worst_f, worst_M = 0.0, 0.0
    for trial in range(5):
        z = rng.uniform(-1.0, 1.0, 9)
        z[1] *= 0.6  # keep pitch away from the rpy singularity
        zdn = rng.uniform(-1.0, 1.0, 9)
        zddn = rng.uniform(-1.0, 1.0, 9)

        A = np.asarray(f_A(tuple(z)), np.float64)
        Adot = np.asarray(f_Adot(tuple(z), tuple(zdn)), np.float64)
        u = A @ zdn
        ud = A @ zddn + Adot @ zdn

        base_R = np.asarray(rpy_to_matrix(jnp.asarray(z[:3])))
        q = jnp.zeros((4, 3), jnp.float64).at[0].set(jnp.asarray(z[6:9]))
        qd = jnp.zeros((4, 3), jnp.float64).at[0].set(
            jnp.asarray(u[6:9]))
        qdd = jnp.zeros((4, 3), jnp.float64).at[0].set(
            jnp.asarray(ud[6:9]))
        kin = precompute_leg_kinematics(model, q)
        tau = np.asarray(rnea(model, kin, jnp.asarray(base_R),
                              jnp.asarray(u[:6]), qd,
                              jnp.asarray(ud[:6]), qdd, gravity=True))
        tau9 = np.concatenate([tau[:6], tau[6:9]])

        f_sym = np.asarray(f_fz(tuple(z), tuple(zdn), tuple(zddn)),
                           np.float64).ravel()
        f_eng = A.T @ tau9
        err_f = np.abs(f_sym - f_eng).max() / (1 + np.abs(f_sym).max())
        worst_f = max(worst_f, err_f)

        M_eng = np.asarray(mass_matrix(model, kin, (), jnp.float64))
        M_eng9 = M_eng[np.ix_(list(range(6)) + [6, 7, 8],
                              list(range(6)) + [6, 7, 8])]
        M_sym = np.asarray(f_Mc(tuple(z)), np.float64)
        M_from_eng = A.T @ M_eng9 @ A
        err_M = (np.abs(M_sym - M_from_eng).max()
                 / (1 + np.abs(M_sym).max()))
        worst_M = max(worst_M, err_M)
        print(f"  trial {trial}: |f_sym - A^T tau_rnea| rel {err_f:.2e}, "
              f"|M_c - A^T M A| rel {err_M:.2e}")

    assert worst_f < 1e-9, worst_f
    assert worst_M < 1e-9, worst_M
    print(f"PASS: Lagrangian == RNEA/CRBA to {max(worst_f, worst_M):.2e} "
          "(f64, 5 random states)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
