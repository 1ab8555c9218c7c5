#!/usr/bin/env python
"""Symbolic derivation of the leg kinematics (the reference's sympy
notebook, scripts/kinematics/quadruped_kinematics.ipynb, as a checked-in
executable script).

Derives per-leg FK from the joint chain

    T = Trans(hip) . Rx(q1) . Trans(0, l1s, 0)
                   . Ry(q2) . Trans(0, 0, l2s)
                   . Ry(q3) . Trans(0, 0, l3s)

(hip-roll about x, thigh/calf pitch about y; l1s is the signed abduction
link, l2s = -l2 / l3s = -l3 point down at q = 0 — kinematics.cpp:23-42),
plus the geometric Jacobian d(foot)/dq, and PROVES symbolically that both
equal the closed forms shipped in ops/kinematics.py. Also evaluates the
reference's notebook test point q = (0.63, 1.04, -1.60) (the commented
expected values in kinematics.cpp:49-64) and cross-checks the JAX ops
numerically for all four legs.

Run: PYTHONPATH="$PYTHONPATH:." python scripts/derive_kinematics.py
"""

import sys

import numpy as np
import sympy as sp


def rx(a):
    return sp.Matrix([[1, 0, 0],
                      [0, sp.cos(a), -sp.sin(a)],
                      [0, sp.sin(a), sp.cos(a)]])


def ry(a):
    return sp.Matrix([[sp.cos(a), 0, sp.sin(a)],
                      [0, 1, 0],
                      [-sp.sin(a), 0, sp.cos(a)]])


def main():
    q1, q2, q3 = sp.symbols("q1 q2 q3", real=True)
    l1s, l2s, l3s = sp.symbols("l1s l2s l3s", real=True)
    hx, hy, hz = sp.symbols("hx hy hz", real=True)

    # Forward chain.
    foot = (sp.Matrix([hx, hy, hz])
            + rx(q1) * (sp.Matrix([0, l1s, 0])
                        + ry(q2) * (sp.Matrix([0, 0, l2s])
                                    + ry(q3) * sp.Matrix([0, 0, l3s]))))
    foot = sp.simplify(foot)

    # The closed form shipped in ops/kinematics.forward_kinematics.
    s1, c1 = sp.sin(q1), sp.cos(q1)
    s2, c2 = sp.sin(q2), sp.cos(q2)
    s23, c23 = sp.sin(q2 + q3), sp.cos(q2 + q3)
    shipped = sp.Matrix([
        l2s * s2 + l3s * s23 + hx,
        l1s * c1 - l2s * s1 * c2 - l3s * s1 * c23 + hy,
        l1s * s1 + l2s * c1 * c2 + l3s * c1 * c23 + hz,
    ])
    dfk = sp.simplify(foot - shipped)
    assert dfk == sp.zeros(3, 1), f"FK mismatch: {dfk}"
    print("FK: chain == ops/kinematics closed form (symbolic)")

    # Jacobian.
    J = sp.simplify(foot.jacobian(sp.Matrix([q1, q2, q3])))
    shipped_J = sp.Matrix([
        [0, l2s * c2 + l3s * c23, l3s * c23],
        [-l1s * s1 - l2s * c1 * c2 - l3s * c1 * c23,
         (l2s * s2 + l3s * s23) * s1, l3s * s23 * s1],
        [l1s * c1 - l2s * s1 * c2 - l3s * s1 * c23,
         -(l2s * s2 + l3s * s23) * c1, -l3s * s23 * c1],
    ])
    dJ = sp.simplify(J - shipped_J)
    assert dJ == sp.zeros(3, 3), f"Jacobian mismatch: {dJ}"
    print("Jacobian: d(foot)/dq == ops/kinematics closed form (symbolic)")

    # IK branch identity: substituting the shipped IK back into FK must
    # return the target — check numerically on random reachable targets.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from quadruped_control_tpu.config import KinematicsConfig
    from quadruped_control_tpu.ops.kinematics import (
        forward_kinematics,
        inverse_kinematics,
        leg_jacobian,
    )

    cfg = KinematicsConfig()
    # Reference notebook evaluation point (kinematics.cpp:49-64).
    q_ref = jnp.broadcast_to(jnp.array([0.63, 1.04, -1.60]), (1, 4, 3))
    fk = np.asarray(forward_kinematics(q_ref, cfg))[0]
    print(f"FK at notebook point q=(0.63, 1.04, -1.60):\n{fk}")

    # Numeric cross-check of the symbolic chain vs the JAX op, all legs.
    hips = cfg.hip_offsets_np()
    left = np.array([1.0, 1.0, -1.0, -1.0])
    subs_common = {q1: 0.63, q2: 1.04, q3: -1.60}
    for leg in range(4):
        subs = dict(subs_common)
        subs.update({l1s: left[leg] * cfg.l1, l2s: -cfg.l2, l3s: -cfg.l3,
                     hx: hips[leg, 0], hy: hips[leg, 1], hz: hips[leg, 2]})
        sym = np.array([float(foot[i].evalf(subs=subs)) for i in range(3)])
        assert np.allclose(sym, fk[leg], atol=1e-12), (leg, sym, fk[leg])
    print("numeric: symbolic chain == forward_kinematics on all 4 legs")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform([-0.5, 0.3, -2.2], [0.5, 1.5, -0.8],
                                (256, 4, 3)))
    p = forward_kinematics(q, cfg)
    q_rt = inverse_kinematics(p, cfg)
    p_rt = forward_kinematics(q_rt, cfg)
    err = float(jnp.abs(p_rt - p).max())
    assert err < 1e-9, err
    print(f"IK: FK(IK(FK(q))) == FK(q) on 256 random postures "
          f"(max err {err:.2e})")

    # Jacobian vs finite differences of the op (sanity on the JAX side).
    J_op = np.asarray(leg_jacobian(q[:8], cfg))
    eps = 1e-7

    def fd(qb):
        out = np.zeros((qb.shape[0], 4, 3, 3))
        for j in range(3):
            dq = np.zeros_like(np.asarray(qb))
            dq[..., j] = eps
            out[..., j] = np.asarray(
                (forward_kinematics(qb + dq, cfg)
                 - forward_kinematics(qb - dq, cfg)) / (2 * eps))
        return out

    assert np.allclose(J_op, fd(q[:8]), atol=1e-6)
    print("Jacobian op == finite differences")
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
