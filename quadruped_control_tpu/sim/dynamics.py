"""Batched spatial rigid-body dynamics for the floating 13-body tree.

TPU-native replacement for Drake's articulated-body dynamics (the physics
behind drake_interface_node.cpp:271-273's ``Simulator``): Featherstone
spatial-algebra Recursive Newton-Euler in link coordinates, with the mass
matrix assembled from vmapped unit-acceleration RNEA columns (the classic
inverse-dynamics identity ``M e_i = ID(q, 0, e_i)`` — one traced RNEA body,
18 lanes). Everything is expressed on ``(...,)`` scenario batches; the
four legs are a vectorized axis, the 3-joint chains are unrolled Python
loops (static tree -> static XLA graph).

Generalized coordinates (the floating-base convention):
  u = [omega_b (3, base coords), v_b (3, base-origin velocity, base
  coords), qdot (12, legs in [RL, FL, RR, FR] x [abad, thigh, knee])].

Spatial vectors are ``(omega, v)`` pairs; a coordinate transform from
parent to child is carried as ``(E, r)`` — child axes ``E`` (maps parent
coords to child coords) and child origin ``r`` in parent coords — instead
of materialized 6x6 Plücker matrices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import GRAVITY
from quadruped_control_tpu.sim.model import WholeBodyModel

NU = 18  # 6 base + 12 joint velocities


def _cross(a, b):
    return jnp.cross(a, b)


def _skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _axis_rotation_T(axis, q):
    """E = R(axis, q)^T via Rodrigues — maps parent coords to child coords.

    axis: (..., 3) unit vector; q: (...,) angle.
    """
    a = _skew(axis)
    s = jnp.sin(q)[..., None, None]
    c = jnp.cos(q)[..., None, None]
    eye = jnp.eye(3, dtype=q.dtype)
    return eye - s * a + (1.0 - c) * (a @ a)


class LegKinematics(NamedTuple):
    """Per-joint transforms for all four legs, precomputed from q.

    ``E[j]``: (..., 4, 3, 3) parent->child coordinate rotation of joint j;
    ``r[j]``: (..., 4, 3) joint origin in parent coords. Tuples indexed by
    joint (abad, thigh, knee).
    """

    E: tuple
    r: tuple


def precompute_leg_kinematics(model: WholeBodyModel, q) -> LegKinematics:
    """q: (..., 4, 3) joint angles -> per-joint (E, r)."""
    Es, rs = [], []
    for j in range(3):
        axis = model.joint_axes[:, j, :].astype(q.dtype)
        Es.append(_axis_rotation_T(axis, q[..., :, j]))
        rs.append(
            jnp.broadcast_to(
                model.joint_offsets[:, j, :].astype(q.dtype),
                q.shape[:-2] + (4, 3),
            )
        )
    return LegKinematics(E=tuple(Es), r=tuple(rs))


def _xform_motion(E, r, w, v):
    """(E, r) parent->child on a motion vector (w, v)."""
    w_c = (E @ w[..., None])[..., 0]
    v_c = (E @ (v - _cross(r, w))[..., None])[..., 0]
    return w_c, v_c


def _xform_force_T(E, r, fw, fv):
    """Transpose (child->parent) on a force vector (fw, fv)."""
    fv_p = (jnp.swapaxes(E, -1, -2) @ fv[..., None])[..., 0]
    fw_p = (jnp.swapaxes(E, -1, -2) @ fw[..., None])[..., 0] + _cross(r, fv_p)
    return fw_p, fv_p


def _spatial_inertia_apply(I_c, m, c, w, v):
    """Apply the spatial inertia (about the link-frame origin, COM offset c)
    to a motion vector: returns (h_ang, h_lin)."""
    cxw = _cross(c, w)
    # I_o w = I_c w + m * c x (w x c)  (since (c x)(c x)^T w = c x (w x c))
    h_ang = (I_c @ w[..., None])[..., 0] + m[..., None] * _cross(
        c, _cross(w, c)
    ) + m[..., None] * _cross(c, v)
    h_lin = m[..., None] * (v - cxw)
    return h_ang, h_lin


def rnea(model: WholeBodyModel, kin: LegKinematics, base_R, base_v, qdot,
         base_a, qddot, gravity: bool = True):
    """Inverse dynamics: generalized forces for the given motion.

    Args:
      kin: precomputed joint transforms (functions of q only).
      base_R: (..., 3, 3) world-from-base rotation (only used for gravity).
      base_v: (..., 6) base spatial velocity (omega, v) in base coords.
      qdot, qddot: (..., 4, 3).
      base_a: (..., 6) base spatial acceleration in base coords.
      gravity: include gravity (via the a0 = -g offset trick).
    Returns:
      tau: (..., 18) = [base wrench (ang, lin), joint torques (12)], the
      generalized force that would PRODUCE (base_a, qddot) at (base_v, qdot).
    """
    dtype = qdot.dtype
    batch = base_v.shape[:-1]

    w0 = base_v[..., :3]
    v0 = base_v[..., 3:]
    aw0 = base_a[..., :3]
    av0 = base_a[..., 3:]
    if gravity:
        g_base = GRAVITY * jnp.swapaxes(base_R, -1, -2)[..., :, 2]
        av0 = av0 + g_base  # a0 = base_a - g, g = (0,0,-9.81) world

    m_tr = model.trunk_mass.astype(dtype)
    I_tr = model.trunk_inertia.astype(dtype)
    # Trunk spatial momentum/force (COM at base origin: c = 0).
    hw0 = (I_tr @ w0[..., None])[..., 0]
    f0w = (I_tr @ aw0[..., None])[..., 0] + _cross(w0, hw0)
    f0v = m_tr * av0 + _cross(w0, m_tr * v0)

    # Broadcast base motion over the leg axis.
    def leg_bcast(x):
        return jnp.broadcast_to(x[..., None, :], batch + (4, 3))

    w_p, v_p = leg_bcast(w0), leg_bcast(v0)
    aw_p, av_p = leg_bcast(aw0), leg_bcast(av0)

    vs, as_, fs = [], [], []
    for j in range(3):
        E, r = kin.E[j], kin.r[j]
        axis = model.joint_axes[:, j, :].astype(dtype)
        qd = qdot[..., :, j, None]
        qdd = qddot[..., :, j, None]

        w_j, v_j = _xform_motion(E, r, w_p, v_p)
        aw_j, av_j = _xform_motion(E, r, aw_p, av_p)
        # Joint contribution: vJ = S qd (angular only), plus velocity
        # product v_j x vJ.
        wJ = axis * qd
        w_new = w_j + wJ
        aw_j = aw_j + axis * qdd + _cross(w_new, wJ)
        av_j = av_j + _cross(v_j, wJ)
        w_j = w_new

        m = model.link_mass[:, j].astype(dtype)
        c = model.link_com[:, j, :].astype(dtype)
        I_c = model.link_inertia[:, j].astype(dtype)

        hw, hv = _spatial_inertia_apply(I_c, m, c, w_j, v_j)
        fw_a, fv_a = _spatial_inertia_apply(I_c, m, c, aw_j, av_j)
        fw = fw_a + _cross(w_j, hw) + _cross(v_j, hv)
        fv = fv_a + _cross(w_j, hv)

        vs.append((w_j, v_j))
        as_.append((aw_j, av_j))
        fs.append((fw, fv))
        w_p, v_p = w_j, v_j
        aw_p, av_p = aw_j, av_j

    # Backward pass.
    tau_joints = []
    fw_child = jnp.zeros(batch + (4, 3), dtype)
    fv_child = jnp.zeros(batch + (4, 3), dtype)
    for j in (2, 1, 0):
        fw = fs[j][0] + fw_child
        fv = fs[j][1] + fv_child
        axis = model.joint_axes[:, j, :].astype(dtype)
        tau_j = jnp.sum(axis * fw, axis=-1)
        tau_j = tau_j + model.armature[:, j].astype(dtype) * qddot[..., :, j]
        tau_joints.append(tau_j)
        fw_child, fv_child = _xform_force_T(kin.E[j], kin.r[j], fw, fv)

    tau_joints = jnp.stack(tau_joints[::-1], axis=-1)  # (..., 4, 3)
    f0w = f0w + jnp.sum(fw_child, axis=-2)
    f0v = f0v + jnp.sum(fv_child, axis=-2)

    return jnp.concatenate(
        [f0w, f0v, tau_joints.reshape(batch + (12,))], axis=-1
    )


def rnea_bias(model: WholeBodyModel, kin: LegKinematics, base_R, base_v,
              qdot):
    """Bias force h(q, u): Coriolis/centrifugal + gravity (zero accel)."""
    zeros6 = jnp.zeros_like(base_v)
    zeros_q = jnp.zeros_like(qdot)
    return rnea(model, kin, base_R, base_v, qdot, zeros6, zeros_q,
                gravity=True)


def mass_matrix(model: WholeBodyModel, kin: LegKinematics, batch_shape,
                dtype):
    """M(q): (..., 18, 18) via vmapped unit-acceleration RNEA columns."""
    zeros6 = jnp.zeros(batch_shape + (6,), dtype)
    zeros_q = jnp.zeros(batch_shape + (4, 3), dtype)
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))

    def column(e):
        return rnea(model, kin, eyeR, zeros6, zeros_q, e[:6],
                    e[6:].reshape((4, 3)), gravity=False)

    cols = jax.vmap(column)(jnp.eye(NU, dtype=dtype))  # (18, ..., 18)
    M = jnp.moveaxis(cols, 0, -1)  # columns -> last axis
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def total_mass(model: WholeBodyModel):
    return model.trunk_mass + jnp.sum(model.link_mass)


def leg_mass_matrices(model: WholeBodyModel, q):
    """Per-leg (..., 4, 3, 3) joint-space mass matrices with the base held
    fixed — the D blocks of the floating-tree mass matrix: the inertia a
    swing leg's joint PD actually drives.

    Twelve unit-acceleration RNEA columns restricted to one leg's joints
    each (legs are decoupled given a fixed base, so each column only
    needs its own leg's 3 joint rows). Feeds the commander's
    ``swing_accel_ff`` inertia feedforward: tau_ff = D(q) qddot_ref — the
    model-based instrument for the measured swing-lag ratchet (the
    reference tracks its 0.15 s sextic open-loop-lagged by 3-8 cm with PD
    alone; its own acceleration-reference code is commented out,
    trajectory.cpp:246-251).
    """
    kin = precompute_leg_kinematics(model, q)
    batch = q.shape[:-2]
    dtype = q.dtype
    zeros6 = jnp.zeros(batch + (6,), dtype)
    zeros_q = jnp.zeros(batch + (4, 3), dtype)
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))

    def column(e):
        tau = rnea(model, kin, eyeR, zeros6, zeros_q, zeros6,
                   jnp.broadcast_to(e, batch + (4, 3)), gravity=False)
        return tau[..., 6:].reshape(batch + (4, 3))

    basis = jnp.eye(3, dtype=dtype)  # joint-axis unit accelerations
    # One column per joint axis, same axis on all 4 legs at once (legs are
    # independent blocks, so cross-leg terms are exactly zero).
    cols = jax.vmap(
        lambda e: column(jnp.broadcast_to(e, (4, 3))))(basis)
    # cols: (3, ..., 4, 3) = tau rows for unit qddot on axis j of each leg
    D = jnp.moveaxis(cols, 0, -1)  # (..., 4, 3row, 3col)
    return 0.5 * (D + jnp.swapaxes(D, -1, -2))


def leg_gravity_torques(model: WholeBodyModel, q, base_R):
    """Per-joint gravity torques of the legs alone: the joint rows of the
    bias at zero velocity, tau_g = dV_legs/dq.

    Used by the commander's optional gravity compensation: the reference's
    tau = J^T f realizes the commanded GRF only for massless legs — with
    real link masses each foot force carries a ~2-3 N systematic bias (the
    leg's own weight), and the swing PD droops under it.
    """
    kin = precompute_leg_kinematics(model, q)
    batch = q.shape[:-2]
    dtype = q.dtype
    zeros6 = jnp.zeros(batch + (6,), dtype)
    zeros_q = jnp.zeros_like(q)
    tau = rnea(model, kin, base_R, zeros6, zeros_q, zeros6, zeros_q,
               gravity=True)
    return tau[..., 6:].reshape(batch + (4, 3))


def _inv3(m):
    """Closed-form (..., 3, 3) inverse via the adjugate."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([C, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


class MassFactor(NamedTuple):
    """Prefactored mass matrix (tree-sparsity Schur form), reusable across
    substeps within a control tick."""

    Dinv: jnp.ndarray  # (..., 4, 3, 3) per-leg joint-block inverses
    Bl: jnp.ndarray  # (..., 4, 6, 3) base-leg coupling
    BDinv: jnp.ndarray  # (..., 4, 6, 3)
    Sinv: jnp.ndarray  # (..., 6, 6) inverse base Schur complement


def prefactor_mass_matrix(M) -> MassFactor:
    """Factor M exploiting the floating-tree sparsity.

    The four leg chains couple only through the base, so
    ``M = [[A (6x6), B (6x12)], [B^T, D]]`` with D block-diagonal in
    4 per-leg 3x3 blocks — the same branch-induced sparsity Featherstone's
    ABA exploits. A Schur complement on the base block reduces a solve to
    4 closed-form 3x3 inverses plus one 6x6 inverse (~5x fewer flops than
    an 18x18 Cholesky, all batched VPU-friendly small ops on TPU).
    """
    batch = M.shape[:-2]
    A = M[..., :6, :6]
    B = M[..., :6, 6:]
    Db = jnp.stack(
        [M[..., 6 + 3 * l:9 + 3 * l, 6 + 3 * l:9 + 3 * l] for l in range(4)],
        axis=-3,
    )
    Dinv = _inv3(Db)  # (..., 4, 3, 3)
    Bl = B.reshape(batch + (6, 4, 3))
    Bl = jnp.moveaxis(Bl, -2, -3)  # (..., 4, 6, 3)
    BDinv = Bl @ Dinv
    S = A - jnp.einsum("...lij,...lkj->...ik", BDinv, Bl)
    Sinv = jnp.linalg.inv(S)
    return MassFactor(Dinv=Dinv, Bl=Bl, BDinv=BDinv, Sinv=Sinv)


def solve_prefactored(f: MassFactor, rhs):
    """Solve M u = rhs with a :func:`prefactor_mass_matrix` factor."""
    batch = rhs.shape[:-1]
    r_b = rhs[..., :6]
    r_q = rhs[..., 6:].reshape(batch + (4, 3))
    rhs_b = r_b - jnp.einsum("...lij,...lj->...i", f.BDinv, r_q)
    u_b = (f.Sinv @ rhs_b[..., None])[..., 0]
    u_q = (f.Dinv @ (r_q - jnp.einsum(
        "...lji,...j->...li", f.Bl, u_b))[..., None])[..., 0]
    return jnp.concatenate([u_b, u_q.reshape(batch + (12,))], axis=-1)


def solve_mass_matrix(M, rhs):
    """One-shot tree-sparsity solve (factor + solve)."""
    return solve_prefactored(prefactor_mass_matrix(M), rhs)


def body_coms_world(model: WholeBodyModel, q, base_R, base_x):
    """World positions of all 13 body COMs.

    Returns:
      trunk_com: (..., 3); link_coms: (..., 4, 3, 3) [leg, joint, xyz].
    """
    dtype = q.dtype
    batch = q.shape[:-2]
    B = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (4, 3, 3))
    p = jnp.zeros(batch + (4, 3), dtype)
    coms = []
    for j in range(3):
        axis = model.joint_axes[:, j, :].astype(dtype)
        # Link frame expressed in base coords: rotate by R(axis, q).
        Rj = jnp.swapaxes(_axis_rotation_T(axis, q[..., :, j]), -1, -2)
        r = model.joint_offsets[:, j, :].astype(dtype)
        p = p + (B @ r[..., None])[..., 0]
        B = B @ Rj
        c = model.link_com[:, j, :].astype(dtype)
        coms.append(p + (B @ c[..., None])[..., 0])
    link_coms_body = jnp.stack(coms, axis=-2)  # (..., 4, 3, 3)
    link_coms_world = (
        jnp.einsum("...ij,...lkj->...lki", base_R, link_coms_body)
        + base_x[..., None, None, :]
    )
    return base_x, link_coms_world
