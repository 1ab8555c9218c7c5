"""Fused Pallas kernel: N physics substeps of the whole-body plant.

The XLA whole-body substep is ~250 tiny batched ops (3-vector cross
products, 3x3 matvecs) — op-latency-bound on TPU (~0.4 ms/substep at batch
1024, regardless of batch). This kernel runs the ENTIRE substep loop —
RNEA bias, contact (compliant normal + anchor stiction), prefactored
tree solve, semi-implicit integration, Rodrigues pose update — as one
``pallas_call``: every scalar of the algorithm is a ``(rows, 128)`` lane
vector over instances, the 13-body model is unrolled with its parameters
baked in as compile-time constants, and zero-valued parameter terms are
folded away symbolically at trace time (``None`` = exact zero).

The mass-matrix factor is computed ONCE per control tick in XLA (exactly
like ``whole_body_step(m_update="tick")``) and passed in; the kernel
holds it across substeps.

Layout (same convention as solver/pallas_fused.py): ``(B, k)`` component
arrays pack to ``(nb, k, rows, 128)`` tiles; grid over nb.

Validated against the XLA path in tests/test_pallas_substep.py
(interpret mode in f64, real kernel in f32 on device).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from quadruped_control_tpu.config import GRAVITY, ControlConfig
from quadruped_control_tpu.sim.dynamics import (
    mass_matrix,
    precompute_leg_kinematics,
    prefactor_mass_matrix,
)
from quadruped_control_tpu.sim.model import WholeBodyModel
from quadruped_control_tpu.sim.plant import ContactConfig, WholeBodyState

from quadruped_control_tpu.math.symlane import (
    _conc,
    _add,
    _const_cross,
    _cross,
    _cst,
    _inv3_sym,
    _m3add,
    _m3c,
    _m3mul,
    _m3smul,
    _m3sub,
    _m3T,
    _matTvec,
    _matvec,
    _mul,
    _neg,
    _neg3,
    _skewm,
    _smul,
    _vadd,
    _vsmul,
)

LANE = 128

# Input component layout (k axis), all (B,):
#   0:9    R row-major       9:12   x          12:30  u (w_b, v_b, qdot)
#   30:42  q                 42:58  anchor (8 x 2)    58:70  tau
# and, with prefactor="xla" only (prefactor="kernel" computes these
# in-kernel from q via CRBA, see _build_factor_sym):
#   70:106 Dinv (4 x 3x3)    106:178 Bl (4 x 6x3)
#   178:250 BDinv (4 x 6x3)  250:286 Sinv (6x6)
N_COMP = 286
N_COMP_LEAN = 70
N_STATE = 58


# Spatial inertia about a frame origin as (m: float, h: sym 3-tuple,
# J: sym 3x3) with h = m*com, J = I_com - m*skew(c)skew(c).

def _inertia_add(a, b):
    return (a[0] + b[0], _vadd(a[1], b[1]), _m3add(a[2], b[2]))


def _xform_inertia(E, r, inertia):
    """Express (m, h, J) of a child frame in the parent frame, where the
    child axes are E (parent->child map) and the child origin sits at the
    constant float3 ``r`` in parent coords (Featherstone X^T I X)."""
    m, h, J = inertia
    Et = _m3T(E)
    h_r = tuple(
        _add(_mul(Et[i][0], h[0]), _mul(Et[i][1], h[1]),
             _mul(Et[i][2], h[2]))
        for i in range(3)
    )
    J_r = _m3mul(_m3mul(Et, J), E)
    r_sym = tuple(_cst(x) for x in r)
    h_p = _vadd(h_r, _vsmul(m, r_sym))
    rhat = _skewm(r_sym)
    hhat = _skewm(h_r)
    corr = _m3add(
        _m3smul(m, _m3mul(rhat, rhat)),
        _m3add(_m3mul(rhat, hhat), _m3mul(hhat, rhat)),
    )
    return (m, h_p, _m3sub(J_r, corr))


def _pack(a, rows):
    B, k = a.shape
    nb = B // (rows * LANE)
    return a.reshape(nb, rows, LANE, k).transpose(0, 3, 1, 2)


def _unpack(a):
    nb, k, rows, lane = a.shape
    return a.transpose(0, 2, 3, 1).reshape(nb * rows * lane, k)


def make_pallas_stepper(model: WholeBodyModel, cfg: ControlConfig,
                        contact: ContactConfig = ContactConfig(),
                        rows: int = 8, interpret: bool = False,
                        prefactor: str = "kernel",
                        torque_input: str = "tau",
                        gravity_comp: bool = False):
    """Build a jittable fused plant stepper.

    Model/geometry/contact parameters are snapshot to Python floats HERE
    (call outside jit) and baked into the kernel as constants. ``dt`` and
    ``n_substeps`` are static.

    ``prefactor`` selects where the once-per-tick mass-matrix
    factorization happens:
      - ``"kernel"`` (default, fast path): composite-rigid-body (CRBA)
        assembly of the tree-sparse blocks + Schur prefactorization run
        INSIDE the kernel from q — the whole tick becomes one kernel and
        the XLA side only packs state. Equals the XLA factor in exact
        arithmetic; differs by roundoff (Cholesky-based 6x6 inverse vs
        jnp.linalg.inv's LU, and CRBA's summation order vs unit-accel
        RNEA columns).
      - ``"xla"``: factor computed by sim.dynamics.prefactor_mass_matrix
        in XLA and streamed in — bitwise-matches whole_body_step
        (m_update="tick"); used by the exact-parity tests.

    ``torque_input`` selects the commanded-torque interface:
      - ``"tau"``: ``stepper(state, tau, dt, n_substeps)`` — joint torques
        computed outside (the original interface).
      - ``"qp"``: ``stepper(state, f_world, tau_swing, stance, dt,
        n_substeps)`` — the commander's torque-mapping stage (world GRFs ->
        f_b = -R^T f_w -> tau = J^T f_b, merged with the swing PD torques
        by the stance mask, optional leg gravity compensation, clamped to
        the config torque limits) runs as the kernel prologue, eliminating
        the XLA glue between the QP solve and the plant. Also exposes
        ``stepper.packed(state_p, fw_p, tausw_p, st_p, dt, n_substeps)``
        operating directly on (nb, k, rows, 128) tiles for the fused tick
        loop (sim/pallas_tick.py); packed mode requires
        ``prefactor="kernel"``.

    ``gravity_comp`` (``"qp"`` mode only): add the in-kernel equivalent of
    ``sim.dynamics.leg_gravity_torques`` before clamping (the commander's
    ``gravity_comp_tau`` option).
    """
    if prefactor not in ("kernel", "xla"):
        raise ValueError(f"prefactor must be 'kernel'|'xla': {prefactor}")
    if torque_input not in ("tau", "qp"):
        raise ValueError(f"torque_input must be 'tau'|'qp': {torque_input}")
    if gravity_comp and torque_input != "qp":
        raise ValueError("gravity_comp requires torque_input='qp'")
    # In "qp" mode the tau block (comps 58:70) is dropped; the xla-mode
    # factor blocks start right after the state.
    fac_off = 70 if torque_input == "tau" else 58
    tau_min = float(cfg.balance.torque_min)
    tau_max = float(cfg.balance.torque_max)
    mdl = jax.tree.map(np.asarray, model)
    kin = cfg.kinematics
    hips = kin.hip_offsets_np()
    l1s = kin.l1_signed_np()
    sl2, sl3 = -float(kin.l2), -float(kin.l3)

    trunk_m = float(mdl.trunk_mass)
    trunk_I = np.diag(np.asarray(mdl.trunk_inertia)).tolist()
    assert np.allclose(
        np.asarray(mdl.trunk_inertia),
        np.diag(np.diag(np.asarray(mdl.trunk_inertia)))), (
        "pallas stepper assumes a diagonal trunk inertia")
    link_m = np.asarray(mdl.link_mass)
    link_c = np.asarray(mdl.link_com)
    link_I = np.asarray(mdl.link_inertia)
    for leg in range(4):
        for j in range(3):
            assert np.allclose(
                link_I[leg, j], np.diag(np.diag(link_I[leg, j]))
            ), "pallas stepper assumes diagonal link inertias"
    damp = np.asarray(mdl.joint_damping)
    armature = np.asarray(mdl.armature)
    axes = np.asarray(mdl.joint_axes)
    for leg in range(4):
        assert np.allclose(axes[leg, 0], [1, 0, 0])
        assert np.allclose(axes[leg, 1], [0, 1, 0])
        assert np.allclose(axes[leg, 2], [0, 1, 0])
    joint_r = np.asarray(mdl.joint_offsets)

    k_n = float(contact.stiffness)
    d_n = float(contact.dissipation)
    mu = float(contact.mu)
    kt = float(contact.tangent_stiffness)
    ct = float(contact.tangent_damping)
    v_s = float(contact.stiction_velocity)
    use_anchor = contact.tangential == "anchor"
    trunk_cz = float(contact.trunk_contact_z)

    def rot_apply(jtype, s, c, v, transpose=False):
        """E v with E = R_axis(q)^T (parent coords -> child coords);
        transpose applies E^T = R_axis(q). jtype 0 = Rx, 1 = Ry."""
        sn = s if transpose else _neg(s)
        if jtype == 0:
            # [[1,0,0],[0,c,sn... ]] with E = Rx(q)^T:
            # E = [[1,0,0],[0,c,s],[0,-s,c]] -> forward uses s, -s rows:
            return (
                v[0],
                _add(_mul(c, v[1]), _neg(_mul(sn, v[2]))),
                _add(_mul(sn, v[1]), _mul(c, v[2])),
            )
        # E = Ry(q)^T = [[c,0,-s],[0,1,0],[s,0,c]]
        return (
            _add(_mul(c, v[0]), _mul(sn, v[2])),
            v[1],
            _add(_neg(_mul(sn, v[0])), _mul(c, v[2])),
        )

    # Leaf spatial inertias about the link-frame origin, as constants:
    # h = m*c, J_origin = I_com - m*skew(c)skew(c) (diagonal I_com asserted
    # above; c along a single axis keeps J_origin diagonal, but the builder
    # handles the general case).
    leaf_inertia = []
    for leg in range(4):
        row = []
        for j in range(3):
            m = float(link_m[leg, j])
            c = np.asarray(link_c[leg, j], dtype=np.float64)
            J_o = np.asarray(link_I[leg, j], dtype=np.float64) + m * (
                float(c @ c) * np.eye(3) - np.outer(c, c)
            )
            row.append((m, tuple(_cst(x) for x in c * m), _m3c(J_o)))
        leaf_inertia.append(row)
    trunk_inertia_sym = (trunk_m, (None, None, None),
                         _m3c(np.diag(np.asarray(trunk_I))))

    def joint_E(jtype, s, c):
        """Symbolic parent->child rotation of rot_apply, as a matrix."""
        if jtype == 0:  # Rx(q)^T
            return [[1.0, None, None], [None, c, s], [None, _neg(s), c]]
        return [[c, None, _neg(s)], [None, 1.0, None], [s, None, c]]

    def xform_force_up(E, r, fw, fv):
        """Child->parent force transform with constant float3 r."""
        Et = _m3T(E)
        fv_p = tuple(
            _add(_mul(Et[i][0], fv[0]), _mul(Et[i][1], fv[1]),
                 _mul(Et[i][2], fv[2]))
            for i in range(3)
        )
        fw_p = _vadd(
            tuple(
                _add(_mul(Et[i][0], fw[0]), _mul(Et[i][1], fw[1]),
                     _mul(Et[i][2], fw[2]))
                for i in range(3)
            ),
            _const_cross(r, fv_p),
        )
        return fw_p, fv_p

    def build_factor_sym(sin, cos, zero, debug=False):
        """CRBA + tree-sparsity Schur prefactor, fully symbolic.

        From the tick-start sin/cos of q, produce the blocks the substep
        solve consumes: per-leg Dinv (3x3), Bl (6x3), BDinv (6x3) and the
        inverse base Schur complement Sinv (6x6). Mirrors
        sim/dynamics.{mass_matrix, prefactor_mass_matrix} (CRBA instead of
        unit-accel RNEA columns — identical in exact arithmetic)."""
        A_inertia = trunk_inertia_sym
        Bl_s = [[[None] * 3 for _ in range(6)] for _ in range(4)]
        D_s = [[[None] * 3 for _ in range(3)] for _ in range(4)]
        for leg in range(4):
            Es, rs = [], []
            for j in range(3):
                jtype = 0 if j == 0 else 1
                qi = leg * 3 + j
                Es.append(joint_E(jtype, sin[qi], cos[qi]))
                rs.append(tuple(float(joint_r[leg, j, i])
                                for i in range(3)))
            # Composite inertias up the chain (frame j).
            Ic = [None, None, leaf_inertia[leg][2]]
            Ic[1] = _inertia_add(leaf_inertia[leg][1],
                                 _xform_inertia(Es[2], rs[2], Ic[2]))
            Ic[0] = _inertia_add(leaf_inertia[leg][0],
                                 _xform_inertia(Es[1], rs[1], Ic[1]))
            A_inertia = _inertia_add(
                A_inertia, _xform_inertia(Es[0], rs[0], Ic[0])
            )
            # F_j = I^c_j S_j propagated toward the base: D and Bl entries.
            for j in range(3):
                ax = 0 if j == 0 else 1  # abad: x, thigh/knee: y
                _, h_c, J_c = Ic[j]
                fw = tuple(J_c[r][ax] for r in range(3))
                fv = ((None, _neg(h_c[2]), h_c[1]) if ax == 0
                      else (h_c[2], None, _neg(h_c[0])))
                D_s[leg][j][j] = _add(fw[ax], _cst(armature[leg, j]))
                for i in range(j - 1, -1, -1):
                    fw, fv = xform_force_up(Es[i + 1], rs[i + 1], fw, fv)
                    ai = 0 if i == 0 else 1
                    D_s[leg][i][j] = fw[ai]
                    D_s[leg][j][i] = fw[ai]
                fw, fv = xform_force_up(Es[0], rs[0], fw, fv)
                for r in range(3):
                    Bl_s[leg][r][j] = fw[r]
                    Bl_s[leg][3 + r][j] = fv[r]

        m_tot, h_tot, J_tot = A_inertia
        hhat = _skewm(h_tot)
        A = [[None] * 6 for _ in range(6)]
        for i in range(3):
            for j in range(3):
                A[i][j] = J_tot[i][j]
                A[i][3 + j] = hhat[i][j]
                A[3 + i][j] = hhat[j][i]
        for i in range(3):
            A[3 + i][3 + i] = m_tot

        Dinv_s = [_inv3_sym(D_s[leg]) for leg in range(4)]
        BDinv_s = [
            [
                [
                    _add(*[_mul(Bl_s[leg][r][t], Dinv_s[leg][t][c])
                           for t in range(3)])
                    for c in range(3)
                ]
                for r in range(6)
            ]
            for leg in range(4)
        ]
        # S = A - sum_leg BDinv_leg @ Bl_leg^T, materialized to lanes.
        S = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                acc = A[i][j]
                for leg in range(4):
                    for t in range(3):
                        acc = _add(acc, _neg(_mul(BDinv_s[leg][i][t],
                                                  Bl_s[leg][j][t])))
                if acc is None:
                    acc = zero
                elif isinstance(acc, float):
                    acc = zero + acc
                S[i][j] = acc
                S[j][i] = acc
        # Unrolled Cholesky S = L L^T, then Sinv = L^-T L^-1 (S is SPD:
        # it is the base block of M after eliminating the leg blocks).
        L = [[None] * 6 for _ in range(6)]
        for j in range(6):
            d = S[j][j]
            for k in range(j):
                d = d - L[j][k] * L[j][k]
            Ljj = jnp.sqrt(d)
            inv_Ljj = 1.0 / Ljj
            L[j][j] = Ljj
            for i in range(j + 1, 6):
                v = S[i][j]
                for k in range(j):
                    v = v - L[i][k] * L[j][k]
                L[i][j] = v * inv_Ljj
        Y = [[None] * 6 for _ in range(6)]  # Y = L^-1 (lower)
        for j in range(6):
            Y[j][j] = 1.0 / L[j][j]
        for j in range(6):
            for i in range(j + 1, 6):
                acc = None
                for k in range(j, i):
                    acc = _add(acc, _mul(L[i][k], Y[k][j]))
                Y[i][j] = _neg(_mul(acc, Y[i][i]))
        Sinv_s = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                acc = None
                for k in range(j, 6):
                    acc = _add(acc, _mul(Y[k][i], Y[k][j]))
                Sinv_s[i][j] = acc
                Sinv_s[j][i] = acc
        if debug:
            return Dinv_s, Bl_s, BDinv_s, Sinv_s, A, S
        return Dinv_s, Bl_s, BDinv_s, Sinv_s

    def spatial_inertia_apply(Ic, m, cvec, w, v):
        """(ang, lin) of [[Ic + m cx cx^T, m cx],[m cx^T, m]] (w, v) with
        diagonal Ic and constant COM cvec."""
        Icw = tuple(_smul(Ic[i], w[i]) for i in range(3))
        w_x_c = _neg3(_const_cross(cvec, w))  # w x c = -(c x w)
        cxwxc = _const_cross(cvec, w_x_c)
        h_ang = _vadd(
            Icw, _vsmul(m, _vadd(cxwxc, _const_cross(cvec, v)))
        )
        h_lin = _vsmul(m, _vadd(v, _neg3(_const_cross(cvec, w))))
        return h_ang, h_lin

    def rnea_legs(sin, cos, w_b, v_b, qd, g_base):
        """Per-leg RNEA sweep (forward velocities/accelerations, backward
        forces). Velocities may be symbolic Nones — a gravity-only pass
        (w_b = v_b = qd = None) folds to just the rotated gravity chain.
        Returns (bias_q[12], base wrench additions (fw, fv))."""
        bias_q = [None] * 12
        f0w_acc = (None, None, None)
        f0v_acc = (None, None, None)
        for leg in range(4):
            w_p, v_p = w_b, v_b
            aw_p, av_p = (None, None, None), g_base
            chain = []
            for j in range(3):
                jtype = 0 if j == 0 else 1
                qi = leg * 3 + j
                s, c = sin[qi], cos[qi]
                r = tuple(float(joint_r[leg, j, i]) for i in range(3))

                w_j = rot_apply(jtype, s, c, w_p)
                v_j = rot_apply(
                    jtype, s, c,
                    _vadd(v_p, _neg3(_const_cross(r, w_p))))
                aw_t = rot_apply(jtype, s, c, aw_p)
                av_t = rot_apply(
                    jtype, s, c,
                    _vadd(av_p, _neg3(_const_cross(r, aw_p))))

                qdot_i = qd[qi]
                wJ = ((qdot_i, None, None) if jtype == 0
                      else (None, qdot_i, None))
                w_new = _vadd(w_j, wJ)
                aw_j = _vadd(aw_t, _cross(w_new, wJ))
                av_j = _vadd(av_t, _cross(v_j, wJ))

                m = float(link_m[leg, j])
                cvec = tuple(float(link_c[leg, j, i]) for i in range(3))
                Ic = [float(link_I[leg, j, i, i]) for i in range(3)]
                hw, hv = spatial_inertia_apply(Ic, m, cvec, w_new, v_j)
                fw_a, fv_a = spatial_inertia_apply(Ic, m, cvec, aw_j,
                                                   av_j)
                fw = _vadd(fw_a,
                           _vadd(_cross(w_new, hw), _cross(v_j, hv)))
                fv = _vadd(fv_a, _cross(w_new, hv))
                chain.append((jtype, s, c, r, fw, fv))
                w_p, v_p = w_new, v_j
                aw_p, av_p = aw_j, av_j

            fw_c = (None, None, None)
            fv_c = (None, None, None)
            for j in (2, 1, 0):
                jtype, s, c, r, fw_j, fv_j = chain[j]
                fw_t = _vadd(fw_j, fw_c)
                fv_t = _vadd(fv_j, fv_c)
                bias_q[leg * 3 + j] = fw_t[0] if jtype == 0 else fw_t[1]
                EtFv = rot_apply(jtype, s, c, fv_t, transpose=True)
                EtFw = rot_apply(jtype, s, c, fw_t, transpose=True)
                fw_c = _vadd(EtFw, _const_cross(r, EtFv))
                fv_c = EtFv
            f0w_acc = _vadd(f0w_acc, fw_c)
            f0v_acc = _vadd(f0v_acc, fv_c)
        return bias_q, f0w_acc, f0v_acc

    def leg_jacobian_sym(leg, sin, cos):
        """Leg Jacobian at the given joint trig (ops/kinematics.py:99-130);
        shared by the contact section and the torque-map prologue."""
        s1, c1 = sin[leg * 3], cos[leg * 3]
        s2, c2 = sin[leg * 3 + 1], cos[leg * 3 + 1]
        s3, c3 = sin[leg * 3 + 2], cos[leg * 3 + 2]
        s23 = _add(_mul(s2, c3), _mul(c2, s3))
        c23 = _add(_mul(c2, c3), _neg(_mul(s2, s3)))
        L1 = float(l1s[leg])
        zl = _add(_smul(sl2, c2), _smul(sl3, c23))
        xl = _add(_smul(sl2, s2), _smul(sl3, s23))
        j01 = zl
        j02 = _smul(sl3, c23)
        j10 = _add(_smul(-L1, s1), _neg(_mul(c1, zl)))
        j11 = _mul(xl, s1)
        j12 = _mul(_smul(sl3, s23), s1)
        j20 = _add(_smul(L1, c1), _neg(_mul(s1, zl)))
        j21 = _neg(_mul(xl, c1))
        j22 = _neg(_mul(_smul(sl3, s23), c1))
        return ((None, j01, j02), (j10, j11, j12), (j20, j21, j22))

    def torque_map_sym(load_state, load_fw, load_tausw, load_st):
        """Commander steps 9b-10 (control/commander.py): world GRFs ->
        body-frame forces -> tau = J^T f per stance leg, merged with the
        swing PD torques, optional in-kernel leg gravity compensation
        (sim/dynamics.leg_gravity_torques), clamped to the torque limits
        (commander_node.cpp:511-531)."""
        R = [load_state(i) for i in range(9)]
        Rm = (R[0:3], R[3:6], R[6:9])
        q = [load_state(30 + i) for i in range(12)]
        zero = R[0] * 0.0
        sin = [jnp.sin(q[i]) for i in range(12)]
        cos = [jnp.cos(q[i]) for i in range(12)]
        tau_g = None
        if gravity_comp:
            g_base = tuple(_smul(GRAVITY, Rm[2][i]) for i in range(3))
            none3 = (None, None, None)
            tau_g, _, _ = rnea_legs(sin, cos, none3, none3, [None] * 12,
                                    g_base)
        tau = [None] * 12
        for leg in range(4):
            st = load_st(leg)
            f_w = tuple(load_fw(leg * 3 + i) for i in range(3))
            # f_b = -R^T f_w for stance legs (ops/dynamics.
            # forces_to_body_frame, balance_controller.cpp:218-232).
            f_b = _neg3(_matTvec(Rm, f_w))
            Jl = leg_jacobian_sym(leg, sin, cos)
            tau_st = _matTvec(Jl, f_b)
            for j in range(3):
                i = leg * 3 + j
                v = jnp.where(st > 0.5, _conc(tau_st[j], zero),
                              load_tausw(i))
                if tau_g is not None:
                    v = v + _conc(tau_g[i], zero)
                tau[i] = jnp.clip(v, tau_min, tau_max)
        return tau

    def kernel(inp_ref, out_ref, *, n_substeps, h, extra_refs=None):
        def load(i):
            return inp_ref[0, i]

        if torque_input == "qp":
            fw_ref, tausw_ref, st_ref = extra_refs
            tau_in = torque_map_sym(load, lambda i: fw_ref[0, i],
                                    lambda i: tausw_ref[0, i],
                                    lambda i: st_ref[0, i])
        else:
            tau_in = [load(58 + i) for i in range(12)]
        if prefactor == "kernel":
            q0 = [load(30 + i) for i in range(12)]
            zero0 = load(9) * 0.0
            sin0 = [jnp.sin(q0[i]) for i in range(12)]
            cos0 = [jnp.cos(q0[i]) for i in range(12)]
            Dinv, Bl, BDinv, Sinv = build_factor_sym(sin0, cos0, zero0)
        else:
            Dinv = [[[load(fac_off + g * 9 + r * 3 + c) for c in range(3)]
                     for r in range(3)] for g in range(4)]
            Bl = [[[load(fac_off + 36 + g * 18 + r * 3 + c)
                    for c in range(3)] for r in range(6)] for g in range(4)]
            BDinv = [[[load(fac_off + 108 + g * 18 + r * 3 + c)
                       for c in range(3)] for r in range(6)]
                      for g in range(4)]
            Sinv = [[load(fac_off + 180 + r * 6 + c) for c in range(6)]
                    for r in range(6)]

        def body(_, carry):
            R = carry[0:9]
            x = carry[9:12]
            u = carry[12:30]
            q = carry[30:42]
            anchor = carry[42:58]

            Rm = (R[0:3], R[3:6], R[6:9])
            w_b = u[0:3]
            v_b = u[3:6]
            qd = u[6:18]
            zero = x[0] * 0.0

            sin = [jnp.sin(q[i]) for i in range(12)]
            cos = [jnp.cos(q[i]) for i in range(12)]

            # ---- RNEA bias (qdd = 0, base accel = gravity trick) ------
            g_base = tuple(_smul(GRAVITY, Rm[2][i]) for i in range(3))
            hw0 = tuple(_smul(trunk_I[i], w_b[i]) for i in range(3))
            f0w = _cross(w_b, hw0)
            f0v = _vadd(_vsmul(trunk_m, g_base),
                        _cross(w_b, _vsmul(trunk_m, v_b)))
            bias_q, fw_legs, fv_legs = rnea_legs(sin, cos, w_b, v_b, qd,
                                                 g_base)
            f0w = _vadd(f0w, fw_legs)
            f0v = _vadd(f0v, fv_legs)

            # ---- contact ------------------------------------------------
            g_w = (None, None, None)
            g_v = (None, None, None)
            g_q = [None] * 12
            anchor_new = list(anchor)
            for p in range(8):
                leg = p % 4
                if p < 4:
                    s1, c1 = sin[leg * 3], cos[leg * 3]
                    s2, c2 = sin[leg * 3 + 1], cos[leg * 3 + 1]
                    s3, c3 = sin[leg * 3 + 2], cos[leg * 3 + 2]
                    s23 = _add(_mul(s2, c3), _mul(c2, s3))
                    c23 = _add(_mul(c2, c3), _neg(_mul(s2, s3)))
                    L1 = float(l1s[leg])
                    hx, hy, hz = (float(hips[leg, 0]), float(hips[leg, 1]),
                                  float(hips[leg, 2]))
                    zl = _add(_smul(sl2, c2), _smul(sl3, c23))
                    px = _add(_smul(sl2, s2), _smul(sl3, s23), zero + hx)
                    py = _add(_smul(L1, c1), _neg(_mul(s1, zl)), zero + hy)
                    pz = _add(_smul(L1, s1), _mul(c1, zl), zero + hz)
                    pt_b = (px, py, pz)
                    # leg Jacobian (ops/kinematics.py:99-130)
                    j01 = _add(_smul(sl2, c2), _smul(sl3, c23))
                    j02 = _smul(sl3, c23)
                    j10 = _add(_smul(-L1, s1), _neg(_mul(c1, zl)))
                    xl = _add(_smul(sl2, s2), _smul(sl3, s23))
                    j11 = _mul(xl, s1)
                    j12 = _mul(_smul(sl3, s23), s1)
                    j20 = _add(_smul(L1, c1), _neg(_mul(s1, zl)))
                    j21 = _neg(_mul(xl, c1))
                    j22 = _neg(_mul(_smul(sl3, s23), c1))
                    Jl = ((None, j01, j02), (j10, j11, j12),
                          (j20, j21, j22))
                    qd_leg = (qd[leg * 3], qd[leg * 3 + 1],
                              qd[leg * 3 + 2])
                    v_joint = _matvec(Jl, qd_leg)
                else:
                    hx, hy, hz = (float(hips[leg, 0]), float(hips[leg, 1]),
                                  float(hips[leg, 2]) + trunk_cz)
                    pt_b = (zero + hx, zero + hy, zero + hz)
                    Jl = None
                    v_joint = (None, None, None)

                p_w = _vadd(_matvec(Rm, pt_b), x)
                v_pt = _vadd(_vadd(v_b, _cross(w_b, pt_b)), v_joint)
                v_w = _matvec(Rm, v_pt)

                phi = _neg(p_w[2])
                phidot = _neg(v_w[2])
                fn = k_n * phi * (1.0 + d_n * phidot)
                in_contact = phi > 0.0
                fn = jnp.where(in_contact, jnp.maximum(fn, zero), zero)

                ax, ay = anchor[p * 2], anchor[p * 2 + 1]
                if use_anchor:
                    ftx = -kt * (p_w[0] - ax) - ct * v_w[0]
                    fty = -kt * (p_w[1] - ay) - ct * v_w[1]
                    ftn = jnp.sqrt(ftx * ftx + fty * fty + 1e-16)
                    scale = jnp.minimum(zero + 1.0, mu * fn / ftn)
                    ftx = jnp.where(in_contact, scale * ftx, zero)
                    fty = jnp.where(in_contact, scale * fty, zero)
                    anchor_new[p * 2] = jnp.where(
                        in_contact, p_w[0] + (ftx + ct * v_w[0]) / kt,
                        p_w[0])
                    anchor_new[p * 2 + 1] = jnp.where(
                        in_contact, p_w[1] + (fty + ct * v_w[1]) / kt,
                        p_w[1])
                else:
                    speed = jnp.sqrt(v_w[0] * v_w[0] + v_w[1] * v_w[1]
                                     + 1e-16)
                    scale = mu * fn / jnp.maximum(speed, zero + v_s)
                    ftx = -scale * v_w[0]
                    fty = -scale * v_w[1]
                    anchor_new[p * 2] = p_w[0]
                    anchor_new[p * 2 + 1] = p_w[1]

                f_w_pt = (ftx, fty, fn)
                f_b_pt = _matTvec(Rm, f_w_pt)
                g_w = _vadd(g_w, _cross(pt_b, f_b_pt))
                g_v = _vadd(g_v, f_b_pt)
                if p < 4:
                    tq = _matTvec(Jl, f_b_pt)
                    for j in range(3):
                        g_q[leg * 3 + j] = _add(g_q[leg * 3 + j], tq[j])

            # ---- solve (prefactored Schur) + integrate -----------------
            rhs = [None] * 18
            for i in range(3):
                rhs[i] = _add(g_w[i], _neg(f0w[i]))
                rhs[3 + i] = _add(g_v[i], _neg(f0v[i]))
            for i in range(12):
                leg, j = divmod(i, 3)
                rhs[6 + i] = _add(
                    tau_in[i], _neg(_smul(float(damp[leg, j]), qd[i])),
                    g_q[i], _neg(bias_q[i]))

            rb = [rhs[i] for i in range(6)]
            for leg in range(4):
                for r in range(6):
                    acc = rb[r]
                    for c in range(3):
                        acc = _add(acc, _neg(_mul(BDinv[leg][r][c],
                                                  rhs[6 + leg * 3 + c])))
                    rb[r] = acc
            ub = []
            for r in range(6):
                acc = None
                for c in range(6):
                    acc = _add(acc, _mul(Sinv[r][c], rb[c]))
                ub.append(acc)
            uq = [None] * 12
            for leg in range(4):
                t = []
                for c in range(3):
                    acc = rhs[6 + leg * 3 + c]
                    for r in range(6):
                        acc = _add(acc, _neg(_mul(Bl[leg][r][c], ub[r])))
                    t.append(acc)
                for r in range(3):
                    acc = None
                    for c in range(3):
                        acc = _add(acc, _mul(Dinv[leg][r][c], t[c]))
                    uq[leg * 3 + r] = acc
            udot = ub + uq

            u_new = tuple(_add(u[i], _smul(h, udot[i])) for i in range(18))
            # Post-fall poison guard stage 1 (parity with sim/plant.py's
            # substep guard): clamp generalized velocities to the far-
            # beyond-envelope bound BEFORE deriving pose updates, so one
            # explosive contact impulse cannot launch the integrator.
            # Bit-exact no-op on nominal lanes (|u| < 30 in the trot).
            u_new = tuple(jnp.clip(v, -200.0, 200.0) for v in u_new)
            w_new = u_new[0:3]
            v_new = u_new[3:6]
            x_new = _vadd(x, _vsmul(h, _matvec(Rm, v_new)))
            q_new = tuple(_add(q[i], _smul(h, u_new[6 + i]))
                          for i in range(12))

            # R_new = R @ exp(skew(w h)) (Rodrigues; concrete vectors).
            wx = _add(_smul(h, w_new[0]), zero)
            wy = _add(_smul(h, w_new[1]), zero)
            wz = _add(_smul(h, w_new[2]), zero)
            th2 = wx * wx + wy * wy + wz * wz
            th = jnp.sqrt(th2 + 1e-30)
            sinc = jnp.sin(th) / th
            cosc = (1.0 - jnp.cos(th)) / (th2 + 1e-30)
            K = ((zero, -wz, wy), (wz, zero, -wx), (-wy, wx, zero))
            E = [[None] * 3 for _ in range(3)]
            for i in range(3):
                for j in range(3):
                    k2 = zero
                    for m_ in range(3):
                        k2 = k2 + K[i][m_] * K[m_][j]
                    val = sinc * K[i][j] + cosc * k2
                    if i == j:
                        val = val + 1.0
                    E[i][j] = val
            R_new = []
            for i in range(3):
                for j in range(3):
                    acc = zero
                    for m_ in range(3):
                        acc = acc + Rm[i][m_] * E[m_][j]
                    R_new.append(acc)

            # Post-fall poison guard stage 2 (parity with sim/plant.py):
            # if the substep still produced a non-finite value anywhere in
            # the lane's state, FREEZE that lane at its previous state
            # with zeroed velocity — one crashed scenario can never NaN a
            # packed batch. Finiteness via a single |.|-sum (NaN/Inf
            # poison the sum; no bool VECTORS needed beyond the compare,
            # which select_n accepts as a condition — Mosaic rules in
            # CLAUDE.md). Bit-exact no-op on finite lanes.
            _c = lambda v: zero if v is None else v  # noqa: E731
            nf = zero
            for v in (tuple(R_new) + tuple(x_new) + u_new + q_new
                      + tuple(anchor_new)):
                nf = nf + jnp.abs(_c(v))
            ok = nf < 1e30
            R_new = [jnp.where(ok, _c(v), _c(R[i]))
                     for i, v in enumerate(R_new)]
            x_new = tuple(jnp.where(ok, _c(v), _c(x[i]))
                          for i, v in enumerate(x_new))
            u_new = tuple(jnp.where(ok, _c(v), zero) for v in u_new)
            q_new = tuple(jnp.where(ok, _c(v), _c(q[i]))
                          for i, v in enumerate(q_new))
            anchor_new = [jnp.where(ok, _c(v), _c(anchor[i]))
                          for i, v in enumerate(anchor_new)]
            out = (tuple(R_new) + x_new + u_new + q_new
                   + tuple(anchor_new))
            # Mosaic: no Nones in the fori carry — materialize zeros.
            return tuple(zero if v is None else v for v in out)

        init = tuple(load(i) for i in range(N_STATE))
        final = jax.lax.fori_loop(0, n_substeps, body, init)
        for i in range(N_STATE):
            out_ref[0, i] = final[i]

    def _spec(k):
        return pl.BlockSpec((1, k, rows, LANE), lambda i: (i, 0, 0, 0))

    def _kern_entry_qp(inp_ref, fw_ref, tausw_ref, st_ref, out_ref, *,
                       n_substeps, h):
        kernel(inp_ref, out_ref, n_substeps=n_substeps, h=h,
               extra_refs=(fw_ref, tausw_ref, st_ref))

    def _call_packed(packed_inputs, n_comp, dt, n_substeps):
        nb = packed_inputs[0].shape[0]
        dtype = packed_inputs[0].dtype
        if torque_input == "qp":
            kern = partial(_kern_entry_qp, n_substeps=n_substeps,
                           h=float(dt) / n_substeps)
            in_specs = [_spec(n_comp), _spec(12), _spec(12), _spec(4)]
        else:
            kern = partial(kernel, n_substeps=n_substeps,
                           h=float(dt) / n_substeps)
            in_specs = [_spec(n_comp)]
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=_spec(N_STATE),
            out_shape=jax.ShapeDtypeStruct((nb, N_STATE, rows, LANE),
                                           dtype),
            interpret=interpret,
        )(*packed_inputs)

    def _state_comps(state: WholeBodyState, extra, batch, B, dtype):
        """Flatten state (+ mode-dependent extras) to (B, n_comp) columns
        and the separate (B, k) extra columns for qp mode."""
        pieces = [
            state.R.reshape(batch + (9,)),
            state.x,
            state.u,
            state.q.reshape(batch + (12,)),
            state.anchor.reshape(batch + (16,)),
        ]
        if torque_input == "tau":
            pieces.append(extra[0].reshape(batch + (12,)).astype(dtype))
        if prefactor != "kernel":
            kin_j = precompute_leg_kinematics(model, state.q)
            M = mass_matrix(model, kin_j, batch, dtype)
            fac = prefactor_mass_matrix(M)
            pieces += [
                fac.Dinv.reshape(batch + (36,)),
                fac.Bl.reshape(batch + (72,)),
                fac.BDinv.reshape(batch + (72,)),
                fac.Sinv.reshape(batch + (36,)),
            ]
        n_comp = sum(p.shape[-1] for p in pieces)
        comps = jnp.concatenate(pieces, axis=-1).reshape(B, n_comp)
        extras = []
        if torque_input == "qp":
            extras = [
                extra[0].reshape(batch + (12,)).astype(dtype)
                .reshape(B, 12),
                extra[1].reshape(batch + (12,)).astype(dtype)
                .reshape(B, 12),
                extra[2].reshape(batch + (4,)).astype(dtype).reshape(B, 4),
            ]
        return comps, extras, n_comp

    def _pad_comps(comps, n_comp, B, tile, dtype):
        B_pad = ((B + tile - 1) // tile) * tile
        if B_pad == B:
            return comps, B_pad
        pad = jnp.zeros((B_pad - B, n_comp), dtype)
        # Identity R, base high above ground (+ identity factor blocks on
        # the xla path): padding lanes integrate a free-falling robot at
        # q=0 and are dropped.
        pad = pad.at[:, 0].set(1.0).at[:, 4].set(1.0).at[:, 8].set(1.0)
        pad = pad.at[:, 11].set(100.0)
        if prefactor != "kernel":
            for g in range(4):
                for i in range(3):
                    pad = pad.at[:, fac_off + g * 9 + i * 4].set(1.0)
            for i in range(6):
                pad = pad.at[:, fac_off + 180 + i * 7].set(1.0)
        return jnp.concatenate([comps, pad], axis=0), B_pad

    def _run(state: WholeBodyState, extra, dt: float, n_substeps: int):
        dtype = state.x.dtype
        batch = state.x.shape[:-1]
        B = 1
        for d in batch:
            B *= int(d)
        comps, extras, n_comp = _state_comps(state, extra, batch, B, dtype)
        tile = rows * LANE
        comps, B_pad = _pad_comps(comps, n_comp, B, tile, dtype)
        packed_in = [_pack(comps, rows)]
        for e in extras:
            if B_pad != B:
                e = jnp.concatenate(
                    [e, jnp.zeros((B_pad - B, e.shape[-1]), dtype)],
                    axis=0)
            packed_in.append(_pack(e, rows))
        out = _call_packed(packed_in, n_comp, dt, n_substeps)
        flat = _unpack(out)[:B]
        return WholeBodyState(
            R=flat[:, 0:9].reshape(batch + (3, 3)),
            x=flat[:, 9:12].reshape(batch + (3,)),
            u=flat[:, 12:30].reshape(batch + (18,)),
            q=flat[:, 30:42].reshape(batch + (4, 3)),
            anchor=flat[:, 42:58].reshape(batch + (8, 2)),
        )

    if torque_input == "tau":
        @partial(jax.jit, static_argnames=("dt", "n_substeps"))
        def stepper(state: WholeBodyState, tau, dt: float,
                    n_substeps: int):
            return _run(state, (tau,), dt, n_substeps)
    else:
        @partial(jax.jit, static_argnames=("dt", "n_substeps"))
        def stepper(state: WholeBodyState, f_world, tau_swing, stance,
                    dt: float, n_substeps: int):
            return _run(state, (f_world, tau_swing, stance), dt,
                        n_substeps)

        def stepper_packed(state_p, fw_p, tausw_p, st_p, dt: float,
                           n_substeps: int):
            """Packed fast path: (nb, 58|274, rows, 128) state tiles in,
            (nb, 58, rows, 128) out — zero XLA glue between kernels
            (sim/pallas_tick.py)."""
            return _call_packed([state_p, fw_p, tausw_p, st_p],
                                state_p.shape[1], dt, n_substeps)

        stepper.packed = stepper_packed

    stepper.build_factor_sym = build_factor_sym  # exposed for tests
    return stepper
