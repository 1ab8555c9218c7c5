"""Structured (sparse multiple-shooting) SRB MPC solver: O(N) Riccati IPM.

The condensed path (mpc/horizon.py) materializes the dense (12N)^2 Hessian
H = 2(Bqp^T L Bqp + alpha I) and pays O((12N)^3) per IPM iteration. This
module solves the SAME QP without ever forming H: the horizon's
block-tridiagonal KKT structure is eliminated by a backward Riccati sweep
(``lax.scan`` over time steps) — the "sequence-parallel analogue" promised
in SURVEY.md §5: time steps are handled by banded factorization, not by a
bigger dense solve. Per IPM iteration the cost is O(N (nx+nu)^3) instead of
O(N^3 nu^3): ~10x fewer FLOPs at N=16 and linear (not cubic) scaling with
horizon length.

Math. The condensed Newton system per Mehrotra iteration is

    (H + G^T D G) dF = rhs,    D = diag(z/s)  (block-diag per step)

which is exactly the LQR problem

    min  sum_{t=1..N} dxi_t^T L dxi_t
       + sum_{t=0..N-1} 1/2 df_t^T R_t df_t - rhs_t^T df_t
    s.t. dxi_{t+1} = A dxi_t + B_t df_t,  dxi_0 = 0,

with R_t = 2 alpha I + G_t^T D_t G_t and state weight 2L, solved by the
classic backward Riccati recursion + forward rollout. H-vector products
(for residuals) are one forward + one backward scan.

Everything is batched over instances: the scan carries (B, nx, nx) Riccati
matrices; all dense blocks are <= 13x13 so XLA maps them onto batched MXU
matmuls. Validated against the condensed solver + float64 oracle in
tests/test_mpc_structured.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import ControlConfig
from quadruped_control_tpu.mpc.horizon import (
    NU,
    NX,
    srb_discrete_dynamics,
)
from quadruped_control_tpu.ops.dynamics import cone_constraints
from quadruped_control_tpu.solver.ipm import IPMSolution

_M = 24  # cone rows per step


class MPCStructuredData(NamedTuple):
    """Per-step problem data (never condensed)."""

    A: jnp.ndarray        # (..., NX, NX) shared across steps
    B: jnp.ndarray        # (..., N, NX, NU) stance-masked per step
    G: jnp.ndarray        # (..., N, 24, NU)
    h: jnp.ndarray        # (..., N, 24)
    err0: jnp.ndarray     # (..., N, NX) free-response error Sqp xi0 - xi_ref
    L: jnp.ndarray        # (NX,) state weights
    alpha: float          # force weight


def build_mpc_structured(xi0, xi_ref, yaw, feet_world, x_com,
                         stance_schedule, horizon: int, dt,
                         cfg: ControlConfig, state_weights=None,
                         force_weight: float = 1e-6, mass=None,
                         inertia_diag=None, mu=None) -> MPCStructuredData:
    """Same inputs/semantics as mpc/horizon.build_mpc_qp, but emits per-step
    data. err0 (the free response) is computed by an N-step scan instead of
    stacked powers of A."""
    dtype = xi0.dtype
    if state_weights is None:
        state_weights = jnp.array(
            [50.0, 50.0, 10.0, 1.0, 1.0, 100.0,
             1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0], dtype=dtype
        )
    L = jnp.asarray(state_weights, dtype=dtype)

    A, B = srb_discrete_dynamics(yaw, feet_world, x_com, dt, cfg,
                                 mass=mass, inertia_diag=inertia_diag)
    col_mask = jnp.repeat(stance_schedule.astype(dtype), 3, axis=-1)
    B_steps = B[..., None, :, :] * col_mask[..., :, None, :]  # (..., N, NX, NU)

    # Free response: xi_t = A^t xi0.
    def step(x, _):
        x1 = jnp.einsum("...ij,...j->...i", A, x)
        return x1, x1

    _, xi_free = lax.scan(step, xi0, None, length=horizon)
    # scan stacks on axis 0 -> move to (..., N, NX).
    xi_free = jnp.moveaxis(xi_free, 0, -2)
    err0 = xi_free - xi_ref

    G_steps, h_steps = [], []
    for t in range(horizon):
        Gt, ht = cone_constraints(stance_schedule[..., t, :], mu=mu,
                                  cfg=cfg.balance, dtype=dtype)
        G_steps.append(Gt)
        h_steps.append(ht)
    G = jnp.stack(G_steps, axis=-3)
    h = jnp.stack(h_steps, axis=-2)
    return MPCStructuredData(A=A, B=B_steps, G=G, h=h, err0=err0, L=L,
                             alpha=float(force_weight))


def _forward_map(A, B, F):
    """dxi = Bqp F: forward rollout with zero initial state.

    F: (..., N, NU) -> (..., N, NX) (states at t = 1..N).
    """
    Fs = jnp.moveaxis(F, -2, 0)
    Bs = jnp.moveaxis(B, -3, 0)
    x0 = jnp.zeros(F.shape[:-2] + (NX,), F.dtype)

    def step(x, inp):
        Bt, ft = inp
        x1 = jnp.einsum("...ij,...j->...i", A, x) + \
            jnp.einsum("...ij,...j->...i", Bt, ft)
        return x1, x1

    _, xs = lax.scan(step, x0, (Bs, Fs))
    return jnp.moveaxis(xs, 0, -2)


def _adjoint_map(A, B, Y):
    """Bqp^T Y: backward adjoint accumulation.

    Y: (..., N, NX) costates at t = 1..N -> (..., N, NU).
    (Bqp^T Y)_t = B_t^T sum_{k >= t+1} (A^T)^(k-t-1) y_k = B_t^T lam_t,
    lam_t = y_{t+1} + A^T lam_{t+1}.
    """
    Ys = jnp.moveaxis(Y, -2, 0)
    Bs = jnp.moveaxis(B, -3, 0)
    lam_end = jnp.zeros(Y.shape[:-2] + (NX,), Y.dtype)

    def step(lam, inp):
        Bt, yt = inp
        lam_t = yt + lam  # lam carries A^T-propagated future costate
        out = jnp.einsum("...ji,...j->...i", Bt, lam_t)
        lam_next = jnp.einsum("...ji,...j->...i", A, lam_t)
        return lam_next, out

    _, outs = lax.scan(step, lam_end, (Bs, Ys), reverse=True)
    return jnp.moveaxis(outs, 0, -2)


def _L_bcast(data: MPCStructuredData):
    """State-weight diagonal broadcast against (..., N, NX) arrays.

    ``L`` may be (NX,) or PER-INSTANCE (..., NX) — a traced batch of
    weight diagonals (gradient tuning / weight sweeps); insert the horizon
    axis so both broadcast."""
    return data.L[..., None, :]


def _hvp(data: MPCStructuredData, F):
    """H F = 2 (Bqp^T L (Bqp F) + alpha F) without materializing H."""
    dxi = _forward_map(data.A, data.B, F)
    y = _L_bcast(data) * dxi
    return 2.0 * (_adjoint_map(data.A, data.B, y) + data.alpha * F)


def _linear_cost(data: MPCStructuredData):
    """c = 2 Bqp^T L err0."""
    return 2.0 * _adjoint_map(data.A, data.B, _L_bcast(data) * data.err0)


def _riccati_solve(data: MPCStructuredData, Rts, rhs, reg):
    """Solve (H + G^T D G) dF = rhs via backward Riccati + forward rollout.

    Args:
      Rts: (..., N, NU, NU) per-step control Hessians
           R_t = 2 alpha I + G_t^T D_t G_t (+ reg I).
      rhs: (..., N, NU).
    Returns dF (..., N, NU).
    """
    dtype = rhs.dtype
    A = data.A
    Q = 2.0 * data.L  # state weight (diagonal), applies at t = 1..N
    eye_u = jnp.eye(NU, dtype=dtype)

    Bs = jnp.moveaxis(data.B, -3, 0)
    Rs = jnp.moveaxis(Rts, -3, 0)
    rs = jnp.moveaxis(rhs, -2, 0)

    batch = rhs.shape[:-2]
    # diag-embed Q, which may be (NX,) or per-instance (..., NX).
    Qd = jnp.broadcast_to(Q.astype(dtype), batch + (NX,))
    P_end = Qd[..., :, None] * jnp.eye(NX, dtype=dtype)
    p_end = jnp.zeros(batch + (NX,), dtype)
    reg_e = reg[..., None, None] * eye_u

    def backward(carry, inp):
        P, p = carry
        Bt, Rt, rhs_t = inp
        PB = P @ Bt                                   # (.., NX, NU)
        Luu = Rt + jnp.swapaxes(Bt, -1, -2) @ PB      # (.., NU, NU)
        Luu = Luu + reg_e
        PA = P @ A
        Lux = jnp.einsum("...ji,...jk->...ik", Bt, PA)   # B^T P A
        lu = jnp.einsum("...ji,...j->...i", Bt, p) - rhs_t
        Lc = jnp.linalg.cholesky(Luu)
        # K = -Luu^{-1} Lux ; k = -Luu^{-1} lu
        K = -lax.linalg.triangular_solve(
            Lc, lax.linalg.triangular_solve(Lc, Lux, left_side=True,
                                            lower=True),
            left_side=True, lower=True, transpose_a=True)
        k = -lax.linalg.triangular_solve(
            Lc, lax.linalg.triangular_solve(Lc, lu[..., None],
                                            left_side=True, lower=True),
            left_side=True, lower=True, transpose_a=True)[..., 0]
        # P_t = Q + A^T P A + Lux^T K (the state cost applies at t = 1..N;
        # it is also added at t=0 but P_0 is never used — dxi_0 = 0).
        APA = jnp.einsum("...ji,...jk->...ik", A, PA)
        P_new = APA + jnp.einsum("...ji,...jk->...ik", Lux, K)
        P_new = P_new + Qd[..., :, None] * jnp.eye(NX, dtype=dtype)
        # Symmetrize for numerical hygiene.
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))
        p_new = jnp.einsum("...ji,...j->...i", A, p) + \
            jnp.einsum("...ji,...j->...i", Lux, k)
        return (P_new, p_new), (K, k)

    (_, _), (Ks, ks) = lax.scan(
        backward, (P_end, p_end), (Bs, Rs, rs), reverse=True)

    # Forward rollout: dxi_0 = 0.
    x0 = jnp.zeros(batch + (NX,), dtype)

    def forward(x, inp):
        Bt, Kt, kt = inp
        u = jnp.einsum("...ij,...j->...i", Kt, x) + kt
        x1 = jnp.einsum("...ij,...j->...i", A, x) + \
            jnp.einsum("...ij,...j->...i", Bt, u)
        return x1, u

    _, us = lax.scan(forward, x0, (Bs, Ks, ks))
    return jnp.moveaxis(us, 0, -2)


def _max_step(v, dv, tau):
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    alpha = tau * jnp.min(ratio, axis=(-2, -1))
    return jnp.minimum(alpha, 1.0)


@partial(jax.jit, static_argnames=("iterations",))
def solve_mpc_qp_structured(data: MPCStructuredData, iterations: int = 30,
                            tol: float = 3e-4, tau: float = 0.995,
                            warm_start=None
                            ) -> tuple[jnp.ndarray, IPMSolution]:
    """Mehrotra IPM on the horizon QP with Riccati KKT solves.

    Returns (F (..., N, NU), IPMSolution with flattened (..., N*NU) fields).
    Semantics (initialization, freeze, best-iterate) mirror solve_qp_ipm;
    scaling: forces are solved in units of fz_max and the cost normalized by
    max |c| (the structured analogue of equilibrate()).

    warm_start: optional (F, s, z) in ORIGINAL units — typically the
    previous receding-horizon tick's solution (shift it by one step before
    passing for best effect). Slacks/duals are pushed to the interior as in
    solve_qp_ipm.
    """
    dtype = data.err0.dtype
    N = data.B.shape[-3]
    batch = jnp.broadcast_shapes(data.err0.shape[:-2], data.h.shape[:-2])
    eps = jnp.finfo(dtype).eps

    # --- scaling: x = sigma x', objective x nu --------------------------------
    # sigma: typical force magnitude; rows of G are O(1) already.
    sigma = jnp.asarray(120.0, dtype)
    c_raw = _linear_cost(data)  # (..., N, NU)
    nu = 1.0 / jnp.maximum(
        jnp.max(jnp.abs(c_raw), axis=(-2, -1), keepdims=True) * sigma, 1e-12
    )  # (..., 1, 1)
    inv_s = 1.0 / (sigma * sigma * nu)  # (..., 1, 1) scaled->original factor

    Gs = data.G * sigma
    hs = data.h
    cs = c_raw * sigma * nu

    # scaled Hessian operator: H'(F') = sigma^2 nu H(F')
    def hvp_s(F):
        return (sigma * sigma) * nu * _hvp(data, F)

    alpha_s = data.alpha  # appears inside hvp; R_t built separately below

    if warm_start is None:
        x = jnp.zeros(batch + (N, NU), dtype)
        s = jnp.maximum(hs, 1.0)
        z = 1.0 / s
    else:
        Fw, sw, zw = warm_start
        interior = jnp.asarray(1e-2, dtype)
        x = jnp.broadcast_to(Fw / sigma, batch + (N, NU))
        s = jnp.maximum(jnp.broadcast_to(sw.reshape(x.shape[:-2] + (N, _M)),
                                         batch + (N, _M)), interior)
        z = jnp.maximum(jnp.broadcast_to(
            zw.reshape(x.shape[:-2] + (N, _M)) * nu, batch + (N, _M)),
            interior)

    obj_scale = 1.0 + jnp.max(jnp.abs(cs), axis=(-2, -1))
    h_scale = 1.0 + jnp.max(jnp.abs(hs), axis=(-2, -1))
    freeze_gap = jnp.maximum(1e-4 * tol, 100.0 * eps) * obj_scale
    freeze_pr = jnp.maximum(tol, 50.0 * eps) * h_scale
    freeze_dr = jnp.maximum(tol, 50.0 * eps) * obj_scale
    d_max = 1.0 / eps
    MN = _M * N

    eye_u = jnp.eye(NU, dtype=dtype)

    def body(_, carry):
        x, s, z, best = carry
        Gx = jnp.einsum("...tij,...tj->...ti", Gs, x)
        r_prim = Gx + s - hs
        Hx = hvp_s(x)
        r_dual = Hx + cs + jnp.einsum("...tji,...tj->...ti", Gs, z)

        merit = (
            jnp.max(jnp.abs(r_prim), axis=(-2, -1)) / h_scale
            + jnp.max(jnp.abs(r_dual), axis=(-2, -1)) / obj_scale
            + jnp.abs(jnp.sum(s * z, axis=(-2, -1))) / (MN * obj_scale)
        )
        bx, bs, bz, bmerit = best
        improve = (merit < bmerit) & jnp.all(jnp.isfinite(x), axis=(-2, -1))
        imp = improve[..., None, None]
        best = (
            jnp.where(imp, x, bx),
            jnp.where(imp, s, bs),
            jnp.where(imp, z, bz),
            jnp.where(improve, merit, bmerit),
        )

        d = jnp.minimum(z / s, d_max)
        # Per-step control Hessian R_t = 2 alpha' I + G^T D G (scaled units:
        # alpha' = sigma^2 nu alpha, G^T D G uses scaled G rows).
        GtDG = jnp.einsum("...tki,...tk,...tkj->...tij", Gs, d, Gs)
        Rts = 2.0 * (sigma * sigma) * nu[..., None] * alpha_s * eye_u + GtDG
        diag_R = jnp.diagonal(Rts, axis1=-2, axis2=-1)
        reg = (100.0 * eps) * jnp.max(diag_R, axis=(-2, -1))

        def kkt_solve(rhs):
            # Solve (H' + G_s^T D G_s) dF' = rhs. The Riccati recursion runs
            # in ORIGINAL units: H' + GtDG = sigma^2 nu (H + GtDG * inv_s),
            # so solve (H + GtDG * inv_s) dF' = rhs * inv_s.
            Rts_orig = 2.0 * alpha_s * eye_u + GtDG * inv_s[..., None]
            reg_orig = reg * inv_s[..., 0, 0]
            dx = _riccati_solve(data, Rts_orig, rhs * inv_s, reg_orig)
            # One refinement pass against the scaled operator.
            resid = rhs - (hvp_s(dx)
                           + jnp.einsum("...tij,...tj->...ti", GtDG, dx))
            dx2 = _riccati_solve(data, Rts_orig, resid * inv_s, reg_orig)
            return dx + dx2

        mu = jnp.sum(s * z, axis=(-2, -1)) / MN

        def newton(rc):
            t = (z * r_prim - rc) / s
            rhs = -(r_dual + jnp.einsum("...tji,...tj->...ti", Gs, t))
            dxF = kkt_solve(rhs)
            Gdx = jnp.einsum("...tij,...tj->...ti", Gs, dxF)
            ds = -r_prim - Gdx
            dz = -(rc + z * ds) / s
            return dxF, ds, dz

        rc_aff = s * z
        dx_a, ds_a, dz_a = newton(rc_aff)
        a_aff = jnp.minimum(_max_step(s, ds_a, 1.0), _max_step(z, dz_a, 1.0))
        a_ = a_aff[..., None, None]
        mu_aff = jnp.sum((s + a_ * ds_a) * (z + a_ * dz_a), axis=(-2, -1)) / MN
        sig = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3

        rc = s * z + ds_a * dz_a - (sig * mu)[..., None, None]
        dxF, ds, dz = newton(rc)
        alpha = jnp.minimum(_max_step(s, ds, tau), _max_step(z, dz, tau))

        done = (
            (mu < freeze_gap)
            & (jnp.max(jnp.abs(r_prim), axis=(-2, -1)) < freeze_pr)
            & (jnp.max(jnp.abs(r_dual), axis=(-2, -1)) < freeze_dr)
        )
        step_ok = (
            jnp.all(jnp.isfinite(dxF), axis=(-2, -1))
            & jnp.all(jnp.isfinite(ds), axis=(-2, -1))
            & jnp.all(jnp.isfinite(dz), axis=(-2, -1))
        )
        a = jnp.where(done | ~step_ok, 0.0, alpha)[..., None, None]
        tiny = jnp.finfo(dtype).tiny
        return (
            x + a * dxF,
            jnp.maximum(s + a * ds, tiny),
            jnp.maximum(z + a * dz, tiny),
            best,
        )

    best0 = (x, s, z, jnp.full(batch, jnp.inf, dtype))
    x, s, z, best = lax.fori_loop(0, iterations, body, (x, s, z, best0))

    # Final best-iterate pick.
    Gx = jnp.einsum("...tij,...tj->...ti", Gs, x)
    r_prim_f = Gx + s - hs
    r_dual_f = hvp_s(x) + cs + jnp.einsum("...tji,...tj->...ti", Gs, z)
    merit_f = (
        jnp.max(jnp.abs(r_prim_f), axis=(-2, -1)) / h_scale
        + jnp.max(jnp.abs(r_dual_f), axis=(-2, -1)) / obj_scale
        + jnp.abs(jnp.sum(s * z, axis=(-2, -1))) / (MN * obj_scale)
    )
    bx, bs, bz, bmerit = best
    kf = (merit_f < bmerit) & jnp.all(jnp.isfinite(x), axis=(-2, -1))
    kfe = kf[..., None, None]
    x = jnp.where(kfe, x, bx)
    s = jnp.where(kfe, s, bs)
    z = jnp.where(kfe, z, bz)

    # Map to original units + diagnostics: x = sigma x'; the scaled
    # stationarity H'x' + c' + G_s^T z' = nu sigma (Hx + c + G^T (z'/nu)),
    # so z = z'/nu; slacks are unscaled (h rows untouched).
    F = x * sigma
    z_orig = z / nu
    s_orig = s

    c_orig = c_raw
    r_dual = _hvp(data, F) + c_orig + \
        jnp.einsum("...tji,...tj->...ti", data.G, z_orig)
    r_prim = jnp.einsum("...tij,...tj->...ti", data.G, F) + s_orig - data.h
    gap = jnp.abs(jnp.sum(s_orig * z_orig, axis=(-2, -1))) / MN
    pr = jnp.max(jnp.abs(r_prim), axis=(-2, -1))
    dr = jnp.max(jnp.abs(r_dual), axis=(-2, -1))
    # The converged flag is evaluated in the SCALED units the solver actually
    # controls (r_dual_s = nu sigma r_dual, gap_s = nu gap, r_prim_s =
    # r_prim): in original units the f32 complementarity floor is inflated by
    # the O(100 N) slack magnitudes and the flag under-reports badly.
    nu_s = nu[..., 0, 0]
    converged = (
        (pr < tol * (1.0 + jnp.max(jnp.abs(data.h), axis=(-2, -1))))
        & (dr * nu_s * sigma < tol * obj_scale)
        & (gap * nu_s < tol * obj_scale)
    )

    flat = batch + (N * NU,)
    flat_m = batch + (N * _M,)
    sol = IPMSolution(
        x=F.reshape(flat), z=z_orig.reshape(flat_m), s=s_orig.reshape(flat_m),
        iterations=jnp.asarray(iterations), gap=gap, primal_residual=pr,
        dual_residual=dr, converged=converged,
    )
    return F, sol


@partial(jax.jit, static_argnames=("horizon", "cfg", "iterations"))
def solve_mpc_structured(xi0, xi_ref, yaw, feet_world, x_com,
                         stance_schedule, horizon: int, dt,
                         cfg: ControlConfig, iterations: int = 30,
                         mass=None, inertia_diag=None, mu=None, tol=None,
                         state_weights=None, force_weight: float = 1e-6):
    """Drop-in analogue of mpc/horizon.solve_mpc using the O(N) structured
    solver. Returns (F (..., N, 12), IPMSolution). state_weights may be a
    TRACED (..., 13) array, including PER-INSTANCE batches of weight
    diagonals — the whole solve is differentiable, so MPC cost weights can
    be tuned by gradient through closed-loop rollouts or swept in one
    compile (scripts/reverse_lab.py)."""
    data = build_mpc_structured(xi0, xi_ref, yaw, feet_world, x_com,
                                stance_schedule, horizon, dt, cfg,
                                mass=mass, inertia_diag=inertia_diag, mu=mu,
                                state_weights=state_weights,
                                force_weight=force_weight)
    if tol is None:
        tol = 1e-6 if data.err0.dtype == jnp.float64 else 3e-4
    return solve_mpc_qp_structured(data, iterations=iterations, tol=tol)
