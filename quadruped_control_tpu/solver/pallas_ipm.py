"""Pallas TPU kernel for the batched GRF interior-point solve.

The jnp IPM (solver/ipm.py) is algorithmically right but XLA:TPU cannot fuse
its ~2k-op unrolled small-matrix chains — each (B,) elementwise op becomes a
dispatch, and the batched 12x12 factorizations dominate. This kernel runs
the ENTIRE barrier loop in one ``pallas_call``:

  - one QP instance per vector-lane element: every per-instance scalar is an
    (8, 128) tile (8 sublanes x 128 lanes = 1024 instances per grid step),
    so each unrolled statement is a full-width VPU op and there is ZERO
    cross-lane traffic — instances never communicate;
  - problem data (Q 144, G 288, c 12, h 24 tiles) loads from HBM once per
    grid step and all iteration state lives in VMEM/registers for the whole
    fixed-iteration Mehrotra loop;
  - the 12x12 Cholesky, triangular solves, and the refinement pass are
    Python-unrolled into straight-line vector code (~2k fused ops per
    iteration) — the Mosaic compiler schedules them back-to-back.

Numerically identical (up to f32 rounding) to solve_qp_ipm's barrier loop on
the equilibrated problem; the host wrapper reuses the same equilibration and
certified active-set polish. Layout: instance b maps to (tile b//1024,
sublane (b%1024)//128, lane b%128).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadruped_control_tpu.solver.ipm import IPMSolution, equilibrate

N = 12
M = 24
SUB = 8
LANE = 128
TILE = SUB * LANE  # instances per grid step


def _kernel(Q_ref, c_ref, G_ref, h_ref, x_ref, s_ref, z_ref,
            *, iterations: int, tau: float):
    f32 = jnp.float32
    eps = jnp.float32(1.1920929e-07)
    d_max = 1.0 / eps
    big = jnp.float32(3.0e38)

    # Load problem data once; lists of (8, 128) tiles act as registers.
    Qv = [Q_ref[i] for i in range(N * N)]
    cv = [c_ref[i] for i in range(N)]
    Gv = [G_ref[i] for i in range(M * N)]
    hv = [h_ref[i] for i in range(M)]

    one = jnp.ones((SUB, LANE), f32)
    # Init: x = 0, s = max(h, 1), z = 1/s (see solver/ipm.py).
    x = [jnp.zeros((SUB, LANE), f32) for _ in range(N)]
    s = [jnp.maximum(hv[r], 1.0) for r in range(M)]
    z = [one / s[r] for r in range(M)]

    # Freeze thresholds (equilibrated units; tol ~ f32 floor).
    obj_scale = cv[0] * 0.0 + 1.0
    for i in range(N):
        obj_scale = jnp.maximum(obj_scale, 1.0 + jnp.abs(cv[i]))
    h_scale = hv[0] * 0.0 + 1.0
    for r in range(M):
        h_scale = jnp.maximum(h_scale, 1.0 + jnp.abs(hv[r]))
    freeze_gap = (100.0 * eps) * obj_scale
    freeze_pr = (50.0 * eps) * h_scale
    freeze_dr = (50.0 * eps) * obj_scale

    def chol_solve(Lmat, rhs):
        """Solve (L L^T) u = rhs; Lmat/rhs are lists of tiles."""
        y = [None] * N
        for i in range(N):
            v = rhs[i]
            for k in range(i):
                v = v - Lmat[i][k] * y[k]
            y[i] = v * Lmat[i][i]  # Lmat[i][i] stores 1/L_ii
        u = [None] * N
        for i in reversed(range(N)):
            v = y[i]
            for k in range(i + 1, N):
                v = v - Lmat[k][i] * u[k]
            u[i] = v * Lmat[i][i]
        return u

    def body(_, carry):
        x, s, z, best = carry

        # Residuals.
        Gx = [None] * M
        for r in range(M):
            v = Gv[r * N] * x[0]
            for j in range(1, N):
                v = v + Gv[r * N + j] * x[j]
            Gx[r] = v
        r_prim = [Gx[r] + s[r] - hv[r] for r in range(M)]

        r_dual = [None] * N
        for i in range(N):
            v = cv[i]
            for j in range(N):
                v = v + Qv[i * N + j] * x[j]
            for r in range(M):
                v = v + Gv[r * N + i] * z[r]
            r_dual[i] = v

        d = [jnp.minimum(z[r] / s[r], d_max) for r in range(M)]

        # M = Q + G^T D G (upper triangle), then regularize diagonal.
        Mm = [[None] * N for _ in range(N)]
        for i in range(N):
            for j in range(i, N):
                v = Qv[i * N + j]
                for r in range(M):
                    v = v + Gv[r * N + i] * d[r] * Gv[r * N + j]
                Mm[i][j] = v
        diag_max = Mm[0][0]
        for i in range(1, N):
            diag_max = jnp.maximum(diag_max, Mm[i][i])
        delta = (100.0 * eps) * diag_max
        for i in range(N):
            Mm[i][i] = Mm[i][i] + delta

        # Cholesky, storing reciprocal diagonal (saves divides in solves).
        Lm = [[None] * N for _ in range(N)]
        for j in range(N):
            dd = Mm[j][j]
            for k in range(j):
                dd = dd - Lm[j][k] * Lm[j][k]
            dd = jnp.where(dd > 0.0, dd, jnp.float32(jnp.nan))
            inv = lax.rsqrt(dd)
            Lm[j][j] = inv  # NOTE: stores 1/L_jj
            for i in range(j + 1, N):
                v = Mm[j][i]  # upper-stored symmetric entry (j <= i)
                for k in range(j):
                    v = v - Lm[i][k] * Lm[j][k]
                Lm[i][j] = v * inv

        def kkt_solve(rhs):
            u = chol_solve(Lm, rhs)
            # One refinement pass against the true M (upper-stored).
            resid = [None] * N
            for i in range(N):
                v = rhs[i]
                for j in range(N):
                    mij = Mm[i][j] if j >= i else Mm[j][i]
                    extra = delta if j == i else 0.0
                    v = v - (mij - extra) * u[j]
                resid[i] = v
            corr = chol_solve(Lm, resid)
            return [u[i] + corr[i] for i in range(N)]

        mu = s[0] * z[0]
        for r in range(1, M):
            mu = mu + s[r] * z[r]
        mu = mu * (1.0 / M)

        def newton(rc):
            """Direction for centering residual list rc (= s*z - sigma*mu)."""
            t = [(z[r] * r_prim[r] - rc[r]) / s[r] for r in range(M)]
            rhs = [None] * N
            for i in range(N):
                v = -r_dual[i]
                for r in range(M):
                    v = v - Gv[r * N + i] * t[r]
                rhs[i] = v
            dx = kkt_solve(rhs)
            Gdx = [None] * M
            for r in range(M):
                v = Gv[r * N] * dx[0]
                for j in range(1, N):
                    v = v + Gv[r * N + j] * dx[j]
                Gdx[r] = v
            ds = [-r_prim[r] - Gdx[r] for r in range(M)]
            dz = [-(rc[r] + z[r] * ds[r]) / s[r] for r in range(M)]
            return dx, ds, dz

        def max_step(v, dv, t_frac):
            ratio = big
            for r in range(M):
                rr = jnp.where(dv[r] < 0.0,
                               -v[r] / jnp.where(dv[r] < 0.0, dv[r], -1.0),
                               big)
                ratio = jnp.minimum(ratio, rr)
            return jnp.minimum(t_frac * ratio, 1.0)

        # Affine step.
        rc_aff = [s[r] * z[r] for r in range(M)]
        dx_a, ds_a, dz_a = newton(rc_aff)
        a_aff = jnp.minimum(max_step(s, ds_a, 1.0), max_step(z, dz_a, 1.0))

        mu_aff = (s[0] + a_aff * ds_a[0]) * (z[0] + a_aff * dz_a[0])
        for r in range(1, M):
            mu_aff = mu_aff + (s[r] + a_aff * ds_a[r]) * (z[r] + a_aff * dz_a[r])
        mu_aff = mu_aff * (1.0 / M)
        ratio = mu_aff / jnp.maximum(mu, 1e-30)
        sigma_mu = ratio * ratio * ratio * mu

        # Corrector.
        rc = [s[r] * z[r] + ds_a[r] * dz_a[r] - sigma_mu for r in range(M)]
        dx, ds, dz = newton(rc)
        alpha = jnp.minimum(max_step(s, ds, tau), max_step(z, dz, tau))

        # Freeze + finite-step guard.
        pr_max = jnp.abs(r_prim[0])
        dr_max = jnp.abs(r_dual[0])
        for r in range(1, M):
            pr_max = jnp.maximum(pr_max, jnp.abs(r_prim[r]))
        for i in range(1, N):
            dr_max = jnp.maximum(dr_max, jnp.abs(r_dual[i]))
        done = (mu < freeze_gap) & (pr_max < freeze_pr) & (dr_max < freeze_dr)

        # Best-iterate tracking by scaled KKT merit: f32 late-stage steps can
        # blow up (huge-but-finite directions); the returned iterate is the
        # best ever seen, exactly as in the jnp path.
        bx, bs, bz, bmerit = best
        merit = pr_max / h_scale + dr_max / obj_scale + mu / obj_scale
        x_finite = jnp.isfinite(x[0])
        for i in range(1, N):
            x_finite = x_finite & jnp.isfinite(x[i])
        improve = (merit < bmerit) & x_finite
        bx = [jnp.where(improve, x[i], bx[i]) for i in range(N)]
        bs = [jnp.where(improve, s[r], bs[r]) for r in range(M)]
        bz = [jnp.where(improve, z[r], bz[r]) for r in range(M)]
        bmerit = jnp.where(improve, merit, bmerit)

        finite = jnp.isfinite(dx[0])
        for i in range(1, N):
            finite = finite & jnp.isfinite(dx[i])
        for r in range(M):
            finite = finite & jnp.isfinite(ds[r]) & jnp.isfinite(dz[r])

        a = jnp.where(done | ~finite, 0.0, alpha)
        tiny = jnp.float32(1.1754944e-38)
        x_new = [x[i] + a * dx[i] for i in range(N)]
        s_new = [jnp.maximum(s[r] + a * ds[r], tiny) for r in range(M)]
        z_new = [jnp.maximum(z[r] + a * dz[r], tiny) for r in range(M)]
        return x_new, s_new, z_new, (bx, bs, bz, bmerit)

    best0 = (
        [jnp.zeros((SUB, LANE), f32) for _ in range(N)],
        [s[r] for r in range(M)],
        [z[r] for r in range(M)],
        jnp.full((SUB, LANE), jnp.inf, f32),
    )
    x, s, z, best = lax.fori_loop(0, iterations, body, (x, s, z, best0))
    bx, bs, bz, _ = best

    for i in range(N):
        x_ref[i] = bx[i]
    for r in range(M):
        s_ref[r] = bs[r]
        z_ref[r] = bz[r]


NK = N + M  # full KKT dimension (36)
_POLISH_SWEEPS_PALLAS = 8
_POLISH_REFINE = 4


def _two_sum(a, b):
    s = a + b
    bp = s - a
    return s, (a - (s - bp)) + (b - bp)


def _two_prod(a, b):
    """Dekker error-free product on f32 tiles (split at 2^12 + 1)."""
    p = a * b
    ca = jnp.float32(4097.0) * a
    a_hi = ca - (ca - a)
    a_lo = a - a_hi
    cb = jnp.float32(4097.0) * b
    b_hi = cb - (cb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _ff_linear(terms):
    """Compensated sum of [(coeff, vec), ...] products: sum_i c_i * v_i.

    Every product is error-free split, accumulation is two_sum-chained; the
    returned f32 tile captures cancellation between O(1) terms down to ~eps
    of the true (small) result — the in-kernel equivalent of
    utils/ff.residual_compensated.
    """
    acc = jnp.zeros_like(terms[0][0] * terms[0][1])
    comp = jnp.zeros_like(acc)
    for cf, v in terms:
        p, e1 = _two_prod(cf, v)
        acc, e2 = _two_sum(acc, p)
        comp = comp + e1 + e2
    return acc + comp


def _polish_kernel(Q_ref, c_ref, G_ref, h_ref, xin_ref, sin_ref, zin_ref,
                   x_ref, s_ref, z_ref, cert_ref, Ksc, Dsc, usc):
    """Certified active-set polish, fully in-kernel.

    Per sweep: build the symmetric quasidefinite EQP KKT

        K = [[Q, (aG)^T], [aG, -R]],   R = reg*a + (1-a)

    (inactive rows reduce to z_i = 0; active rows to G_i x = h_i up to reg,
    removed by refinement), factor it with a loop-based 36x36 LDL^T in VMEM
    scratch — no pivoting needed for quasidefinite matrices (Vanderbei
    1995) — refine against the true (reg-free) system, certify the KKT
    conditions with a Dekker-compensated stationarity residual, and swap the
    active set (qpOASES-style add-most-violated / drop-most-negative).

    Scratch: Ksc/Lsc (NK*NK tiles), Dsc/usc (NK tiles). Loops are serial but
    each step is a full (8,128) VPU op over 1024 instances.
    """
    f32 = jnp.float32
    eps = f32(1.1920929e-07)
    reg = f32(1e-4)
    big = f32(3.0e38)

    Qv = [Q_ref[i] for i in range(N * N)]
    cv = [c_ref[i] for i in range(N)]
    Gv = [G_ref[i] for i in range(M * N)]
    hv = [h_ref[i] for i in range(M)]
    x0 = [xin_ref[i] for i in range(N)]
    s0 = [sin_ref[r] for r in range(M)]
    z0 = [zin_ref[r] for r in range(M)]

    obj_scale = cv[0] * 0.0 + 1.0
    for i in range(N):
        obj_scale = jnp.maximum(obj_scale, 1.0 + jnp.abs(cv[i]))
    h_scale = hv[0] * 0.0 + 1.0
    for r in range(M):
        h_scale = jnp.maximum(h_scale, 1.0 + jnp.abs(hv[r]))
    zmax = z0[0]
    for r in range(1, M):
        zmax = jnp.maximum(zmax, z0[r])
    cert_dr = (30.0 * eps) * obj_scale
    feas_tol = jnp.maximum(f32(1e-6), 30.0 * eps) * h_scale
    z_tol = jnp.maximum(f32(1e-6), 30.0 * eps) * (1.0 + zmax)

    def build_K(a):
        """Write the full symmetric K into Ksc (static unrolled writes)."""
        for i in range(N):
            for j in range(N):
                Ksc[i * NK + j] = Qv[i * N + j]
        for r in range(M):
            for i in range(N):
                v = a[r] * Gv[r * N + i]
                Ksc[i * NK + (N + r)] = v
                Ksc[(N + r) * NK + i] = v
        zero = jnp.zeros((SUB, LANE), f32)
        for r in range(M):
            for rp in range(M):
                if r == rp:
                    Ksc[(N + r) * NK + (N + r)] = -(reg * a[r] + (1.0 - a[r]))
                else:
                    Ksc[(N + r) * NK + (N + rp)] = zero

    def ldl_factor():
        """Loop-based in-place LDL^T: L overwrites Ksc's strict lower
        triangle (originals are read from the symmetric upper copy), D goes
        to Dsc. One scratch matrix total."""
        def j_body(j, _):
            dd = lax.fori_loop(
                0, j, lambda k, acc: acc - Ksc[j * NK + k]
                * Ksc[j * NK + k] * Dsc[k], Ksc[j * NK + j])
            dd = jnp.where(jnp.abs(dd) > f32(1e-30), dd, f32(jnp.nan))
            Dsc[j] = dd
            dinv = 1.0 / dd

            def i_body(i, _):
                v = lax.fori_loop(
                    0, j, lambda k, acc: acc - Ksc[i * NK + k]
                    * Dsc[k] * Ksc[j * NK + k], Ksc[j * NK + i])
                Ksc[i * NK + j] = v * dinv
                return 0

            lax.fori_loop(j + 1, NK, i_body, 0)
            return 0

        lax.fori_loop(0, NK, j_body, 0)

    def ldl_solve_inplace():
        """Solve K u = usc in place (usc holds rhs on entry)."""
        def fwd(i, _):
            v = lax.fori_loop(
                0, i, lambda k, acc: acc - Ksc[i * NK + k] * usc[k], usc[i])
            usc[i] = v
            return 0

        lax.fori_loop(0, NK, fwd, 0)

        def bwd(t, _):
            i = NK - 1 - t
            v = usc[i] / Dsc[i]
            v = lax.fori_loop(
                i + 1, NK, lambda k, acc: acc - Ksc[k * NK + i] * usc[k], v)
            usc[i] = v
            return 0

        lax.fori_loop(0, NK, bwd, 0)

    def true_matvec_residual(a, xp, zp, rhs1, rhs2):
        """Plain-f32 residual of the reg-free system (for refinement)."""
        r1 = [None] * N
        for i in range(N):
            v = rhs1[i]
            for j in range(N):
                v = v - Qv[i * N + j] * xp[j]
            for r in range(M):
                v = v - a[r] * Gv[r * N + i] * zp[r]
            r1[i] = v
        r2 = [None] * M
        for r in range(M):
            v = rhs2[r] - (1.0 - a[r]) * zp[r]
            for j in range(N):
                v = v - a[r] * Gv[r * N + j] * xp[j]
            r2[r] = v
        return r1, r2

    def ff_dual_residual(a, xp, zp, rhs1):
        """Compensated stationarity residual (certification only)."""
        r1 = [None] * N
        for i in range(N):
            terms = [(f32(-1.0) * Qv[i * N + j], xp[j]) for j in range(N)]
            terms += [(-(a[r] * Gv[r * N + i]), zp[r]) for r in range(M)]
            terms.append((jnp.ones_like(rhs1[i]), rhs1[i]))
            r1[i] = _ff_linear(terms)
        return r1

    def sweep_body(_, carry):
        a, bx, bz, bs, cert = carry
        build_K(a)
        ldl_factor()
        rhs1 = [-cv[i] for i in range(N)]
        rhs2 = [a[r] * hv[r] for r in range(M)]
        for i in range(N):
            usc[i] = rhs1[i]
        for r in range(M):
            usc[N + r] = rhs2[r]
        ldl_solve_inplace()
        xp = [usc[i] for i in range(N)]
        zp = [usc[N + r] for r in range(M)]

        # Refinement against the true (reg-free) system.
        for _ in range(_POLISH_REFINE):
            r1, r2 = true_matvec_residual(a, xp, zp, rhs1, rhs2)
            for i in range(N):
                usc[i] = r1[i]
            for r in range(M):
                usc[N + r] = r2[r]
            ldl_solve_inplace()
            xp = [xp[i] + usc[i] for i in range(N)]
            zp = [zp[r] + usc[N + r] for r in range(M)]

        # Certification.
        r1 = ff_dual_residual(a, xp, zp, rhs1)
        dr_max = jnp.abs(r1[0])
        for i in range(1, N):
            dr_max = jnp.maximum(dr_max, jnp.abs(r1[i]))
        slack = [None] * M
        for r in range(M):
            v = hv[r]
            for j in range(N):
                v = v - Gv[r * N + j] * xp[j]
            slack[r] = v
        slack_min = slack[0]
        z_signed = zp[0] * a[0]
        finite = jnp.isfinite(xp[0])
        for r in range(1, M):
            slack_min = jnp.minimum(slack_min, slack[r])
            z_signed = jnp.minimum(z_signed, zp[r] * a[r])
        for i in range(N):
            finite = finite & jnp.isfinite(xp[i])
        for r in range(M):
            finite = finite & jnp.isfinite(zp[r])
        ok = (
            finite
            & (slack_min > -feas_tol)
            & (z_signed > -z_tol)
            & (dr_max < cert_dr)
        )

        take = ok & (cert < 0.5)
        bx = [jnp.where(take, xp[i], bx[i]) for i in range(N)]
        bz = [jnp.where(take, jnp.maximum(a[r] * zp[r], 0.0), bz[r])
              for r in range(M)]
        bs = [jnp.where(take, jnp.maximum(slack[r], 0.0), bs[r])
              for r in range(M)]
        cert = jnp.maximum(cert, ok.astype(jnp.float32))

        # Active-set swap: add most violated, else drop most negative z.
        viol_best = jnp.full((SUB, LANE), -big, f32)
        viol_idx = jnp.zeros((SUB, LANE), f32)
        negz_best = jnp.full((SUB, LANE), big, f32)
        negz_idx = jnp.zeros((SUB, LANE), f32)
        for r in range(M):
            viol_r = jnp.where(a[r] > 0.5, -big, -slack[r])
            upd = viol_r > viol_best
            viol_best = jnp.where(upd, viol_r, viol_best)
            viol_idx = jnp.where(upd, f32(r), viol_idx)
            nz_r = jnp.where(a[r] > 0.5, zp[r], big)
            updn = nz_r < negz_best
            negz_best = jnp.where(updn, nz_r, negz_best)
            negz_idx = jnp.where(updn, f32(r), negz_idx)
        do_add = viol_best > feas_tol
        do_drop = (~do_add) & (negz_best < -z_tol)
        a_new = list(a)
        for r in range(M):
            a_new[r] = jnp.where(do_add & (viol_idx == f32(r)), 1.0,
                                 jnp.where(do_drop & (negz_idx == f32(r)),
                                           0.0, a[r]))
        a = [jnp.where(cert > 0.5, a[r], a_new[r]) for r in range(M)]
        return a, bx, bz, bs, cert

    a0 = [jnp.where(z0[r] > s0[r], f32(1.0), f32(0.0)) for r in range(M)]
    cert0 = jnp.zeros_like(x0[0])
    carry = (a0, x0, z0, s0, cert0)
    carry = lax.fori_loop(0, _POLISH_SWEEPS_PALLAS, sweep_body, carry)
    _, bx, bz, bs, cert = carry

    for i in range(N):
        x_ref[i] = bx[i]
    for r in range(M):
        s_ref[r] = bs[r]
        z_ref[r] = bz[r]
    cert_ref[0] = cert



def _pack(a, last_dim):
    """(B, k) -> (nb, k, 8, 128) tile layout (B must be TILE-aligned)."""
    B = a.shape[0]
    nb = B // TILE
    return (
        a.reshape(nb, SUB, LANE, last_dim)
        .transpose(0, 3, 1, 2)
    )


def _unpack(a):
    """(nb, k, 8, 128) -> (B, k)."""
    nb, k = a.shape[0], a.shape[1]
    return a.transpose(0, 2, 3, 1).reshape(nb * TILE, k)


@partial(jax.jit, static_argnames=("iterations", "polish"))
def solve_qp_ipm_pallas(Q, c, G, h, iterations: int = 20, tol: float = 3e-5,
                        tau: float = 0.995, polish: bool = True
                        ) -> IPMSolution:
    """Pallas-accelerated batched QP solve (float32, n=12, m=24).

    Drop-in for solve_qp_ipm on (B, 12, 12) GRF problems with B a multiple
    of 1024 (pad the batch otherwise). Equilibration, the certified
    active-set polish, and the reported diagnostics are shared with the jnp
    path — only the barrier loop runs in the kernel.
    """
    assert Q.shape[-1] == N and G.shape[-2] == M
    B = Q.shape[0]
    assert B % TILE == 0, f"batch {B} must be a multiple of {TILE}"
    nb = B // TILE
    orig = (Q, c, G, h)
    Qs, cs, Gs, hs, Dv, Er, nu = equilibrate(Q, c, G, h)

    Qp = _pack(Qs.reshape(B, N * N).astype(jnp.float32), N * N)
    cp = _pack(cs.astype(jnp.float32), N)
    Gp = _pack(Gs.reshape(B, M * N).astype(jnp.float32), M * N)
    hp = _pack(hs.astype(jnp.float32), M)

    grid = (nb,)
    in_specs = [
        pl.BlockSpec((1, N * N, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M * N, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, N, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, SUB, LANE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def kernel(Q_ref, c_ref, G_ref, h_ref, x_ref, s_ref, z_ref):
        _kernel(Q_ref[0], c_ref[0], G_ref[0], h_ref[0],
                x_ref.at[0], s_ref.at[0], z_ref.at[0],
                iterations=iterations, tau=tau)

    xp, sp, zp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, N, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, M, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, M, SUB, LANE), jnp.float32),
        ],
    )(Qp, cp, Gp, hp)

    certified = None
    if polish:
        state_specs = [
            pl.BlockSpec((1, N, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

        def polish_kernel(Q_ref, c_ref, G_ref, h_ref, xi_ref, si_ref,
                          zi_ref, x_ref, s_ref, z_ref, cert_ref,
                          Ksc, Dsc, usc):
            _polish_kernel(Q_ref[0], c_ref[0], G_ref[0], h_ref[0],
                           xi_ref[0], si_ref[0], zi_ref[0],
                           x_ref.at[0], s_ref.at[0], z_ref.at[0],
                           cert_ref.at[0], Ksc, Dsc, usc)

        xp, sp, zp, certp = pl.pallas_call(
            polish_kernel,
            grid=grid,
            in_specs=in_specs + state_specs,
            out_specs=out_specs + [
                pl.BlockSpec((1, 1, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, N, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct((nb, M, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct((nb, M, SUB, LANE), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1, SUB, LANE), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((NK * NK, SUB, LANE), jnp.float32),
                pltpu.VMEM((NK, SUB, LANE), jnp.float32),
                pltpu.VMEM((NK, SUB, LANE), jnp.float32),
            ],
        )(Qp, cp, Gp, hp, xp, sp, zp)
        certified = _unpack(certp)[..., 0] > 0.5

    x = _unpack(xp)
    s = _unpack(sp)
    z = _unpack(zp)

    # Map back to original units + diagnostics (shared semantics with
    # solve_qp_ipm).
    x = x * Dv
    z = z * Er / nu[..., None]
    s = s / Er
    Q, c, G, h = orig

    r_dual = (
        jnp.einsum("...ij,...j->...i", Q, x)
        + c
        + jnp.einsum("...ji,...j->...i", G, z)
    )
    r_prim = jnp.einsum("...ij,...j->...i", G, x) + s - h
    gap = jnp.abs(jnp.sum(s * z, axis=-1)) / M
    scale = 1.0 + jnp.max(jnp.abs(c), axis=-1)
    pr = jnp.max(jnp.abs(r_prim), axis=-1)
    dr = jnp.max(jnp.abs(r_dual), axis=-1)
    converged = (pr < tol * (1.0 + jnp.max(jnp.abs(h), axis=-1))) & \
                (dr < tol * scale) & (gap < tol * scale)
    if certified is not None:
        converged = converged | certified

    return IPMSolution(
        x=x, z=z, s=s, iterations=jnp.asarray(iterations),
        gap=gap, primal_residual=pr, dual_residual=dr, converged=converged,
    )
