"""Fully-fused Pallas TPU kernel: GRF-QP assembly + equilibration + barrier
IPM + certified active-set polish in ONE ``pallas_call``.

The split pipeline (ops/dynamics.py assembly in XLA -> solver/pallas_ipm.py
kernels) moves the dense problem data through HBM twice: Q (144 f32), G (288
f32), c (12), h (24) per instance — 1.9 MB per 1024-instance grid step — and
the XLA-side einsums/pack transposes cost more than the solve itself. This
kernel instead takes the ~25 f32/instance of RAW scenario state the reference
controller starts from (balance_controller.cpp:98-161):

  - ``r``  (12): stance-masked world-frame CoM->foot vectors R @ p_i,
  - ``b``   (6): the SRB Newton-Euler right-hand side,
  - ``stance`` (4), ``mu`` (1), ``fz_min``/``fz_max`` (2),

and rebuilds everything on-chip:

  1. **Assembly** — Q = 2(A^T S A + W) expands in closed form: the top
     (identity) blocks of A contribute S_lin * delta_ab to every leg-pair
     block and the bottom (skew) blocks contribute skew(r_l)^T S_ang
     skew(r_l') with 2-3 multiplies per entry; c = -2 A^T S b likewise. G is
     never materialized as a dense 24x12: each friction-cone row has <= 2
     nonzeros at STATIC positions (ops/dynamics.py `friction_cone_rows`), so
     it is carried as per-row sparse (col, value) lists.
  2. **Equilibration** — the same Jacobi/row/cost scaling as
     solver/ipm.py::equilibrate, on tiles (diagonal scaling preserves G's
     sparsity).
  3. **Barrier loop** — identical algorithm to pallas_ipm._kernel, but every
     G product (Gx, G^T z, the G^T D G normal-matrix term, G dx) uses the
     sparse rows: the normal-matrix formation drops from M*n(n+1)/2 = 1872
     to ~96 MACs/iteration.
  4. **Polish** — identical algorithm to pallas_ipm._polish_kernel (36x36
     quasidefinite LDL^T in VMEM scratch + refinement + Dekker-compensated
     certification), with sparse-G assembly of the KKT and residuals.
  5. **Map-back + diagnostics** — the solution is returned in ORIGINAL
     units with the same converged/certified semantics as solve_qp_ipm, so
     callers never touch the equilibrated problem.

Instance layout matches pallas_ipm: one QP per vector lane, (8, 128) tiles,
1024 instances per grid step, zero cross-lane traffic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadruped_control_tpu.config import BalanceConfig
from quadruped_control_tpu.ops.dynamics import SWING_ROW_RELAX, pd_accelerations
from quadruped_control_tpu.solver.ipm import IPMSolution
from quadruped_control_tpu.solver.pallas_ipm import (
    LANE,
    M,
    N,
    NK,
    SUB,
    TILE,
    _POLISH_REFINE,
    _POLISH_SWEEPS_PALLAS,
    _ff_linear,
    _pack,
    _unpack,
)

# Friction-cone row sparsity (ops/dynamics.py friction_cone_rows, one-sided
# form): per leg, row t has nonzeros in local columns _ROW_COLS[t] with signs
# _ROW_SIGN[t]; the z-column entry of rows 0-3 is -mu (handled separately).
_ROW_COLS = ((0, 2), (1, 2), (1, 2), (0, 2), (2,), (2,))
_ROW_SIGN = ((1.0, None), (1.0, None), (-1.0, None), (-1.0, None),
             (1.0,), (-1.0,))

_N_DIAG = 6  # cert, conv, pr, dr, gap, reserved


def _pack_rows(a, last_dim, rows):
    """(B, k) -> (nb, k, rows, 128). Taller tiles put more independent
    instances behind every VPU instruction: the kernel is latency-bound on
    serial elementwise chains, so rows=16/32 hides VPU latency at the cost
    of rows/8 x the VMEM footprint."""
    B = a.shape[0]
    nb = B // (rows * LANE)
    return a.reshape(nb, rows, LANE, last_dim).transpose(0, 3, 1, 2)


def _unpack_rows(a):
    """(nb, k, rows, 128) -> (B, k)."""
    nb, k = a.shape[0], a.shape[1]
    return a.transpose(0, 2, 3, 1).reshape(nb * a.shape[2] * a.shape[3], k)


def _skew_quad(rl, rlp, d):
    """3x3 block skew(rl)^T diag(d) skew(rlp) as a dict {(a,b): tile}."""
    x, y, z = rl
    xp, yp, zp = rlp
    d1, d2, d3 = d
    return {
        (0, 0): d2 * z * zp + d3 * y * yp,
        (0, 1): -d3 * y * xp,
        (0, 2): -d2 * z * xp,
        (1, 0): -d3 * x * yp,
        (1, 1): d1 * z * zp + d3 * x * xp,
        (1, 2): -d1 * z * yp,
        (2, 0): -d2 * x * zp,
        (2, 1): -d1 * y * zp,
        (2, 2): d1 * y * yp + d2 * x * xp,
    }


def _assemble(r, b, st, mu, fzmin, fzmax, s_diag, w_diag, swing_relax):
    """Closed-form QP assembly on (8,128) tiles.

    Implements exactly ops/dynamics.py::{srb_dynamics (A side), assemble_qp,
    cone_constraints} given the precomputed, stance-masked world CoM->foot
    vectors ``r`` and SRB rhs ``b`` (balance_controller.cpp:152-153,
    274-330).

    Returns:
      Qu: 2D upper list, Qu[i][j] for i <= j.
      c:  list of N tiles.
      Grow: list of M rows; each row is a list of (local_col, tile).
      h:  list of M tiles.
    """
    f32 = jnp.float32
    sl = [f32(2.0 * s_diag[k]) for k in range(3)]      # 2*S_lin baked in
    sa = [f32(s_diag[3 + k]) for k in range(3)]        # S_ang (quad handles 2x)
    w2 = f32(2.0 * w_diag)
    one = jnp.ones_like(mu)

    # Q upper triangle: block (l, l') for l <= l'.
    Qu = [[None] * N for _ in range(N)]
    for l in range(4):
        for lp in range(l, 4):
            quad = _skew_quad(r[l], r[lp], sa)
            mm = st[l] * st[lp]
            for a in range(3):
                for bcol in range(3):
                    i, j = 3 * l + a, 3 * lp + bcol
                    if i > j:
                        continue
                    v = 2.0 * quad[(a, bcol)]
                    if a == bcol:
                        v = v + mm * sl[a]
                        if l == lp:
                            v = v + w2
                    Qu[i][j] = v

    # c = -2 A^T S b.
    bl, ba = b[:3], b[3:]
    c = [None] * N
    for l in range(4):
        x, y, z = r[l]
        c[3 * l + 0] = -(st[l] * sl[0] * bl[0]
                         + 2.0 * (sa[1] * z * ba[1] - sa[2] * y * ba[2]))
        c[3 * l + 1] = -(st[l] * sl[1] * bl[1]
                         + 2.0 * (-sa[0] * z * ba[0] + sa[2] * x * ba[2]))
        c[3 * l + 2] = -(st[l] * sl[2] * bl[2]
                         + 2.0 * (sa[0] * y * ba[0] - sa[1] * x * ba[1]))

    # Sparse cone rows + bounds.
    relax = f32(swing_relax)
    zero = jnp.zeros_like(mu)
    Grow = []
    h = []
    for l in range(4):
        for t in range(6):
            entries = []
            for k, col in enumerate(_ROW_COLS[t]):
                if col == 2 and t < 4:
                    entries.append((2, -mu))
                else:
                    entries.append((col, _ROW_SIGN[t][k] * one))
            Grow.append(entries)
        hb = [zero, zero, zero, zero, fzmax, -fzmin]
        for t in range(6):
            h.append(jnp.where(st[l] > 0.5, hb[t], relax))
    return Qu, c, Grow, h


def _equilibrate_tiles(Qu, c, Grow, h):
    """Tile-level port of solver/ipm.py::equilibrate (sparsity-preserving)."""
    f32 = jnp.float32
    Dv = [lax.rsqrt(jnp.maximum(Qu[j][j], f32(1e-12))) for j in range(N)]
    Qs = [[None] * N for _ in range(N)]
    for i in range(N):
        for j in range(i, N):
            Qs[i][j] = Qu[i][j] * Dv[i] * Dv[j]
    cs = [c[i] * Dv[i] for i in range(N)]

    Gs, Er, hs = [], [], []
    for r in range(M):
        leg = r // 6
        scaled = [(k, v * Dv[3 * leg + k]) for k, v in Grow[r]]
        rn = jnp.abs(scaled[0][1])
        for _, v in scaled[1:]:
            rn = jnp.maximum(rn, jnp.abs(v))
        er = 1.0 / jnp.maximum(rn, f32(1e-12))
        Gs.append([(k, v * er) for k, v in scaled])
        Er.append(er)
        hs.append(h[r] * er)

    cmax = jnp.abs(cs[0])
    for i in range(1, N):
        cmax = jnp.maximum(cmax, jnp.abs(cs[i]))
    nu = 1.0 / jnp.maximum(cmax, f32(1e-12))
    for i in range(N):
        cs[i] = cs[i] * nu
        for j in range(i, N):
            Qs[i][j] = Qs[i][j] * nu
    return Qs, cs, Gs, hs, Dv, Er, nu


def _sym(Qu, i, j):
    return Qu[i][j] if i <= j else Qu[j][i]


def _col_rows():
    """col (0..2) -> list of leg-local row indices with a nonzero there."""
    out = {0: [], 1: [], 2: []}
    for t in range(6):
        for col in _ROW_COLS[t]:
            out[col].append(t)
    return out


_COL_ROWS = _col_rows()


def _gx(Gs, xv, r):
    """(G x)_r via the sparse row."""
    leg = r // 6
    acc = None
    for k, g in Gs[r]:
        term = g * xv[3 * leg + k]
        acc = term if acc is None else acc + term
    return acc


def _gty(Gs, zv, i):
    """(G^T z)_i via the sparse columns."""
    leg, a = i // 3, i % 3
    acc = None
    for t in _COL_ROWS[a]:
        r = 6 * leg + t
        g = dict(Gs[r])[a]
        term = g * zv[r]
        acc = term if acc is None else acc + term
    return acc


def _barrier(Qs, cs, Gs, hs, *, iterations: int, tau: float, init=None):
    """Structured-G port of pallas_ipm._kernel's Mehrotra loop.

    Same initialization, freeze thresholds, best-iterate tracking, and step
    rules — only the G products use the sparse rows. ``init`` optionally
    replaces the cold start with a warm (x, s, z) triple of tile lists in
    EQUILIBRATED units (caller is responsible for the interior shift /
    stale-row resets — see _fused_kernel's warm path).
    """
    f32 = jnp.float32
    eps = jnp.float32(1.1920929e-07)
    d_max = 1.0 / eps
    big = jnp.float32(3.0e38)

    one = jnp.ones_like(cs[0])
    if init is None:
        x = [jnp.zeros_like(cs[0]) for _ in range(N)]
        s = [jnp.maximum(hs[r], 1.0) for r in range(M)]
        z = [one / s[r] for r in range(M)]
    else:
        x, s, z = (list(init[0]), list(init[1]), list(init[2]))

    obj_scale = cs[0] * 0.0 + 1.0
    for i in range(N):
        obj_scale = jnp.maximum(obj_scale, 1.0 + jnp.abs(cs[i]))
    h_scale = hs[0] * 0.0 + 1.0
    for r in range(M):
        h_scale = jnp.maximum(h_scale, 1.0 + jnp.abs(hs[r]))
    freeze_gap = (100.0 * eps) * obj_scale
    freeze_pr = (50.0 * eps) * h_scale
    freeze_dr = (50.0 * eps) * obj_scale

    def chol_solve(Lmat, rhs):
        y = [None] * N
        for i in range(N):
            v = rhs[i]
            for k in range(i):
                v = v - Lmat[i][k] * y[k]
            y[i] = v * Lmat[i][i]  # diag stores 1/L_ii
        u = [None] * N
        for i in reversed(range(N)):
            v = y[i]
            for k in range(i + 1, N):
                v = v - Lmat[k][i] * u[k]
            u[i] = v * Lmat[i][i]
        return u

    def body(_, carry):
        x, s, z, best = carry

        Gx = [_gx(Gs, x, r) for r in range(M)]
        r_prim = [Gx[r] + s[r] - hs[r] for r in range(M)]

        r_dual = [None] * N
        for i in range(N):
            v = cs[i]
            for j in range(N):
                v = v + _sym(Qs, i, j) * x[j]
            r_dual[i] = v + _gty(Gs, z, i)

        d = [jnp.minimum(z[r] / s[r], d_max) for r in range(M)]

        # M = Q + G^T D G: the cone term is leg-block-diagonal.
        Mm = [[None] * N for _ in range(N)]
        for i in range(N):
            for j in range(i, N):
                Mm[i][j] = Qs[i][j]
        for leg in range(4):
            for t in range(6):
                r = 6 * leg + t
                row = Gs[r]
                u = [(k, d[r] * g) for k, g in row]
                for ki, (a, ua) in enumerate(u):
                    for b, gb in row:
                        if b < a:
                            continue
                        i, j = 3 * leg + a, 3 * leg + b
                        Mm[i][j] = Mm[i][j] + ua * gb
        diag_max = Mm[0][0]
        for i in range(1, N):
            diag_max = jnp.maximum(diag_max, Mm[i][i])
        delta = (100.0 * eps) * diag_max
        for i in range(N):
            Mm[i][i] = Mm[i][i] + delta

        Lm = [[None] * N for _ in range(N)]
        for j in range(N):
            dd = Mm[j][j]
            for k in range(j):
                dd = dd - Lm[j][k] * Lm[j][k]
            dd = jnp.where(dd > 0.0, dd, jnp.float32(jnp.nan))
            inv = lax.rsqrt(dd)
            Lm[j][j] = inv
            for i in range(j + 1, N):
                v = Mm[j][i]
                for k in range(j):
                    v = v - Lm[i][k] * Lm[j][k]
                Lm[i][j] = v * inv

        def kkt_solve(rhs):
            u = chol_solve(Lm, rhs)
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
            t = [(z[r] * r_prim[r] - rc[r]) / s[r] for r in range(M)]
            rhs = [-r_dual[i] - _gty(Gs, t, i) for i in range(N)]
            dx = kkt_solve(rhs)
            Gdx = [_gx(Gs, dx, r) for r in range(M)]
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

        rc_aff = [s[r] * z[r] for r in range(M)]
        dx_a, ds_a, dz_a = newton(rc_aff)
        a_aff = jnp.minimum(max_step(s, ds_a, 1.0), max_step(z, dz_a, 1.0))

        mu_aff = (s[0] + a_aff * ds_a[0]) * (z[0] + a_aff * dz_a[0])
        for r in range(1, M):
            mu_aff = mu_aff + (s[r] + a_aff * ds_a[r]) * (z[r] + a_aff * dz_a[r])
        mu_aff = mu_aff * (1.0 / M)
        ratio = mu_aff / jnp.maximum(mu, 1e-30)
        sigma_mu = ratio * ratio * ratio * mu

        rc = [s[r] * z[r] + ds_a[r] * dz_a[r] - sigma_mu for r in range(M)]
        dx, ds, dz = newton(rc)
        alpha = jnp.minimum(max_step(s, ds, tau), max_step(z, dz, tau))

        pr_max = jnp.abs(r_prim[0])
        dr_max = jnp.abs(r_dual[0])
        for r in range(1, M):
            pr_max = jnp.maximum(pr_max, jnp.abs(r_prim[r]))
        for i in range(1, N):
            dr_max = jnp.maximum(dr_max, jnp.abs(r_dual[i]))
        done = (mu < freeze_gap) & (pr_max < freeze_pr) & (dr_max < freeze_dr)

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
        [jnp.zeros_like(cs[0]) for _ in range(N)],
        [s[r] for r in range(M)],
        [z[r] for r in range(M)],
        jnp.full_like(cs[0], jnp.inf),
    )
    x, s, z, best = lax.fori_loop(0, iterations, body, (x, s, z, best0))
    bx, bs, bz, _ = best
    return bx, bs, bz


def _tri(i, j):
    """Packed lower-triangle index (works on Python ints and tracers)."""
    return i * (i + 1) // 2 + j


_NK_TRI = NK * (NK + 1) // 2  # 666 tiles: half the dense NK^2 scratch


def _polish(Qs, cs, Gs, hs, x0, s0, z0, Ksc, Dsc, usc, *, sweeps: int,
            refine: int, a0=None, multi_swap: bool = False,
            ff_refine: bool = True):
    """Structured-G port of pallas_ipm._polish_kernel. Returns
    (x, s, z, cert) in equilibrated units.

    ``a0``: optional initial active-set guess (M tiles of 0/1). Default is
    the barrier heuristic z0 > s0 — which is NOISE for the degenerate
    4-stance family the barrier cannot solve (cond ~7.5e5: the set search
    then needs ~10-30 add/drop sweeps, scripts/tail_knobs.py). Control
    streams pass the PREVIOUS tick's certified active set instead (the
    warm carry), reducing the search to <=1 swap per tick — qpOASES's
    working-set hotstart (balance_controller.cpp:193-195), applied to the
    polish stage.

    VMEM economy: the quasidefinite KKT is stored as a PACKED LOWER TRIANGLE
    (666 tiles vs 1296 dense) and the LDL^T factor overwrites it IN PLACE —
    legal because the iterative-refinement residuals are rebuilt from the
    persistent Qs/Gs, never from K. Halving the scratch is what lets the
    polish run at rows=16 tile height (the kernel is VPU-latency-bound;
    taller tiles are the main throughput lever)."""
    f32 = jnp.float32
    eps = f32(1.1920929e-07)
    reg = f32(1e-4)
    big = f32(3.0e38)

    obj_scale = cs[0] * 0.0 + 1.0
    for i in range(N):
        obj_scale = jnp.maximum(obj_scale, 1.0 + jnp.abs(cs[i]))
    h_scale = hs[0] * 0.0 + 1.0
    for r in range(M):
        h_scale = jnp.maximum(h_scale, 1.0 + jnp.abs(hs[r]))
    zmax = z0[0]
    for r in range(1, M):
        zmax = jnp.maximum(zmax, z0[r])
    cert_dr = (30.0 * eps) * obj_scale
    feas_tol = jnp.maximum(f32(1e-6), 30.0 * eps) * h_scale
    z_tol = jnp.maximum(f32(1e-6), 30.0 * eps) * (1.0 + zmax)

    zero = jnp.zeros_like(cs[0])

    def build_K(a):
        """Write only the lower triangle (row-major packed)."""
        for i in range(N):
            for j in range(i + 1):
                Ksc[_tri(i, j)] = _sym(Qs, i, j)
        for r in range(M):
            leg = r // 6
            vals = dict(Gs[r])
            row = N + r
            for i in range(N):
                k = i - 3 * leg
                Ksc[_tri(row, i)] = a[r] * vals[k] if k in vals else zero
            for rp in range(r):
                Ksc[_tri(row, N + rp)] = zero
            Ksc[_tri(row, row)] = -(reg * a[r] + (1.0 - a[r]))

    def ldl_factor():
        """In-place packed LDL^T: each K[i,j] is read exactly once (at its
        own elimination step), so L can overwrite K with no second copy."""
        def j_body(j, _):
            bj = _tri(j, 0)
            dd = lax.fori_loop(
                0, j, lambda k, acc: acc - Ksc[bj + k]
                * Ksc[bj + k] * Dsc[k], Ksc[bj + j])
            dd = jnp.where(jnp.abs(dd) > f32(1e-30), dd, f32(jnp.nan))
            Dsc[j] = dd
            dinv = 1.0 / dd

            def i_body(i, _):
                bi = _tri(i, 0)
                v = lax.fori_loop(
                    0, j, lambda k, acc: acc - Ksc[bi + k]
                    * Dsc[k] * Ksc[bj + k], Ksc[bi + j])
                Ksc[bi + j] = v * dinv
                return 0

            lax.fori_loop(j + 1, NK, i_body, 0)
            return 0

        lax.fori_loop(0, NK, j_body, 0)

    def ldl_solve_inplace():
        def fwd(i, _):
            bi = _tri(i, 0)
            v = lax.fori_loop(
                0, i, lambda k, acc: acc - Ksc[bi + k] * usc[k], usc[i])
            usc[i] = v
            return 0

        lax.fori_loop(0, NK, fwd, 0)

        def bwd(t, _):
            i = NK - 1 - t
            v = usc[i] / Dsc[i]
            v = lax.fori_loop(
                i + 1, NK, lambda k, acc: acc - Ksc[_tri(k, i)] * usc[k], v)
            usc[i] = v
            return 0

        lax.fori_loop(0, NK, bwd, 0)

    def true_matvec_residual(a, xp, zp, rhs1, rhs2):
        r1 = [None] * N
        for i in range(N):
            v = rhs1[i]
            for j in range(N):
                v = v - _sym(Qs, i, j) * xp[j]
            leg, col = i // 3, i % 3
            for t in _COL_ROWS[col]:
                r = 6 * leg + t
                g = dict(Gs[r])[col]
                v = v - a[r] * g * zp[r]
            r1[i] = v
        r2 = [None] * M
        for r in range(M):
            v = rhs2[r] - (1.0 - a[r]) * zp[r] - a[r] * _gx(Gs, xp, r)
            r2[r] = v
        return r1, r2

    def ff_dual_residual(a, xp, zp, rhs1):
        r1 = [None] * N
        for i in range(N):
            terms = [(jnp.float32(-1.0) * _sym(Qs, i, j), xp[j])
                     for j in range(N)]
            leg, col = i // 3, i % 3
            for t in _COL_ROWS[col]:
                r = 6 * leg + t
                g = dict(Gs[r])[col]
                terms.append((-(a[r] * g), zp[r]))
            terms.append((jnp.ones_like(rhs1[i]), rhs1[i]))
            r1[i] = _ff_linear(terms)
        return r1

    def ff_primal_residual(a, xp, zp, rhs2):
        """Compensated r2 = rhs2 - (1-a) z - a G x (round-4 float-float
        EQP refinement, VERDICT #4): with plain-f32 residuals, iterative
        refinement stalls at eps*cond(K) dual error for the degenerate
        cond ~1e6 4-stance family; error-free residuals restore the
        backward-stable ~eps floor (classic mixed-precision IR)."""
        r2 = [None] * M
        for r in range(M):
            leg = r // 6
            one = jnp.ones_like(rhs2[r])
            terms = [(one, rhs2[r]), (-(1.0 - a[r]), zp[r])]
            for k, g in Gs[r]:
                terms.append((-(a[r] * g), xp[3 * leg + k]))
            r2[r] = _ff_linear(terms)
        return r2

    # NOTE: slack stays plain f32 — its feas_tol is 1e-6*h_scale, ~10x
    # above f32 Gx noise, so compensating it buys nothing (and its M
    # compensated chains pushed the rows=16 tail+prox kernel 724 KB over
    # the 16 MB scoped-VMEM ceiling when tried; the binding criterion is
    # the 30-eps DUAL residual, which ff refinement addresses).

    def sweep_body(_, carry):
        a, bx, bz, bs, cert = carry
        build_K(a)
        ldl_factor()
        rhs1 = [-cs[i] for i in range(N)]
        rhs2 = [a[r] * hs[r] for r in range(M)]
        for i in range(N):
            usc[i] = rhs1[i]
        for r in range(M):
            usc[N + r] = rhs2[r]
        ldl_solve_inplace()
        xp = [usc[i] for i in range(N)]
        zp = [usc[N + r] for r in range(M)]

        for k in range(refine):
            # Float-float residuals on the LAST refinement pass (and all
            # but the first): the early passes shrink the error by ~1e3x
            # each, where plain f32 residuals are accurate enough; the
            # final passes need error-free residuals to reach the ~30 eps
            # certification floor at cond ~1e6 (measured: plain-f32
            # refinement stalls the last ~0.2% of the trot tail).
            # ff_refine=False (the prox-internal regularized polish, which
            # accepts on the LOOSE 3e-5 criterion — ff buys nothing there)
            # keeps the prox kernel's live set inside the 16 MB VMEM
            # ceiling at rows=16.
            if not ff_refine or (k == 0 and refine > 1):
                r1, r2 = true_matvec_residual(a, xp, zp, rhs1, rhs2)
            else:
                r1 = ff_dual_residual(a, xp, zp, rhs1)
                r2 = ff_primal_residual(a, xp, zp, rhs2)
            for i in range(N):
                usc[i] = r1[i]
            for r in range(M):
                usc[N + r] = r2[r]
            ldl_solve_inplace()
            xp = [xp[i] + usc[i] for i in range(N)]
            zp = [zp[r] + usc[N + r] for r in range(M)]

        r1 = ff_dual_residual(a, xp, zp, rhs1)
        dr_max = jnp.abs(r1[0])
        for i in range(1, N):
            dr_max = jnp.maximum(dr_max, jnp.abs(r1[i]))
        slack = [hs[r] - _gx(Gs, xp, r) for r in range(M)]
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

        if multi_swap:
            # EXPERIMENTAL / measured negative result — kept as a probe,
            # default off. Swap EVERY violated/negative row at once instead
            # of one per sweep. On the degenerate 4-stance trot family this
            # is a measured NO-OP on warm seeds: the missing rows are
            # revealed one per EQP solve (each add exposes the next
            # violation — scripts/tail_polish_replica.py), so simultaneous
            # swaps cannot shortcut the search; SWEEPS are the lever
            # (63/84/95% of the hard set at 1/4/24 sweeps, ROADMAP "tail
            # anatomy"). Simultaneous swaps may also cycle in theory; the
            # compensated certification + best-iterate keep wrong sets
            # harmless.
            a_new = []
            for r in range(M):
                add_r = (-slack[r] > feas_tol) & ~(a[r] > 0.5)
                drop_r = (a[r] > 0.5) & (zp[r] < -z_tol)
                a_new.append(jnp.where(add_r, f32(1.0),
                                       jnp.where(drop_r, f32(0.0), a[r])))
        else:
            viol_best = jnp.full_like(cs[0], -big)
            viol_idx = jnp.zeros_like(cs[0])
            negz_best = jnp.full_like(cs[0], big)
            negz_idx = jnp.zeros_like(cs[0])
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
                a_new[r] = jnp.where(
                    do_add & (viol_idx == f32(r)), 1.0,
                    jnp.where(do_drop & (negz_idx == f32(r)), 0.0, a[r]))
        a = [jnp.where(cert > 0.5, a[r], a_new[r]) for r in range(M)]
        return a, bx, bz, bs, cert

    if a0 is None:
        a0 = [jnp.where(z0[r] > s0[r], f32(1.0), f32(0.0))
              for r in range(M)]
    cert0 = jnp.zeros_like(x0[0])
    carry = (a0, x0, z0, s0, cert0)
    carry = lax.fori_loop(0, sweeps, sweep_body, carry)
    _, bx, bz, bs, cert = carry
    return bx, bs, bz, cert


def _loose_conv(Qu, c, Grow, h, Dv, Er, nu, x, s, z, tol):
    """The loose original-units KKT criterion (the same formula as the
    kernel's final diag conv) for an EQUILIBRATED candidate (x, s, z) —
    used to gate prox-restart acceptance mid-kernel."""
    inv_nu = 1.0 / nu
    xo = [x[i] * Dv[i] for i in range(N)]
    zo = [z[r] * Er[r] * inv_nu for r in range(M)]
    so = [s[r] / Er[r] for r in range(M)]
    gap = so[0] * zo[0]
    pr = jnp.abs(_gx(Grow, xo, 0) + so[0] - h[0])
    for rr in range(1, M):
        gap = gap + so[rr] * zo[rr]
        pr = jnp.maximum(pr, jnp.abs(_gx(Grow, xo, rr) + so[rr] - h[rr]))
    gap = jnp.abs(gap) * (1.0 / M)
    dr = None
    for i in range(N):
        v = c[i]
        for j in range(N):
            v = v + _sym(Qu, i, j) * xo[j]
        leg, col = i // 3, i % 3
        for t in _COL_ROWS[col]:
            rr = 6 * leg + t
            g = dict(Grow[rr])[col]
            v = v + g * zo[rr]
        va = jnp.abs(v)
        dr = va if dr is None else jnp.maximum(dr, va)
    cmax = jnp.abs(c[0])
    hmax = jnp.abs(h[0])
    for i in range(1, N):
        cmax = jnp.maximum(cmax, jnp.abs(c[i]))
    for rr in range(1, M):
        hmax = jnp.maximum(hmax, jnp.abs(h[rr]))
    scale = 1.0 + cmax
    tolf = jnp.float32(tol)
    return ((pr < tolf * (1.0 + hmax)) & (dr < tolf * scale)
            & (gap < tolf * scale))


def _fused_kernel(r_ref, b_ref, st_ref, mu_ref, fzmin_ref, fzmax_ref,
                  x_ref, s_ref, z_ref, diag_ref, Ksc, Dsc, usc,
                  *, s_diag, w_diag, swing_relax, iterations, tau, tol,
                  polish, polish_sweeps, polish_refine,
                  polish_multi_swap=False, warm_refs=None,
                  prox_steps: int = 0, prox_iterations: int = 10,
                  prox_rho: float = 1e-2, prox_sweeps: int | None = None,
                  prox_cold: bool = False, ff_refine: bool = True):
    """Kernel body. Modes: full (barrier + polish), barrier-only
    (polish=False), polish-only (3-tuple warm_refs + iterations == 0 — the
    barrier is skipped and the warm (x, s, z) in ORIGINAL units seed the
    polish; lets a rows=32 barrier-only pass feed a rows=16 polish pass,
    since the polish scratch caps its tile height), and WARM-STARTED
    barrier (4-tuple warm_refs (x, s, z, st_prev) + iterations > 0 — the
    reference's qpOASES-hotstart economics, balance_controller.cpp:193-195,
    for control streams: the previous tick's solution seeds the barrier
    after a Mehrotra interior shift, and the 6 cone rows of any leg whose
    stance flag changed since st_prev are reset to the cold start, exactly
    solver/ipm.py solve_qp_ipm's warm_start + warm_reset_mask semantics).

    ``prox_steps > 0`` (requires polish): IN-KERNEL proximal restarts for
    the degenerate 4-stance family whose active set defeats the
    single-swap search (ROADMAP "tail anatomy"). Each step (run under a
    lax.fori_loop — a Python unroll costs ~60-75 s of Mosaic compile per
    step) solves min ½xᵀ(Q+ρI)x + (c−ρx_k)ᵀx with ρ = prox_rho *
    mean(diag Q) UNIFORM in original units (a proportional ρ adds nothing
    on exactly the flat directions that need stiffening — measured −0.0005
    conv), RE-EQUILIBRATES the regularized problem (its conditioning
    profile is completely different: cond ~1e6 collapses once the flat
    directions carry ρ), warm-starts the barrier from the prox iterate,
    and polishes the REGULARIZED subproblem (strongly convex, so its
    active-set search is not f32-defeated; polishing the original problem
    just re-enters the defeated search — measured −0.0005 conv).
    Acceptance is by the loose 3e-5 ORIGINAL-KKT criterion (at the prox
    fixed point the regularized optimum satisfies the original KKT to
    ρ|x_{k+1}−x_k|); accepted lanes freeze, prox iterates keep advancing.
    Each of these details was isolated by A/B on the 32k bench tail
    (2026-08-21): together they take the tail from 0.9985 to 0.9998,
    matching the round-2 XLA prox at ~1/10 the cost and compile."""
    r = [[r_ref[3 * l + k] for k in range(3)] for l in range(4)]
    b = [b_ref[i] for i in range(6)]
    st = [st_ref[l] for l in range(4)]
    mu = mu_ref[0]
    fzmin = fzmin_ref[0]
    fzmax = fzmax_ref[0]

    Qu, c, Grow, h = _assemble(r, b, st, mu, fzmin, fzmax,
                               s_diag, w_diag, swing_relax)
    Qs, cs, Gsr, hs, Dv, Er, nu = _equilibrate_tiles(Qu, c, Grow, h)

    a0_warm = None
    if iterations > 0:
        init = None
        if warm_refs is not None:
            assert len(warm_refs) == 4, "warm barrier needs (x, s, z, st_prev)"
            xin_ref, sin_ref, zin_ref, stprev_ref = warm_refs
            # Original units -> equilibrated coordinates, then the interior
            # shift (solver/ipm.py:262-265: a boundary start stalls the
            # barrier) and the stance-transition row resets (ipm.py:266-269).
            interior = jnp.float32(1e-2)
            x0 = [xin_ref[i] / Dv[i] for i in range(N)]
            s0 = [jnp.maximum(sin_ref[rr] * Er[rr], interior)
                  for rr in range(M)]
            z0 = [jnp.maximum(zin_ref[rr] * nu / Er[rr], interior)
                  for rr in range(M)]
            if polish:
                a0_warm = [None] * M
            for rr in range(M):
                leg = rr // 6
                reset = jnp.abs(st[leg] - stprev_ref[leg]) > 0.5
                s_cold = jnp.maximum(hs[rr], 1.0)
                s0[rr] = jnp.where(reset, s_cold, s0[rr])
                z0[rr] = jnp.where(reset, 1.0 / s_cold, z0[rr])
                if polish:
                    # Previous tick's certified active set (original-units
                    # z > s on the carried triple); -1 marks reset rows for
                    # the barrier-heuristic fallback below.
                    a_prev = jnp.where(zin_ref[rr] > sin_ref[rr],
                                       jnp.float32(1.0), jnp.float32(0.0))
                    a0_warm[rr] = jnp.where(reset, jnp.float32(-1.0),
                                            a_prev)
            init = (x0, s0, z0)
        x, s, z = _barrier(Qs, cs, Gsr, hs, iterations=iterations, tau=tau,
                           init=init)
    else:
        assert warm_refs is not None, "polish-only mode needs a warm start"
        xin_ref, sin_ref, zin_ref = warm_refs[:3]
        # Original units -> equilibrated coordinates.
        x = [xin_ref[i] / Dv[i] for i in range(N)]
        s = [jnp.maximum(sin_ref[rr] * Er[rr], jnp.float32(1e-30))
             for rr in range(M)]
        z = [jnp.maximum(zin_ref[rr] * nu / Er[rr], jnp.float32(1e-30))
             for rr in range(M)]
    if polish:
        a0 = None
        if a0_warm is not None:
            # Warm rows keep the previous tick's set; reset rows (-1) fall
            # back to the barrier heuristic.
            a0 = [jnp.where(a0_warm[rr] < -0.5,
                            jnp.where(z[rr] > s[rr], jnp.float32(1.0),
                                      jnp.float32(0.0)),
                            a0_warm[rr]) for rr in range(M)]
        x, s, z, cert = _polish(Qs, cs, Gsr, hs, x, s, z, Ksc, Dsc, usc,
                                sweeps=polish_sweeps, refine=polish_refine,
                                a0=a0, multi_swap=polish_multi_swap,
                                ff_refine=ff_refine)
        if prox_steps > 0:
            # In-kernel proximal restarts (see the mode docstring). The
            # prox ITERATE (xk, sk, zk) keeps advancing every step; the
            # OUTPUT (x, s, z, cert) only absorbs a step's polished result
            # on lanes it newly certifies — already-certified lanes stay
            # frozen. Equilibrated diag(Qs) == nu exactly (the Dv scaling
            # normalizes the diagonal to 1 before the nu rescale), so
            # rho = prox_rho * nu is a relative regularization.
            interior_p = jnp.float32(1e-2)
            # Regularize UNIFORMLY in ORIGINAL-variable units (the scale
            # solve_qp_prox uses): rho_orig = prox_rho * mean(diag Q_orig).
            # A proportional (equilibrated-diagonal) rho adds ~nothing on
            # exactly the flat 1e-5-curvature directions of the degenerate
            # 4-stance family — the directions the restart must stiffen
            # (measured: proportional saturates at conv 0.9992 on the
            # bench tail; uniform matches the round-2 XLA prox). In
            # equilibrated coordinates that is rho_i = rho_orig Dv_i^2 nu
            # (orig diag_i == 1/Dv_i^2 since Qs_ii == nu).
            d2 = [Dv[i] * Dv[i] for i in range(N)]
            mean_diag = d2[0] * 0.0
            for i in range(N):
                mean_diag = mean_diag + 1.0 / d2[i]
            mean_diag = mean_diag * jnp.float32(1.0 / N)
            rho_orig = jnp.float32(prox_rho) * mean_diag
            psw = polish_sweeps if prox_sweeps is None else prox_sweeps
            # Prox state in ORIGINAL units: the regularized subproblem is
            # RE-EQUILIBRATED each step (Q + rho I has a completely
            # different conditioning profile than Q for the degenerate
            # family — cond ~1e6 collapses once the flat directions carry
            # rho — and the round-2 XLA prox owed much of its efficacy to
            # its solver re-equilibrating the subproblem).
            xko = [x[i] * Dv[i] for i in range(N)]
            sko = [s[r] / Er[r] for r in range(M)]
            zko = [z[r] * Er[r] / nu for r in range(M)]
            # Acceptance mask: once a lane holds a strict-certified OR
            # loose-3e-5 point, later prox steps must not overwrite it.
            # ``cert`` itself stays the STRICT certificate (diag row 0).
            acc0 = jnp.where(cert > 0.5, jnp.float32(1.0),
                             jnp.float32(0.0))

            # The steps run under lax.fori_loop (identical body; carries
            # are f32 tiles only — Mosaic forbids bool vectors in fori
            # carries): a Python unroll costs ~60-75 s of Mosaic compile
            # PER STEP (measured 292 s at 4 steps), the rolled loop
            # compiles once.
            def _prox_body(_k, pc):
                xko, sko, zko, x, s, z, acc = pc
                xko, sko, zko = list(xko), list(sko), list(zko)
                x, s, z = list(x), list(s), list(z)
                Qup = [[None] * N for _ in range(N)]
                for i in range(N):
                    for j in range(i, N):
                        Qup[i][j] = (Qu[i][j] + rho_orig if i == j
                                     else Qu[i][j])
                cko = [c[i] - rho_orig * xko[i] for i in range(N)]
                Qsp, csp, Gsp, hsp, Dvp, Erp, nup = _equilibrate_tiles(
                    Qup, cko, Grow, h)
                if prox_cold:
                    initp = None
                else:
                    x0p = [xko[i] / Dvp[i] for i in range(N)]
                    s0p = [jnp.maximum(sko[rr] * Erp[rr], interior_p)
                           for rr in range(M)]
                    z0p = [jnp.maximum(zko[rr] * nup / Erp[rr],
                                       interior_p / s0p[rr])
                           for rr in range(M)]
                    initp = (x0p, s0p, z0p)
                xbp, sbp, zbp = _barrier(Qsp, csp, Gsp, hsp,
                                         iterations=prox_iterations,
                                         tau=tau, init=initp)
                # Polish the REGULARIZED subproblem (the decisive detail:
                # Q + rho I is strongly convex, so ITS active-set search
                # is not f32-defeated the way the original degenerate
                # family's is — re-polishing against the original problem
                # just re-enters the defeated search; the round-2 XLA prox
                # polished each regularized solve). Certification against
                # the ORIGINAL KKT happens at acceptance below: at the
                # prox fixed point the regularized optimum satisfies the
                # original KKT to rho |x_k+1 - x_k|.
                a0p = [jnp.where(zbp[rr] > sbp[rr], jnp.float32(1.0),
                                 jnp.float32(0.0)) for rr in range(M)]
                xp2p, sp2p, zp2p, _cert_reg = _polish(
                    Qsp, csp, Gsp, hsp, xbp, sbp, zbp, Ksc, Dsc, usc,
                    sweeps=psw, refine=polish_refine, a0=a0p,
                    multi_swap=polish_multi_swap, ff_refine=False)
                # Primed coords -> original -> the OUTER equilibrated
                # coords the output lives in.
                xbo = [xp2p[i] * Dvp[i] for i in range(N)]
                sbo = [sp2p[r] / Erp[r] for r in range(M)]
                zbo = [zp2p[r] * Erp[r] / nup for r in range(M)]
                xp2 = [xbo[i] / Dv[i] for i in range(N)]
                sp2 = [jnp.maximum(sbo[r] * Er[r], jnp.float32(1e-30))
                       for r in range(M)]
                zp2 = [jnp.maximum(zbo[r] * nu / Er[r],
                                   jnp.float32(1e-30)) for r in range(M)]
                # Accept on the loose 3e-5 ORIGINAL-KKT criterion (the bar
                # the round-2 XLA prox accepted at; the strict certificate
                # cannot transfer — it certifies the regularized problem).
                loose2 = _loose_conv(Qu, c, Grow, h, Dv, Er, nu,
                                     xp2, sp2, zp2, tol)
                newly = loose2 & (acc < 0.5)
                x = [jnp.where(newly, xp2[i], x[i]) for i in range(N)]
                s = [jnp.where(newly, sp2[rr], s[rr]) for rr in range(M)]
                z = [jnp.where(newly, zp2[rr], z[rr]) for rr in range(M)]
                acc = jnp.where(newly, jnp.float32(1.0), acc)
                return (tuple(xbo), tuple(sbo), tuple(zbo),
                        tuple(x), tuple(s), tuple(z), acc)

            pc = lax.fori_loop(
                0, prox_steps, _prox_body,
                (tuple(xko), tuple(sko), tuple(zko),
                 tuple(x), tuple(s), tuple(z), acc0))
            x, s, z = list(pc[3]), list(pc[4]), list(pc[5])
    else:
        cert = jnp.zeros_like(x[0])

    # Map back to original units (solve_qp_ipm's inverse scaling).
    inv_nu = 1.0 / nu
    xo = [x[i] * Dv[i] for i in range(N)]
    zo = [z[r] * Er[r] * inv_nu for r in range(M)]
    so = [s[r] / Er[r] for r in range(M)]

    # Diagnostics in ORIGINAL units (matches the solve_qp_ipm_pallas
    # wrapper's converged formula).
    r_dual = [None] * N
    for i in range(N):
        v = c[i]
        for j in range(N):
            v = v + _sym(Qu, i, j) * xo[j]
        leg, col = i // 3, i % 3
        for t in _COL_ROWS[col]:
            rr = 6 * leg + t
            g = dict(Grow[rr])[col]
            v = v + g * zo[rr]
        r_dual[i] = v
    gap = so[0] * zo[0]
    pr = jnp.abs(_gx(Grow, xo, 0) + so[0] - h[0])
    for rr in range(1, M):
        gap = gap + so[rr] * zo[rr]
        pr = jnp.maximum(pr, jnp.abs(_gx(Grow, xo, rr) + so[rr] - h[rr]))
    gap = jnp.abs(gap) * (1.0 / M)
    dr = jnp.abs(r_dual[0])
    for i in range(1, N):
        dr = jnp.maximum(dr, jnp.abs(r_dual[i]))
    cmax = jnp.abs(c[0])
    hmax = jnp.abs(h[0])
    for i in range(1, N):
        cmax = jnp.maximum(cmax, jnp.abs(c[i]))
    for rr in range(1, M):
        hmax = jnp.maximum(hmax, jnp.abs(h[rr]))
    scale = 1.0 + cmax
    tolf = jnp.float32(tol)
    conv = ((pr < tolf * (1.0 + hmax)) & (dr < tolf * scale)
            & (gap < tolf * scale)) | (cert > 0.5)

    # Scaled-units criterion (the residuals the barrier actually controls):
    # in original units the f32 complementarity floor is inflated by the
    # 1e4 swing-row slacks — the barrier-only flag under-reported at ~0.33
    # while solution quality was far better. Equilibrated scales are O(1).
    pr_s = jnp.abs(_gx(Gsr, x, 0) + s[0] - hs[0])
    gap_s = s[0] * z[0]
    for rr in range(1, M):
        pr_s = jnp.maximum(pr_s, jnp.abs(_gx(Gsr, x, rr) + s[rr] - hs[rr]))
        gap_s = gap_s + s[rr] * z[rr]
    gap_s = jnp.abs(gap_s) * (1.0 / M)
    dr_s = None
    for i in range(N):
        v = cs[i]
        for j in range(N):
            v = v + _sym(Qs, i, j) * x[j]
        leg, col = i // 3, i % 3
        for t in _COL_ROWS[col]:
            rr = 6 * leg + t
            g = dict(Gsr[rr])[col]
            v = v + g * z[rr]
        va = jnp.abs(v)
        dr_s = va if dr_s is None else jnp.maximum(dr_s, va)
    cs_max = jnp.abs(cs[0])
    hs_max = jnp.abs(hs[0])
    for i in range(1, N):
        cs_max = jnp.maximum(cs_max, jnp.abs(cs[i]))
    for rr in range(1, M):
        hs_max = jnp.maximum(hs_max, jnp.abs(hs[rr]))
    scale_s = 1.0 + cs_max
    conv = conv | ((pr_s < tolf * (1.0 + hs_max)) & (dr_s < tolf * scale_s)
                   & (gap_s < tolf * scale_s))

    for i in range(N):
        x_ref[i] = xo[i]
    for rr in range(M):
        s_ref[rr] = so[rr]
        z_ref[rr] = zo[rr]
    diag_ref[0] = cert
    diag_ref[1] = conv.astype(jnp.float32)
    diag_ref[2] = pr
    diag_ref[3] = dr
    diag_ref[4] = gap
    diag_ref[5] = jnp.zeros_like(cert)


def _assembly_kernel(r_ref, b_ref, st_ref, mu_ref, fzmin_ref, fzmax_ref,
                     Q_ref, c_ref, G_ref, h_ref,
                     *, s_diag, w_diag, swing_relax, equilibrated):
    """Debug kernel: emit the (optionally equilibrated) dense QP for tests."""
    r = [[r_ref[3 * l + k] for k in range(3)] for l in range(4)]
    b = [b_ref[i] for i in range(6)]
    st = [st_ref[l] for l in range(4)]
    Qu, c, Grow, h = _assemble(r, b, st, mu_ref[0], fzmin_ref[0],
                               fzmax_ref[0], s_diag, w_diag, swing_relax)
    if equilibrated:
        Qu, c, Grow, h, _, _, _ = _equilibrate_tiles(Qu, c, Grow, h)
    zero = jnp.zeros_like(c[0])
    for i in range(N):
        c_ref[i] = c[i]
        for j in range(N):
            Q_ref[i * N + j] = _sym(Qu, i, j)
    for rr in range(M):
        h_ref[rr] = h[rr]
        vals = dict(Grow[rr])
        leg = rr // 6
        for j in range(N):
            k = j - 3 * leg
            G_ref[rr * N + j] = vals[k] if k in vals else zero
    return


def _vec_spec(k, rows=SUB):
    return pl.BlockSpec((1, k, rows, LANE), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _prep_inputs(r_masked, b, stance, mu, fz_min, fz_max, rows=SUB):
    B = r_masked.shape[0]
    tile = rows * LANE
    assert B % tile == 0, f"batch {B} must be a multiple of {tile}"
    f32 = jnp.float32

    def bcast(v):
        return jnp.broadcast_to(jnp.asarray(v, f32), (B,))[..., None]

    rp = _pack_rows(r_masked.reshape(B, N).astype(f32), N, rows)
    bp = _pack_rows(b.astype(f32), 6, rows)
    stp = _pack_rows(stance.astype(f32), 4, rows)
    mup = _pack_rows(bcast(mu), 1, rows)
    fminp = _pack_rows(bcast(fz_min), 1, rows)
    fmaxp = _pack_rows(bcast(fz_max), 1, rows)
    return rp, bp, stp, mup, fminp, fmaxp


@partial(jax.jit, static_argnames=(
    "s_diag", "w_diag", "swing_relax", "iterations", "polish",
    "polish_sweeps", "polish_refine", "polish_multi_swap", "tol", "tau",
    "rows", "prox_steps", "prox_iterations", "prox_rho", "prox_sweeps",
    "prox_cold", "ff_refine", "interpret"))
def solve_grf_qp_fused(r_masked, b, stance, mu, fz_min, fz_max, *,
                       s_diag, w_diag, swing_relax=SWING_ROW_RELAX,
                       iterations: int = 20, polish: bool = True,
                       polish_sweeps: int = _POLISH_SWEEPS_PALLAS,
                       polish_refine: int = _POLISH_REFINE,
                       polish_multi_swap: bool = False,
                       tol: float = 3e-5, tau: float = 0.995,
                       rows: int = SUB, warm=None, warm_stance_prev=None,
                       prox_steps: int = 0, prox_iterations: int = 10,
                       prox_rho: float = 1e-2,
                       prox_sweeps: int | None = None,
                       prox_cold: bool = False,
                       ff_refine: bool = True,
                       interpret: bool = False) -> IPMSolution:
    """Fused assembly + solve of the batched GRF QP from raw SRB state.

    Args:
      r_masked: (B, 4, 3) stance-masked world-frame CoM->foot vectors
        (R @ p_foot, zeroed for swing legs — srb_dynamics' com_ft_masked).
      b: (B, 6) SRB Newton-Euler rhs [m(xddot_d + g); Iw wdot_d + w x Iw w].
      stance: (B, 4) bool/float stance mask.
      mu, fz_min, fz_max: scalars or (B,) per-instance cone parameters.
      s_diag / w_diag: STATIC objective weights (tuple of 6, float).
      rows: sublane height of the per-value tiles (8/16/32); taller tiles
        hide VPU latency (more independent instances per instruction) but
        multiply VMEM: the polish scratch is 5.3 MB at rows=8.
      warm: optional (x, s, z) in ORIGINAL units. With iterations == 0:
        polish-only mode — the kernel re-assembles/equilibrates and runs
        only the certified polish from the given point. With
        iterations > 0: WARM-STARTED barrier (the reference's hotstart
        economics for control streams) — interior-shifted, with cone rows
        reset cold for legs whose stance differs from ``warm_stance_prev``.
      warm_stance_prev: (B, 4) stance mask the warm point was solved under
        (warm-barrier mode only). Defaults to ``stance`` (no resets).

    Returns IPMSolution in original problem units; B must be a multiple of
    rows * 128.
    """
    B = r_masked.shape[0]
    rp, bp, stp, mup, fminp, fmaxp = _prep_inputs(
        r_masked, b, stance, mu, fz_min, fz_max, rows)
    inputs = [rp, bp, stp, mup, fminp, fmaxp]
    if warm is not None:
        xw, sw, zw = warm
        inputs += [_pack_rows(xw.astype(jnp.float32), N, rows),
                   _pack_rows(sw.astype(jnp.float32), M, rows),
                   _pack_rows(zw.astype(jnp.float32), M, rows)]
        if iterations > 0:
            stw = stance if warm_stance_prev is None else warm_stance_prev
            stw = jnp.broadcast_to(
                jnp.asarray(stw, jnp.float32), (B, 4))
            inputs += [_pack_rows(stw, 4, rows)]
    else:
        assert warm_stance_prev is None, "warm_stance_prev needs warm"

    xo, so, zo, diag = solve_grf_qp_fused_packed(
        *inputs, s_diag=s_diag, w_diag=w_diag, swing_relax=swing_relax,
        iterations=iterations, polish=polish, polish_sweeps=polish_sweeps,
        polish_refine=polish_refine, polish_multi_swap=polish_multi_swap,
        tol=tol, tau=tau, rows=rows, prox_steps=prox_steps,
        prox_iterations=prox_iterations, prox_rho=prox_rho,
        prox_sweeps=prox_sweeps, prox_cold=prox_cold, ff_refine=ff_refine,
        interpret=interpret)

    x = _unpack_rows(xo)
    s = _unpack_rows(so)
    z = _unpack_rows(zo)
    d = _unpack_rows(diag)
    return IPMSolution(
        x=x, z=z, s=s, iterations=jnp.asarray(iterations),
        gap=d[:, 4], primal_residual=d[:, 2], dual_residual=d[:, 3],
        converged=d[:, 1] > 0.5,
    )


def solve_grf_qp_fused_packed(rp, bp, stp, mup, fminp, fmaxp, *warm_packed,
                              s_diag, w_diag, swing_relax=SWING_ROW_RELAX,
                              iterations: int = 20, polish: bool = True,
                              polish_sweeps: int = _POLISH_SWEEPS_PALLAS,
                              polish_refine: int = _POLISH_REFINE,
                              polish_multi_swap: bool = False,
                              tol: float = 3e-5, tau: float = 0.995,
                              rows: int = SUB, prox_steps: int = 0,
                              prox_iterations: int = 10,
                              prox_rho: float = 1e-2,
                              prox_sweeps: int | None = None,
                              prox_cold: bool = False,
                              ff_refine: bool = True,
                              interpret: bool = False):
    """The fused GRF-QP kernel on PRE-PACKED (nb, k, rows, 128) tiles.

    The zero-copy entry for producers that already live in the packed lane
    layout (the fused commander kernel, sim/pallas_tick.py): no XLA pack /
    unpack transposes on either side. Returns packed (x, s, z, diag) with
    diag rows [cert, conv, pr, dr, gap, 0] (see _fused_kernel).

    ``warm_packed``: optional packed (x, s, z) triple for polish-only mode
    (iterations == 0), or a packed (x, s, z, st_prev) 4-tuple for the
    WARM-STARTED barrier (iterations > 0): the previous solution seeds the
    barrier, with cone rows of legs whose stance changed vs ``st_prev``
    reset cold. Passing zeros for (x, s, z) and -1 for st_prev reproduces
    the cold start bitwise — the natural first-tick carry init.

    The kernel is float32 internally (its literals and freeze thresholds
    are f32); inputs are cast here — a no-op on device, where the whole
    pipeline is f32 anyway.
    """
    nb = rp.shape[0]
    dtype = jnp.float32
    rp, bp, stp, mup, fminp, fmaxp = (
        a.astype(dtype) for a in (rp, bp, stp, mup, fminp, fmaxp))
    warm_packed = tuple(a.astype(dtype) for a in warm_packed)
    inputs = [rp, bp, stp, mup, fminp, fmaxp]
    in_specs = [_vec_spec(N, rows), _vec_spec(6, rows), _vec_spec(4, rows),
                _vec_spec(1, rows), _vec_spec(1, rows), _vec_spec(1, rows)]
    has_warm = len(warm_packed) in (3, 4)
    if warm_packed and not has_warm:
        raise ValueError(
            "warm_packed must be (x, s, z) or (x, s, z, st_prev)")
    has_st_prev = len(warm_packed) == 4
    if has_st_prev and iterations == 0:
        raise ValueError("(x, s, z, st_prev) warm start needs iterations > 0")
    if has_warm and not has_st_prev and iterations != 0:
        raise ValueError("(x, s, z) warm is polish-only (iterations == 0); "
                         "pass st_prev too for a warm-started barrier")
    if has_warm:
        inputs += list(warm_packed)
        in_specs += [_vec_spec(N, rows), _vec_spec(M, rows),
                     _vec_spec(M, rows)]
        if has_st_prev:
            in_specs += [_vec_spec(4, rows)]

    kern = partial(
        _fused_kernel_entry,
        s_diag=tuple(float(v) for v in s_diag), w_diag=float(w_diag),
        swing_relax=float(swing_relax), iterations=iterations, tau=tau,
        tol=tol, polish=polish, polish_sweeps=polish_sweeps,
        polish_refine=polish_refine, polish_multi_swap=polish_multi_swap,
        prox_steps=prox_steps, prox_iterations=prox_iterations,
        prox_rho=prox_rho, prox_sweeps=prox_sweeps, prox_cold=prox_cold,
        ff_refine=ff_refine, has_warm=has_warm, has_st_prev=has_st_prev)

    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[_vec_spec(N, rows), _vec_spec(M, rows), _vec_spec(M, rows),
                   _vec_spec(_N_DIAG, rows)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, N, rows, LANE), dtype),
            jax.ShapeDtypeStruct((nb, M, rows, LANE), dtype),
            jax.ShapeDtypeStruct((nb, M, rows, LANE), dtype),
            jax.ShapeDtypeStruct((nb, _N_DIAG, rows, LANE), dtype),
        ],
        # The packed-triangular LDL^T scratch is only needed when polishing
        # (the VMEM budget item: 666 tiles = 2.7 MB at rows=8, 5.5 MB at
        # rows=16).
        scratch_shapes=(
            [
                pltpu.VMEM((_NK_TRI, rows, LANE), dtype),
                pltpu.VMEM((NK, rows, LANE), dtype),
                pltpu.VMEM((NK, rows, LANE), dtype),
            ]
            if polish else []
        ),
        interpret=interpret,
    )(*inputs)


def _fused_kernel_entry(r_ref, b_ref, st_ref, mu_ref, fzmin_ref, fzmax_ref,
                        *rest, has_warm=False, has_st_prev=False, **kw):
    rest = list(rest)
    warm_refs = None
    if has_warm:
        n_w = 4 if has_st_prev else 3
        warm_refs = tuple(w[0] for w in rest[:n_w])
        rest = rest[n_w:]
    x_ref, s_ref, z_ref, diag_ref = rest[:4]
    scratch = rest[4:]
    Ksc, Dsc, usc = scratch if scratch else (None, None, None)
    _fused_kernel(r_ref[0], b_ref[0], st_ref[0], mu_ref[0], fzmin_ref[0],
                  fzmax_ref[0], x_ref.at[0], s_ref.at[0], z_ref.at[0],
                  diag_ref.at[0], Ksc, Dsc, usc, warm_refs=warm_refs, **kw)


@partial(jax.jit, static_argnames=(
    "s_diag", "w_diag", "swing_relax", "equilibrated", "interpret"))
def assemble_qp_fused_debug(r_masked, b, stance, mu, fz_min, fz_max, *,
                            s_diag, w_diag, swing_relax=SWING_ROW_RELAX,
                            equilibrated: bool = False,
                            interpret: bool = False):
    """Run ONLY the in-kernel assembly and return dense (Q, c, G, h) —
    the parity hook for tests against ops/dynamics.build_balance_qp."""
    B = r_masked.shape[0]
    nb = B // TILE
    rp, bp, stp, mup, fminp, fmaxp = _prep_inputs(
        r_masked, b, stance, mu, fz_min, fz_max)

    def kern(r_ref, b_ref, st_ref, mu_ref, fzmin_ref, fzmax_ref,
             Q_ref, c_ref, G_ref, h_ref):
        _assembly_kernel(r_ref[0], b_ref[0], st_ref[0], mu_ref[0],
                         fzmin_ref[0], fzmax_ref[0],
                         Q_ref.at[0], c_ref.at[0], G_ref.at[0], h_ref.at[0],
                         s_diag=tuple(float(v) for v in s_diag),
                         w_diag=float(w_diag),
                         swing_relax=float(swing_relax),
                         equilibrated=equilibrated)

    Qo, co, Go, ho = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[_vec_spec(N), _vec_spec(6), _vec_spec(4), _vec_spec(1),
                  _vec_spec(1), _vec_spec(1)],
        out_specs=[_vec_spec(N * N), _vec_spec(N), _vec_spec(M * N),
                   _vec_spec(M)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, N * N, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, N, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, M * N, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, M, SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(rp, bp, stp, mup, fminp, fmaxp)
    Q = _unpack(Qo).reshape(B, N, N)
    c = _unpack(co)
    G = _unpack(Go).reshape(B, M, N)
    h = _unpack(ho)
    return Q, c, G, h


@partial(jax.jit, static_argnames=(
    "s_diag", "w_diag", "swing_relax", "iterations", "polish_sweeps",
    "polish_refine", "polish_multi_swap", "tol", "tau", "barrier_rows",
    "polish_rows", "interpret"))
def solve_grf_qp_fused_split(r_masked, b, stance, mu, fz_min, fz_max, *,
                             s_diag, w_diag, swing_relax=SWING_ROW_RELAX,
                             iterations: int = 20, polish_sweeps: int = 2,
                             polish_refine: int = _POLISH_REFINE,
                             polish_multi_swap: bool = False,
                             tol: float = 3e-5, tau: float = 0.995,
                             barrier_rows: int = 32, polish_rows: int = 16,
                             interpret: bool = False) -> IPMSolution:
    """Split-phase fused solve: barrier at max tile height, polish at the
    tallest height its LDL scratch allows.

    The packed-triangular polish scratch caps the fused kernel at rows=16;
    the barrier has no scratch and runs ~2x faster at rows=32. This variant
    runs them as two pallas_calls — the barrier's (x, s, z) round-trips
    through HBM (60 f32/instance, negligible) into the polish-only mode.
    B must be a multiple of max(barrier_rows, polish_rows) * 128.
    """
    sol1 = solve_grf_qp_fused(
        r_masked, b, stance, mu, fz_min, fz_max, s_diag=s_diag,
        w_diag=w_diag, swing_relax=swing_relax, iterations=iterations,
        polish=False, tol=tol, tau=tau, rows=barrier_rows,
        interpret=interpret)
    return solve_grf_qp_fused(
        r_masked, b, stance, mu, fz_min, fz_max, s_diag=s_diag,
        w_diag=w_diag, swing_relax=swing_relax, iterations=0, polish=True,
        polish_sweeps=polish_sweeps, polish_refine=polish_refine,
        polish_multi_swap=polish_multi_swap, tol=tol,
        tau=tau, rows=polish_rows, warm=(sol1.x, sol1.s, sol1.z),
        interpret=interpret)


@partial(jax.jit, static_argnames=(
    "s_diag", "w_diag", "swing_relax", "iterations", "polish_sweeps",
    "polish_refine", "polish_multi_swap", "tail_divisor",
    "tail_iterations", "tail_sweeps", "tail_refine", "tail_prox_steps",
    "tail_prox_iterations", "tail_prox_rho", "tail_prox_sweeps", "tol",
    "tau", "rows", "split", "interpret"))
def solve_grf_qp_fused_two_phase(
        r_masked, b, stance, mu, fz_min, fz_max, *, s_diag, w_diag,
        swing_relax=SWING_ROW_RELAX, iterations: int = 20,
        polish_sweeps: int = 2, polish_refine: int = _POLISH_REFINE,
        polish_multi_swap: bool = False,
        tail_divisor: int = 8, tail_iterations: int = 48,
        tail_sweeps: int = 32, tail_refine: int = 4,
        tail_prox_steps: int = 0, tail_prox_iterations: int = 10,
        tail_prox_rho: float = 1e-2, tail_prox_sweeps: "int | None" = None,
        tol: float = 3e-5, tau: float = 0.995, rows: int = SUB,
        split: bool = False,
        interpret: bool = False) -> IPMSolution:
    """Two-phase fused solve: cheap schedule for everyone, long schedule for
    the hard tail.

    Phase 1 runs the fused kernel with a SHORT polish (most instances certify
    in 1-2 sweeps). The uncertified tail — typically ~1-5% — is compacted to
    the front of a B/tail_divisor re-solve batch by an argsort on the
    converged flag (pure on-device data movement), run through the kernel
    again with a LONG schedule, and scattered back. Average cost approaches
    the phase-1 schedule while the tail gets a longer schedule than the
    single-phase default — throughput AND convergence both improve.

    Tail schedule defaults (it=48, sweeps=32, refine=4) come from
    scripts/tail_knobs.py on harvested hard instances (degenerate
    4-stance QPs: rank-6 A^T S A + 1e-5 W, condition ~1e6): ACTIVE-SET
    SWEEPS are the decisive knob (8 -> 16 sweeps certifies 74% of the old
    failures, saturating ~84% by sweeps=32/it=48), and the 1/8-size tail is
    latency-hidden — measured conv 0.9943 -> 0.9985 at UNCHANGED marginal
    ms/batch (v5e, batch 32k). The remaining ~0.15% saturate: they sit at
    f32's stationarity floor for this conditioning.

    split=True runs phase 1 in split form (barrier at rows=32, polish-only
    at ``rows``) — see solve_grf_qp_fused_split.

    Requires B % (tail_divisor * rows * 128) == 0 (and, with split,
    B % (32 * 128) == 0).
    """
    B = r_masked.shape[0]
    Bt = B // tail_divisor
    assert Bt % (rows * LANE) == 0, (B, tail_divisor, rows)

    if split:
        sol1 = solve_grf_qp_fused_split(
            r_masked, b, stance, mu, fz_min, fz_max, s_diag=s_diag,
            w_diag=w_diag, swing_relax=swing_relax, iterations=iterations,
            polish_sweeps=polish_sweeps, polish_refine=polish_refine,
            polish_multi_swap=polish_multi_swap,
            tol=tol, tau=tau, polish_rows=rows, interpret=interpret)
    else:
        sol1 = solve_grf_qp_fused(
            r_masked, b, stance, mu, fz_min, fz_max, s_diag=s_diag,
            w_diag=w_diag, swing_relax=swing_relax, iterations=iterations,
            polish=True, polish_sweeps=polish_sweeps,
            polish_refine=polish_refine,
            polish_multi_swap=polish_multi_swap, tol=tol, tau=tau,
            rows=rows, interpret=interpret)

    # Unconverged instances first (stable order); take the first Bt slots.
    order = jnp.argsort(sol1.converged.astype(jnp.int32), stable=True)
    idx = order[:Bt]

    def take(a):
        return a[idx]

    mu_b = jnp.broadcast_to(jnp.asarray(mu, jnp.float32), (B,))
    fmin_b = jnp.broadcast_to(jnp.asarray(fz_min, jnp.float32), (B,))
    fmax_b = jnp.broadcast_to(jnp.asarray(fz_max, jnp.float32), (B,))
    # tail_prox_steps > 0 folds the certification prox restarts INTO this
    # same tail dispatch (the in-kernel prox, _fused_kernel docstring) —
    # one kernel instead of the separate XLA prox stage, ~10x cheaper and
    # far cheaper to compile.
    sol2 = solve_grf_qp_fused(
        take(r_masked), take(b), take(stance), take(mu_b), take(fmin_b),
        take(fmax_b), s_diag=s_diag, w_diag=w_diag,
        swing_relax=swing_relax, iterations=tail_iterations, polish=True,
        polish_sweeps=tail_sweeps,
        polish_refine=polish_refine if tail_refine is None else tail_refine,
        polish_multi_swap=polish_multi_swap, tol=tol, tau=tau, rows=rows,
        prox_steps=tail_prox_steps,
        prox_iterations=tail_prox_iterations, prox_rho=tail_prox_rho,
        prox_sweeps=tail_prox_sweeps,
        interpret=interpret)

    # Scatter the re-solve back wherever it improved the flag.
    better = sol2.converged & ~sol1.converged[idx]

    def merge(a1, a2):
        upd = better.reshape(better.shape + (1,) * (a2.ndim - 1))
        return a1.at[idx].set(jnp.where(upd, a2, a1[idx]))

    return IPMSolution(
        x=merge(sol1.x, sol2.x),
        z=merge(sol1.z, sol2.z),
        s=merge(sol1.s, sol2.s),
        iterations=jnp.asarray(iterations + tail_iterations),
        gap=merge(sol1.gap, sol2.gap),
        primal_residual=merge(sol1.primal_residual, sol2.primal_residual),
        dual_residual=merge(sol1.dual_residual, sol2.dual_residual),
        converged=merge(sol1.converged, sol2.converged),
    )


def srb_rhs(R, w_d, xddot_d, wdot_d, cfg: BalanceConfig,
            mass=None, inertia_diag=None):
    """The SRB Newton-Euler right-hand side b (srb_dynamics' b, without
    materializing A — balance_controller.cpp:237-272)."""
    dtype = R.dtype
    m = jnp.asarray(cfg.mass if mass is None else mass, dtype=dtype)
    Ib = jnp.asarray(
        cfg.inertia_diag if inertia_diag is None else inertia_diag,
        dtype=dtype)
    gvec = jnp.array([0.0, 0.0, cfg.gravity_z_term], dtype=dtype)
    b_lin = m[..., None] * (xddot_d + gvec)
    Iw = R * Ib[..., None, :] @ jnp.swapaxes(R, -1, -2)
    Iw_wd = (Iw @ w_d[..., None])[..., 0]
    b_ang = (Iw @ wdot_d[..., None])[..., 0] + jnp.cross(w_d, Iw_wd)
    return jnp.concatenate([b_lin, b_ang], axis=-1)


def solve_balance_qp_fused(R, R_d, x, xdot, w, x_d, xdot_d, w_d,
                           foot_positions, stance_mask,
                           cfg: BalanceConfig = BalanceConfig(),
                           mass=None, inertia_diag=None, mu=None,
                           fz_min=None, fz_max=None,
                           iterations: int = 20, polish: bool = True,
                           polish_sweeps: int = _POLISH_SWEEPS_PALLAS,
                           polish_refine: int = _POLISH_REFINE,
                           polish_multi_swap: bool = False,
                           rows: int = SUB, two_phase: bool = False,
                           tail_divisor: int = 8, tail_iterations: int = 48,
                           tail_sweeps: int = 32, tail_refine: int = 4,
                           tail_prox_steps: int = 0,
                           tail_prox_iterations: int = 10,
                           tail_prox_sweeps: int | None = None,
                           split: bool = False, prox_tail: bool = False,
                           prox_divisor: int = 64, prox_rho: float = 1e-2,
                           prox_steps: int = 4, prox_iterations: int = 30,
                           prox_backend: str = "kernel",
                           prox_sweeps: int = 8, prox_cold: bool = False,
                           interpret: bool = False) -> IPMSolution:
    """End-to-end fused balance-controller solve: the XLA side computes only
    the tiny per-instance precursors (PD accelerations, masked world foot
    vectors, the 6-vector rhs); assembly and the solve run in the kernel.

    Drop-in replacement for build_balance_qp + solve_qp_ipm_pallas
    (reference hot path balance_controller.cpp:98-235). Any batch shape is
    accepted: inputs are flattened and padded to the rows*128 tile multiple
    (pad instances replicate instance 0 and are stripped from the result),
    so the commander/rollout path can route large sweeps through the kernel
    without aligning its own batch sizes.

    prox_tail=True adds a THIRD phase for certification-critical sweeps:
    the residual uncertified instances (the degenerate 4-stance family the
    kernel tail saturates on) are compacted into a B/prox_divisor slice
    and re-solved by proximal restarts. prox_backend:
      - "kernel" (default, round 3): the IN-KERNEL prox mode of the fused
        kernel (_fused_kernel docstring — uniform original-units rho,
        re-equilibrated regularized subproblem, regularized polish,
        loose-original-KKT acceptance, steps under lax.fori). bench.py
        measured 2026-08-21 at 32k: conv 0.9998 at 1.357M QPs/s marginal
        with the i24/s16 two-phase tail — +18% over the XLA stage at
        equal certification and ~1/3 the first compile.
      - "xla": the round-2 stage (dense assembly + solve_qp_ipm_pallas
        restarts; ~15 ms + ~200 s compile at 32k), kept for A/B.
    QCT_BENCH_PROX=0 selects the two-phase-only throughput point
    (~2.3M marginal, conv ~0.9985).
    """
    xddot_d, wdot_d = pd_accelerations(R, R_d, x, xdot, w, x_d, xdot_d, w_d,
                                       cfg)
    com_ft = jnp.einsum("...ij,...lj->...li", R, foot_positions)
    r_masked = jnp.where(stance_mask[..., None], com_ft, 0.0)
    b = srb_rhs(R, w_d, xddot_d, wdot_d, cfg, mass=mass,
                inertia_diag=inertia_diag)

    batch_shape = jnp.broadcast_shapes(
        r_masked.shape[:-2], b.shape[:-1], stance_mask.shape[:-1])
    B = 1
    for d in batch_shape:
        B *= int(d)
    # Two-phase needs the tail slice (B / tail_divisor) tile-aligned too.
    tile = rows * LANE * (tail_divisor if two_phase else 1)
    Bp = ((B + tile - 1) // tile) * tile

    def flat(a, tail):
        a = jnp.broadcast_to(a, batch_shape + tail).reshape((B,) + tail)
        if Bp > B:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (Bp - B,) + tail)], axis=0)
        return a

    def flat_param(v):
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0:
            return v
        return flat(v, ())

    args = (
        flat(r_masked, (4, 3)), flat(b, (6,)),
        flat(stance_mask.astype(jnp.float32), (4,)),
        flat_param(cfg.mu if mu is None else mu),
        flat_param(cfg.fz_min if fz_min is None else fz_min),
        flat_param(cfg.fz_max if fz_max is None else fz_max),
    )
    common = dict(
        s_diag=tuple(cfg.s_diag), w_diag=float(cfg.w_diag),
        polish_sweeps=polish_sweeps, polish_refine=polish_refine,
        polish_multi_swap=polish_multi_swap,
        rows=rows, interpret=interpret,
    )
    if two_phase:
        sol = solve_grf_qp_fused_two_phase(
            *args, iterations=iterations, tail_divisor=tail_divisor,
            tail_iterations=tail_iterations, tail_sweeps=tail_sweeps,
            tail_refine=tail_refine, tail_prox_steps=tail_prox_steps,
            tail_prox_iterations=tail_prox_iterations,
            tail_prox_sweeps=tail_prox_sweeps, split=split,
            **common)
    else:
        sol = solve_grf_qp_fused(
            *args, iterations=iterations, polish=polish, **common)
    if prox_tail:
        from quadruped_control_tpu.math.rotations import skew
        from quadruped_control_tpu.ops.dynamics import (
            assemble_qp,
            cone_constraints,
        )
        from quadruped_control_tpu.solver.ipm import solve_qp_prox

        # The prox subproblems run in the generic Pallas IPM kernel
        # (solve_qp_ipm_pallas, batch % 1024 == 0): the dense jnp path at
        # this batch is ~14x slower (192 ms vs ~25 ms measured, 16k batch).
        Bt = max(Bp // prox_divisor, 1)
        if Bp >= TILE:
            Bt = ((max(Bt, TILE) + TILE - 1) // TILE) * TILE
        order = jnp.argsort(sol.converged.astype(jnp.int32), stable=True)
        idx = order[:Bt]

        def take(v):
            v = jnp.asarray(v, jnp.float32)
            return v if v.ndim == 0 else v[idx]

        if prox_backend == "kernel":
            # Round-3 path: the in-kernel proximal restarts
            # (_fused_kernel prox mode) on the compacted slice — one
            # fused dispatch instead of dense assembly + prox_steps
            # generic-IPM solves; ~10x cheaper and far cheaper to
            # compile, same certify-against-original-KKT semantics.
            # rows=8 for the prox stage: the re-equilibrated subproblem
            # keeps a second scaled system live in VMEM — rows=16 overruns
            # the 16 MB scoped ceiling by ~0.2-0.7 MB (measured); rows=8
            # halves the footprint at the same per-tile sweep latency.
            prox_rows = min(rows, 8)
            tile_k = prox_rows * LANE
            Bt = min(((Bt + tile_k - 1) // tile_k) * tile_k, Bp)
            idx = order[:Bt]
            psol = solve_grf_qp_fused(
                args[0][idx].reshape(Bt, 4, 3), args[1][idx],
                args[2][idx], take(args[3]), take(args[4]), take(args[5]),
                s_diag=tuple(cfg.s_diag), w_diag=float(cfg.w_diag),
                iterations=0, polish=True, polish_sweeps=prox_sweeps,
                # Forward the refine depth the phase-1/two-phase solves use
                # so the prox stage certifies under the SAME arithmetic
                # (tol/tau/swing_relax are the shared module defaults).
                polish_refine=polish_refine,
                warm=(sol.x[idx], sol.s[idx], sol.z[idx]),
                prox_steps=prox_steps, prox_iterations=prox_iterations,
                prox_rho=prox_rho, prox_sweeps=prox_sweeps,
                prox_cold=prox_cold, rows=prox_rows,
                interpret=interpret)
            better = psol.converged & ~sol.converged[idx]

            def pmerge0(a1, a2):
                upd = better.reshape(better.shape + (1,) * (a2.ndim - 1))
                return a1.at[idx].set(jnp.where(upd, a2, a1[idx]))

            sol = IPMSolution(
                x=pmerge0(sol.x, psol.x), z=pmerge0(sol.z, psol.z),
                s=pmerge0(sol.s, psol.s), iterations=sol.iterations,
                gap=pmerge0(sol.gap, psol.gap),
                primal_residual=pmerge0(sol.primal_residual,
                                        psol.primal_residual),
                dual_residual=pmerge0(sol.dual_residual,
                                      psol.dual_residual),
                converged=pmerge0(sol.converged, psol.converged),
            )
    if prox_tail and prox_backend != "kernel":
        rm = args[0][idx]          # (Bt, 4, 3) stance-masked world levers
        bb = args[1][idx]          # (Bt, 6)
        stl = args[2][idx] > 0.5   # (Bt, 4)
        eye3 = jnp.eye(3, dtype=rm.dtype)
        top = jnp.concatenate(
            [eye3 * stl[:, l, None, None] for l in range(4)], axis=-1)
        bot = jnp.concatenate([skew(rm[:, l]) for l in range(4)], axis=-1)
        A = jnp.concatenate([top, bot], axis=-2)   # (Bt, 6, 12)
        Qd, cd = assemble_qp(A, bb, cfg)
        Gd, hd = cone_constraints(stl, mu=take(args[3]),
                                  fz_min=take(args[4]),
                                  fz_max=take(args[5]), cfg=cfg,
                                  dtype=rm.dtype)
        if Bt % TILE == 0 and not interpret:
            from quadruped_control_tpu.solver.pallas_ipm import (
                solve_qp_ipm_pallas,
            )

            diagq = jnp.einsum("...ii->...i", Qd)
            rho = prox_rho * diagq.mean(-1)[..., None]
            Qp = Qd + rho[..., None] * jnp.eye(12, dtype=Qd.dtype)
            xk = sol.x[idx]
            ps = None
            for _ in range(prox_steps):
                ps = solve_qp_ipm_pallas(Qp, cd - rho * xk, Gd, hd,
                                         iterations=prox_iterations,
                                         polish=True, tol=3e-5)
                xk = ps.x
            # Certify against the ORIGINAL KKT (solve_qp_prox's criterion).
            tolf = jnp.float32(3e-5)
            pr = jnp.abs(jnp.einsum("...ij,...j->...i", Gd, xk)
                         + ps.s - hd).max(-1)
            dr = jnp.abs(jnp.einsum("...ij,...j->...i", Qd, xk) + cd
                         + jnp.einsum("...ij,...i->...j", Gd, ps.z)).max(-1)
            gap = jnp.abs(jnp.einsum("...i,...i->...", ps.s, ps.z)) / 24.0
            scalec = 1.0 + jnp.abs(cd).max(-1)
            hmax = 1.0 + jnp.abs(hd).max(-1)
            pconv = ((pr < tolf * hmax) & (dr < tolf * scalec)
                     & (gap < tolf * scalec))
            psol = IPMSolution(x=xk, z=ps.z, s=ps.s,
                               iterations=ps.iterations, gap=gap,
                               primal_residual=pr, dual_residual=dr,
                               converged=pconv)
        else:
            psol = solve_qp_prox(Qd, cd, Gd, hd, x0=sol.x[idx],
                                 rho_rel=prox_rho, prox_steps=prox_steps,
                                 iterations=prox_iterations, tol=3e-5)
        better = psol.converged & ~sol.converged[idx]

        def pmerge(a1, a2):
            upd = better.reshape(better.shape + (1,) * (a2.ndim - 1))
            return a1.at[idx].set(jnp.where(upd, a2, a1[idx]))

        sol = IPMSolution(
            x=pmerge(sol.x, psol.x), z=pmerge(sol.z, psol.z),
            s=pmerge(sol.s, psol.s), iterations=sol.iterations,
            gap=pmerge(sol.gap, psol.gap),
            primal_residual=pmerge(sol.primal_residual,
                                   psol.primal_residual),
            dual_residual=pmerge(sol.dual_residual, psol.dual_residual),
            converged=pmerge(sol.converged, psol.converged),
        )

    if Bp == B and len(batch_shape) == 1:
        return sol

    def unflat(a, tail):
        return a[:B].reshape(batch_shape + tail)

    return IPMSolution(
        x=unflat(sol.x, (N,)), z=unflat(sol.z, (M,)), s=unflat(sol.s, (M,)),
        iterations=sol.iterations, gap=unflat(sol.gap, ()),
        primal_residual=unflat(sol.primal_residual, ()),
        dual_residual=unflat(sol.dual_residual, ()),
        converged=unflat(sol.converged, ()),
    )


def solve_grf_qp_tail_packed(rp, bp, stp, mup, fminp, fmaxp,
                             xp, sp, zp, diagp, *, s_diag, w_diag,
                             swing_relax=SWING_ROW_RELAX,
                             tail_divisor: int = 4, tail_rows: int = 8,
                             tail_sweeps: int = 24,
                             tail_refine: int = _POLISH_REFINE,
                             tail_prox_steps: int = 2,
                             tail_prox_iterations: int = 8,
                             tail_prox_rho: float = 1e-2,
                             tail_prox_sweeps: int | None = None,
                             tol: float = 3e-5, tau: float = 0.995,
                             tail_ff: bool = False,
                             interpret: bool = False):
    """Certification tail for the IN-LOOP fused tick (VERDICT round-2 #1).

    Takes the packed inputs + phase-1 solution of
    :func:`solve_grf_qp_fused_packed` (typically a warm barrier-only tick
    solve), compacts the UNCERTIFIED instances to a ``B / tail_divisor``
    slice by an argsort on the converged flag (the two-phase bench trick,
    solve_grf_qp_fused_two_phase), and re-solves only that slice with the
    long warm-seeded polish + IN-KERNEL proximal restarts (prox_steps /
    prox_iterations — the instrument for the f32 single-swap-defeating
    4-stance family, ROADMAP "tail anatomy"; the bench's XLA prox tail is
    ~10-30x too slow for a 1 ms tick budget). Improved instances scatter
    back into (x, s, z, diag), so the scan's warm carry ALSO inherits the
    certified triple.

    All arrays stay packed (nb, k, rows, 128); the only XLA glue is the
    transpose-gather-scatter of ~90 f32 values per instance. Requires
    ``B % (tail_rows * 128) == 0`` (any main-kernel rows >= tail_rows
    satisfies this). Returns updated packed (x, s, z, diag).
    """
    if tail_ff and tail_rows > 8 and tail_prox_steps > 0:
        # Make the config downgrade VISIBLE (round-4 advisor): the ff
        # scratch cannot fit next to the prox machinery above rows=8
        # (16 MB scoped VMEM + 1.18 MB measured overrun), so ff_refine is
        # forced off below rather than OOM-ing the kernel.
        import warnings

        warnings.warn(
            "tail_ff=True requested with tail_rows="
            f"{tail_rows} > 8 and prox_steps={tail_prox_steps} > 0: "
            "float-float refinement is force-disabled (scoped-VMEM "
            "ceiling). Use tail_rows<=8 or prox_steps=0 to keep it.",
            stacklevel=2)
    rows_main = rp.shape[2]
    B = rp.shape[0] * rows_main * LANE
    tile2 = tail_rows * LANE
    assert B % tile2 == 0, (B, tail_rows)
    Bt = max(B // tail_divisor, tile2)
    Bt = min(((Bt + tile2 - 1) // tile2) * tile2, B)

    r_f = _unpack_rows(rp)          # (B, 12)
    b_f = _unpack_rows(bp)          # (B, 6)
    st_f = _unpack_rows(stp)        # (B, 4)
    mu_f = _unpack_rows(mup)[:, 0]
    fmin_f = _unpack_rows(fminp)[:, 0]
    fmax_f = _unpack_rows(fmaxp)[:, 0]
    x_f = _unpack_rows(xp)
    s_f = _unpack_rows(sp)
    z_f = _unpack_rows(zp)
    d_f = _unpack_rows(diagp)       # (B, 6) [cert, conv, pr, dr, gap, 0]
    conv = d_f[:, 1] > 0.5

    order = jnp.argsort(conv.astype(jnp.int32), stable=True)
    idx = order[:Bt]

    # Dispatch at the PACKED level so the tail solve's full diag row set is
    # available: row 0 is the STRICT certificate, which must come from the
    # tail solve itself — merged lanes accepted only by the loose conv flag
    # (row 1) must not inherit an unearned strict-cert bit (round-3 advisor
    # finding).
    rp2, bp2, stp2, mup2, fminp2, fmaxp2 = _prep_inputs(
        r_f[idx].reshape(Bt, 4, 3), b_f[idx], st_f[idx], mu_f[idx],
        fmin_f[idx], fmax_f[idx], tail_rows)
    xo2, so2, zo2, do2 = solve_grf_qp_fused_packed(
        rp2, bp2, stp2, mup2, fminp2, fmaxp2,
        _pack_rows(x_f[idx], N, tail_rows),
        _pack_rows(s_f[idx], M, tail_rows),
        _pack_rows(z_f[idx], M, tail_rows),
        s_diag=s_diag, w_diag=w_diag,
        swing_relax=swing_relax, iterations=0, polish=True,
        polish_sweeps=tail_sweeps, polish_refine=tail_refine,
        tol=tol, tau=tau, rows=tail_rows,
        prox_steps=tail_prox_steps, prox_iterations=tail_prox_iterations,
        prox_rho=tail_prox_rho, prox_sweeps=tail_prox_sweeps,
        # tail_ff default False: float-float refinement measured
        # TRAJECTORY-DIVERGENT in the closed loop (deterministic 600-tick
        # trot: conv 0.9983 -> 0.9867 — slightly different tick forces
        # land the loop in a different marginal-instance family; on FIXED
        # problem sets the bench measures ff conv-neutral). It also
        # cannot fit next to the prox machinery at rows=16 (16 MB scoped
        # VMEM + 1.18 MB measured).
        ff_refine=tail_ff and (tail_rows <= 8 or tail_prox_steps == 0),
        interpret=interpret)
    x2, s2, z2 = _unpack_rows(xo2), _unpack_rows(so2), _unpack_rows(zo2)
    d2 = _unpack_rows(do2)
    better = (d2[:, 1] > 0.5) & ~conv[idx]

    def merge(a1, a2):
        upd = better.reshape(better.shape + (1,) * (a2.ndim - 1))
        return a1.at[idx].set(jnp.where(upd, a2, a1[idx]))

    x_f = merge(x_f, x2)
    s_f = merge(s_f, s2)
    z_f = merge(z_f, z2)
    d_f = merge(d_f, d2)

    return (_pack_rows(x_f, N, rows_main), _pack_rows(s_f, M, rows_main),
            _pack_rows(z_f, M, rows_main),
            _pack_rows(d_f, _N_DIAG, rows_main))
