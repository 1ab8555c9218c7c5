"""Pallas TPU kernel: the WHOLE receding-horizon MPC solve per vector lane.

BASELINE config 4 measurements (v5e, batch 1024, N=10, f32): the condensed
solver (mpc/horizon.py) takes ~830 ms/batch — XLA's batched 120x120
factorizations are slow — and the XLA-scan Riccati (mpc/structured.py)
~2 s — 1200 sequential tiny batched ops are latency city. This kernel runs
the ENTIRE primal-dual interior-point MPC solve inside one ``pallas_call``,
one instance per lane (the GRF-kernel recipe, solver/pallas_fused.py):

  - per-step data assembled in-kernel from raw SRB state (~70 f32/instance:
    yaw, foot levers, inertia, xi0, reference, contact schedule);
  - the sparse structure is exploited everywhere: A = I + dt*S with 9
    nonzeros in S, B has 4 dense 3x3 lever blocks + a diagonal, the friction
    cone rows have <= 2 nonzeros (ops/dynamics.py pattern);
  - each IPM iteration solves its Newton system by a backward Riccati sweep
    + forward rollout (``lax.fori_loop`` over the horizon, small bodies —
    the remote Mosaic compiler chokes on >~10k unrolled statements);
  - the per-step feedback gains K_t (12x13 tiles) do NOT fit VMEM for the
    whole horizon: they are DMA-streamed to an HBM buffer during the
    backward sweep and streamed back in the forward pass (~12 MB round trip
    per grid step, ~15 us at HBM bandwidth — free next to the compute);
  - single-direction path-following (fixed centering sigma) instead of
    Mehrotra: the corrector would need either per-step P or Luu-factor
    storage; extra iterations are cheaper than the VMEM.

Scaling mirrors mpc/structured.py: forces in units of sigma_f = 120 N,
cost normalized by nu = 1/max|c'| (computed in-kernel by one adjoint
rollout); the converged flag is evaluated in these scaled units.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadruped_control_tpu.config import GRAVITY, ControlConfig
from quadruped_control_tpu.ops.dynamics import SWING_ROW_RELAX
from quadruped_control_tpu.solver.ipm import IPMSolution
from quadruped_control_tpu.solver.pallas_ipm import LANE

NX = 13
NU = 12
MC = 24  # cone rows per step
ROWS = 8
TILE = ROWS * LANE
SIGMA_F = 120.0  # force scale (fz_max)

# Cone row sparsity (ops/dynamics.py friction_cone_rows).
_ROW_COLS = ((0, 2), (1, 2), (1, 2), (0, 2), (2,), (2,))
_ROW_SIGN = ((1.0, None), (1.0, None), (-1.0, None), (-1.0, None),
             (1.0,), (-1.0,))
_COL_ROWS = {0: (0, 3), 1: (1, 2), 2: (0, 1, 2, 3, 4, 5)}

_NU_TRI = NU * (NU + 1) // 2


def _tri(i, j):
    return i * (i + 1) // 2 + j


def _g_entries(mu, t, vzero):
    """Scaled cone-row entries for leg-row type t: [(local_col, tile)].
    Rows act on the SCALED forces, so every entry carries sigma_f."""
    sf = jnp.float32(SIGMA_F)
    out = []
    for k, col in enumerate(_ROW_COLS[t]):
        if col == 2 and t < 4:
            out.append((2, -sf * mu))
        else:
            out.append((col, jnp.float32(_ROW_SIGN[t][k]) * sf + vzero))
    return out


def _mpc_kernel(yaw_ref, r_ref, mIb_ref, mu_ref, fz_ref, xi0_ref, ref_ref,
                st_ref, F_ref, diag_ref, Kout,
                Psc, PAsc, PBsc, Lsc, Dsc, Lxsc, Kstg, kst,
                Fsc, ssc, zsc, rpsc, rdsc, dFsc, csc, hsc, bFsc, dma_sem,
                *, n_steps, dt, state_weights, alpha, iterations,
                sigma_c, tau, tol, use_hbm_k=True, warm_refs=None,
                warm_out=None):
    f32 = jnp.float32
    N = n_steps
    # Long horizons brush the 16 MB VMEM ceiling (N=20 missed by 16 KB):
    # drop the best-iterate buffer there — freeze + NaN-gated updates keep
    # the final iterate sound on their own.
    track_best = N <= 16
    eps = f32(1.1920929e-07)
    d_max = 1.0 / eps
    big = f32(3.0e38)
    tiny = f32(1e-12)

    yaw = yaw_ref[0]
    r = [[r_ref[3 * l + k] for k in range(3)] for l in range(4)]
    m = mIb_ref[0]
    Ib = [mIb_ref[1 + k] for k in range(3)]
    mu = mu_ref[0]
    # Data-dependent zero: constant splats carried through lax.fori_loop
    # trip Mosaic's relayout ("non-singleton dimension replicated in
    # destination"); deriving zeros from a loaded vector keeps every loop
    # carry in a concrete (8, 128) layout.
    vzero = mu * 0.0
    fzmin = fz_ref[0]
    fzmax = fz_ref[1]
    xi0 = [xi0_ref[i] for i in range(NX)]

    cy = jnp.cos(yaw)
    sy = jnp.sin(yaw)

    # ---- dynamics data ---------------------------------------------------
    # Iw = Rz diag(Ib) Rz^T (closed form), then Iw^-1 by adjugate.
    Ixx = cy * cy * Ib[0] + sy * sy * Ib[1]
    Ixy = cy * sy * (Ib[0] - Ib[1])
    Iyy = sy * sy * Ib[0] + cy * cy * Ib[1]
    Izz = Ib[2]
    det2 = Ixx * Iyy - Ixy * Ixy
    inv2 = 1.0 / det2
    Wxx = Iyy * inv2
    Wxy = -Ixy * inv2
    Wyy = Ixx * inv2
    Wzz = 1.0 / Izz
    # Iw_inv = [[Wxx, Wxy, 0], [Wxy, Wyy, 0], [0, 0, Wzz]]
    Winv = ((Wxx, Wxy, vzero),
            (Wxy, Wyy, vzero),
            (vzero, vzero, Wzz))

    # Bw[l][c][a] = sigma_f * dt * (Iw_inv @ skew(r_l))[c][a]
    sfdt = f32(SIGMA_F * dt)
    Bw = []
    for l in range(4):
        x_, y_, z_ = r[l]
        sk = ((vzero, -z_, y_),
              (z_, vzero, -x_),
              (-y_, x_, vzero))
        blk = []
        for c in range(3):
            row = []
            for a in range(3):
                v = Winv[c][0] * sk[0][a] + Winv[c][1] * sk[1][a] \
                    + Winv[c][2] * sk[2][a]
                row.append(sfdt * v)
            blk.append(row)
        Bw.append(blk)
    bm = sfdt / m  # rows 9-11 diagonal, every leg

    dtf = f32(dt)
    g_dt = f32(GRAVITY * dt)

    def Amv(v):
        """A @ v with A = I + dt*S (S sparse, see srb_discrete_dynamics)."""
        out = list(v)
        out[0] = out[0] + dtf * (cy * v[6] + sy * v[7])
        out[1] = out[1] + dtf * (-sy * v[6] + cy * v[7])
        out[2] = out[2] + dtf * v[8]
        out[3] = out[3] + dtf * v[9]
        out[4] = out[4] + dtf * v[10]
        out[5] = out[5] + dtf * v[11]
        out[11] = out[11] - g_dt * v[12]
        return out

    def Atmv(v):
        out = list(v)
        out[6] = out[6] + dtf * (cy * v[0] - sy * v[1])
        out[7] = out[7] + dtf * (sy * v[0] + cy * v[1])
        out[8] = out[8] + dtf * v[2]
        out[9] = out[9] + dtf * v[3]
        out[10] = out[10] + dtf * v[4]
        out[11] = out[11] + dtf * v[5]
        out[12] = out[12] - g_dt * v[11]
        return out

    def masks_at(t):
        return [st_ref[0, t * 4 + l] for l in range(4)]

    def Bmv(u, mk):
        """B' @ u (u: 12 tiles, mk: 4 stance tiles) -> 13 tiles."""
        um = [mk[l] * u[3 * l + a] for l in range(4) for a in range(3)]
        out = [vzero for _ in range(NX)]
        for l in range(4):
            for c in range(3):
                acc = out[6 + c]
                for a in range(3):
                    acc = acc + Bw[l][c][a] * um[3 * l + a]
                out[6 + c] = acc
        for a in range(3):
            acc = out[9 + a]
            for l in range(4):
                acc = acc + bm * um[3 * l + a]
            out[9 + a] = acc
        return out

    def Btmv(v, mk):
        """B'^T @ v -> 12 tiles."""
        out = []
        for l in range(4):
            for a in range(3):
                acc = bm * v[9 + a]
                for c in range(3):
                    acc = acc + Bw[l][c][a] * v[6 + c]
                out.append(mk[l] * acc)
        return out

    # ---- cone data -------------------------------------------------------
    Grow = []  # per leg-row type: [(col, tile)] in scaled units
    for t in range(6):
        Grow.append(_g_entries(mu, t, vzero))
    relax = f32(SWING_ROW_RELAX)
    zero = vzero
    hb = [zero, zero, zero, zero, fzmax, -fzmin]
    for t in range(N):
        for l in range(4):
            stl = st_ref[0, t * 4 + l]
            for ty in range(6):
                hsc[t * MC + 6 * l + ty] = jnp.where(
                    stl > 0.5, hb[ty], relax)

    def gx_row(u, rr):
        """(G u)_row for leg-row rr (0..23) of one step; u: 12 tiles."""
        leg, ty = rr // 6, rr % 6
        acc = None
        for k, g in Grow[ty]:
            term = g * u[3 * leg + k]
            acc = term if acc is None else acc + term
        return acc

    def gty_col(zv, i):
        """(G^T zv)_i; zv: 24 tiles of one step."""
        leg, a = i // 3, i % 3
        acc = None
        for ty in _COL_ROWS[a]:
            g = dict(Grow[ty])[a]
            term = g * zv[6 * leg + ty]
            acc = term if acc is None else acc + term
        return acc

    # ---- linear cost c' = 2 nu B'^T L (A^t xi0 - ref) --------------------
    Lw = [f32(w) for w in state_weights]
    # forward free rollout storing L*err into rdsc as a temp (N*NX <= rdsc?
    # rdsc is N*NU; use dFsc (N*NU) no — need N*NX: reuse rpsc (N*MC,
    # MC=24 >= NX? 24 > 13 yes): stash L*err_t at rpsc[t*MC + i].
    def free_body(t, xi):
        xi1 = Amv(xi)
        for i in range(NX):
            rpsc[t * MC + i] = Lw[i] * (xi1[i] - ref_ref[0, t * NX + i])
        return xi1

    lax.fori_loop(0, N, free_body, xi0, unroll=False)

    # adjoint: lam_t = y_{t+1} + A^T lam_{t+1}; craw_t = B_t'^T lam_t
    def adj_body(tt, lam):
        t = N - 1 - tt
        y = [rpsc[t * MC + i] for i in range(NX)]
        lam_t = [y[i] + lam[i] for i in range(NX)]
        cb = Btmv(lam_t, masks_at(t))
        for u in range(NU):
            csc[t * NU + u] = 2.0 * cb[u]
        return Atmv(lam_t)

    lam0 = [vzero for _ in range(NX)]
    lax.fori_loop(0, N, adj_body, lam0, unroll=False)

    cmax = vzero

    def cmax_body(i, acc):
        return jnp.maximum(acc, jnp.abs(csc[i]))

    cmax = lax.fori_loop(0, N * NU, cmax_body, cmax)
    nu = 1.0 / jnp.maximum(cmax, f32(1e-12))

    def scale_c(i, _):
        csc[i] = csc[i] * nu
        return 0

    lax.fori_loop(0, N * NU, scale_c, 0)

    q_scale = 2.0 * nu                        # state-cost factor on L
    r_diag = 2.0 * nu * f32(SIGMA_F * SIGMA_F * alpha)  # control reg

    hmax = vzero

    def hmax_body(i, acc):
        return jnp.maximum(acc, jnp.abs(hsc[i]))

    hmax = lax.fori_loop(0, N * MC, hmax_body, hmax)
    obj_scale = 2.0 + vzero  # max|c'| = 1 by construction
    h_scale = 1.0 + hmax

    # ---- H'x operator (writes rdsc += nothing; returns through rdsc) ----
    def hvp_into_rd(Fs):
        """rdsc[t*NU+u] = (H' F)_t,u for F read from scratch ref Fs."""
        def fwd(t, xi):
            u = [Fs[t * NU + k] for k in range(NU)]
            xi1 = Amv(xi)
            bu = Bmv(u, masks_at(t))
            xi1 = [xi1[i] + bu[i] for i in range(NX)]
            for i in range(NX):
                rpsc[t * MC + i] = q_scale * Lw[i] * xi1[i]
            return xi1

        zerox = [vzero for _ in range(NX)]
        lax.fori_loop(0, N, fwd, zerox, unroll=False)

        def adj(tt, lam):
            t = N - 1 - tt
            y = [rpsc[t * MC + i] for i in range(NX)]
            lam_t = [y[i] + lam[i] for i in range(NX)]
            hb_ = Btmv(lam_t, masks_at(t))
            for u in range(NU):
                rdsc[t * NU + u] = hb_[u] + r_diag * Fs[t * NU + u]
            return Atmv(lam_t)

        lax.fori_loop(0, N, adj, zerox, unroll=False)

    # ---- init ------------------------------------------------------------
    if warm_refs is None:
        def init_vars(i, _):
            ssc[i] = jnp.maximum(hsc[i], 1.0)
            zsc[i] = 1.0 / ssc[i]
            return 0

        lax.fori_loop(0, N * MC, init_vars, 0)

        def init_F(i, _):
            Fsc[i] = vzero
            if track_best:
                bFsc[i] = vzero
            return 0

        lax.fori_loop(0, N * NU, init_F, 0)
    else:
        # Warm start from the previous tick's horizon solution (the
        # receding-horizon analogue of the fused QP kernel's 4-tuple warm
        # mode / the reference's qpOASES hotstart economics,
        # balance_controller.cpp:193-195). The carry is in ORIGINAL units:
        # F in Newtons, s in constraint units, z UNSCALED (z_orig = z/nu —
        # nu is recomputed per tick, so duals are rescaled on load). Any
        # (step, leg) whose stance-schedule bit changed since the previous
        # tick resets cold; st_prev = -1 (init_mpc_warm_packed) resets
        # everything, making the first tick exactly the cold start.
        Fw, sw, zw, stw = warm_refs
        interior = f32(1e-2)
        inv_sf = f32(1.0 / SIGMA_F)

        def init_vars_w(i, _):
            t = i // MC
            rr = i - t * MC
            leg = rr // 6
            changed = jnp.abs(st_ref[0, t * 4 + leg]
                              - stw[0, t * 4 + leg]) > 0.5
            s_cold = jnp.maximum(hsc[i], 1.0)
            s_warm = jnp.maximum(sw[0, i], interior)
            # Floor the COMPLEMENTARITY PRODUCT, not z absolutely: row
            # scales span 1 (cone rows) to 1e4 (swing relax rows) — an
            # absolute z floor of 1e-2 would inject s*z ~ 100 on every
            # swing row (~50x the cold start's mu), and the IPM then
            # spends its whole budget re-centering away from that
            # artifact (measured: warm trot conv 0.03, robot falls).
            # s*z >= interior keeps the point interior at mu ~= 1e-2
            # per row without distorting the warm point.
            z_warm = jnp.maximum(zw[0, i] * nu, interior / s_warm)
            ssc[i] = jnp.where(changed, s_cold, s_warm)
            zsc[i] = jnp.where(changed, 1.0 / s_cold, z_warm)
            return 0

        lax.fori_loop(0, N * MC, init_vars_w, 0)

        def init_F_w(i, _):
            t = i // NU
            leg = (i - t * NU) // 3
            stc = st_ref[0, t * 4 + leg]
            keep = (jnp.abs(stc - stw[0, t * 4 + leg]) < 0.5) & (stc > 0.5)
            Fsc[i] = jnp.where(keep, Fw[0, i] * inv_sf, vzero)
            if track_best:
                bFsc[i] = Fsc[i]
            return 0

        lax.fori_loop(0, N * NU, init_F_w, 0)

    best_merit0 = vzero + jnp.float32(3.0e38)

    # ---- packed LDL(12) on Lsc/Dsc ----------------------------------------
    def ldl_factor12():
        def j_body(j, _):
            bj = _tri(j, 0)
            dd = lax.fori_loop(
                0, j, lambda k, acc: acc - Lsc[bj + k] * Lsc[bj + k]
                * Dsc[k], Lsc[bj + j])
            dd = jnp.where(jnp.abs(dd) > f32(1e-30), dd, f32(jnp.nan))
            Dsc[j] = dd
            dinv = 1.0 / dd

            def i_body(i, _):
                bi = _tri(i, 0)
                v = lax.fori_loop(
                    0, j, lambda k, acc: acc - Lsc[bi + k] * Dsc[k]
                    * Lsc[bj + k], Lsc[bi + j])
                Lsc[bi + j] = v * dinv
                return 0

            lax.fori_loop(j + 1, NU, i_body, 0)
            return 0

        lax.fori_loop(0, NU, j_body, 0)

    def ldl_solve12(v):
        """Solve Luu x = v for a 12-list of tiles (in registers)."""
        y = [None] * NU
        for i in range(NU):
            acc = v[i]
            for k in range(i):
                acc = acc - Lsc[_tri(i, k)] * y[k]
            y[i] = acc
        out = [None] * NU
        for i in reversed(range(NU)):
            acc = y[i] / Dsc[i]
            for k in range(i + 1, NU):
                acc = acc - Lsc[_tri(k, i)] * out[k]
            out[i] = acc
        return out

    # ---- one IPM iteration -------------------------------------------------
    def iteration(it, carry):
        # frozen/alpha carried as f32 (Mosaic cannot legalize i1 vectors
        # in scf.for loop carries)
        best_merit, frozen, a_prev = carry

        # residuals: r_dual into rdsc, r_prim into rpsc
        hvp_into_rd(Fsc)

        def rd_fix(t, _):
            u = [Fsc[t * NU + k] for k in range(NU)]
            zv = [zsc[t * MC + rr] for rr in range(MC)]
            for i in range(NU):
                rdsc[t * NU + i] = (rdsc[t * NU + i] + csc[t * NU + i]
                                    + gty_col(zv, i))
            for rr in range(MC):
                rpsc[t * MC + rr] = (gx_row(u, rr) + ssc[t * MC + rr]
                                     - hsc[t * MC + rr])
            return 0

        lax.fori_loop(0, N, rd_fix, 0)

        def maxes(i, acc):
            pr, dr, gap = acc
            pr = jnp.maximum(pr, jnp.abs(rpsc[i]))
            gap = gap + ssc[i] * zsc[i]
            return pr, dr, gap

        pr, dr, gap = lax.fori_loop(
            0, N * MC, maxes,
            (vzero, vzero, vzero))

        def drmax(i, acc):
            return jnp.maximum(acc, jnp.abs(rdsc[i]))

        dr = lax.fori_loop(0, N * NU, drmax, dr)
        mu_avg = gap * (1.0 / (N * MC))

        merit = pr / h_scale + dr / obj_scale + mu_avg / obj_scale
        improve = merit < best_merit
        if track_best:
            def best_body(i, _):
                bFsc[i] = jnp.where(improve, Fsc[i], bFsc[i])
                return 0

            lax.fori_loop(0, N * NU, best_body, 0)
        best_merit = jnp.where(improve, merit, best_merit)

        done = ((mu_avg < (100.0 * eps) * obj_scale)
                & (pr < (50.0 * eps) * h_scale)
                & (dr < (50.0 * eps) * obj_scale))

        # Adaptive centering (Mehrotra-flavored without the corrector):
        # long previous steps -> aim low, short steps -> re-center.
        sig = jnp.clip((1.0 - a_prev) ** 3, f32(0.03), f32(sigma_c))
        rc_target = sig * mu_avg

        # rhs_t = -rd_t - G^T [(z rp - (s z - rc)) / s] = -rd - G^T[(z rp
        #         - s z + rc)/s]  (store into dFsc temporarily)
        def rhs_body(t, _):
            tvals = []
            for rr in range(MC):
                sv = ssc[t * MC + rr]
                zv = zsc[t * MC + rr]
                rp_ = rpsc[t * MC + rr]
                tvals.append((zv * rp_ - (sv * zv - rc_target)) / sv)
            for i in range(NU):
                leg, a = i // 3, i % 3
                acc = -rdsc[t * NU + i]
                for ty in _COL_ROWS[a]:
                    g = dict(Grow[ty])[a]
                    acc = acc - g * tvals[6 * leg + ty]
                dFsc[t * NU + i] = acc
            return 0

        lax.fori_loop(0, N, rhs_body, 0)

        # ---- backward Riccati: P carried in Psc, p as loop values --------
        # Terminal P_N = 2 nu diag(L) (static indices: plain Python loop).
        for i_ in range(NX):
            for j_ in range(NX):
                Psc[i_ * NX + j_] = (q_scale * Lw[i_] if i_ == j_
                                     else vzero)

        def backward(tt, p):
            t = N - 1 - tt
            mk = masks_at(t)
            um = [mk[l] for l in range(4)]

            # PB columns: PB[k][u] for u = 3l+a (static column loop — the
            # B column structure (which leg block) is position-dependent,
            # so Python-unrolled; ~780 statements).
            for ucol in range(NU):
                l = ucol // 3
                a = ucol - 3 * l
                for k in range(NX):
                    acc = Psc[k * NX + 9 + a] * bm
                    for c in range(3):
                        acc = acc + Psc[k * NX + 6 + c] * Bw[l][c][a]
                    PBsc[k * NU + ucol] = acc * um[l]

            # Luu (packed lower) = r_diag I + G^T D G + B^T PB, then reg.
            dvals = []
            for rr in range(MC):
                sv = ssc[t * MC + rr]
                zv = zsc[t * MC + rr]
                dvals.append(jnp.minimum(zv / sv, d_max))
            for i in range(NU):
                li, a = i // 3, i % 3
                for j in range(i + 1):
                    lj, b_ = j // 3, j % 3
                    # B^T PB: column i of B dot PB[:, j]
                    acc = um[li] * (bm * PBsc[(9 + a) * NU + j])
                    for c in range(3):
                        acc = acc + um[li] * Bw[li][c][a] \
                            * PBsc[(6 + c) * NU + j]
                    if i == j:
                        acc = acc + r_diag
                    if li == lj:
                        for ty in range(6):
                            ents = dict(Grow[ty])
                            if a in ents and b_ in ents:
                                acc = acc + ents[a] * dvals[6 * li + ty] \
                                    * ents[b_]
                    Lsc[_tri(i, j)] = acc
            # diagonal regularization
            dmax_t = Lsc[_tri(0, 0)]
            for i in range(1, NU):
                dmax_t = jnp.maximum(dmax_t, Lsc[_tri(i, i)])
            reg = (100.0 * eps) * dmax_t
            for i in range(NU):
                Lsc[_tri(i, i)] = Lsc[_tri(i, i)] + reg

            ldl_factor12()

            # PA and Lux columns; store PA into PAsc, Lux into Lxsc.
            def pa_col(j, _):
                # (P@S) column j contributions
                for k in range(NX):
                    base = Psc[k * NX + j]
                    extra = vzero
                    extra = jnp.where(
                        jnp.asarray(j == 6, jnp.bool_),
                        Psc[k * NX + 0] * cy - Psc[k * NX + 1] * sy, extra)
                    extra = jnp.where(
                        jnp.asarray(j == 7, jnp.bool_),
                        Psc[k * NX + 0] * sy + Psc[k * NX + 1] * cy, extra)
                    extra = jnp.where(
                        jnp.asarray(j == 8, jnp.bool_),
                        Psc[k * NX + 2], extra)
                    extra = jnp.where(
                        jnp.asarray(j == 9, jnp.bool_),
                        Psc[k * NX + 3], extra)
                    extra = jnp.where(
                        jnp.asarray(j == 10, jnp.bool_),
                        Psc[k * NX + 4], extra)
                    extra = jnp.where(
                        jnp.asarray(j == 11, jnp.bool_),
                        Psc[k * NX + 5], extra)
                    extra = jnp.where(
                        jnp.asarray(j == 12, jnp.bool_),
                        -f32(GRAVITY) * Psc[k * NX + 11], extra)
                    PAsc[k * NX + j] = base + dtf * extra
                # Lux col j = B^T (PA col j)
                for i in range(NU):
                    li, a = i // 3, i % 3
                    acc = bm * PAsc[(9 + a) * NX + j]
                    for c in range(3):
                        acc = acc + Bw[li][c][a] * PAsc[(6 + c) * NX + j]
                    Lxsc[i * NX + j] = um[li] * acc
                return 0

            lax.fori_loop(0, NX, pa_col, 0, unroll=False)

            # K columns: K[:, j] = -Luu^{-1} Lux[:, j] -> gain store.
            kbase = 0 if use_hbm_k else t * NU * NX

            def k_col(j, _):
                v = [Lxsc[i * NX + j] for i in range(NU)]
                sol = ldl_solve12(v)
                for i in range(NU):
                    Kstg[kbase + i * NX + j] = -sol[i]
                return 0

            lax.fori_loop(0, NX, k_col, 0, unroll=False)

            # feedforward: lu = B^T p - rhs_t; k = -Luu^{-1} lu
            bp = Btmv(p, mk)
            lu = [bp[i] - dFsc[t * NU + i] for i in range(NU)]
            kv = ldl_solve12(lu)
            for i in range(NU):
                kst[t * NU + i] = -kv[i]

            # p_new = A^T p + Lux^T k
            luxk = []
            for j in range(NX):
                acc = vzero
                for i in range(NU):
                    acc = acc + Lxsc[i * NX + j] * (-kv[i])
                luxk.append(acc)
            pA = Atmv(p)
            p_new = [pA[j] + luxk[j] for j in range(NX)]

            # P_new = Q + A^T PA + Lux^T K (build into Psc, col by col;
            # PAsc holds products of the OLD P so overwriting Psc is safe).
            def pnew_col(j, _):
                # A^T (PA col j): PA col j is PAsc[:, j]
                colv = [PAsc[k * NX + j] for k in range(NX)]
                at = Atmv(colv)
                # diag state weight L[j] gathered by where-chain (j traced).
                lw_j = vzero
                for jj in range(NX):
                    lw_j = jnp.where(jnp.asarray(j == jj, jnp.bool_),
                                     Lw[jj], lw_j)
                for i in range(NX):
                    acc = at[i]
                    for u in range(NU):
                        acc = acc + Lxsc[u * NX + i] * Kstg[kbase + u * NX + j]
                    acc = acc + jnp.where(jnp.asarray(i == j, jnp.bool_),
                                          q_scale * lw_j, 0.0)
                    Psc[i * NX + j] = acc
                return 0

            lax.fori_loop(0, NX, pnew_col, 0, unroll=False)

            # symmetrize
            def symm(idx, _):
                i = idx // NX
                j = idx - i * NX

                @pl.when(jnp.asarray(i < j, jnp.bool_))
                def _():
                    v = 0.5 * (Psc[i * NX + j] + Psc[j * NX + i])
                    Psc[i * NX + j] = v
                    Psc[j * NX + i] = v

                return 0

            lax.fori_loop(0, NX * NX, symm, 0, unroll=False)

            # stream K_t to HBM (skipped in the VMEM-resident variant)
            if use_hbm_k:
                gi = pl.program_id(0)
                cp = pltpu.make_async_copy(Kstg, Kout.at[gi, t], dma_sem)
                cp.start()
                cp.wait()
            return p_new

        p0 = [vzero for _ in range(NX)]
        lax.fori_loop(0, N, backward, p0, unroll=False)

        # ---- forward rollout: dF_t = K_t dxi + k_t ------------------------
        def forward(t, dxi):
            if use_hbm_k:
                gi = pl.program_id(0)
                cp = pltpu.make_async_copy(Kout.at[gi, t], Kstg, dma_sem)
                cp.start()
                cp.wait()
                fbase = 0
            else:
                fbase = t * NU * NX
            du = []
            for i in range(NU):
                acc = kst[t * NU + i]
                for j in range(NX):
                    acc = acc + Kstg[fbase + i * NX + j] * dxi[j]
                du.append(acc)
            for i in range(NU):
                dFsc[t * NU + i] = du[i]
            x1 = Amv(dxi)
            bu = Bmv(du, masks_at(t))
            return [x1[i] + bu[i] for i in range(NX)]

        dxi0 = [vzero for _ in range(NX)]
        lax.fori_loop(0, N, forward, dxi0, unroll=False)

        # ---- step length ---------------------------------------------------
        def alpha_body(t, amin):
            u = [dFsc[t * NU + k] for k in range(NU)]
            for rr in range(MC):
                sv = ssc[t * MC + rr]
                zv = zsc[t * MC + rr]
                rp_ = rpsc[t * MC + rr]
                ds_ = -rp_ - gx_row(u, rr)
                dz_ = -((sv * zv - rc_target) + zv * ds_) / sv
                ra = jnp.where(ds_ < 0.0,
                               -sv / jnp.where(ds_ < 0.0, ds_, -1.0), big)
                rb = jnp.where(dz_ < 0.0,
                               -zv / jnp.where(dz_ < 0.0, dz_, -1.0), big)
                amin = jnp.minimum(amin, jnp.minimum(ra, rb))
            return amin

        amin = lax.fori_loop(0, N, alpha_body, vzero + big)
        alpha_s = jnp.minimum(f32(tau) * amin, 1.0)

        finite_f = vzero + 1.0

        def fin_body(i, acc):
            return acc * jnp.isfinite(dFsc[i]).astype(jnp.float32)

        finite = lax.fori_loop(0, N * NU, fin_body, finite_f) > 0.5
        a = jnp.where(done | (frozen > 0.5) | ~finite, 0.0, alpha_s)

        # ---- update ---------------------------------------------------------
        def upd_body(t, _):
            u = [dFsc[t * NU + k] for k in range(NU)]
            ok = a > 0.0  # 0 * NaN = NaN: gate instead of scaling
            for k in range(NU):
                Fsc[t * NU + k] = jnp.where(
                    ok, Fsc[t * NU + k] + a * u[k], Fsc[t * NU + k])
            for rr in range(MC):
                sv = ssc[t * MC + rr]
                zv = zsc[t * MC + rr]
                rp_ = rpsc[t * MC + rr]
                ds_ = -rp_ - gx_row(u, rr)
                dz_ = -((sv * zv - rc_target) + zv * ds_) / sv
                ssc[t * MC + rr] = jnp.where(
                    ok, jnp.maximum(sv + a * ds_, tiny), sv)
                zsc[t * MC + rr] = jnp.where(
                    ok, jnp.maximum(zv + a * dz_, tiny), zv)
            return 0

        lax.fori_loop(0, N, upd_body, 0)
        return (best_merit, jnp.maximum(frozen, done.astype(jnp.float32)),
                a)

    frozen0 = vzero
    best_merit, _, _ = lax.fori_loop(0, iterations, iteration,
                                     (best_merit0, frozen0, vzero))

    # ---- final residuals at the current iterate; pick best-F if better ----
    hvp_into_rd(Fsc)

    def final_fix(t, _):
        u = [Fsc[t * NU + k] for k in range(NU)]
        zv = [zsc[t * MC + rr] for rr in range(MC)]
        for i in range(NU):
            rdsc[t * NU + i] = (rdsc[t * NU + i] + csc[t * NU + i]
                                + gty_col(zv, i))
        for rr in range(MC):
            rpsc[t * MC + rr] = (gx_row(u, rr) + ssc[t * MC + rr]
                                 - hsc[t * MC + rr])
        return 0

    lax.fori_loop(0, N, final_fix, 0)

    def maxes2(i, acc):
        pr, gap = acc
        return (jnp.maximum(pr, jnp.abs(rpsc[i])), gap + ssc[i] * zsc[i])

    pr, gap = lax.fori_loop(0, N * MC, maxes2,
                            (vzero, vzero))

    def drmax2(i, acc):
        return jnp.maximum(acc, jnp.abs(rdsc[i]))

    dr = lax.fori_loop(0, N * NU, drmax2, vzero)
    gap = gap * (1.0 / (N * MC))
    merit_f = pr / h_scale + dr / obj_scale + gap / obj_scale
    use_final = (merit_f <= best_merit) | jnp.asarray(not track_best,
                                                      jnp.bool_)

    sf = f32(SIGMA_F)

    def out_body(i, _):
        # Swing forces are exactly 0 at the optimum (masked B columns
        # decouple them; the alpha term pins them) but converge slowly
        # along those 1e-6-curvature directions — project them out.
        t = i // NU
        leg = (i - t * NU) // 3
        mk = st_ref[0, t * 4 + leg]
        F_ref[i] = jnp.where(use_final, Fsc[i], bFsc[i]) * sf * mk
        return 0

    lax.fori_loop(0, N * NU, out_body, 0)

    if warm_out is not None:
        # Next-tick warm carry: [s | z/nu | F] in original units. F here is
        # the FINAL iterate (not the best-merit select F_ref emits for
        # control) so the carried (F, s, z) is a consistent primal-dual
        # point — mixing best-merit F with final-iterate s/z would seed the
        # next tick with an inconsistent pair on exactly the lanes that
        # struggled (advisor round-2 finding). The schedule slice rides the
        # tick's own carry.
        inv_nu = 1.0 / nu

        def wout_body(i, _):
            warm_out[i] = ssc[i]
            warm_out[N * MC + i] = zsc[i] * inv_nu
            return 0

        lax.fori_loop(0, N * MC, wout_body, 0)

        def wout_f_body(i, _):
            t = i // NU
            leg = (i - t * NU) // 3
            mk = st_ref[0, t * 4 + leg]
            warm_out[2 * N * MC + i] = Fsc[i] * sf * mk
            return 0

        lax.fori_loop(0, N * NU, wout_f_body, 0)

    # Flag calibration: with adaptive centering the scaled dual residual
    # lands at p50 ~1e-4 / p99 ~4.4e-4 (v5e, 40 iterations) and the measured
    # OBJECTIVE parity vs the condensed Mehrotra solver is ~1e-5-relative
    # (the kernel's objectives came out strictly LOWER on the audit sample)
    # — tol = 5e-4 marks that operating point.
    tolf = f32(tol)
    conv = ((pr < tolf * h_scale) & (dr < tolf * obj_scale)
            & (gap < tolf * obj_scale))
    diag_ref[0] = conv.astype(f32)
    diag_ref[1] = pr
    diag_ref[2] = dr
    diag_ref[3] = gap
    diag_ref[4] = nu
    diag_ref[5] = vzero


def _pack(a, k):
    B = a.shape[0]
    nb = B // TILE
    return a.reshape(nb, ROWS, LANE, k).transpose(0, 3, 1, 2)


def _unpack(a):
    nb, k = a.shape[0], a.shape[1]
    return a.transpose(0, 2, 3, 1).reshape(nb * TILE, k)


def _spec(k):
    return pl.BlockSpec((1, k, ROWS, LANE), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=(
    "n_steps", "dt", "state_weights", "alpha", "iterations", "sigma_c",
    "tau", "tol", "interpret"))
def solve_mpc_qp_riccati(yaw, r_levers, mass, inertia_diag, mu, fz_min,
                         fz_max, xi0, xi_ref, stance_schedule, *,
                         n_steps: int, dt: float, state_weights,
                         alpha: float = 1e-6, iterations: int = 40,
                         sigma_c: float = 0.5, tau: float = 0.95,
                         tol: float = 5e-4,
                         interpret: bool = False):
    """Fully-fused MPC solve. Batch B must be a multiple of 1024.

    Args:
      yaw: (B,), r_levers: (B, 4, 3) = feet_world - x_com, mass: (B,) or
      scalar, inertia_diag: (B, 3) or (3,), mu/fz_min/fz_max: scalars or
      (B,), xi0: (B, 13), xi_ref: (B, N, 13), stance_schedule: (B, N, 4).

    Returns (F (B, N, 12), IPMSolution-like diagnostics).
    """
    B = yaw.shape[0]
    assert B % TILE == 0, f"batch {B} must be a multiple of {TILE}"
    nb = B // TILE
    N = n_steps
    f32 = jnp.float32

    def bcast(v, tail=()):
        return jnp.broadcast_to(jnp.asarray(v, f32), (B,) + tail)

    yawp = _pack(bcast(yaw)[:, None], 1)
    rp = _pack(jnp.asarray(r_levers, f32).reshape(B, 12), 12)
    mIb = jnp.concatenate(
        [bcast(mass)[:, None], bcast(inertia_diag, (3,)).reshape(B, 3)],
        axis=-1)
    mIbp = _pack(mIb, 4)
    mup = _pack(bcast(mu)[:, None], 1)
    fzp = _pack(jnp.stack([bcast(fz_min), bcast(fz_max)], axis=-1), 2)
    xi0p = _pack(jnp.asarray(xi0, f32), NX)
    refp = _pack(jnp.asarray(xi_ref, f32).reshape(B, N * NX), N * NX)
    stp = _pack(jnp.asarray(stance_schedule, f32).reshape(B, N * 4), N * 4)

    # Interpret mode cannot lower program_id/DMA for the HBM gain stream;
    # fall back to a VMEM-resident K there (no VMEM limit off-device).
    use_hbm_k = not interpret
    kern = partial(
        _mpc_kernel, n_steps=N, dt=float(dt),
        state_weights=tuple(float(w) for w in state_weights),
        alpha=float(alpha), iterations=iterations, sigma_c=float(sigma_c),
        tau=float(tau), tol=float(tol), use_hbm_k=use_hbm_k)

    def entry(yaw_ref, r_ref, mIb_ref, mu_ref, fz_ref, xi0_ref, ref_ref,
              st_ref, F_ref, diag_ref, Kout, *scratch):
        if not use_hbm_k:
            scratch = list(scratch) + [None]  # no dma_sem
        kern(yaw_ref[0], r_ref[0], mIb_ref[0], mu_ref[0], fz_ref[0],
             xi0_ref[0], ref_ref, st_ref, F_ref.at[0], diag_ref.at[0],
             Kout, *scratch)

    Fp, diag, _K = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[_spec(1), _spec(12), _spec(4), _spec(1), _spec(2),
                  _spec(NX), _spec(N * NX), _spec(N * 4)],
        out_specs=[
            _spec(N * NU), _spec(6),
            # The gain stream stays in HBM (full, unblocked — indexed by
            # program_id inside the kernel via explicit DMA).
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, N * NU, ROWS, LANE), f32),
            jax.ShapeDtypeStruct((nb, 6, ROWS, LANE), f32),
            jax.ShapeDtypeStruct((nb, N, NU * NX, ROWS, LANE), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NX * NX, ROWS, LANE), f32),   # Psc
            pltpu.VMEM((NX * NX, ROWS, LANE), f32),   # PAsc
            pltpu.VMEM((NX * NU, ROWS, LANE), f32),   # PBsc
            pltpu.VMEM((_NU_TRI, ROWS, LANE), f32),   # Lsc
            pltpu.VMEM((NU, ROWS, LANE), f32),        # Dsc
            pltpu.VMEM((NU * NX, ROWS, LANE), f32),   # Lxsc
            # gain store: one step (HBM-streamed) or the whole horizon
            pltpu.VMEM(((NU * NX) if use_hbm_k else (N * NU * NX),
                        ROWS, LANE), f32),            # Kstg
            pltpu.VMEM((N * NU, ROWS, LANE), f32),    # kst
            pltpu.VMEM((N * NU, ROWS, LANE), f32),    # Fsc
            pltpu.VMEM((N * MC, ROWS, LANE), f32),    # ssc
            pltpu.VMEM((N * MC, ROWS, LANE), f32),    # zsc
            pltpu.VMEM((N * MC, ROWS, LANE), f32),    # rpsc
            pltpu.VMEM((N * NU, ROWS, LANE), f32),    # rdsc
            pltpu.VMEM((N * NU, ROWS, LANE), f32),    # dFsc
            pltpu.VMEM((N * NU, ROWS, LANE), f32),    # csc
            pltpu.VMEM((N * MC, ROWS, LANE), f32),    # hsc
            # best-F buffer only for short horizons (VMEM budget)
            pltpu.VMEM(((N * NU) if N <= 16 else 1, ROWS, LANE), f32),
        ] + ([pltpu.SemaphoreType.DMA(())] if use_hbm_k else []),
        interpret=interpret,
    )(yawp, rp, mIbp, mup, fzp, xi0p, refp, stp)

    F = _unpack(Fp).reshape(B, N, NU)
    d = _unpack(diag)
    sol = IPMSolution(
        x=F.reshape(B, N * NU), z=jnp.zeros((B, N * MC), f32),
        s=jnp.zeros((B, N * MC), f32), iterations=jnp.asarray(iterations),
        gap=d[:, 3], primal_residual=d[:, 1], dual_residual=d[:, 2],
        converged=d[:, 0] > 0.5,
    )
    return F, sol


class _OffRef:
    """View into a packed ref at a static component offset, exposing the
    ``[0, idx]`` protocol _mpc_kernel uses for its dynamically-indexed
    inputs (the stance schedule and the reference, read with a TRACED
    horizon step inside ``lax.fori_loop`` — dynamic indexing is legal on
    REFS only, so the fused entry must hand the kernel ref views, never
    loaded arrays)."""

    def __init__(self, ref, off):
        self._ref, self._off = ref, off

    def __getitem__(self, key):
        b, idx = key
        return self._ref[b, self._off + idx]


def solve_mpc_qp_riccati_packed(mpc_p, warm_p=None, *, n_steps: int,
                                dt: float,
                                mass: float, inertia_diag, mu: float,
                                fz_min: float, fz_max: float,
                                state_weights, alpha: float = 1e-6,
                                iterations: int = 40,
                                sigma_c: float = 0.5, tau: float = 0.95,
                                tol: float = 5e-4,
                                interpret: bool = False):
    """The fused-tick MPC entry: one ``pallas_call`` consuming the packed
    MPC precursor block the commander-pre kernel emits
    (control/pallas_commander.mpc_block_size layout: xi0 13 | levers 12 |
    stance schedule 4N | reference 13N), with the robot constants (mass,
    inertia, cone parameters) baked statically — zero XLA glue on either
    side, the packed twin of :func:`solve_mpc_qp_riccati`.

    Returns packed ``(F_p, diag_p)``: F_p (nb, N*NU, rows, 128) horizon
    forces in Newtons (step-0 slice = the tick's GRFs), diag_p rows
    [conv, pr, dr, gap, nu, 0] (the kernel's native order).

    ``warm_p = (F_p_prev, sz_p_prev, sched_p_prev)`` warm-starts the IPM
    from the previous tick's horizon solution (F in Newtons; sz = [s | z]
    original units; sched = the previous tick's N*4 stance schedule, -1
    for a cold first tick). Rows whose schedule bit changed reset cold.
    The return becomes ``(F_p, diag_p, szf_p_new)`` where szf is the
    packed [s | z | F] block of the FINAL iterate — a consistent
    primal-dual triple for the next tick's warm seed (F_p itself is the
    best-merit control output and must NOT be recycled as the warm F:
    advisor round-2 finding). Thread ``(szf[2NMC:], szf[:2NMC], sched)``
    into the next call's warm_p (sim/pallas_tick.py does this).
    """
    nb, kb, rows, _ = mpc_p.shape
    N = n_steps
    assert kb == 25 + 17 * N, (kb, N)
    f32 = jnp.float32
    mpc_p = mpc_p.astype(f32)
    Ibf = tuple(float(v) for v in inertia_diag)
    warm = warm_p is not None

    use_hbm_k = not interpret
    kern = partial(
        _mpc_kernel, n_steps=N, dt=float(dt),
        state_weights=tuple(float(w) for w in state_weights),
        alpha=float(alpha), iterations=iterations, sigma_c=float(sigma_c),
        tau=float(tau), tol=float(tol), use_hbm_k=use_hbm_k)

    def entry_cold(mpc_ref, F_ref, diag_ref, Kout, *scratch):
        if not use_hbm_k:
            scratch = list(scratch) + [None]  # no dma_sem
        xi0 = [mpc_ref[0, i] for i in range(NX)]
        r = [mpc_ref[0, NX + j] for j in range(12)]
        vz = xi0[0] * 0.0
        mIb = [vz + f32(mass)] + [vz + f32(v) for v in Ibf]
        kern([xi0[2]], r, mIb, [vz + f32(mu)],
             [vz + f32(fz_min), vz + f32(fz_max)], xi0,
             _OffRef(mpc_ref, 25 + 4 * N), _OffRef(mpc_ref, 25),
             F_ref.at[0], diag_ref.at[0], Kout, *scratch)

    def entry_warm(mpc_ref, Fw_ref, sz_ref, stw_ref, F_ref, diag_ref,
                   wout_ref, Kout, *scratch):
        if not use_hbm_k:
            scratch = list(scratch) + [None]  # no dma_sem
        xi0 = [mpc_ref[0, i] for i in range(NX)]
        r = [mpc_ref[0, NX + j] for j in range(12)]
        vz = xi0[0] * 0.0
        mIb = [vz + f32(mass)] + [vz + f32(v) for v in Ibf]
        kern([xi0[2]], r, mIb, [vz + f32(mu)],
             [vz + f32(fz_min), vz + f32(fz_max)], xi0,
             _OffRef(mpc_ref, 25 + 4 * N), _OffRef(mpc_ref, 25),
             F_ref.at[0], diag_ref.at[0], Kout, *scratch,
             warm_refs=(Fw_ref, _OffRef(sz_ref, 0),
                        _OffRef(sz_ref, N * MC), stw_ref),
             warm_out=wout_ref.at[0])

    vspec = partial(pl.BlockSpec, index_map=lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM)
    in_specs = [vspec((1, kb, rows, LANE))]
    out_specs = [
        vspec((1, N * NU, rows, LANE)),
        vspec((1, 6, rows, LANE)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, N * NU, rows, LANE), f32),
        jax.ShapeDtypeStruct((nb, 6, rows, LANE), f32),
    ]
    inputs = (mpc_p,)
    if warm:
        Fw_p, sz_p, stw_p = warm_p
        assert Fw_p.shape == (nb, N * NU, rows, LANE), Fw_p.shape
        assert sz_p.shape == (nb, 2 * N * MC, rows, LANE), sz_p.shape
        assert stw_p.shape == (nb, 4 * N, rows, LANE), stw_p.shape
        in_specs += [vspec((1, N * NU, rows, LANE)),
                     vspec((1, 2 * N * MC, rows, LANE)),
                     vspec((1, 4 * N, rows, LANE))]
        out_specs.append(vspec((1, 2 * N * MC + N * NU, rows, LANE)))
        out_shape.append(
            jax.ShapeDtypeStruct((nb, 2 * N * MC + N * NU, rows, LANE),
                                 f32))
        inputs = (mpc_p, Fw_p.astype(f32), sz_p.astype(f32),
                  stw_p.astype(f32))
    out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    out_shape.append(
        jax.ShapeDtypeStruct((nb, N, NU * NX, rows, LANE), f32))

    outs = pl.pallas_call(
        entry_warm if warm else entry_cold,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NX * NX, rows, LANE), f32),   # Psc
            pltpu.VMEM((NX * NX, rows, LANE), f32),   # PAsc
            pltpu.VMEM((NX * NU, rows, LANE), f32),   # PBsc
            pltpu.VMEM((_NU_TRI, rows, LANE), f32),   # Lsc
            pltpu.VMEM((NU, rows, LANE), f32),        # Dsc
            pltpu.VMEM((NU * NX, rows, LANE), f32),   # Lxsc
            pltpu.VMEM(((NU * NX) if use_hbm_k else (N * NU * NX),
                        rows, LANE), f32),            # Kstg
            pltpu.VMEM((N * NU, rows, LANE), f32),    # kst
            pltpu.VMEM((N * NU, rows, LANE), f32),    # Fsc
            pltpu.VMEM((N * MC, rows, LANE), f32),    # ssc
            pltpu.VMEM((N * MC, rows, LANE), f32),    # zsc
            pltpu.VMEM((N * MC, rows, LANE), f32),    # rpsc
            pltpu.VMEM((N * NU, rows, LANE), f32),    # rdsc
            pltpu.VMEM((N * NU, rows, LANE), f32),    # dFsc
            pltpu.VMEM((N * NU, rows, LANE), f32),    # csc
            pltpu.VMEM((N * MC, rows, LANE), f32),    # hsc
            pltpu.VMEM(((N * NU) if N <= 16 else 1, rows, LANE), f32),
        ] + ([pltpu.SemaphoreType.DMA(())] if use_hbm_k else []),
        interpret=interpret,
    )(*inputs)
    if warm:
        Fp, diag, sz_new, _K = outs
        return Fp, diag, sz_new
    Fp, diag, _K = outs
    return Fp, diag


def solve_mpc_fused(xi0, xi_ref, yaw, feet_world, x_com, stance_schedule,
                    horizon: int, dt, cfg: ControlConfig,
                    iterations: int = 40, mass=None, inertia_diag=None,
                    mu=None, state_weights=None, force_weight: float = 1e-6,
                    interpret: bool = False):
    """Drop-in analogue of mpc/horizon.solve_mpc running in the Pallas
    Riccati kernel. Any batch shape: instances are flattened and padded to
    the 1024 tile multiple (pads replicate instance 0 and are stripped), so
    the commander/rollout path can use the kernel at arbitrary batch."""
    if state_weights is None:
        state_weights = (50.0, 50.0, 10.0, 1.0, 1.0, 100.0,
                         1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0)
    bal = cfg.balance
    r = feet_world - x_com[..., None, :]

    batch_shape = jnp.broadcast_shapes(
        xi0.shape[:-1], xi_ref.shape[:-2], yaw.shape, r.shape[:-2],
        stance_schedule.shape[:-2])
    B = 1
    for d in batch_shape:
        B *= int(d)
    Bp = ((B + TILE - 1) // TILE) * TILE

    def flat(a, tail):
        a = jnp.broadcast_to(a, batch_shape + tail).reshape((B,) + tail)
        if Bp > B:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (Bp - B,) + tail)], axis=0)
        return a

    def flat_param(v, tail=()):
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 0 or v.shape == tail:
            return v  # constant across instances; the kernel broadcasts
        return flat(v, tail)

    N = int(horizon)
    F, sol = solve_mpc_qp_riccati(
        flat(yaw, ()), flat(r, (4, 3)),
        flat_param(bal.mass if mass is None else mass),
        flat_param(
            bal.inertia_diag if inertia_diag is None else inertia_diag,
            (3,)),
        flat_param(bal.mu if mu is None else mu), bal.fz_min, bal.fz_max,
        flat(xi0, (NX,)), flat(xi_ref, (N, NX)),
        flat(stance_schedule.astype(jnp.float32), (N, 4)),
        n_steps=N, dt=float(dt), state_weights=tuple(state_weights),
        alpha=float(force_weight), iterations=iterations,
        interpret=interpret)
    if Bp == B and len(batch_shape) == 1:
        return F, sol

    def unflat(a, tail):
        return a[:B].reshape(batch_shape + tail)

    return unflat(F, (N, NU)), IPMSolution(
        x=unflat(sol.x, (N * NU,)), z=unflat(sol.z, (N * MC,)),
        s=unflat(sol.s, (N * MC,)), iterations=sol.iterations,
        gap=unflat(sol.gap, ()),
        primal_residual=unflat(sol.primal_residual, ()),
        dual_residual=unflat(sol.dual_residual, ()),
        converged=unflat(sol.converged, ()),
    )
