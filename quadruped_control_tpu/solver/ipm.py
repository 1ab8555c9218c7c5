"""Batched primal-dual interior-point QP solver (Mehrotra predictor-corrector).

This is the TPU-native replacement for the reference's warm-started qpOASES
active-set solve (balance_controller.cpp:177-208): instead of amortizing one
QP across ticks via hotstart, we amortize across *instances* — thousands of
independent 12-var friction-cone QPs solved simultaneously, one vector lane
each. The entire solve is a fixed-iteration ``lax.fori_loop`` of dense
(..., 12, 12) linear algebra, so it jits once and runs with zero host
round-trips; a Pallas kernel (solver/pallas_ipm.py) implements the same
iteration with all per-instance state pinned in VMEM.

Problem form (see ops/dynamics.py):

    min_x 1/2 x^T Q x + c^T x   s.t.   G x <= h

with Q symmetric positive definite (the reference's W-regularization,
balance_controller.cpp:152, guarantees this). The Newton/KKT system is
condensed to the 12x12 normal form M = Q + G^T diag(z/s) G, factored by
Cholesky once per iteration and reused for the corrector solve.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class IPMSolution(NamedTuple):
    x: jnp.ndarray  # (..., n) primal solution
    z: jnp.ndarray  # (..., m) dual (inequality multipliers)
    s: jnp.ndarray  # (..., m) slacks
    iterations: jnp.ndarray  # () iterations run (static count)
    gap: jnp.ndarray  # (...,) final complementarity mu
    primal_residual: jnp.ndarray  # (...,) inf-norm of G x + s - h
    dual_residual: jnp.ndarray  # (...,) inf-norm of Q x + c + G^T z
    converged: jnp.ndarray  # (...,) bool


def _cholesky_solve(L, b):
    """Solve A x = b given lower Cholesky factor L (batched)."""
    y = lax.linalg.triangular_solve(
        L, b[..., None], left_side=True, lower=True, transpose_a=False
    )
    x = lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0]


def _max_step(v, dv, tau):
    """Largest alpha in (0, 1] with v + alpha dv >= (1 - tau) v  (fraction-to-
    the-boundary), batched over trailing constraint dim."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    alpha = tau * jnp.min(ratio, axis=-1)
    return jnp.minimum(alpha, 1.0)


_POLISH_SWEEPS = 12


def _polish(Q, c, G, h, x_ipm, z_ipm, s_ipm):
    """Active-set polish (OSQP-style): once the IPM has identified the active
    set, solve the equality-constrained KKT exactly and keep the polished
    point when it certifies. This recovers machine-precision parity with an
    active-set solver (qpOASES) even in the GRF family's 1e-5-curvature flat
    directions, where the barrier-condensed system is limited to ~1e-5
    accuracy by conditioning.

    Static shapes: inactive constraints are represented by identity rows
    forcing z_i = 0, so every instance solves the same (n+m) dense system.
    """
    from quadruped_control_tpu.utils.ff import (
        residual_compensated,
        solve_refined,
    )

    dtype = Q.dtype
    n = Q.shape[-1]
    m = G.shape[-2]
    eps = jnp.finfo(dtype).eps
    eye_m = jnp.eye(m, dtype=dtype)
    top = jnp.concatenate([Q, jnp.swapaxes(G, -1, -2)], axis=-1)
    h_scale = 1.0 + jnp.max(jnp.abs(h), axis=-1)
    obj_scale = 1.0 + jnp.max(jnp.abs(c), axis=-1)
    # With the refined solve + compensated certification the stationarity
    # check can sit a hair above machine epsilon — in float32 this is what
    # makes polish acceptance (and hence qpOASES-level parity) possible at
    # all on TPU hardware.
    cert_dr = jnp.maximum(1e-9, 30.0 * eps) * obj_scale
    feas_tol = jnp.maximum(1e-6, 30.0 * eps) * h_scale
    z_tol = jnp.maximum(1e-6, 30.0 * eps) * (1.0 + jnp.max(z_ipm, axis=-1))

    def try_active(active):
        # K = [[Q, G^T], [diag(a) G, diag(1-a)]],  rhs = [-c, a*h].
        aG = active[..., None] * G
        lower = jnp.concatenate(
            [aG, (1.0 - active)[..., None] * eye_m], axis=-1
        )
        K = jnp.concatenate([top, lower], axis=-2)
        rhs = jnp.concatenate([-c, active * h], axis=-1)
        # Float32 LU + compensated iterative refinement: ~eps-relative
        # solution even at kappa ~ 1e7 (utils/ff.py).
        sol = solve_refined(K, rhs)
        x_p, z_p = sol[..., :n], sol[..., n:]

        # Certify with a compensated KKT residual (a plain f32 evaluation
        # would bury the true residual under evaluation roundoff).
        r_full = residual_compensated(K, sol, rhs)
        r_dual_p = r_full[..., :n]
        slack_p = h - jnp.einsum("...ij,...j->...i", G, x_p)
        ok = (
            jnp.all(jnp.isfinite(x_p), axis=-1)
            & jnp.all(jnp.isfinite(z_p), axis=-1)
            & (jnp.min(slack_p, axis=-1) > -feas_tol)
            & (jnp.min(z_p, axis=-1) > -z_tol)
            & (jnp.max(jnp.abs(r_dual_p), axis=-1) < cert_dr)
        )
        return ok, x_p, z_p, slack_p

    # Active-set refinement: start from the barrier iterate's guess and run
    # qpOASES-style single-swap iterations — add the most violated row, else
    # drop the most negative multiplier. Float32 barrier iterates sometimes
    # misidentify the set (especially near degeneracy); a handful of swaps
    # with certified EQP solves repairs it. All instances run the same fixed
    # number of swaps; certified instances freeze.
    a0 = (z_ipm > s_ipm).astype(dtype)
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    certified0 = jnp.zeros(a0.shape[:-1], dtype=bool)

    def sweep(_, carry):
        a, best_x, best_z, best_s, certified = carry
        ok, x_p, z_p, slack_p = try_active(a)
        take = (ok & ~certified)[..., None]
        best_x = jnp.where(take, x_p, best_x)
        best_z = jnp.where(take, jnp.maximum(z_p, 0.0), best_z)
        best_s = jnp.where(take, jnp.maximum(slack_p, 0.0), best_s)
        certified = certified | ok

        # Most violated inactive row (add) / most negative multiplier (drop).
        viol = jnp.where(a > 0.5, -big, -slack_p)  # (..., m)
        viol_max = jnp.max(viol, axis=-1)
        add_idx = jnp.argmax(viol, axis=-1)
        negz = jnp.where(a > 0.5, z_p, big)
        neg_min = jnp.min(negz, axis=-1)
        drop_idx = jnp.argmin(negz, axis=-1)

        do_add = viol_max > feas_tol
        do_drop = (~do_add) & (neg_min < -z_tol)
        onehot_add = jax.nn.one_hot(add_idx, m, dtype=dtype)
        onehot_drop = jax.nn.one_hot(drop_idx, m, dtype=dtype)
        a_new = jnp.where(do_add[..., None], jnp.maximum(a, onehot_add),
                          jnp.where(do_drop[..., None],
                                    a * (1.0 - onehot_drop), a))
        a = jnp.where(certified[..., None], a, a_new)
        return a, best_x, best_z, best_s, certified

    _, best_x, best_z, best_s, certified = lax.fori_loop(
        0, _POLISH_SWEEPS, sweep, (a0, x_ipm, z_ipm, s_ipm, certified0)
    )
    return best_x, best_z, best_s, certified


def equilibrate(Q, c, G, h):
    """Diagonal problem scaling (OSQP-style, one-shot).

    Float32 on TPU cannot run the barrier path on the raw GRF problem
    (h spans [0, 1e4], |c| ~ 1e4, kappa(Q) ~ 1e6): variables are scaled by
    1/sqrt(diag(Q)) (Jacobi), constraint rows of the scaled G to unit
    inf-norm, and the cost to unit magnitude. Returns the scaled problem and
    the scaling factors needed to map the solution back:

      x = Dv * x_s,  z = (Er / nu) * z_s,  s = s_s / Er.
    """
    diag_q = jnp.diagonal(Q, axis1=-2, axis2=-1)
    Dv = 1.0 / jnp.sqrt(jnp.maximum(diag_q, 1e-12))  # (..., n)
    Qs = Q * Dv[..., :, None] * Dv[..., None, :]
    cs = c * Dv
    Gs = G * Dv[..., None, :]
    row_norm = jnp.maximum(jnp.max(jnp.abs(Gs), axis=-1), 1e-12)  # (..., m)
    Er = 1.0 / row_norm
    Gs = Gs * Er[..., None]
    hs = h * Er
    nu = 1.0 / jnp.maximum(jnp.max(jnp.abs(cs), axis=-1), 1e-12)  # (...,)
    Qs = Qs * nu[..., None, None]
    cs = cs * nu[..., None]
    return Qs, cs, Gs, hs, Dv, Er, nu


@partial(jax.jit, static_argnames=("iterations", "polish", "scale", "d_max", "reg_factor", "unrolled_linalg"))
def solve_qp_ipm(Q, c, G, h, iterations: int = 25, tol: float = 1e-7,
                 tau: float = 0.995, static_reg: float = 0.0,
                 polish: bool = True, scale: bool = True,
                 d_max: float | None = None, reg_factor: float = 100.0,
                 unrolled_linalg: bool = False,
                 warm_start=None, warm_reset_mask=None) -> IPMSolution:
    """Solve a batch of inequality-constrained QPs.

    Args:
      Q: (..., n, n) SPD Hessians.
      c: (..., n).
      G: (..., m, n) inequality rows.
      h: (..., m) bounds (G x <= h).
      iterations: fixed Newton iteration count (static for jit; every
        instance in the batch runs the same schedule — the TPU-friendly
        replacement for per-instance early exit).
      tol: convergence tolerance used only for the reported ``converged``
        mask (relative on residuals and gap).
      tau: fraction-to-the-boundary parameter.
      static_reg: optional diagonal regularization added to the condensed
        KKT matrix (0 disables).
      polish: run the active-set polish after the barrier loop.
      scale: equilibrate the problem first (required for float32).
      warm_start: optional (x, s, z) in ORIGINAL units — typically the
        previous tick's IPMSolution fields. Replaces the reference's
        qpOASES hotstart economics (balance_controller.cpp:193-195) for
        control/MPC streams: slacks and duals are pushed back to the
        interior (Mehrotra shift) so a nearby previous solution converges
        in a fraction of the cold-start schedule.
      warm_reset_mask: optional (..., m) bool — rows whose warm slack/dual
        are STALE and must cold-start (transition-aware reset). The gait
        use: when a leg flips stance<->swing its 6 cone rows jump between
        h = 0-bounds and the relaxed swing bound, so the carried (s, z) sit
        on the wrong side of the new boundary and stall the barrier; pass
        repeat(stance_changed, 6) to re-center exactly those rows.

    Returns:
      IPMSolution with leading batch dims preserved; diagnostics are
      reported in the ORIGINAL (unscaled) problem's units.
    """
    if scale:
        Q0, c0, G0, h0 = Q, c, G, h
        Q, c, G, h, Dv, Er, nu = equilibrate(Q, c, G, h)
    dtype = Q.dtype
    m = G.shape[-2]
    n = Q.shape[-1]
    eye_n = jnp.eye(n, dtype=dtype)

    # --- Initialization -----------------------------------------------------
    # Cold start: x0 = 0 (scale-free; the unconstrained minimizer -Q^-1 c is
    # catastrophic for the GRF family, whose W-regularized Hessian has ~1e-5
    # eigenvalues); s0: clamped slack at x0; z0 = mu0 / s0 so every
    # complementarity product starts at mu0 — this keeps the huge relaxed
    # swing-row slacks (h ~ 1e4) from inflating mu.
    if warm_start is None:
        x0 = jnp.zeros_like(c)
        s0 = jnp.maximum(h, 1.0)
        mu0 = jnp.asarray(1.0, dtype=dtype)
        z0 = mu0 / s0
    else:
        xw, sw, zw = warm_start
        if scale:
            # Map original-unit warm values into equilibrated coordinates.
            xw = xw / Dv
            sw = sw * Er
            zw = zw * nu[..., None] / Er
        # Push back to the interior: a boundary start (s or z ~ 0) stalls
        # the barrier; the shift re-centers at a modest mu.
        interior = jnp.asarray(1e-2, dtype=dtype)
        x0 = xw
        s0 = jnp.maximum(sw, interior)
        z0 = jnp.maximum(zw, interior)
        if warm_reset_mask is not None:
            s_cold = jnp.maximum(h, 1.0)
            s0 = jnp.where(warm_reset_mask, s_cold, s0)
            z0 = jnp.where(warm_reset_mask, 1.0 / s_cold, z0)

    # Freeze thresholds: once an instance reaches machine-precision optimality
    # further Newton steps only amplify roundoff (d = z/s overflows and the
    # Cholesky goes NaN), so converged instances stop moving. All instances
    # still run the same fixed schedule — the mask is data, not control flow.
    eps = jnp.finfo(dtype).eps
    obj_scale = 1.0 + jnp.max(jnp.abs(c), axis=-1)
    h_scale = 1.0 + jnp.max(jnp.abs(h), axis=-1)
    # Freeze ~3 decades below the user tolerance (or at the roundoff floor,
    # whichever is higher) — tight enough for 1e-6-level objective parity,
    # early enough that the condensed system is still well-posed.
    freeze_gap = jnp.maximum(1e-4 * tol, 100.0 * eps) * obj_scale
    freeze_pr = jnp.maximum(tol, 50.0 * eps) * h_scale
    freeze_dr = jnp.maximum(tol, 50.0 * eps) * obj_scale
    if d_max is None:
        d_max = 1.0 / eps

    def body(_, carry):
        x, s, z, best = carry
        Gx = jnp.einsum("...ij,...j->...i", G, x)
        r_dual = (
            jnp.einsum("...ij,...j->...i", Q, x)
            + c
            + jnp.einsum("...ji,...j->...i", G, z)
        )
        r_prim = Gx + s - h

        # Best-iterate tracking: float32 late-stage steps can regress or blow
        # up; the returned iterate is the best by scaled KKT merit, making
        # extra iterations always safe.
        merit = (
            jnp.max(jnp.abs(r_prim), axis=-1) / h_scale
            + jnp.max(jnp.abs(r_dual), axis=-1) / obj_scale
            + jnp.abs(jnp.sum(s * z, axis=-1)) / (m * obj_scale)
        )
        bx, bs, bz, bmerit = best
        improve = (merit < bmerit) & jnp.all(jnp.isfinite(x), axis=-1)
        imp = improve[..., None]
        best = (
            jnp.where(imp, x, bx),
            jnp.where(imp, s, bs),
            jnp.where(imp, z, bz),
            jnp.where(improve, merit, bmerit),
        )

        d = jnp.minimum(z / s, d_max)  # (..., m)
        M = Q + jnp.einsum("...ki,...k,...kj->...ij", G, d, G)
        if static_reg:
            M = M + static_reg * eye_n
        # Late-stage barrier terms reach d ~ 1/eps, and rounding then makes M
        # numerically indefinite relative to Q's smallest eigenvalues
        # (~1e-5 for the W-regularized GRF Hessian). Factor a regularized
        # copy and recover accuracy with one refinement pass against the
        # true M — the standard condensed-KKT recipe.
        diag_M = jnp.diagonal(M, axis1=-2, axis2=-1)
        delta = (reg_factor * eps) * jnp.max(diag_M, axis=-1)
        M_reg = M + delta[..., None, None] * eye_n

        if unrolled_linalg:
            # Fully-unrolled batched Cholesky: elementwise on (B,) lanes,
            # ~10x faster than XLA's generic batched factorization for n=12.
            from quadruped_control_tpu.solver.smallalg import (
                cholesky_solve_unrolled,
                cholesky_unrolled,
            )

            Lu = cholesky_unrolled(M_reg, n)

            def kkt_solve(rhs):
                dx = cholesky_solve_unrolled(Lu, rhs, n)
                resid = rhs - jnp.einsum("...ij,...j->...i", M, dx)
                return dx + cholesky_solve_unrolled(Lu, resid, n)
        else:
            L = jnp.linalg.cholesky(M_reg)

            def kkt_solve(rhs):
                dx = _cholesky_solve(L, rhs)
                resid = rhs - jnp.einsum("...ij,...j->...i", M, dx)
                return dx + _cholesky_solve(L, resid)

        mu = jnp.sum(s * z, axis=-1) / m

        # ---- affine (predictor) step ----
        r_cent_aff = s * z
        rhs_aff = -(r_dual + jnp.einsum(
            "...ji,...j->...i", G, (z * r_prim - r_cent_aff) / s
        ))
        dx_aff = kkt_solve(rhs_aff)
        ds_aff = -r_prim - jnp.einsum("...ij,...j->...i", G, dx_aff)
        dz_aff = -(r_cent_aff + z * ds_aff) / s

        alpha_s = _max_step(s, ds_aff, jnp.asarray(1.0, dtype))
        alpha_z = _max_step(z, dz_aff, jnp.asarray(1.0, dtype))
        alpha_aff = jnp.minimum(alpha_s, alpha_z)

        mu_aff = jnp.sum(
            (s + alpha_aff[..., None] * ds_aff) * (z + alpha_aff[..., None] * dz_aff),
            axis=-1,
        ) / m
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3

        # ---- corrector step (reuses the factorization) ----
        r_cent = s * z + ds_aff * dz_aff - (sigma * mu)[..., None]
        rhs = -(r_dual + jnp.einsum(
            "...ji,...j->...i", G, (z * r_prim - r_cent) / s
        ))
        dx = kkt_solve(rhs)
        ds = -r_prim - jnp.einsum("...ij,...j->...i", G, dx)
        dz = -(r_cent + z * ds) / s

        alpha = jnp.minimum(_max_step(s, ds, tau), _max_step(z, dz, tau))

        done = (
            (mu < freeze_gap)
            & (jnp.max(jnp.abs(r_prim), axis=-1) < freeze_pr)
            & (jnp.max(jnp.abs(r_dual), axis=-1) < freeze_dr)
        )
        # Guard: a step that overflowed (inf/nan anywhere) is skipped rather
        # than letting one bad instance poison its lane.
        step_ok = (
            jnp.all(jnp.isfinite(dx), axis=-1)
            & jnp.all(jnp.isfinite(ds), axis=-1)
            & jnp.all(jnp.isfinite(dz), axis=-1)
        )
        a = jnp.where(done | ~step_ok, 0.0, alpha)[..., None]
        tiny = jnp.finfo(dtype).tiny
        return (
            x + a * dx,
            jnp.maximum(s + a * ds, tiny),
            jnp.maximum(z + a * dz, tiny),
            best,
        )

    batch = jnp.broadcast_shapes(Q.shape[:-2], c.shape[:-1], h.shape[:-1])
    best0 = (
        jnp.broadcast_to(x0, batch + (n,)),
        jnp.broadcast_to(s0, batch + (m,)),
        jnp.broadcast_to(z0, batch + (m,)),
        jnp.full(batch, jnp.inf, dtype=dtype),
    )
    x, s, z, best = lax.fori_loop(
        0, iterations, body, (x0, s0, z0, best0)
    )
    # One more merit evaluation for the final iterate.
    r_dual_f = (
        jnp.einsum("...ij,...j->...i", Q, x)
        + c
        + jnp.einsum("...ji,...j->...i", G, z)
    )
    r_prim_f = jnp.einsum("...ij,...j->...i", G, x) + s - h
    merit_f = (
        jnp.max(jnp.abs(r_prim_f), axis=-1) / h_scale
        + jnp.max(jnp.abs(r_dual_f), axis=-1) / obj_scale
        + jnp.abs(jnp.sum(s * z, axis=-1)) / (m * obj_scale)
    )
    bx, bs, bz, bmerit = best
    keep_final = (merit_f < bmerit) & jnp.all(jnp.isfinite(x), axis=-1)
    kf = keep_final[..., None]
    x = jnp.where(kf, x, bx)
    s = jnp.where(kf, s, bs)
    z = jnp.where(kf, z, bz)

    certified = None
    if polish:
        x, z, s, certified = _polish(Q, c, G, h, x, z, s)

    if scale:
        # Map back to the original problem's units.
        x = x * Dv
        z = z * Er / nu[..., None]
        s = s / Er
        Q, c, G, h = Q0, c0, G0, h0

    # --- Final diagnostics --------------------------------------------------
    r_dual = (
        jnp.einsum("...ij,...j->...i", Q, x)
        + c
        + jnp.einsum("...ji,...j->...i", G, z)
    )
    r_prim = jnp.einsum("...ij,...j->...i", G, x) + s - h
    gap = jnp.sum(s * z, axis=-1) / m
    scale = 1.0 + jnp.max(jnp.abs(c), axis=-1)
    pr = jnp.max(jnp.abs(r_prim), axis=-1)
    dr = jnp.max(jnp.abs(r_dual), axis=-1)
    converged = (pr < tol * (1.0 + jnp.max(jnp.abs(h), axis=-1))) & \
                (dr < tol * scale) & (gap < tol * scale)
    if certified is not None:
        # A polish certificate (KKT-verified at ~30 eps on the equilibrated
        # problem) is a stronger statement than the tol-based check.
        converged = converged | certified

    return IPMSolution(
        x=x, z=z, s=s,
        iterations=jnp.asarray(iterations),
        gap=gap, primal_residual=pr, dual_residual=dr, converged=converged,
    )


def qp_objective(Q, c, x):
    """1/2 x^T Q x + c^T x (batched)."""
    Qx = jnp.einsum("...ij,...j->...i", Q, x)
    return 0.5 * jnp.sum(x * Qx, axis=-1) + jnp.sum(c * x, axis=-1)


@partial(jax.jit, static_argnames=("prox_steps", "iterations", "polish",
                                   "unrolled_linalg"))
def solve_qp_prox(Q, c, G, h, x0=None, rho_rel: float = 1e-2,
                  prox_steps: int = 4, iterations: int = 30,
                  tol: float = 3e-5, polish: bool = True,
                  unrolled_linalg: bool = True) -> IPMSolution:
    """Proximal-point restart for ill-conditioned QPs.

    Solves x_{k+1} = argmin 1/2 x^T (Q + rho I) x + (c - rho x_k)^T x
    s.t. Gx <= h for ``prox_steps`` rounds (ProxQP-style). Each subproblem's
    conditioning improves by ~rho/lambda_min(Q), so float32 solves it
    cleanly, and the ORIGINAL problem's dual residual at round k is exactly
    rho (x_{k-1} - x_k) — it contracts as the prox iterates converge.

    Built for the GRF family's certification tail: the degenerate 4-stance
    instances (rank-6 A^T S A + 1e-5 W, condition ~1e6) sit at f32's
    stationarity floor for direct solves; measured on the harvested hard
    set (scripts/tail_prox.py, TPU f32), prox rho_rel=1e-2 x4 certifies
    ~80% of them vs ~30% for a direct 60-iteration solve, objective error
    p50 ~2e-8.

    Args:
      x0: optional (..., n) warm point (e.g. the failed solve's iterate).
      rho_rel: rho = rho_rel * mean(diag(Q)) per instance.
      tol: certification tolerance, applied to the ORIGINAL KKT.
    Returns:
      IPMSolution whose ``converged`` certifies against the ORIGINAL
      (Q, c) — not the proximal subproblem.
    """
    n = Q.shape[-1]
    m = G.shape[-2]
    diag = jnp.einsum("...ii->...i", Q)
    rho = rho_rel * diag.mean(-1)[..., None]
    Qp = Q + rho[..., None] * jnp.eye(n, dtype=Q.dtype)
    xk = jnp.zeros_like(c) if x0 is None else x0

    sol = None
    for _ in range(prox_steps):
        sol = solve_qp_ipm(Qp, c - rho * xk, G, h, iterations=iterations,
                           polish=polish, tol=tol,
                           unrolled_linalg=unrolled_linalg)
        xk = sol.x

    # Certify against the ORIGINAL problem (solve_qp_ipm's criterion).
    pr = jnp.abs(
        jnp.einsum("...ij,...j->...i", G, xk) + sol.s - h).max(-1)
    dr = jnp.abs(
        jnp.einsum("...ij,...j->...i", Q, xk) + c
        + jnp.einsum("...ij,...i->...j", G, sol.z)).max(-1)
    gap = jnp.abs(jnp.einsum("...i,...i->...", sol.s, sol.z)) / m
    scale = 1.0 + jnp.abs(c).max(-1)
    hmax = 1.0 + jnp.abs(h).max(-1)
    converged = (pr < tol * hmax) & (dr < tol * scale) & (gap < tol * scale)
    return IPMSolution(x=xk, z=sol.z, s=sol.s,
                       iterations=jnp.asarray(prox_steps * iterations),
                       gap=gap, primal_residual=pr, dual_residual=dr,
                       converged=converged)
