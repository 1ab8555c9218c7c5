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


@partial(jax.jit, static_argnames=("iterations",))
def solve_qp_ipm(Q, c, G, h, iterations: int = 25, tol: float = 1e-7,
                 tau: float = 0.995, static_reg: float = 0.0) -> IPMSolution:
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
        KKT matrix (0 disables; f32 runs may want ~1e-7 * ||Q||).

    Returns:
      IPMSolution with leading batch dims preserved.
    """
    dtype = Q.dtype
    m = G.shape[-2]
    n = Q.shape[-1]
    eye_n = jnp.eye(n, dtype=dtype)

    # --- Initialization -----------------------------------------------------
    # x0: unconstrained minimizer (Q is SPD); s0: clamped slack at x0;
    # z0 = mu0 / s0 so every complementarity product starts at mu0 — this
    # keeps the huge relaxed swing-row slacks (h ~ 1e4) from inflating mu.
    L0 = jnp.linalg.cholesky(Q + static_reg * eye_n)
    x0 = _cholesky_solve(L0, -c)
    slack0 = h - jnp.einsum("...ij,...j->...i", G, x0)
    s0 = jnp.maximum(slack0, 1.0)
    mu0 = jnp.asarray(1.0, dtype=dtype)
    z0 = mu0 / s0

    def body(_, carry):
        x, s, z = carry
        Gx = jnp.einsum("...ij,...j->...i", G, x)
        r_dual = (
            jnp.einsum("...ij,...j->...i", Q, x)
            + c
            + jnp.einsum("...ji,...j->...i", G, z)
        )
        r_prim = Gx + s - h

        d = z / s  # (..., m)
        M = Q + jnp.einsum("...ki,...k,...kj->...ij", G, d, G)
        if static_reg:
            M = M + static_reg * eye_n
        L = jnp.linalg.cholesky(M)

        mu = jnp.sum(s * z, axis=-1) / m

        # ---- affine (predictor) step ----
        r_cent_aff = s * z
        rhs_aff = -(r_dual + jnp.einsum(
            "...ji,...j->...i", G, (z * r_prim - r_cent_aff) / s
        ))
        dx_aff = _cholesky_solve(L, rhs_aff)
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
        dx = _cholesky_solve(L, rhs)
        ds = -r_prim - jnp.einsum("...ij,...j->...i", G, dx)
        dz = -(r_cent + z * ds) / s

        alpha = jnp.minimum(_max_step(s, ds, tau), _max_step(z, dz, tau))
        a = alpha[..., None]
        return (x + a * dx, s + a * ds, z + a * dz)

    x, s, z = lax.fori_loop(0, iterations, body, (x0, s0, z0))

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

    return IPMSolution(
        x=x, z=z, s=s,
        iterations=jnp.asarray(iterations),
        gap=gap, primal_residual=pr, dual_residual=dr, converged=converged,
    )


def qp_objective(Q, c, x):
    """1/2 x^T Q x + c^T x (batched)."""
    Qx = jnp.einsum("...ij,...j->...i", Q, x)
    return 0.5 * jnp.sum(x * Qx, axis=-1) + jnp.sum(c * x, axis=-1)
