"""Compensated ("float-float") arithmetic helpers for float32 TPUs.

TPU v5e has no float64 ALU. The GRF QP family needs ~1e-6-relative linear
solves on systems with condition numbers near 1/eps_f32 — unreachable by
plain float32. The classic mixed-precision remedy (Wilkinson iterative
refinement) only works if the RESIDUAL r = b - A x is computed to better
than working precision; these helpers provide that via error-free
transformations (Dekker splitting + Neumaier compensated summation), turning
each float32 product/sum into a (value, error) pair without any float64.

Used by the solver polish path (solver/ipm.py) and available to the MPC
stack. All functions are elementwise/vmappable jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Dekker split constant for float32: 2^12 + 1 (24-bit mantissa -> 12+12).
_SPLIT_F32 = 4097.0
# For float64: 2^27 + 1.
_SPLIT_F64 = 134217729.0


def _split_const(dtype):
    return _SPLIT_F32 if dtype == jnp.float32 else _SPLIT_F64


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth TwoSum, 6 flops)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def split(a):
    """Dekker split: a = hi + lo with hi, lo having half-width mantissas."""
    c = jnp.asarray(_split_const(a.dtype), a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker, FMA-free)."""
    p = a * b
    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _df_add(a_hi, a_lo, b_hi, b_lo):
    """Double-float addition: (a_hi + a_lo) + (b_hi + b_lo) -> (hi, lo)."""
    s, e = two_sum(a_hi, b_hi)
    e = e + (a_lo + b_lo)
    hi, lo = two_sum(s, e)
    return hi, lo


def compensated_sum(terms, axis: int = -1):
    """Compensated summation along ``axis`` via a pairwise double-float
    reduction tree (log-depth, fully vectorized — a sequential Neumaier scan
    would serialize on TPU).

    Returns the sum accurate to ~eps * |sum| + n * eps^2 * sum|terms| —
    i.e. cancellation between large terms is captured instead of lost.
    """
    terms = jnp.moveaxis(terms, axis, 0)
    hi = terms
    lo = jnp.zeros_like(terms)
    while hi.shape[0] > 1:
        k = hi.shape[0]
        if k % 2 == 1:
            hi = jnp.concatenate([hi, jnp.zeros_like(hi[:1])], axis=0)
            lo = jnp.concatenate([lo, jnp.zeros_like(lo[:1])], axis=0)
            k += 1
        hi, lo = _df_add(hi[0::2], lo[0::2], hi[1::2], lo[1::2])
    return hi[0] + lo[0]


def residual_compensated(A, x, b):
    """r = b - A @ x with compensated products and summation.

    The returned float32 residual is accurate to ~eps * |r| even when
    |r| << |A||x| (deep cancellation) — exactly what iterative refinement
    needs to make a float32 factorization deliver ~1e-7-relative solutions.

    Args:
      A: (..., n, n); x: (..., n); b: (..., n).
    Returns:
      (..., n).
    """
    p, e = two_prod(A, x[..., None, :])  # (..., n, n) each
    terms = jnp.concatenate([-b[..., None], p], axis=-1)
    main = compensated_sum(terms, axis=-1)
    return -(main + jnp.sum(e, axis=-1))


def solve_refined(A, b, n_refine: int = 4):
    """Solve A x = b via float32 LU + compensated iterative refinement.

    Forward error contracts by ~(eps * kappa) per sweep; with the
    compensated residual the limiting accuracy is ~eps relative — for
    kappa ~ 1e5-1e6 in float32, 3-4 sweeps reach it. In float64 this is
    simply a very accurate dense solve.

    Args:
      A: (..., n, n); b: (..., n).
    Returns:
      (..., n).
    """
    lu, piv, perm = lax.linalg.lu(A)

    def lu_solve(rhs):
        # A = P L U with rows permuted by ``perm``: x = U^-1 L^-1 rhs[perm].
        bp = jnp.take_along_axis(rhs, perm, axis=-1)[..., None]
        y = lax.linalg.triangular_solve(
            lu, bp, left_side=True, lower=True, unit_diagonal=True
        )
        return lax.linalg.triangular_solve(
            lu, y, left_side=True, lower=False
        )[..., 0]

    x = lu_solve(b)

    def refine(_, x):
        r = residual_compensated(A, x, b)
        return x + lu_solve(r)

    return lax.fori_loop(0, n_refine, refine, x)
