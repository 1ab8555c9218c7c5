"""Unrolled small-matrix linear algebra for batched tiny problems.

XLA's generic batched ``cholesky``/``triangular_solve``/``lu`` are built for
large matrices; on (B, 12, 12) problems they lower to serialized loops or
padded 128x128 MXU tiles and dominate the solver's runtime. Here the
factorizations are fully unrolled over the (static, tiny) matrix dimension
into pure elementwise ops on (B,) vectors — the whole batch rides the VPU
lanes and XLA fuses the ~400-statement chains into a handful of kernels.
This is the same "one instance per lane" layout the Pallas kernel uses; the
unrolled jnp version is its portable twin (and its correctness oracle).

All functions take (..., n, n) / (..., n) arrays with any batch shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_unrolled(A, n: int):
    """Lower Cholesky of (..., n, n) SPD matrices, fully unrolled.

    Returns columns as a list-of-lists L[i][j] (i >= j) of (...,) arrays to
    keep everything register-like; use :func:`cholesky_solve_unrolled` to
    consume it.
    """
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = a[j][j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        # Non-PD pivot -> NaN, matching jnp.linalg.cholesky semantics: the
        # solver's finite-step guard then rejects the step instead of
        # accepting a huge-but-finite garbage direction.
        d = jnp.where(d > 0.0, d, jnp.nan)
        inv = jax.lax.rsqrt(d)
        L[j][j] = d * inv  # sqrt(d)
        for i in range(j + 1, n):
            v = a[i][j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    return L


def cholesky_solve_unrolled(L, b, n: int):
    """Solve (L L^T) x = b given unrolled ``L``; b is (..., n)."""
    y = [None] * n
    for i in range(n):
        v = b[..., i]
        for k in range(i):
            v = v - L[i][k] * y[k]
        y[i] = v / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        v = y[i]
        for k in range(i + 1, n):
            v = v - L[k][i] * x[k]
        x[i] = v / L[i][i]
    return jnp.stack(x, axis=-1)


def cholesky_factor_solve(A, b, n: int):
    """One-shot solve A x = b for (..., n, n) SPD A."""
    return cholesky_solve_unrolled(cholesky_unrolled(A, n), b, n)
