"""Differentiable QP solve: implicit-function-theorem custom VJP.

Differentiating through the unrolled barrier loop works (the stack is pure
JAX) but costs ~iterations x the forward pass in memory/time and cannot see
through the certified polish's argmin selects. This module provides the
standard OptNet-style implicit gradient (Amos & Kolter 2017) instead: the
solution map (Q, c, G, h) -> x*(Q, c, G, h) of

    min 1/2 x^T Q x + c^T x   s.t.  G x <= h

is differentiated by the KKT conditions at the solved point:

    Q x + c + G^T z = 0,     diag(z) (G x - h) = 0.

Backward: with dtx = -(d/dx L) pulled through K^{-T} (K the KKT Jacobian),

    dL/dc = -dtx
    dL/dQ = -sym(dtx x^T)
    dL/dG = -(z dtx^T + diag(z) dtz x^T)
    dL/dh = z * dtz

The K^{-T} solve uses the FULL (n+m) KKT Jacobian, NOT the z/s-condensed
normal form: the GRF family mixes ~1e-5-curvature swing directions with
active constraint rows, and the condensed form's z/(s+delta) ~ 1e10 weights
poison any diagonal-relative regularization of the soft directions (a
measured 19x gradient error). The full K keeps every entry at problem
scale (Q, z, s — no ratios), so a plain LU + one refinement pass is exact
under strict complementarity (the generic case; tested against finite
differences and unrolled autodiff).

This enables gradient-based gain/gait/morphology tuning through the GRF
controller — a capability class the reference stack (qpOASES, C++) cannot
touch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quadruped_control_tpu.solver.ipm import solve_qp_ipm


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def solve_qp_implicit(Q, c, G, h, iterations: int = 30, polish: bool = True,
                      delta: float = 1e-8):
    """QP solve returning only x*, with IFT gradients w.r.t. (Q, c, G, h).

    The forward pass is the full certified solver (polish included — the
    gradient does not differentiate through it, it differentiates the
    OPTIMALITY CONDITIONS at the returned point, so a more accurate forward
    point gives more accurate gradients).
    """
    sol = solve_qp_ipm(Q, c, G, h, iterations=iterations, polish=polish)
    return sol.x


def _fwd(Q, c, G, h, iterations, polish, delta):
    sol = solve_qp_ipm(Q, c, G, h, iterations=iterations, polish=polish)
    return sol.x, (Q, c, G, h, sol.x, sol.z, sol.s)


def _bwd(iterations, polish, delta, res, gx):
    Q, c, G, h, x, z, s = res
    dtype = Q.dtype
    n = Q.shape[-1]
    m = G.shape[-2]
    batch = jnp.broadcast_shapes(Q.shape[:-2], G.shape[:-2], z.shape[:-1])

    # K^T = [[Q, G^T diag(z)], [G, -diag(s + delta)]]; delta regularizes
    # weakly-active rows (z ~ s ~ 0), where the implicit derivative is
    # genuinely set-valued.
    GTz = jnp.swapaxes(G, -1, -2) * z[..., None, :]
    top = jnp.concatenate([jnp.broadcast_to(Q, batch + (n, n)), GTz], axis=-1)
    d_reg = jnp.asarray(delta, dtype) * (1.0 + jnp.abs(h))
    diag_s = -(s + d_reg)
    eye_m = jnp.eye(m, dtype=dtype)
    bottom = jnp.concatenate(
        [jnp.broadcast_to(G, batch + (m, n)),
         diag_s[..., None, :] * eye_m], axis=-1)
    KT = jnp.concatenate([top, bottom], axis=-2)
    rhs = jnp.concatenate(
        [jnp.broadcast_to(gx, batch + (n,)),
         jnp.zeros(batch + (m,), dtype)], axis=-1)

    lu, piv = jax.scipy.linalg.lu_factor(KT)
    sol = jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None])[..., 0]
    # One refinement pass.
    resid = rhs - jnp.einsum("...ij,...j->...i", KT, sol)
    sol = sol + jax.scipy.linalg.lu_solve((lu, piv), resid[..., None])[..., 0]

    dtx, dtlam = sol[..., :n], sol[..., n:]
    z_dtlam = z * dtlam

    dQ = -0.5 * (dtx[..., :, None] * x[..., None, :]
                 + x[..., :, None] * dtx[..., None, :])
    dc = -dtx
    dG = -(z[..., :, None] * dtx[..., None, :]
           + z_dtlam[..., :, None] * x[..., None, :])
    dh = z_dtlam
    return dQ, dc, dG, dh


solve_qp_implicit.defvjp(_fwd, _bwd)
