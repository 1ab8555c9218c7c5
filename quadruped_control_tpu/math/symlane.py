"""Symbolic-zero lane-vector algebra for Pallas TPU kernels.

The whole-body / commander kernels (sim/pallas_substep.py,
control/pallas_commander.py) run every scalar of their algorithms as a
``(rows, 128)`` lane vector over batch instances, with model parameters
baked in as compile-time Python floats. This module is the shared algebra:

  - values are ``lane tile | float | None`` where ``None`` is an EXACT zero
    folded away at trace time (a 13-body RNEA has hundreds of structurally
    zero terms — folding them is a ~2x kernel-size win);
  - 3-vectors are tuples, 3x3 matrices are nested lists of such values;
  - :func:`atan2` / :func:`atan` provide the arc tangent Mosaic does not
    implement (``jnp.arctan2`` raises ``Unimplemented primitive ... atan2``
    in the TPU lowering), as a degree-10 polynomial in z^2 with octant
    reduction — max abs error 1.6e-10 over the full plane, i.e. exact to
    f32 and tight enough for float64 interpret-mode parity tests.

Extracted from sim/pallas_substep.py so the fused commander kernel can
share it; that module re-exports these names for compatibility.
"""

from __future__ import annotations

import jax.numpy as jnp

# --- scalar symbolic ops -----------------------------------------------------


def _add(*xs):
    out = None
    for x in xs:
        if x is None:
            continue
        out = x if out is None else out + x
    return out


def _smul(c: float, v):
    if v is None or c == 0.0:
        return None
    if isinstance(v, float):
        out = c * v
        return None if out == 0.0 else out
    if c == 1.0:
        return v
    return c * v


def _mul(a, b):
    if a is None or b is None:
        return None
    if isinstance(a, float):
        return _smul(a, b)
    if isinstance(b, float):
        return _smul(b, a)
    return a * b


def _neg(v):
    return None if v is None else -v


def _cst(x):
    """Python float constant; exact zeros become the symbolic None."""
    x = float(x)
    return None if x == 0.0 else x


def _conc(v, zero):
    """Materialize a symbolic value to a concrete tile."""
    if v is None:
        return zero
    if isinstance(v, float):
        return zero + v
    return v


# --- 3-vector ops ------------------------------------------------------------


def _vadd(a, b):
    return tuple(_add(a[i], b[i]) for i in range(3))


def _vsmul(c: float, v):
    return tuple(_smul(c, v[i]) for i in range(3))


def _vmul(c, v):
    """Elementwise scale of a 3-tuple by a value (tile/float/None)."""
    return tuple(_mul(c, v[i]) for i in range(3))


def _neg3(v):
    return tuple(_neg(x) for x in v)


def _cross(a, b):
    return (
        _add(_mul(a[1], b[2]), _neg(_mul(a[2], b[1]))),
        _add(_mul(a[2], b[0]), _neg(_mul(a[0], b[2]))),
        _add(_mul(a[0], b[1]), _neg(_mul(a[1], b[0]))),
    )


def _const_cross(c: tuple, v):
    """cross(const float3 c, v), zeros folded."""
    return (
        _add(_smul(c[1], v[2]), _neg(_smul(c[2], v[1]))),
        _add(_smul(c[2], v[0]), _neg(_smul(c[0], v[2]))),
        _add(_smul(c[0], v[1]), _neg(_smul(c[1], v[0]))),
    )


def _dot3(a, b):
    return _add(_mul(a[0], b[0]), _mul(a[1], b[1]), _mul(a[2], b[2]))


def _matvec(M, v):
    return tuple(
        _add(_mul(M[i][0], v[0]), _mul(M[i][1], v[1]), _mul(M[i][2], v[2]))
        for i in range(3)
    )


def _matTvec(M, v):
    return tuple(
        _add(_mul(M[0][i], v[0]), _mul(M[1][i], v[1]), _mul(M[2][i], v[2]))
        for i in range(3)
    )


# --- 3x3 symbolic matrices ---------------------------------------------------


def _m3c(mat):
    """Constant numpy 3x3 -> symbolic matrix."""
    return [[_cst(mat[i, j]) for j in range(3)] for i in range(3)]


def _m3T(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def _m3mul(A, B):
    return [
        [
            _add(_mul(A[i][0], B[0][j]), _mul(A[i][1], B[1][j]),
                 _mul(A[i][2], B[2][j]))
            for j in range(3)
        ]
        for i in range(3)
    ]


def _m3add(A, B):
    return [[_add(A[i][j], B[i][j]) for j in range(3)] for i in range(3)]


def _m3sub(A, B):
    return [[_add(A[i][j], _neg(B[i][j])) for j in range(3)]
            for i in range(3)]


def _m3smul(c: float, A):
    return [[_smul(c, A[i][j]) for j in range(3)] for i in range(3)]


def _skewm(v):
    """Symbolic skew(v) matrix."""
    return [
        [None, _neg(v[2]), v[1]],
        [v[2], None, _neg(v[0])],
        [_neg(v[1]), v[0], None],
    ]


def _inv3_sym(M, one=1.0):
    """Closed-form symbolic 3x3 inverse (adjugate / det) — mirrors
    sim/dynamics._inv3."""
    a, b, c = M[0]
    d, e, f = M[1]
    g, h, i = M[2]
    A = _add(_mul(e, i), _neg(_mul(f, h)))
    B = _add(_mul(f, g), _neg(_mul(d, i)))
    C = _add(_mul(d, h), _neg(_mul(e, g)))
    det = _add(_mul(a, A), _mul(b, B), _mul(c, C))
    invdet = one / det
    adj = [
        [A, _add(_mul(c, h), _neg(_mul(b, i))),
         _add(_mul(b, f), _neg(_mul(c, e)))],
        [B, _add(_mul(a, i), _neg(_mul(c, g))),
         _add(_mul(c, d), _neg(_mul(a, f)))],
        [C, _add(_mul(b, g), _neg(_mul(a, h))),
         _add(_mul(a, e), _neg(_mul(b, d)))],
    ]
    return [[_mul(adj[i_][j_], invdet) for j_ in range(3)]
            for i_ in range(3)]


def _adj3_sym(M):
    """Symbolic adjugate and determinant of a 3x3 (no division) —
    ops/kinematics._adjugate_3x3 in lane form."""
    a, b, c = M[0]
    d, e, f = M[1]
    g, h, i = M[2]
    A = _add(_mul(e, i), _neg(_mul(f, h)))
    B = _add(_mul(f, g), _neg(_mul(d, i)))
    C = _add(_mul(d, h), _neg(_mul(e, g)))
    det = _add(_mul(a, A), _mul(b, B), _mul(c, C))
    adj = [
        [A, _add(_mul(c, h), _neg(_mul(b, i))),
         _add(_mul(b, f), _neg(_mul(c, e)))],
        [B, _add(_mul(a, i), _neg(_mul(c, g))),
         _add(_mul(c, d), _neg(_mul(a, f)))],
        [C, _add(_mul(b, g), _neg(_mul(a, h))),
         _add(_mul(a, e), _neg(_mul(b, d)))],
    ]
    return adj, det


# --- arc tangent (Mosaic has no atan/atan2 primitive) ------------------------

# atan(z) = z * P(z^2) on z in [0, 1]; least-squares on Chebyshev nodes,
# max abs error 1.5e-10 (degree 10 in z^2).
_ATAN_COEFFS = (
    9.99999997e-01, -3.33333054e-01, 1.99991831e-01, -1.42748524e-01,
    1.10305298e-01, -8.71901470e-02, 6.55037123e-02, -4.21882175e-02,
    2.05366863e-02, -6.42141417e-03, 9.41994382e-04,
)

_HALF_PI = 1.5707963267948966
_PI = 3.141592653589793


def atan01(z):
    """atan for a concrete tile z in [0, 1]."""
    s = z * z
    p = z * 0.0 + _ATAN_COEFFS[-1]
    for c in reversed(_ATAN_COEFFS[:-1]):
        p = p * s + c
    return z * p


def atan2(y, x):
    """Four-quadrant arc tangent on concrete tiles, matching
    ``jnp.arctan2`` semantics on finite inputs (including the axes and
    atan2(0, 0) = 0; IEEE signed-zero distinctions are not preserved)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, jnp.asarray(1e-38, dtype=hi.dtype))
    a = atan01(z)
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)


def atan(x):
    """Arc tangent of a concrete tile (full real line)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1.0), ax)
    a = atan01(z)
    a = jnp.where(inv, _HALF_PI - a, a)
    return jnp.where(x < 0.0, -a, a)
