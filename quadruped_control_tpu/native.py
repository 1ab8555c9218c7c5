"""ctypes loader for the native (C++) components.

The native library provides the host-side active-set QP solver
(native/active_set_qp.cc) — the framework's qpOASES-equivalent: a
double-precision, OpenMP-batched oracle used for large-scale validation of
the TPU solver and as a host fallback runtime. Built with ``make -C native``
(plain C ABI — no pybind11). Falls back transparently to the pure-NumPy
oracle (solver/reference.py) when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_NAME = "libquadruped_native.so"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or (_load_attempted and not build_if_missing):
        return _lib
    _load_attempted = True
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    if not os.path.exists(path) and build_if_missing:
        _try_build()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.qp_active_set_solve_batch.restype = ctypes.c_int
    lib.qp_active_set_solve_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double)] * 5 + [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
    ]
    lib.qp_native_abi_version.restype = ctypes.c_int
    assert lib.qp_native_abi_version() == 1
    _lib = lib
    return _lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def solve_qp_batch_native(Q, c, G, h, x0, max_iter: int = 200):
    """Batched active-set solve through the native library.

    Args:
      Q: (B, n, n), c: (B, n), G: (B, m, n), h: (B, m), x0: (B, n) feasible
        starts — all float64, C-contiguous (copied if not).
    Returns:
      (x, lam, kkt_err, status) with status 0 == optimal. Falls back to the
      NumPy oracle if the native library is unavailable.
    """
    lib = load_native()
    Q, c, G, h, x0 = (np.ascontiguousarray(a, dtype=np.float64)
                      for a in (Q, c, G, h, x0))
    B, n = c.shape
    m = h.shape[-1]

    if lib is None:
        from quadruped_control_tpu.solver.reference import solve_qp_active_set

        x = np.zeros((B, n))
        lam = np.zeros((B, m))
        kkt = np.zeros(B)
        status = np.zeros(B, dtype=np.int32)
        for b in range(B):
            sol = solve_qp_active_set(Q[b], c[b], G[b], h[b], x0=x0[b],
                                      max_iter=max_iter)
            x[b], lam[b], kkt[b] = sol.x, sol.lam, sol.kkt_error
            status[b] = 0 if sol.status == "optimal" else 1
        return x, lam, kkt, status

    x = np.zeros((B, n), dtype=np.float64)
    lam = np.zeros((B, m), dtype=np.float64)
    kkt = np.zeros(B, dtype=np.float64)
    status = np.zeros(B, dtype=np.int32)
    lib.qp_active_set_solve_batch(
        _ptr(Q), _ptr(c), _ptr(G), _ptr(h), _ptr(x0),
        n, m, B, max_iter,
        _ptr(x), _ptr(lam), _ptr(kkt),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return x, lam, kkt, status
