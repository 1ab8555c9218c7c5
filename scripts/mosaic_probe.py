#!/usr/bin/env python
"""Probe Mosaic (Pallas TPU) support for the transcendentals the fused
commander kernel needs: atan2, atan, floor, mod, sign, acos, erf.

Each op is compiled into a tiny (8,128) kernel on the real chip; prints
OK/FAIL + max abs error vs the XLA op.
"""

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(m):
    print(m, file=sys.stderr, flush=True)


OPS = {
    "atan2": (2, lambda a, b: jnp.arctan2(a, b)),
    "atan": (1, lambda a: jnp.arctan(a)),
    "acos": (1, lambda a: jnp.arccos(jnp.clip(a, -1.0, 1.0))),
    "asin": (1, lambda a: jnp.arcsin(jnp.clip(a, -1.0, 1.0))),
    "floor": (1, lambda a: jnp.floor(a)),
    "mod": (2, lambda a, b: jnp.mod(a, jnp.abs(b) + 1.0)),
    "sign": (1, lambda a: jnp.sign(a)),
    "erf": (1, lambda a: jax.scipy.special.erf(a)),
    "sqrt": (1, lambda a: jnp.sqrt(jnp.abs(a))),
    "sin": (1, lambda a: jnp.sin(a)),
}


def main():
    log(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (8, 128), jnp.float32) * 2.0
    b = jax.random.normal(jax.random.fold_in(key, 1), (8, 128), jnp.float32)

    for name, (nargs, fn) in OPS.items():
        def kern(a_ref, b_ref, o_ref, fn=fn, nargs=nargs):
            if nargs == 1:
                o_ref[...] = fn(a_ref[...])
            else:
                o_ref[...] = fn(a_ref[...], b_ref[...])

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(a, b)
            ref = fn(a) if nargs == 1 else fn(a, b)
            err = float(jnp.max(jnp.abs(out - ref)))
            log(f"{name}: OK maxerr={err:.3e}")
        except Exception as e:
            log(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
