"""Pallas solver tests.

The full kernel only runs on TPU; on the CPU test mesh we validate the
packing layout and (optionally, slow) the interpret-mode barrier kernel.
TPU CI runs the full parity check below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.solver import pallas_ipm


def test_pack_unpack_roundtrip(rng):
    B = 2 * pallas_ipm.TILE
    a = jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32))
    packed = pallas_ipm._pack(a, 12)
    assert packed.shape == (2, 12, 8, 128)
    np.testing.assert_array_equal(np.asarray(pallas_ipm._unpack(packed)),
                                  np.asarray(a))


def test_pack_layout_instance_mapping(rng):
    """Instance b lands at (b // 1024, :, (b % 1024) // 128, b % 128)."""
    B = pallas_ipm.TILE
    a = jnp.arange(B, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
    packed = pallas_ipm._pack(a, 3)
    b = 777
    np.testing.assert_allclose(
        np.asarray(packed[b // 1024, :, (b % 1024) // 128, b % 128]),
        float(b),
    )


@pytest.mark.skipif(jax.devices()[0].platform == "cpu",
                    reason="full Pallas kernel requires TPU")
def test_pallas_matches_oracle_on_tpu():
    from quadruped_control_tpu.config import mit_cheetah_config
    from quadruped_control_tpu.native import solve_qp_batch_native
    from quadruped_control_tpu.solver.reference import grf_feasible_point
    from quadruped_control_tpu.utils.scenarios import (
        assemble_qp_batch,
        grf_scenarios,
    )

    cfg = mit_cheetah_config()
    B = pallas_ipm.TILE
    s = grf_scenarios(jax.random.key(3), B, cfg, dtype=jnp.float32)
    qp = assemble_qp_batch(s, cfg)
    sol = pallas_ipm.solve_qp_ipm_pallas(qp.Q, qp.c, qp.G, qp.h)
    assert float(jnp.mean(sol.converged.astype(jnp.float32))) > 0.98

    Q, c, G, h = (np.asarray(a, np.float64) for a in (qp.Q, qp.c, qp.G, qp.h))
    stance = np.asarray(s.stance)
    x0 = np.stack([grf_feasible_point(stance[b], 10., 120.) for b in range(B)])
    xn, _, kkt, st = solve_qp_batch_native(Q, c, G, h, x0)
    xs = np.asarray(sol.x, np.float64)
    obj = 0.5 * np.einsum("bi,bij,bj->b", xs, Q, xs) + \
        np.einsum("bi,bi->b", c, xs)
    objn = 0.5 * np.einsum("bi,bij,bj->b", xn, Q, xn) + \
        np.einsum("bi,bi->b", c, xn)
    rel = np.abs(obj - objn) / (1 + np.abs(objn))
    assert np.median(rel) < 1e-7
    assert np.percentile(rel, 95) < 1e-6
