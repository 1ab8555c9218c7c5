"""GSPMD sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.parallel.mesh import (
    scenario_mesh,
    shard_scenarios,
    solve_scenarios_sharded,
)
from quadruped_control_tpu.utils.scenarios import grf_scenarios


def test_mesh_has_8_devices():
    mesh = scenario_mesh()
    assert mesh.devices.size == 8


def test_sharded_solve_matches_single_device():
    cfg = mit_cheetah_config()
    key = jax.random.key(3)
    s = grf_scenarios(key, 64, cfg, dtype=jnp.float64)

    mesh = scenario_mesh()
    s_sharded = shard_scenarios(s, mesh)
    # Input really is split over the 8 devices.
    assert len(s_sharded.x.sharding.device_set) == 8

    x_sh, conv_sh, frac_sh = solve_scenarios_sharded(s_sharded, cfg)
    x_1, conv_1, frac_1 = solve_scenarios_sharded(s, cfg)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_1), atol=1e-8)
    np.testing.assert_array_equal(np.asarray(conv_sh), np.asarray(conv_1))
    assert abs(float(frac_sh) - float(frac_1)) < 1e-12
    assert float(frac_sh) > 0.95


def test_sharded_solve_with_randomized_params():
    """Config-5 shape: domain-randomized SRB params, sharded."""
    cfg = mit_cheetah_config()
    s = grf_scenarios(jax.random.key(4), 32, cfg, dtype=jnp.float64,
                      randomize_params=True)
    mesh = scenario_mesh()
    x, conv, frac = solve_scenarios_sharded(shard_scenarios(s, mesh), cfg)
    assert np.all(np.isfinite(np.asarray(x)))
    assert float(frac) > 0.9
