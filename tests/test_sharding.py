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


def test_sharded_mpc_rollout_matches_single_device():
    """The MPC-in-the-loop closed loop shards over the scenario axis like
    everything else (pure data parallelism, SURVEY §2): a sharded decimated
    rollout must equal the unsharded one bit-for-bit-ish."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.commander import init_commander_carry
    from quadruped_control_tpu.control.plant import init_plant_state
    from quadruped_control_tpu.control.rollout import rollout_mpc_decimated

    cfg = mit_cheetah_physical_config()
    B = 16
    plant = init_plant_state(cfg, (B,), dtype=jnp.float64)
    carry = init_commander_carry((B,), dtype=jnp.float64)
    cmd = jnp.zeros((B, 6), jnp.float64).at[:, 0].set(0.1)
    kw = dict(mpc_every=5, mpc_horizon=4, mpc_dt=0.04, mpc_iterations=12,
              mpc_backend="structured")

    ref = rollout_mpc_decimated(plant, carry, cmd, 30, cfg, **kw)

    mesh = scenario_mesh()
    shard = NamedSharding(mesh, P("scenario"))
    put = lambda t: jax.tree.map(lambda a: jax.device_put(a, shard), t)
    sh = rollout_mpc_decimated(put(plant), put(carry), put(cmd), 30, cfg,
                               **kw)
    assert len(sh.plant.com.x.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sh.trace.x),
                               np.asarray(ref.trace.x), atol=1e-9)


def test_sharded_whole_body_rollout_matches_single_device():
    """The full-physics closed loop (incl. the Pallas substep kernel, which
    GSPMD cannot partition — shard_map runs it per shard) shards over the
    scenario axis and reproduces the single-device rollout."""
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.parallel.mesh import shard_rollout_whole_body
    from quadruped_control_tpu.sim import (
        ContactConfig,
        init_whole_body_rollout,
        make_pallas_stepper,
        mit_cheetah_whole_body_model,
        rollout_whole_body,
    )

    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float64)
    contact = ContactConfig()
    B = 64
    plant, carry = init_whole_body_rollout(cfg, (B,), dtype=jnp.float64)
    cmd = jnp.zeros((B, 6), jnp.float64)
    kw = dict(n_substeps=3, qp_iterations=8)

    ref = rollout_whole_body(plant, carry, cmd, 3, cfg, model, contact,
                             record=False, **kw)

    mesh = scenario_mesh()
    for stepper in (None,
                    make_pallas_stepper(model, cfg, contact, rows=8,
                                        interpret=True)):
        run = shard_rollout_whole_body(mesh, cfg, model, contact,
                                       stepper=stepper, **kw)
        out = run(plant, carry, cmd, 3)
        atol = 1e-12 if stepper is None else 1e-8
        np.testing.assert_allclose(np.asarray(out.plant.x),
                                   np.asarray(ref.plant.x), atol=atol)
        np.testing.assert_allclose(np.asarray(out.plant.u),
                                   np.asarray(ref.plant.u), atol=100 * atol)
        np.testing.assert_array_equal(np.asarray(out.carry.standing),
                                      np.asarray(ref.carry.standing))
