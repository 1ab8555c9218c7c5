"""Device-mesh sharding for the scenario batch (the distribution layer).

The reference's "distributed backend" is the ROS master + TCPROS pub/sub
between two processes (SURVEY.md §2); there is no data/model parallelism to
port. The TPU-native parallel dimension is the QP-instance batch: scenarios
shard over a 1-D ``scenario`` mesh axis (ICI within a slice, DCN across
hosts via jax.distributed), compute is pure data parallelism, and scalar
convergence metrics reduce with ``psum``-backed collectives that XLA inserts
automatically from the sharding annotations.

Multi-chip hardware is not required to develop against this module: an
8-device host-CPU mesh (``--xla_force_host_platform_device_count=8``)
exercises identical GSPMD partitioning.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quadruped_control_tpu.config import ControlConfig, mit_cheetah_config
from quadruped_control_tpu.solver.ipm import solve_qp_ipm
from quadruped_control_tpu.utils.scenarios import (
    ScenarioBatch,
    assemble_qp_batch,
)

SCENARIO_AXIS = "scenario"


def scenario_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (SCENARIO_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (scenario) axis; replicate everything trailing."""
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def shard_scenarios(s: ScenarioBatch, mesh: Mesh) -> ScenarioBatch:
    """Place a scenario batch with its leading axis split over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda a: jax.device_put(a, sharding) if a is not None else None, s
    )


@partial(jax.jit, static_argnames=("cfg", "iterations", "polish"))
def solve_scenarios_sharded(s: ScenarioBatch, cfg: ControlConfig = None,
                            iterations: int = 15, polish: bool = True):
    """Assemble + solve a (sharded) scenario batch.

    With the inputs placed by :func:`shard_scenarios`, GSPMD partitions the
    whole pipeline over the scenario axis; the scalar summary (global
    convergence fraction) forces an all-reduce across the mesh — the
    collective that replaces the reference's TCPROS status traffic.

    Returns (x, converged, convergence_fraction).
    """
    cfg = cfg or mit_cheetah_config()
    qp = assemble_qp_batch(s, cfg)
    sol = solve_qp_ipm(qp.Q, qp.c, qp.G, qp.h, iterations=iterations,
                       polish=polish, tol=3e-5)
    frac = jnp.mean(sol.converged.astype(qp.Q.dtype))
    return sol.x, sol.converged, frac


def shard_rollout_whole_body(mesh: Mesh, cfg, model, contact=None,
                             stepper=None, **static_kw):
    """Scenario-sharded full-physics closed loop.

    Returns ``run(plant, carry, cmd_twist, steps)`` that executes
    ``sim.rollout.rollout_whole_body`` with every batch axis split over
    ``mesh``'s scenario axis via ``shard_map``. GSPMD cannot partition a
    ``pallas_call`` automatically, so the Pallas substep kernel
    (``stepper=make_pallas_stepper(...)``) REQUIRES this wrapper on a
    multi-chip mesh — each device runs the kernel on its local shard
    (B/n_devices must stay a multiple of the kernel tile, or pays padding
    per shard). The loop is pure data parallelism (SURVEY.md §2): no
    cross-scenario collectives exist, so scaling is communication-free.

    ``record`` is forced off (trace stacking would need a distinct
    per-leaf out-spec); pass any other rollout kwarg via ``static_kw``.
    """
    from jax import shard_map
    from quadruped_control_tpu.sim.plant import ContactConfig
    from quadruped_control_tpu.sim.rollout import rollout_whole_body

    contact = contact or ContactConfig()
    spec = P(SCENARIO_AXIS)

    def run(plant, carry, cmd_twist, steps: int):
        def local(p, c, cmd):
            return rollout_whole_body(
                p, c, cmd, steps, cfg, model, contact, record=False,
                stepper=stepper, **static_kw)

        # check_vma off: solver-internal scans seed carries from broadcast
        # constants, which trips the varying-axes check even though the
        # computation is purely per-shard.
        return shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )(plant, carry, cmd_twist)

    return run


def shard_rollout_whole_body_fused(mesh: Mesh, tick, n_substeps: int = 10,
                                   mpc_every: int | None = None):
    """Scenario-sharded fused 3-kernel closed loop (sim/pallas_tick.py).

    Returns ``run(plant, carry, cmd_twist, steps)``. Each device runs the
    commander-pre -> QP -> substep kernel chain on its local shard
    (per-shard batch pads to the tick's rows*128 tile internally, so size
    shards to the tile multiple to avoid padded work). Pure data
    parallelism, communication-free, like :func:`shard_rollout_whole_body`.
    ``cmd_twist`` must carry the full batch shape (it is sharded too).

    ``mpc_every``: with a ``controller="mpc"`` tick, run the DECIMATED
    driver (``rollout_whole_body_fused_decimated``: MPC re-solved every
    ``mpc_every`` ticks, zero-order-held forces between — the
    deployment-shape configuration) instead of the per-tick rollout.
    """
    from jax import shard_map

    from quadruped_control_tpu.sim.pallas_tick import (
        rollout_whole_body_fused,
        rollout_whole_body_fused_decimated,
    )

    spec = P(SCENARIO_AXIS)

    def run(plant, carry, cmd_twist, steps: int):
        def local(p, c, cmd):
            if mpc_every is not None:
                return rollout_whole_body_fused_decimated(
                    p, c, cmd, steps, tick, mpc_every=mpc_every,
                    n_substeps=n_substeps, record=False)
            return rollout_whole_body_fused(p, c, cmd, steps, tick,
                                            n_substeps=n_substeps,
                                            record=False)

        return shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )(plant, carry, cmd_twist)

    return run
