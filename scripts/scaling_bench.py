#!/usr/bin/env python
"""Scaling-efficiency benchmark over the device mesh (BASELINE config 5).

Measures the sharded scenario-batch solve at 1, 2, 4, ... devices with the
per-device batch held constant (weak scaling — the relevant regime for a
10k-scenario domain-randomized sweep) and reports efficiency vs the
single-device rate. On a multi-chip platform this exercises ICI; on a
single-chip dev box run it on the virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=. python scripts/scaling_bench.py

For multi-host slices, launch one process per host with
``jax.distributed.initialize()`` before calling main() — the mesh code is
host-count agnostic.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.parallel.mesh import (
    scenario_mesh,
    shard_scenarios,
    solve_scenarios_sharded,
)
from quadruped_control_tpu.utils.profiling import benchmark
from quadruped_control_tpu.utils.scenarios import grf_scenarios


def main(per_device: int = 2048):
    cfg = mit_cheetah_config()
    devices = jax.devices()
    print(f"platform: {devices[0].platform}, devices: {len(devices)}")

    sizes = []
    d = 1
    while d <= len(devices):
        sizes.append(d)
        d *= 2

    base_rate = None
    for nd in sizes:
        mesh = scenario_mesh(devices[:nd])
        batch = per_device * nd
        s = grf_scenarios(jax.random.key(0), batch, cfg, dtype=jnp.float32,
                          randomize_params=True)
        s = shard_scenarios(s, mesh)
        res = benchmark(
            lambda s=s: solve_scenarios_sharded(s, cfg, iterations=15),
            name=f"{nd}dev", reps=5, items=batch,
        )
        rate = res.items_per_second
        if base_rate is None:
            base_rate = rate / nd
        eff = rate / (base_rate * nd)
        print(f"devices={nd}: batch={batch} {res.steady_seconds*1e3:8.1f} ms "
              f"-> {rate:10,.0f} QPs/s  efficiency {eff*100:5.1f}%")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
