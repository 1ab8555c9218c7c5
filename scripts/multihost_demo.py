#!/usr/bin/env python
"""Multi-process (multi-host analogue) sharded solve demo.

One JAX process per "host", joined with ``jax.distributed`` — the bring-up
path for pod slices (BASELINE config 5). On a dev box, processes talk over
the Gloo CPU backend, which stands in for DCN; on Cloud TPU the identical
code spans hosts with ICI within each slice.

Run two "hosts" locally (4 virtual devices each):

  for i in 0 1; do
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      PYTHONPATH=/root/repo python scripts/multihost_demo.py \
      --coordinator localhost:12356 --num-processes 2 --process-id $i &
  done; wait

Each process prints the GLOBAL convergence fraction (psum across the mesh)
and checks it against a local replicated solve of the same global batch —
proving the sharded program computes the same answer the single-process
program does.
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:12356")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--global-batch", type=int, default=1024)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from quadruped_control_tpu.parallel.distributed import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes

    import jax.numpy as jnp

    from quadruped_control_tpu.config import mit_cheetah_config
    from quadruped_control_tpu.parallel.mesh import (
        batch_sharding,
        scenario_mesh,
        solve_scenarios_sharded,
    )
    from quadruped_control_tpu.utils.scenarios import grf_scenarios

    pid = jax.process_index()
    print(
        f"proc {pid}: {len(jax.devices())} global / "
        f"{len(jax.local_devices())} local devices",
        flush=True,
    )

    cfg = mit_cheetah_config()
    # Every process generates the identical full batch (cheap, determinate),
    # then donates only its addressable shards to the global arrays.
    key = jax.random.key(7)
    full = grf_scenarios(key, args.global_batch, cfg, dtype=jnp.float32)
    full_np = jax.tree.map(np.asarray, full)

    mesh = scenario_mesh()
    sharding = batch_sharding(mesh)
    global_batch = jax.tree.map(
        lambda a: jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        ),
        full_np,
    )

    x, converged, frac = solve_scenarios_sharded(global_batch, cfg)
    frac = float(frac)

    # Local replicated oracle: same batch, no mesh.
    x1, c1, frac_local = solve_scenarios_sharded(full, cfg)
    frac_local = float(frac_local)
    print(
        f"proc {pid}: sharded conv_frac={frac:.6f} "
        f"local={frac_local:.6f}",
        flush=True,
    )
    assert abs(frac - frac_local) < 1e-6, (frac, frac_local)
    print(f"proc {pid}: OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
