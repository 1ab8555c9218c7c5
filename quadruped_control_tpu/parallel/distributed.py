"""Multi-host bring-up for pod slices.

The reference's "cluster" is two OS processes plus the ROS master on one
machine (SURVEY.md §2); the TPU-native analogue is one JAX process per host
joined via ``jax.distributed`` — after which `parallel/mesh.py`'s
scenario mesh spans every chip in the slice and the same pjit'd programs run
unmodified (DCN across hosts, ICI within).

Usage (one process per host):

    from quadruped_control_tpu.parallel.distributed import initialize
    initialize()                      # env-driven on Cloud TPU / GKE
    mesh = scenario_mesh()            # now covers the whole slice

Single-host development needs no call — everything degrades gracefully.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job (idempotent; no-op on single host setups).

    With no arguments, relies on the TPU environment's auto-discovery
    (the standard path on Cloud TPU pods). Explicit arguments support
    manual bring-up on other fabrics.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # Single-host / no coordinator configured: run locally.
        pass


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
