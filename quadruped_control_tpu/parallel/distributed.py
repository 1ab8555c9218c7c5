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
    (the standard path on Cloud TPU pods) and degrades to single-host
    silently. With explicit arguments (manual bring-up: dev boxes, other
    fabrics), failures raise — a half-joined job must not limp on.

    NOTE: must run before the first JAX computation; anything that touches
    a backend (including ``jax.process_count()``/``jax.devices()``) locks
    the process into single-host mode.
    """
    if _is_initialized():
        return
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # No coordinator/environment: single-host development.
            pass
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def _is_initialized() -> bool:
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
