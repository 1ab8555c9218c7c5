"""Checkpoint/resume for long batched sweeps (orbax-backed).

The reference has no checkpointing — all state is in-RAM and recovery is a
manual sim-reset service (SURVEY.md §5). Long domain-randomized rollout
sweeps and MPC scans on TPU want restartability: any pytree of arrays
(PlantState, CommanderCarry, accumulated traces, PRNG keys) round-trips
through these helpers. Thin wrapper over orbax-checkpoint so call sites stay
one-liners.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_state(path: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree checkpoint; returns the concrete directory written."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:09d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_state(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint shaped/typed like ``template``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        if hasattr(a, "shape") else a,
        template,
    )
    return ckptr.restore(os.path.abspath(path), abstract)


def latest_step_dir(root: str) -> Optional[str]:
    """Most recent ``step_*`` checkpoint directory under ``root``."""
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None
