"""Checkpoint/resume for long batched sweeps and MPC scans.

The reference has NO checkpointing — all state is in-RAM and recovery is
"relaunch + call the /start_position reset service" (SURVEY.md §5,
drake_interface_node.cpp:89-94,286-302). For a TPU framework running
hours-long domain-randomized sweeps that is not acceptable: a preempted
job must resume mid-sweep. This module provides orbax-backed periodic
checkpointing of arbitrary rollout state pytrees (NamedTuple carries,
plant states, PRNG keys) plus a chunked driver that composes with every
rollout in the package — which ALSO matches how long rollouts must run on
the axon tunnel anyway (single device executions of tens of seconds abort;
CLAUDE.md).

Design notes:
- State pytrees here are NamedTuples of arrays. Orbax restores structure
  as nested dicts/lists, so we save the flattened leaves and rebuild with
  the caller-supplied ``like`` treedef — version-proof against container
  classes and orbax tree-metadata conventions.
- Checkpoints are atomic (orbax finalization) and keyed by step; resume
  picks the latest complete step.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import numpy as np

try:  # orbax is the preferred backend (baked into the image)
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - fallback exercised only if absent
    _HAVE_ORBAX = False


def _leaves_to_numpy(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def save_checkpoint(directory: str, state: Any, step: int) -> str:
    """Save ``state`` (any pytree of arrays) at ``step``. Returns path."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    leaves = _leaves_to_numpy(state)
    named = {f"leaf_{i:04d}": leaf for i, leaf in enumerate(leaves)}
    path = os.path.join(directory, f"step_{step:012d}")
    if _HAVE_ORBAX:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, named)
    else:  # numpy fallback: atomic via rename
        tmp = path + ".tmp.npz"
        np.savez(tmp, **named)
        os.replace(tmp, path + ".npz")
    return path


def latest_step(directory: str) -> int | None:
    """Largest complete checkpoint step in ``directory`` (None if none)."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if not name.startswith("step_"):
            continue
        stem = name.split(".")[0]
        full = os.path.join(directory, name)
        # orbax writes a directory; incomplete saves keep a tmp marker
        if os.path.isdir(full) and any(
            "tmp" in f for f in os.listdir(full)
        ):
            continue
        try:
            steps.append(int(stem[len("step_"):]))
        except ValueError:
            continue
    return max(steps) if steps else None


def restore_checkpoint(directory: str, like: Any, step: int | None = None):
    """Restore the checkpoint at ``step`` (default: latest) shaped like the
    pytree ``like``. Returns (state, step)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"step_{step:012d}")
    leaves_like = jax.tree.leaves(like)
    if _HAVE_ORBAX and os.path.isdir(path):
        with ocp.PyTreeCheckpointer() as ckptr:
            named = ckptr.restore(path)
    else:
        with np.load(path + ".npz") as data:
            named = {k: data[k] for k in data.files}
    leaves = [
        np.asarray(named[f"leaf_{i:04d}"]) for i in range(len(leaves_like))
    ]
    leaves = [
        np.asarray(leaf).astype(ref.dtype).reshape(ref.shape)
        for leaf, ref in zip(leaves, leaves_like)
    ]
    state = jax.tree.unflatten(jax.tree.structure(like), leaves)
    return state, step


def run_checkpointed(step_fn: Callable[[Any, int], Any], state: Any,
                     n_chunks: int, directory: str,
                     save_every: int = 1):
    """Drive ``state = step_fn(state, chunk_index)`` for ``n_chunks``,
    checkpointing every ``save_every`` chunks and RESUMING from the latest
    checkpoint if ``directory`` already holds one.

    ``step_fn`` is typically a jitted chunk of rollout (e.g. 50 control
    ticks — the axon-tunnel-safe granularity). Returns the final state.
    """
    start = 0
    existing = latest_step(directory)
    if existing is not None:
        state, done = restore_checkpoint(directory, state, existing)
        start = done
    for chunk in range(start, n_chunks):
        state = step_fn(state, chunk)
        if (chunk + 1) % save_every == 0 or chunk + 1 == n_chunks:
            save_checkpoint(directory, state, chunk + 1)
    return state
