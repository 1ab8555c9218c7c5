"""Checkpoint/resume of long rollout scans (SURVEY.md §5: the reference
has none — restart = relaunch + reset service; long TPU sweeps need it)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.control.rollout import rollout
from quadruped_control_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    run_checkpointed,
    save_checkpoint,
)

CFG = mit_cheetah_physical_config()
DT = jnp.float64


def init_rollout(cfg, batch_shape=(), dtype=jnp.float32):
    return (init_plant_state(cfg, batch_shape, dtype=dtype),
            init_commander_carry(batch_shape, dtype=dtype))


def test_save_restore_roundtrip(tmp_path):
    state, carry = init_rollout(CFG, (8,), dtype=DT)
    save_checkpoint(str(tmp_path), (state, carry), step=7)
    assert latest_step(str(tmp_path)) == 7
    (state2, carry2), step = restore_checkpoint(str(tmp_path),
                                                (state, carry))
    assert step == 7
    for a, b in zip(jax.tree.leaves((state, carry)),
                    jax.tree.leaves((state2, carry2))):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_bitwise_matches_uninterrupted(tmp_path):
    """A rollout interrupted mid-sweep and resumed from its checkpoint
    produces bit-identical state to the uninterrupted run."""
    cmd = jnp.zeros(6, DT)

    def chunk(state, _):
        plant, carry = state
        res = rollout(plant, carry, cmd, 40, CFG)
        return (res.plant, res.carry)

    init = init_rollout(CFG, dtype=DT)
    ref = init
    for i in range(4):
        ref = chunk(ref, i)

    d = str(tmp_path / "ck")
    # "Preempted" run: dies after 2 of 4 chunks.
    partial_final = run_checkpointed(chunk, init, n_chunks=2, directory=d)
    assert latest_step(d) == 2
    del partial_final
    # Resumed run asks for all 4; the first 2 come from the checkpoint.
    out = run_checkpointed(chunk, init, n_chunks=4, directory=d)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert latest_step(d) == 4
