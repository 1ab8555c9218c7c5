"""Checkpoint round-trip for rollout state pytrees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.plant import init_plant_state
from quadruped_control_tpu.utils.checkpoint import (
    latest_step_dir,
    restore_state,
    save_state,
)


def test_rollout_state_roundtrip(tmp_path):
    cfg = mit_cheetah_physical_config()
    plant = init_plant_state(cfg, (4,), dtype=jnp.float32)
    carry = init_commander_carry((4,), dtype=jnp.float32)
    state = {"plant": plant, "carry": carry, "step": jnp.asarray(123)}

    p = save_state(str(tmp_path / "ckpt"), state, step=123)
    restored = restore_state(p, state)

    flat_a, _ = jax.tree.flatten(state)
    flat_b, _ = jax.tree.flatten(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert latest_step_dir(str(tmp_path / "ckpt")) == p
