"""Gait phase generation as a pure function of time.

TPU-native replacement for ``GaitScheduler`` (reference gait.cpp): the
reference advances per-leg phases in a dedicated 200 Hz worker thread behind a
mutex (gait.cpp:98-123, gait.hpp:73-83). On TPU there is no shared mutable
state — the phase at time ``t`` is simply

    phase_i(t) = (offset_i + t / (t_swing + t_stance)) mod 1

and a leg is in stance iff ``phase <= t_stance / (t_swing + t_stance)``
(gait.cpp:125-134, boundary inclusive via ``almost_equal``). This is exact
(the thread merely approximates this integral with 5 ms steps) and trivially
vmaps over time grids and scenario batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_control_tpu.config import GaitConfig
from quadruped_control_tpu.types import Gait, make_stance_gait

__all__ = ["gait_at_time", "phases_at_time", "leg_states", "make_stance_gait"]


def phases_at_time(t, cfg: GaitConfig, dtype=None):
    """Per-leg phases in [0, 1) at time(s) ``t`` since gait start.

    Args:
      t: scalar or (...,) elapsed time in seconds.
    Returns:
      (..., 4) phases, [RL, FL, RR, FR].
    """
    t = jnp.asarray(t, dtype=dtype)
    offsets = cfg.offsets_array(t.dtype)
    return jnp.mod(offsets + t[..., None] / cfg.period, 1.0)


def leg_states(phases, cfg: GaitConfig, eps: float = 1e-12):
    """Stance mask from phases (reference gait.cpp:125-134).

    Stance iff ``0 <= phase <= stance_phase`` with the reference's
    ``almost_equal`` tolerance at the boundary.
    """
    return phases <= cfg.stance_phase + eps


def gait_at_time(t, cfg: GaitConfig, dtype=None) -> Gait:
    """Full gait snapshot at time ``t`` (replaces ``schedule()``,
    gait.cpp:85-96)."""
    phases = phases_at_time(t, cfg, dtype=dtype)
    return Gait(in_stance=leg_states(phases, cfg), phase=phases)
