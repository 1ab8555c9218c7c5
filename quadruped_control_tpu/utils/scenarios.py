"""On-device scenario generators for the GRF QP benchmark suite.

Mirrors the reference's operating envelope (BASELINE configs 1-5): static
stance / laying-to-standing targets, body-pose tracking sweeps, trot contact
schedules, and domain-randomized SRB parameters. Everything is generated
from a JAX PRNG key directly on device so multi-million-instance batches
never touch the host.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import ControlConfig, mit_cheetah_config
from quadruped_control_tpu.math.rotations import rpy_to_matrix
from quadruped_control_tpu.ops import dynamics as dyn
from quadruped_control_tpu.ops.kinematics import forward_kinematics

# Stance patterns: all-stance (configs 1-2), the two trot pairs (config 3).
_STANCE_PATTERNS = jnp.array(
    [[True, True, True, True],
     [True, False, False, True],
     [False, True, True, False]]
)


class ScenarioBatch(NamedTuple):
    R: jnp.ndarray
    R_d: jnp.ndarray
    x: jnp.ndarray
    xdot: jnp.ndarray
    w: jnp.ndarray
    x_d: jnp.ndarray
    xdot_d: jnp.ndarray
    w_d: jnp.ndarray
    feet: jnp.ndarray
    stance: jnp.ndarray
    # Optional per-instance SRB randomization (config 5); None -> preset.
    mass: Optional[jnp.ndarray] = None
    inertia_diag: Optional[jnp.ndarray] = None
    mu: Optional[jnp.ndarray] = None


def standing_feet(cfg: ControlConfig, dtype=jnp.float32):
    """Feet at the reference init pose (mit_cheetah_config.yaml:43)."""
    q0 = jnp.tile(jnp.array([0.0, 1.61, -2.78], dtype=dtype), (4, 1))
    return forward_kinematics(q0, cfg.kinematics)


def grf_scenarios(key, batch: int, cfg: ControlConfig = None,
                  dtype=jnp.float32, randomize_params: bool = False
                  ) -> ScenarioBatch:
    """Mixed batch over configs 1-3 (+5 with randomize_params)."""
    cfg = cfg or mit_cheetah_config()
    keys = jax.random.split(key, 12)
    feet0 = standing_feet(cfg, dtype)

    rpy = jax.random.uniform(keys[0], (batch, 3), dtype, -0.25, 0.25)
    R = rpy_to_matrix(rpy)
    z = jax.random.uniform(keys[1], (batch,), dtype, 0.08, 0.32)
    x = jnp.zeros((batch, 3), dtype).at[..., 2].set(z)
    xdot = 0.3 * jax.random.normal(keys[2], (batch, 3), dtype)
    w = 0.25 * jax.random.normal(keys[3], (batch, 3), dtype)
    xdot_d = 0.2 * jax.random.normal(keys[4], (batch, 3), dtype)
    w_d = 0.1 * jax.random.normal(keys[5], (batch, 3), dtype)
    x_d = jnp.zeros((batch, 3), dtype).at[..., 2].set(cfg.stand.height)
    feet = feet0 + 0.01 * jax.random.normal(keys[6], (batch, 4, 3), dtype)
    pattern = jax.random.randint(keys[7], (batch,), 0, 3)
    stance = _STANCE_PATTERNS[pattern]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch, 3, 3))

    mass = inertia = mu = None
    if randomize_params:
        mass = cfg.balance.mass * jax.random.uniform(
            keys[8], (batch,), dtype, 0.8, 1.2
        )
        inertia = jnp.asarray(cfg.balance.inertia_diag, dtype) * \
            jax.random.uniform(keys[9], (batch, 3), dtype, 0.8, 1.2)
        mu = jax.random.uniform(keys[10], (batch,), dtype, 0.5, 1.0)

    return ScenarioBatch(
        R=R, R_d=eye, x=x, xdot=xdot, w=w, x_d=x_d, xdot_d=xdot_d, w_d=w_d,
        feet=feet, stance=stance, mass=mass, inertia_diag=inertia, mu=mu,
    )


def assemble_qp_batch(s: ScenarioBatch, cfg: ControlConfig = None):
    """ScenarioBatch -> QPData (the solver's input)."""
    cfg = cfg or mit_cheetah_config()
    return dyn.build_balance_qp(
        s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
        s.stance, cfg.balance, mass=s.mass, inertia_diag=s.inertia_diag,
        mu=s.mu,
    )
