#!/usr/bin/env python
"""Decompose the whole-body closed-loop tick cost on TPU.

Times each stage of the tick separately (commander with fused QP backend,
mass-matrix + prefactor, Pallas substep kernel incl. pack/unpack glue,
XLA substep loop) at batch 1024/4096 using marginal two-length scans so
dispatch constants cancel. Fresh inputs per rep via folded keys
(CLAUDE.md timing rules).
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import (
    commander_step,
    init_commander_carry,
)
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_state,
    make_pallas_stepper,
    mit_cheetah_whole_body_model,
    whole_body_com_state,
    whole_body_step,
)
from quadruped_control_tpu.sim.dynamics import (
    mass_matrix,
    precompute_leg_kinematics,
    prefactor_mass_matrix,
)

REPS_A, REPS_B = 10, 30


def log(m):
    print(m, file=sys.stderr, flush=True)


def marginal(fn, state0, B):
    """Time fn scanned REPS_A vs REPS_B times over perturbed states."""
    def scan_n(n):
        @jax.jit
        def run(state, key):
            def body(s, i):
                k = jax.random.fold_in(key, i)
                s = jax.tree.map(
                    lambda a: a + 1e-6 * jax.random.normal(
                        jax.random.fold_in(k, hash(a.shape) % 97),
                        a.shape, a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, s)
                return fn(s), 0.0
            s, _ = lax.scan(body, state, jnp.arange(n))
            return s
        return run

    runs = {n: scan_n(n) for n in (REPS_A, REPS_B)}
    key = jax.random.PRNGKey(0)
    out = {}
    for n, run in runs.items():
        jax.block_until_ready(run(state0, key))  # compile
        t0 = time.time()
        for r in range(3):
            jax.block_until_ready(run(state0, jax.random.fold_in(key, r)))
        out[n] = (time.time() - t0) / 3
    return (out[REPS_B] - out[REPS_A]) / (REPS_B - REPS_A)


def main():
    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    contact = ContactConfig()
    dt = 1.0 / cfg.frequency
    log(f"device: {jax.devices()[0]}")

    for B in (1024, 4096):
        wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
        carry = init_commander_carry((B,), dtype=jnp.float32)
        carry = carry._replace(standing=jnp.ones((B,), bool))
        com, joints = whole_body_com_state(wb, cfg)
        cmd = jnp.zeros((B, 6), jnp.float32)
        tau = jnp.zeros((B, 4, 3), jnp.float32)
        stepper = make_pallas_stepper(model, cfg, contact, rows=8)

        def commander_only(s):
            com, joints = whole_body_com_state(s, cfg)
            out, _ = commander_step(com, joints, carry, cmd, dt, cfg,
                                    qp_iterations=12, qp_backend="fused")
            return s._replace(x=s.x + 1e-9 * out.torques[..., 0, :])

        def prefactor_only(s):
            kin = precompute_leg_kinematics(model, s.q)
            M = mass_matrix(model, kin, s.x.shape[:-1], s.x.dtype)
            fac = prefactor_mass_matrix(M)
            return s._replace(x=s.x + 1e-9 * fac.Sinv[..., 0, :3])

        def pallas_sub(s):
            return stepper(s, tau, dt, 10)

        def xla_sub(s):
            return whole_body_step(s, tau, dt, model, cfg, contact,
                                   n_substeps=10, m_update="tick")

        for name, fn in [("commander(fused QP)", commander_only),
                         ("massmatrix+prefactor", prefactor_only),
                         ("pallas substep x10 (incl. prefactor)", pallas_sub),
                         ("xla substep x10 (incl. prefactor)", xla_sub)]:
            try:
                ms = marginal(fn, wb, B) * 1e3
                log(f"B={B} {name}: {ms:.3f} ms")
            except Exception as e:
                log(f"B={B} {name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
