#!/usr/bin/env python
"""MPC throughput benchmark (BASELINE configs 4-5).

CAVEAT: small-dispatch timings on the axon relay are unreliable (see
CLAUDE.md); treat throughput numbers from this script as indicative and
prefer rep-scaling measurements for publication-grade figures.

Solves batches of domain-randomized receding-horizon SRB MPC instances
(N-step stacked QP, per-step trot contact schedules, randomized
mass/inertia/friction) and reports horizon-QPs/s and equivalent single-step
QPs/s. Run on TPU:

    PYTHONPATH=. python scripts/mpc_bench.py [batch] [horizon]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.mpc.horizon import (
    NX,
    make_reference_trajectory,
    solve_mpc,
)
from quadruped_control_tpu.mpc.pallas_riccati import solve_mpc_fused
from quadruped_control_tpu.mpc.structured import solve_mpc_structured
from quadruped_control_tpu.utils.scenarios import standing_feet


def main(batch=256, horizon=10):
    batch, horizon = int(batch), int(horizon)
    cfg = mit_cheetah_physical_config()
    dt = 0.03
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)

    xi0 = jnp.zeros((batch, NX), jnp.float32)
    xi0 = xi0.at[:, 5].set(
        jax.random.uniform(ks[0], (batch,), jnp.float32, 0.2, 0.3)
    ).at[:, 12].set(1.0)
    xi0 = xi0.at[:, 9:12].add(
        0.2 * jax.random.normal(ks[1], (batch, 3), jnp.float32)
    )
    cmd = jnp.zeros((batch, 6), jnp.float32).at[:, 0].set(0.2)
    ref = make_reference_trajectory(xi0, cmd, horizon, dt)
    feet = standing_feet(cfg, jnp.float32) + jnp.array([0, 0, 0.26],
                                                       jnp.float32)
    feet = feet + 0.01 * jax.random.normal(ks[2], (batch, 4, 3), jnp.float32)
    x_com = jnp.tile(jnp.array([0, 0, 0.26], jnp.float32), (batch, 1))
    yaw = jnp.zeros((batch,), jnp.float32)
    # Trot schedule alternating every ~0.24 s.
    phase = (jnp.arange(horizon) * dt / 0.49) % 1.0
    trot_a = jnp.array([True, False, False, True])
    trot_b = jnp.array([False, True, True, False])
    sched = jnp.where((phase < 0.5)[:, None], trot_a[None], trot_b[None])
    sched = jnp.tile(sched[None], (batch, 1, 1))
    # Config-5 randomization.
    mass = 11.0 * jax.random.uniform(ks[3], (batch,), jnp.float32, 0.8, 1.2)
    inertia = jnp.array(cfg.balance.inertia_diag, jnp.float32) * \
        jax.random.uniform(ks[4], (batch, 3), jnp.float32, 0.8, 1.2)
    mu = jax.random.uniform(ks[5], (batch,), jnp.float32, 0.5, 1.0)

    # NOTE: fresh inputs must be derived ON DEVICE from a folded key —
    # host-precomputed input lists time as ~0 ms on the axon tunnel
    # (async-dispatch artifact, see CLAUDE.md).
    reps = 5

    def perturb(key):
        return xi0 + 1e-4 * jax.random.normal(key, xi0.shape, jnp.float32)

    def fn_condensed(key):
        return solve_mpc(perturb(key), ref, yaw, feet, x_com, sched,
                         horizon, dt, cfg, iterations=30, mass=mass,
                         inertia_diag=inertia, mu=mu)

    def fn_structured(key):
        return solve_mpc_structured(perturb(key), ref, yaw, feet, x_com,
                                    sched, horizon, dt, cfg, iterations=30,
                                    mass=mass, inertia_diag=inertia, mu=mu)

    def fn_kernel(key):
        return solve_mpc_fused(perturb(key), ref, yaw, feet, x_com, sched,
                               horizon, dt, cfg, iterations=40, mass=mass,
                               inertia_diag=inertia, mu=mu)

    objs = {}
    fns = [("condensed", jax.jit(fn_condensed)),
           ("structured", jax.jit(fn_structured))]
    if batch % 1024 == 0:
        fns.append(("riccati-kernel", jax.jit(fn_kernel)))
    keys = jax.random.split(jax.random.key(7), reps + 1)
    for name, fn in fns:
        t0 = time.time()
        F, sol = jax.block_until_ready(fn(keys[0]))
        print(f"{name}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for i in range(reps):
            F, sol = fn(keys[i + 1])
        jax.block_until_ready(F)
        dtm = (time.time() - t0) / reps
        conv = float(jnp.mean(sol.converged.astype(jnp.float32)))
        objs[name] = np.asarray(F, np.float64)
        print(f"{name}: batch={batch} N={horizon}: {dtm*1e3:.1f} ms -> "
              f"{batch/dtm:,.0f} horizon-QPs/s "
              f"({batch*horizon/dtm:,.0f} step-QPs/s equivalent), "
              f"conv {conv:.3f}")
    for a, b in (("condensed", "structured"), ("condensed",
                                                "riccati-kernel")):
        if a in objs and b in objs:
            d = np.abs(objs[a] - objs[b])
            print(f"{a} vs {b} force diff: p50 {np.median(d):.2e} "
                  f"max {d.max():.2e} N")


if __name__ == "__main__":
    main(*sys.argv[1:])
