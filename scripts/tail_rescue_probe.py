"""Probe a last-resort rescue stage for the bench's unconverged tail.

Round-5 certificates showed the ~8/32768 KKT-unflagged instances are
GENUINELY suboptimal (worst 6.7e-4 rel objective vs the f64 oracle) —
not flat-valley. This probe extracts them from the bench pipeline (key
0), then tries deep schedules of the jnp IPM (solve_qp_ipm) seeded cold
and from the fused solution, reporting conv + objective gap vs oracle
and the wall cost of a 128-slot rescue dispatch at bench scale.

Run on the TPU: PYTHONPATH="$PYTHONPATH:." python scripts/tail_rescue_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.ipm import solve_qp_ipm
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.utils.scenarios import (
    assemble_qp_batch,
    grf_scenarios,
)

BATCH = 32768


def main():
    cfg = mit_cheetah_config()

    @jax.jit
    def pipeline(key):
        s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
        sol = solve_balance_qp_fused(
            s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d, s.feet,
            s.stance, cfg.balance, iterations=20, polish=True,
            polish_sweeps=2, two_phase=True, split=True, rows=16,
            tail_iterations=24, tail_sweeps=16, prox_tail=True,
            prox_backend="kernel", prox_steps=6, prox_iterations=24,
            prox_sweeps=6)
        return sol.x, sol.s, sol.z, sol.converged, s

    x, sslack, z, conv, scen = jax.block_until_ready(
        pipeline(jax.random.key(0)))
    bad = np.flatnonzero(~np.asarray(conv))
    print(f"unconverged: {bad.size} -> {bad[:16]}")
    if bad.size == 0:
        return
    scen_bad = jax.tree.map(lambda a: a[bad] if a is not None else None,
                            scen)
    qp = assemble_qp_batch(scen_bad, cfg)
    Qd = np.asarray(qp.Q, np.float64)
    cd = np.asarray(qp.c, np.float64)

    from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle

    x_star, obj_star, _ = solve_qp_batch_oracle(
        np.asarray(qp.Q), np.asarray(qp.c), np.asarray(qp.G),
        np.asarray(qp.h), np.asarray(scen.stance)[bad],
        cfg.balance.fz_min, cfg.balance.fz_max)

    def report(tag, xs, cv):
        xs = np.asarray(xs, np.float64)
        obj = 0.5 * np.einsum("bi,bij,bj->b", xs, Qd, xs) + \
            np.einsum("bi,bi->b", cd, xs)
        rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
        print(f"{tag}: conv {np.asarray(cv).mean():.3f} "
              f"obj gap p50 {np.median(rel):.1e} max {rel.max():.1e}")

    report("fused (current)", np.asarray(x)[bad], np.zeros(bad.size))

    Qf = jnp.asarray(qp.Q, jnp.float32)
    cf = jnp.asarray(qp.c, jnp.float32)
    Gf = jnp.asarray(qp.G, jnp.float32)
    hf = jnp.asarray(qp.h, jnp.float32)

    for iters in (30, 60, 100):
        sol2 = jax.block_until_ready(jax.jit(
            lambda Q, c, G, h: solve_qp_ipm(Q, c, G, h, iterations=iters)
        )(Qf, cf, Gf, hf))
        report(f"jnp ipm cold it={iters}", sol2.x, sol2.converged)

    # Cost of a 128-slot rescue at bench scale: assembly+solve, marginal.
    @jax.jit
    def rescue(key):
        s = grf_scenarios(key, 128, cfg, dtype=jnp.float32)
        qpr = assemble_qp_batch(s, cfg)
        sol3 = solve_qp_ipm(qpr.Q, qpr.c, qpr.G, qpr.h, iterations=60)
        return sol3.x

    jax.block_until_ready(rescue(jax.random.key(1)))
    n = 32
    t0 = time.time()
    for i in range(n):
        out = rescue(jax.random.fold_in(jax.random.key(2), i))
    jax.block_until_ready(out)
    t1 = (time.time() - t0) / n
    t0 = time.time()
    for i in range(3 * n):
        out = rescue(jax.random.fold_in(jax.random.key(3), i))
    jax.block_until_ready(out)
    t3 = (time.time() - t0) / (3 * n)
    print(f"rescue-128 dispatch: plain {t1*1e3:.2f} ms, "
          f"marginal {(3*t3-t1)/2*1e3:.2f} ms vs bench ~24 ms/32k batch")


if __name__ == "__main__":
    main()
