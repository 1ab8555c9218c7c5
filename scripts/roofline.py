#!/usr/bin/env python
"""Roofline / speed-of-light accounting for the two headline Pallas kernels
(BASELINE.md target row 3; VERDICT round-3 missing #3).

For (a) the fused GRF kernel (solver/pallas_fused.py) and (b) the
whole-horizon Riccati MPC kernel (mpc/pallas_riccati.py), this script

  1. counts FLOPs, HBM bytes, and VPU tile-op issue slots per instance
     ANALYTICALLY, by mirroring the kernel loop structure (constants
     N=12, M=24, NK=36; formulas annotated inline — accurate to ~±20%,
     which is enough to separate bounds an order of magnitude apart);
  2. measures per-phase marginal kernel time on the real TPU (barrier
     iterations and polish sweeps are swept so each phase's slope is a
     direct measurement, not a subtraction of totals);
  3. prints measured time against the three candidate bounds — MXU
     throughput, VPU throughput, HBM bandwidth — plus the LATENCY model
     (dependent-op issue chains), which is the one that actually binds.

v5e (TPU v5 lite) per-chip numbers used (public: jax-ml.github.io/
scaling-book and cloud.google.com/tpu/docs/v5e):
  HBM BW 819 GB/s; MXU 197 bf16 TFLOP/s (f32-accum);
  VPU: (8, 128) lanes x 4 ALUs x 0.94 GHz = 3.85 f32 Top/s.

Run on the real TPU: PYTHONPATH="$PYTHONPATH:." python scripts/roofline.py
Writes the measured table to stdout; ROOFLINE.md holds the analysis.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.solver.pallas_fused import solve_balance_qp_fused
from quadruped_control_tpu.utils.scenarios import grf_scenarios

N, M = 12, 24
NK = N + M
HBM_BPS = 819e9
VPU_OPS = 8 * 128 * 4 * 0.94e9     # f32 elementwise ops/s
MXU_FLOPS = 197e12                  # bf16; the kernels don't use the MXU
CLK = 0.94e9


def log(m):
    print(m, flush=True)


# ---------------------------------------------------------------- counts --
def barrier_iter_counts():
    """Per-instance (flops, tile_ops) for ONE Mehrotra barrier iteration,
    mirroring pallas_fused._barrier body()."""
    fl = op = 0
    # Gx (sparse, <=2 nz/row) + r_prim: M * ~5
    fl += M * 5; op += M * 5
    # r_dual: N full Q rows (N mults) + G^T z (~2): N * (2N + 4)
    fl += N * (2 * N + 4); op += N * (2 * N + 4)
    # d = z/s clamp: M * 2
    fl += M * 2; op += M * 2
    # normal matrix Q + G^T D G: ~96 MACs (docstring) + diag reg N*3
    fl += 96 * 2 + N * 3; op += 96 + N * 3
    # dense 12x12 Cholesky: sum_j [2j + (N-j)(2j+2)] ~ N^3/3 * 2 flops
    fl += int(2 * N**3 / 3) + N * 8; op += int(N**3 / 3) + N * 8
    # kkt_solve (chol_solve + residual + correction) x 2 newton solves:
    # chol_solve 2 * N^2 MACs; residual N^2; => per kkt ~ (2+1+2) N^2 MACs
    per_kkt = 5 * N * N * 2
    fl += 2 * per_kkt; op += per_kkt  # two solves (affine + corrector)
    # newton rhs/ds/dz assembly: 2 * M * ~8
    fl += 2 * M * 8; op += 2 * M * 8
    # step-size ratios 2x(2M), mu/mu_aff 2M*3, merit/best ~ (N+2M)*2
    fl += 10 * M + (N + 2 * M) * 2; op += 10 * M + (N + 2 * M) * 2
    return fl, op


def polish_sweep_counts(refine=4, ff=False):
    """Per-instance (flops, tile_ops) for ONE polish sweep, mirroring
    pallas_fused._polish sweep_body. ff=True counts the compensated
    (TwoProd+TwoSum ~ 13 ops/term vs 2) residual/slack arithmetic."""
    fl = op = 0
    # build_K: N(N+1)/2 copies + M rows * (N writes + diag)
    op += N * (N + 1) // 2 + M * (N + 2)
    fl += M * 3
    # packed LDL^T factor: sum_j [ 5j + (NK-1-j)(5j+2) ]
    f_ops = sum(5 * j + (NK - 1 - j) * (5 * j + 2) for j in range(NK))
    op += f_ops; fl += int(f_ops * 0.8)
    # ldl solves: (1 + refine) x (fwd + bwd) ~ 4 * NK^2 ops each
    op += (1 + refine) * 4 * NK * NK
    fl += (1 + refine) * 3 * NK * NK
    # refinement residuals: r1 N*(N+3) terms, r2 M*4 terms
    per_term = 13 if ff else 2
    op += refine * (N * (N + 3) + M * 4) * per_term
    fl += refine * (N * (N + 3) + M * 4) * per_term
    # ff certification residual (always compensated): N*(N+3) * 13
    op += N * (N + 3) * 13; fl += N * (N + 3) * 13
    # slack + swap bookkeeping: M * ~14 (ff slack: M * 4 * 13)
    sl = M * 4 * (13 if ff else 2) + M * 10
    op += sl; fl += sl
    return fl, op


def bytes_per_instance():
    # in: r 12 + b 6 + st 4 + mu/fmin/fmax 3; out: x 12 + s 24 + z 24 + diag 6
    return (25 + 66) * 4


# ------------------------------------------------------------- measuring --
def measure(fn, reps=8):
    """Best-of-3 marginal timing (tunnel-noise discipline of bench.py)."""
    best = np.inf
    for r in range(3):
        k = jax.random.split(jax.random.key(17 + r), 3 * reps)
        jax.block_until_ready(fn(k[0]))
        t0 = time.time()
        for kk in k[:reps]:
            o = fn(kk)
        jax.block_until_ready(o)
        t1 = time.time() - t0
        t0 = time.time()
        for kk in k:
            o = fn(kk)
        jax.block_until_ready(o)
        t3 = time.time() - t0
        dt = (t3 - t1) / (2 * reps)
        if dt > 0:
            best = min(best, dt)
    return best


def main():
    cfg = mit_cheetah_config()
    log(f"device: {jax.devices()[0]}")
    BATCH = 32768

    def make(iters, sweeps, rows, polish=True):
        @jax.jit
        def f(key):
            s = grf_scenarios(key, BATCH, cfg, dtype=jnp.float32)
            sol = solve_balance_qp_fused(
                s.R, s.R_d, s.x, s.xdot, s.w, s.x_d, s.xdot_d, s.w_d,
                s.feet, s.stance, cfg.balance, iterations=iters,
                polish=polish, polish_sweeps=max(sweeps, 1), rows=rows)
            return sol.converged
        return f

    rows_list = [8, 16]
    results = {}
    for rows in rows_list:
        t_b10 = measure(make(10, 0, rows, polish=False))
        t_b20 = measure(make(20, 0, rows, polish=False))
        t_s2 = measure(make(20, 2, rows))
        t_s8 = measure(make(20, 8, rows))
        per_iter = (t_b20 - t_b10) / 10
        per_sweep = (t_s8 - t_s2) / 6
        results[rows] = (t_b20, per_iter, per_sweep)
        log(f"rows={rows}: barrier20 {t_b20*1e3:.2f} ms | marginal "
            f"barrier-iter {per_iter*1e3:.3f} ms | marginal polish-sweep "
            f"{per_sweep*1e3:.3f} ms  (batch {BATCH})")

    log("\n--- bounds per batch-32768 call ---")
    fl_i, op_i = barrier_iter_counts()
    fl_s, op_s = polish_sweep_counts()
    fl_sf, op_sf = polish_sweep_counts(ff=True)
    log(f"counts/instance: barrier-iter {fl_i} flops / {op_i} tile-ops; "
        f"polish-sweep {fl_s} flops / {op_s} tile-ops "
        f"(ff variant {fl_sf}/{op_sf})")
    hbm_t = BATCH * bytes_per_instance() / HBM_BPS
    log(f"HBM bound (whole call, {bytes_per_instance()} B/inst): "
        f"{hbm_t*1e6:.1f} us — negligible at any phase count")
    for rows in rows_list:
        t_b20, per_iter, per_sweep = results[rows]
        grid = BATCH // (rows * 128)
        # throughput bounds for the marginal phase unit
        it_vpu = BATCH * op_i / VPU_OPS
        sw_vpu = BATCH * op_s / VPU_OPS
        # latency model: ops execute as (rows x 128) tiles on the (8, 128)
        # VPU; dependent chains stall ~LAT cycles per op; grid steps are
        # sequential.
        for name, per, ops in (("barrier-iter", per_iter, op_i),
                               ("polish-sweep", per_sweep, op_s)):
            vpu_b = BATCH * ops / VPU_OPS
            lat_cyc = per * CLK / (grid * ops)
            log(f"rows={rows} {name}: measured {per*1e3:.3f} ms/call = "
                f"{per/grid*1e6:.2f} us/grid-step "
                f"({ops} tile-ops) | VPU-throughput bound "
                f"{vpu_b*1e3:.3f} ms ({per/vpu_b:.1f}x above) | implied "
                f"latency {lat_cyc:.2f} cyc/op")

    # ---- Riccati MPC kernel: marginal per-IPM-iteration time ----
    try:
        from quadruped_control_tpu.mpc.pallas_riccati import solve_mpc_fused
        from quadruped_control_tpu.mpc.horizon import (
            make_reference_trajectory,
        )

        B, NH, mdt = 1024, 10, 0.03

        def make_m(iters):
            @jax.jit
            def f(key):
                ks = jax.random.split(key, 4)
                rpy = 0.05 * jax.random.normal(ks[0], (B, 3))
                xw = jax.random.normal(ks[1], (B, 3)) * 0.02 + jnp.array(
                    [0.0, 0.0, 0.26])
                feet = jax.random.normal(ks[2], (B, 4, 3)) * 0.02 + jnp.array(
                    [[0.19, 0.13, 0.0], [0.19, -0.13, 0.0],
                     [-0.19, 0.13, 0.0], [-0.19, -0.13, 0.0]])
                xi0 = jnp.concatenate(
                    [rpy, xw, jnp.zeros((B, 6)), jnp.ones((B, 1))], -1)
                cmd = jnp.zeros((B, 6)).at[:, 0].set(0.2)
                xi_ref = make_reference_trajectory(xi0, cmd, NH, mdt)
                sched = jnp.ones((B, NH, 4), bool)
                F, sol = solve_mpc_fused(xi0, xi_ref, rpy[:, 2], feet, xw,
                                         sched, NH, mdt, cfg,
                                         iterations=iters)
                return F
            return f

        t10 = measure(make_m(10), reps=4)
        t20 = measure(make_m(20), reps=4)
        per_it = (t20 - t10) / 10
        log(f"\nriccati kernel (B={B}, N={NH}): 20-iter {t20*1e3:.2f} ms, "
            f"marginal {per_it*1e3:.3f} ms/IPM-iteration "
            f"({per_it/ (B/1024) *1e6:.1f} us/grid-step)")
        # per-iteration count: NH Riccati steps, each a 13x13-ish factor +
        # solves + the stage cone algebra (see ROOFLINE.md for the model)
        ops_ric = NH * (int(13**3 / 3) + 6 * 13 * 13 + 24 * 30)
        log(f"  ~{ops_ric} tile-ops/iter -> implied latency "
            f"{per_it * CLK / ((B // 1024) * ops_ric):.2f} cyc/op")
    except Exception as e:  # pragma: no cover
        log(f"riccati measurement skipped: {e}")


if __name__ == "__main__":
    main()
