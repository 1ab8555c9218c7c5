#!/usr/bin/env python
"""Per-stage device timing of the fused tick's three kernels, scan-
amortized (single-dispatch timing on the axon tunnel measures only the
~28 ms HTTP round trip). Each stage runs inside a lax.scan with its state
fed back (or an iteration-dependent perturbation when there is no natural
carry) so XLA cannot hoist it; marginal per-iter = (t(60) - t(20)) / 40.

Run: PYTHONPATH="$PYTHONPATH:." python scripts/tick_stage_profile.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quadruped_control_tpu.config import mit_cheetah_physical_config
from quadruped_control_tpu.control.commander import init_commander_carry
from quadruped_control_tpu.control.pallas_commander import (
    CommanderConsts,
    commander_pre_pallas_packed,
    pack_commander_carry,
    pack_comps,
)
from quadruped_control_tpu.sim import (
    ContactConfig,
    init_whole_body_state,
    mit_cheetah_whole_body_model,
)
from quadruped_control_tpu.sim.pallas_tick import (
    make_fused_tick,
    pack_whole_body_state,
)
from quadruped_control_tpu.solver.pallas_fused import (
    solve_grf_qp_fused_packed,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


ROWS = 8
B = 4096
QP_IT = 12


def marginal(scan_fn, reps=3):
    """scan_fn(steps) -> jitted callable; returns marginal s/iter."""
    out = {}
    for steps in (20, 60):
        jax.block_until_ready(scan_fn(steps))
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(scan_fn(steps))
            best = min(best, time.time() - t0)
        out[steps] = best
    return (out[60] - out[20]) / 40


def main():
    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    contact = ContactConfig()
    dt = 1.0 / cfg.frequency
    consts = CommanderConsts(cfg, dt)
    log(f"device: {jax.devices()[0]}, B={B}, rows={ROWS}")

    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    carry = carry._replace(standing=jnp.ones((B,), bool),
                           gait_time=jnp.zeros((B,)))
    cmd = jnp.zeros((B, 6), jnp.float32).at[:, 0].set(0.2)

    state_p, _ = pack_whole_body_state(wb, ROWS)
    carry_p = pack_commander_carry(carry, ROWS, B)
    cmd_p = pack_comps(cmd, ROWS)
    tick = make_fused_tick(model, cfg, contact, rows=ROWS,
                           qp_iterations=QP_IT, qp_polish=True,
                           qp_warm_start=False)
    # qp_polish=False matches rollout_whole_body's default operating point
    # (the 3-stage numbers are barrier-only; polish is the expensive
    # certified packed-LDL stage).
    tick_np = make_fused_tick(model, cfg, contact, rows=ROWS,
                              qp_iterations=QP_IT, qp_polish=False,
                              qp_warm_start=False)

    # Reference packed precursors for the isolated QP / substep stages.
    outs = jax.jit(lambda s, c, m: commander_pre_pallas_packed(
        s, c, m, consts=consts, rows=ROWS))(state_p, carry_p, cmd_p)
    r_p, b_p, st_p, mu_p, fmin_p, fmax_p, tausw_p, _, _ = outs
    x_p = jax.jit(lambda *a: solve_grf_qp_fused_packed(
        *a, s_diag=tuple(cfg.balance.s_diag),
        w_diag=float(cfg.balance.w_diag), iterations=QP_IT, polish=True,
        rows=ROWS))(r_p, b_p, st_p, mu_p, fmin_p, fmax_p)[0]

    @partial(jax.jit, static_argnames="steps")
    def scan_pre(steps):
        def body(cp, _):
            o = commander_pre_pallas_packed(state_p, cp, cmd_p,
                                            consts=consts, rows=ROWS)
            return o[7], o[1][:, :1]
        cp, bs = lax.scan(body, carry_p, None, length=steps)
        return cp, bs.sum()

    @partial(jax.jit, static_argnames=("steps", "polish"))
    def scan_qp(steps, polish=True):
        def body(bp, _):
            x, _s, _z, d = solve_grf_qp_fused_packed(
                r_p, bp, st_p, mu_p, fmin_p, fmax_p,
                s_diag=tuple(cfg.balance.s_diag),
                w_diag=float(cfg.balance.w_diag), iterations=QP_IT,
                polish=polish, rows=ROWS)
            return bp + 1e-12 * x[:, :6], d[:, 1].sum()
        bp, cs = lax.scan(body, b_p, None, length=steps)
        return bp, cs.sum()

    @partial(jax.jit, static_argnames="steps")
    def scan_sub(steps):
        def body(sp, _):
            return tick.stepper.packed(sp, x_p, tausw_p, st_p, dt, 10), None
        sp, _ = lax.scan(body, state_p, None, length=steps)
        return sp

    @partial(jax.jit, static_argnames=("steps", "polish"))
    def scan_tick(steps, polish=True):
        t = tick if polish else tick_np
        def body(sc, _):
            s, c2, _ = t(sc[0], sc[1], cmd_p, dt, 10)
            return (s, c2), None
        sc, _ = lax.scan(body, (state_p, carry_p), None, length=steps)
        return sc

    for name, fn in (
        ("commander-pre", scan_pre),
        ("fused QP (polish)", scan_qp),
        ("fused QP (barrier)", partial(scan_qp, polish=False)),
        ("substep(qp)x10", scan_sub),
        ("whole tick (polish)", scan_tick),
        ("whole tick (barrier)", partial(scan_tick, polish=False)),
    ):
        per = marginal(fn)
        log(f"{name:20s}: {per*1e3:7.3f} ms/iter  "
            f"({B/per:,.0f} inst/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
