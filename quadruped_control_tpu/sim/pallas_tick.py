"""The whole-body closed-loop tick as three chained Pallas kernels.

The reference runs its validation loop as two OS processes exchanging
topics at 100-600 Hz (commander_node.cpp + drake_interface_node.cpp,
SURVEY.md §3.1-3.2). ``control/commander.py`` + ``sim/plant.py`` already
fuse that into one jitted scan; this module removes the remaining XLA glue
around the kernels. One control tick is exactly three ``pallas_call``s:

  1. commander-pre (control/pallas_commander.py): measurement, FK, the
     standing/gait state machine, Raibert planning, sextic tracking, IK,
     swing PD -> packed QP precursors + swing torques + new carry;
  2. the fused GRF-QP kernel (solver/pallas_fused.py) consuming those
     packed tiles directly;
  3. the whole-body substep kernel (sim/pallas_substep.py,
     ``torque_input="qp"``): torque mapping (J^T f, stance/swing merge,
     optional gravity compensation, clamping) as the prologue, then the
     N-substep physics loop.

Everything between kernels stays in the packed ``(nb, k, rows, 128)`` lane
layout — the scan carry IS the packed tensors, so the XLA side of the loop
body is literally nothing but the three kernel dispatches. Packing happens
once per rollout at the boundary.

Parity: tests/test_pallas_tick.py checks the fused tick against the XLA
commander + QP-kernel + substep-kernel composition in float64 interpret
mode, and closed-loop behavior (stand-up, trot) on device in f32.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import ControlConfig
from quadruped_control_tpu.control.commander import CommanderCarry
from quadruped_control_tpu.control.pallas_commander import (
    N_CARRY,
    CommanderConsts,
    commander_pre_pallas_packed,
    pack_commander_carry,
    pack_comps,
    unpack_commander_carry,
    unpack_comps,
)
from quadruped_control_tpu.sim.model import WholeBodyModel
from quadruped_control_tpu.sim.pallas_substep import (
    LANE,
    N_STATE,
    make_pallas_stepper,
)
from quadruped_control_tpu.sim.plant import ContactConfig, WholeBodyState
from quadruped_control_tpu.solver.pallas_fused import (
    solve_grf_qp_fused_packed,
)


class FusedRolloutTrace(NamedTuple):
    """Per-tick trace of the fused loop (a light cousin of
    control/rollout.RolloutTrace — torques never leave the kernel)."""

    x: jnp.ndarray  # (steps, ..., 3) base position
    standing: jnp.ndarray  # (steps, ...)
    in_stance: jnp.ndarray  # (steps, ..., 4) effective stance mask
    qp_converged: jnp.ndarray  # (steps, ...)


class FusedWholeBodyResult(NamedTuple):
    plant: WholeBodyState
    carry: CommanderCarry
    trace: FusedRolloutTrace | None
    # Final packed QP warm carry (x_p, s_p, z_p, st_p) when the tick was
    # built with qp_warm_start=True, else None. Feed it back as the ``warm``
    # argument of the next rollout call so hotstart economics survive
    # host-side chunking (the reference keeps its qpOASES active set alive
    # across every tick, balance_controller.cpp:193-195 — a chunk boundary
    # must not reset it).
    warm: tuple | None = None


def make_fused_tick(model: WholeBodyModel, cfg: ControlConfig,
                    contact: ContactConfig = ContactConfig(), *,
                    rows: int = 8, qp_iterations: int | None = None,
                    qp_polish: bool = True, qp_warm_start: bool = True,
                    qp_polish_sweeps: int | None = None,
                    qp_polish_refine: int | None = None,
                    qp_polish_multi_swap: bool = False,
                    qp_tail: bool = False, qp_tail_divisor: int = 4,
                    qp_tail_rows: int = 8, qp_tail_sweeps: int = 24,
                    qp_tail_prox_steps: int = 2,
                    qp_tail_prox_iterations: int = 8,
                    qp_tail_prox_sweeps: int | None = None,
                    contact_gate: float = 0.0,
                    raibert_cmd_symmetric: bool = False,
                    gravity_comp: bool = False,
                    controller: str = "balance", mpc_horizon: int = 8,
                    mpc_dt: float = 0.03, mpc_iterations: int = 15,
                    mpc_state_weights=None, mpc_warm_start: bool = False,
                    interpret: bool = False):
    """Build the fused tick: ``tick(state_p, carry_p, cmd_p, dt,
    n_substeps) -> (state_p, carry_p, diag_p)`` on packed tiles.

    Model/config constants are snapshot here (call outside jit). The
    returned callable also carries ``.consts`` and ``.stepper``.

    ``rows`` is the tile height (batch pads to rows*128): 16 measures ~10%
    faster than 8 at batch >= 4096 on v5e (0.130 vs 0.145 ms/tick) with
    BITWISE-identical results — per-lane math is tile-height-independent;
    use 8 for small batches to halve padding.

    ``qp_warm_start=True`` (the default) threads the QP solution (x, s, z)
    and the stance mask through the scan carry and warm-starts the barrier
    from the previous tick's solution (stance-transition rows reset cold) —
    the reference's qpOASES hotstart economics
    (balance_controller.cpp:193-195) inside the kernel. The tick signature
    becomes ``tick(state_p, carry_p, warm_p, cmd_p, dt, n_substeps) ->
    (state_p, carry_p, warm_p, diag_p)`` with
    ``warm_p = (x_p, s_p, z_p, st_p)``; build the first-tick carry with
    :func:`init_qp_warm_packed` (zeros + st=-1 == cold start).

    ``controller="mpc"`` replaces kernel 2 with the receding-horizon
    Pallas Riccati-IPM (mpc/pallas_riccati.py): commander-pre additionally
    emits the MPC precursor block (xi0, levers, the N-step stance schedule
    sampled in-kernel from the gait clock, the constant-twist reference)
    and the tick applies the horizon's step-0 forces — the whole-body
    robust operating point (MPC + gravity_comp,
    tests/test_whole_body_loop.py::test_whole_body_mpc_trot_robust_point)
    through three kernels. ``qp_*`` knobs are ignored; ``mpc_horizon`` /
    ``mpc_dt`` / ``mpc_iterations`` / ``mpc_state_weights`` mirror
    control/commander.commander_step. Use rows=8: the Riccati kernel's
    VMEM scratch (~10 MB at N=8) exceeds the 16 MB ceiling at rows=16.
    ``mpc_warm_start=True`` threads the previous tick's horizon solution
    (F, s, z) + stance schedule through the scan carry and warm-starts the
    Riccati IPM (schedule-changed rows reset cold) — the tick signature
    becomes the warm 6-arg form and the first-tick carry comes from
    :func:`init_mpc_warm_packed` (all -1 schedule == cold start).
    Measured on v5e (BENCH_warm_mpc.json, 2026-08-21): warm-8 runs the
    robust operating point at 1.082 ms/tick b1024 (946k ticks/s, 1.9x
    cold-15) with per-solve certification 0.83 vs cold's 0.63; warm-6 is
    1.21M ticks/s at cold-equal conv. Opt-in: mpc_iterations=10 tipped
    the documented marginal-limit-cycle trot in the B=256 behavior drive
    (PARITY.md "stability anatomy") — use warm-8, and re-check behavior
    when changing the horizon or gait.

    ``qp_tail=True`` appends the IN-LOOP certification tail
    (solver/pallas_fused.solve_grf_qp_tail_packed, VERDICT round-2 #1):
    after the per-tick QP kernel, the uncertified instances are
    argsort-compacted into a ``B / qp_tail_divisor`` slice and re-solved
    by a second kernel dispatch with the long warm-seeded polish
    (``qp_tail_sweeps``) plus IN-KERNEL proximal restarts
    (``qp_tail_prox_steps`` x ``qp_tail_prox_iterations`` — the
    instrument for the f32 single-swap-defeating 4-stance family the
    polish search saturates on). The improved (x, s, z) scatter back into
    the output AND the warm carry. Recommended operating point:
    ``qp_polish=False, qp_tail=True`` — barrier-only for everyone, the
    expensive certified polish only where it is needed.

    ``qp_iterations=None`` resolves to 6 warm / 12 cold — the measured
    operating points (scripts/verify_warm_tick.py on v5e, 2026-08-20,
    BENCH_warm_tick.json): cold needs all 12 barrier iterations (8 falls
    over in trot); warm-6 holds stand-up AND the 0.2 m/s trot at 0.100
    ms/tick vs cold-12's 0.136 at batch 4096 (41.1M vs 30.2M
    scenario-ticks/s) with trot conv 0.978 vs 0.973 — faster AND slightly
    better certified than cold, the same trade qpOASES hotstart buys the
    reference (warm-5 is 0.090 ms/tick but drops trot conv to 0.958).
    """
    if controller not in ("balance", "mpc"):
        raise ValueError(f"controller must be 'balance'|'mpc': {controller}")
    if qp_iterations is None:
        qp_iterations = 6 if qp_warm_start else 12
    from quadruped_control_tpu.solver.pallas_ipm import (
        _POLISH_REFINE,
        _POLISH_SWEEPS_PALLAS,
    )

    if qp_polish_sweeps is None:
        qp_polish_sweeps = _POLISH_SWEEPS_PALLAS
    if qp_polish_refine is None:
        qp_polish_refine = _POLISH_REFINE
    consts = CommanderConsts(cfg, dt=1.0 / cfg.frequency)
    stepper = make_pallas_stepper(
        model, cfg, contact, rows=rows, interpret=interpret,
        prefactor="kernel", torque_input="qp", gravity_comp=gravity_comp)
    s_diag = tuple(cfg.balance.s_diag)
    w_diag = float(cfg.balance.w_diag)
    is_mpc = controller == "mpc"

    def commander_pre(state_p, carry_p, cmd_p):
        return commander_pre_pallas_packed(
            state_p, carry_p, cmd_p, consts=consts, rows=rows,
            contact_gate=contact_gate,
            raibert_cmd_symmetric=raibert_cmd_symmetric,
            mpc_horizon=mpc_horizon if is_mpc else 0, mpc_dt=mpc_dt,
            interpret=interpret)

    if is_mpc:
        # Receding-horizon controller in the tick (the commander's
        # controller="mpc" slot, commander_node.cpp:507-508): kernel 2 is
        # the Pallas Riccati-IPM over the horizon, consuming the MPC
        # precursor block commander-pre emits (schedule sampled in-kernel
        # from the gait clock). Step-0 forces feed the substep kernel.
        from quadruped_control_tpu.mpc.pallas_riccati import (
            solve_mpc_qp_riccati_packed,
        )

        bal = cfg.balance
        weights = (tuple(mpc_state_weights) if mpc_state_weights is not None
                   else (50.0, 50.0, 10.0, 1.0, 1.0, 100.0,
                         1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 0.0))
        mpc_kw = dict(
            n_steps=mpc_horizon, dt=mpc_dt, mass=float(bal.mass),
            inertia_diag=tuple(float(v) for v in bal.inertia_diag),
            mu=float(bal.mu), fz_min=float(bal.fz_min),
            fz_max=float(bal.fz_max), state_weights=weights,
            iterations=mpc_iterations, interpret=interpret)

        def mpc_diag(dg):
            # Reorder the MPC diag [conv, pr, dr, gap, nu, 0] into the QP
            # diag convention [cert, conv, pr, dr, gap, *] the rollout
            # trace indexes (row 1 = converged).
            return jnp.concatenate(
                [jnp.zeros_like(dg[:, 0:1]), dg[:, 0:4], dg[:, 4:5]],
                axis=1)

        if mpc_warm_start:
            def tick(state_p, carry_p, warm_p, cmd_p, dt: float,
                     n_substeps: int):
                (r_p, b_p, st_p, mu_p, fmin_p, fmax_p, tausw_p,
                 carry_new_p, _qref_p, mpc_p) = commander_pre(
                    state_p, carry_p, cmd_p)
                F_p, dg, szf_new_p = solve_mpc_qp_riccati_packed(
                    mpc_p, warm_p, **mpc_kw)
                x_p = F_p[:, 0:12]  # step-0 GRFs (stance-masked, N)
                state_new_p = stepper.packed(
                    state_p, x_p.astype(state_p.dtype), tausw_p, st_p, dt,
                    n_substeps)
                # Next tick's warm carry: the kernel's [s | z | F] block of
                # the FINAL iterate (a consistent primal-dual triple — F_p
                # is the best-merit control output and is NOT recycled as
                # the warm F) + the schedule it was solved against (the
                # kernel cold-resets rows whose schedule bit flips).
                # Uniformly f32: the kernel computes f32 even on an f64
                # interpret path, and the scan carry structure must match.
                sched_p = mpc_p[:, 25:25 + 4 * mpc_horizon].astype(
                    jnp.float32)
                nszh = 2 * 24 * mpc_horizon  # 2 * MC * N
                warm_new_p = (szf_new_p[:, nszh:], szf_new_p[:, :nszh],
                              sched_p)
                return (state_new_p, carry_new_p, warm_new_p,
                        (st_p, mpc_diag(dg)))
        else:
            def tick(state_p, carry_p, cmd_p, dt: float, n_substeps: int):
                (r_p, b_p, st_p, mu_p, fmin_p, fmax_p, tausw_p,
                 carry_new_p, _qref_p, mpc_p) = commander_pre(
                    state_p, carry_p, cmd_p)
                F_p, dg = solve_mpc_qp_riccati_packed(mpc_p, **mpc_kw)
                x_p = F_p[:, 0:12]  # step-0 GRFs (stance-masked, N)
                state_new_p = stepper.packed(
                    state_p, x_p.astype(state_p.dtype), tausw_p, st_p, dt,
                    n_substeps)
                return state_new_p, carry_new_p, (st_p, mpc_diag(dg))

        def held(state_p, carry_p, x_hold_p, cmd_p, dt: float,
                 n_substeps: int):
            """Zero-order-hold tick between MPC solves (the reference-class
            25-50 Hz MPC over a 100-300 Hz loop, control/rollout.py::
            rollout_mpc_decimated): commander-pre still runs (swing PD,
            gait, planning), the held step-0 forces drive the stance
            legs — only the Riccati kernel dispatch is skipped."""
            (_r, _b, st_p, _mu, _fmin, _fmax, tausw_p, carry_new_p,
             _qref) = commander_pre_pallas_packed(
                state_p, carry_p, cmd_p, consts=consts, rows=rows,
                contact_gate=contact_gate,
                raibert_cmd_symmetric=raibert_cmd_symmetric,
                interpret=interpret)
            state_new_p = stepper.packed(
                state_p, x_hold_p.astype(state_p.dtype), tausw_p, st_p,
                dt, n_substeps)
            return state_new_p, carry_new_p, st_p

        tick.held = held
        tick.pre = commander_pre
        tick.solve = partial(solve_mpc_qp_riccati_packed, **mpc_kw)
        tick.consts = consts
        tick.stepper = stepper
        tick.rows = rows
        tick.warm_start = mpc_warm_start
        tick.mpc_horizon = mpc_horizon
        tick.mpc_dt = mpc_dt
        if mpc_warm_start:
            tick.init_warm = partial(init_mpc_warm_packed,
                                     horizon=mpc_horizon, rows=rows)
        return tick

    def qp_tail_stage(r_p, b_p, st_p, mu_p, fmin_p, fmax_p,
                      x_p, s_p, z_p, diag_p):
        from quadruped_control_tpu.solver.pallas_fused import (
            solve_grf_qp_tail_packed,
        )

        return solve_grf_qp_tail_packed(
            r_p, b_p, st_p, mu_p, fmin_p, fmax_p, x_p, s_p, z_p, diag_p,
            s_diag=s_diag, w_diag=w_diag, tail_divisor=qp_tail_divisor,
            tail_rows=qp_tail_rows, tail_sweeps=qp_tail_sweeps,
            tail_prox_steps=qp_tail_prox_steps,
            tail_prox_iterations=qp_tail_prox_iterations,
            tail_prox_sweeps=qp_tail_prox_sweeps,
            interpret=interpret)

    if qp_warm_start:
        def tick(state_p, carry_p, warm_p, cmd_p, dt: float,
                 n_substeps: int):
            (r_p, b_p, st_p, mu_p, fmin_p, fmax_p, tausw_p, carry_new_p,
             _qref_p) = commander_pre(state_p, carry_p, cmd_p)
            xw_p, sw_p, zw_p, stprev_p = warm_p
            x_p, s_p, z_p, diag_p = solve_grf_qp_fused_packed(
                r_p, b_p, st_p, mu_p, fmin_p, fmax_p,
                xw_p, sw_p, zw_p, stprev_p, s_diag=s_diag,
                w_diag=w_diag, iterations=qp_iterations, polish=qp_polish,
                polish_sweeps=qp_polish_sweeps,
                polish_refine=qp_polish_refine,
                polish_multi_swap=qp_polish_multi_swap,
                rows=rows, interpret=interpret)
            if qp_tail:
                x_p, s_p, z_p, diag_p = qp_tail_stage(
                    r_p, b_p, st_p, mu_p, fmin_p, fmax_p,
                    x_p, s_p, z_p, diag_p)
            state_new_p = stepper.packed(state_p, x_p.astype(state_p.dtype),
                                         tausw_p, st_p, dt, n_substeps)
            # The QP kernel computes f32 regardless of the plant dtype, so
            # the warm carry is uniformly f32 (st_p may be f64 interpret).
            warm_new_p = (x_p, s_p, z_p, st_p.astype(jnp.float32))
            return state_new_p, carry_new_p, warm_new_p, (st_p, diag_p)
    else:
        def tick(state_p, carry_p, cmd_p, dt: float, n_substeps: int):
            (r_p, b_p, st_p, mu_p, fmin_p, fmax_p, tausw_p, carry_new_p,
             _qref_p) = commander_pre(state_p, carry_p, cmd_p)
            x_p, s_p, z_p, diag_p = solve_grf_qp_fused_packed(
                r_p, b_p, st_p, mu_p, fmin_p, fmax_p, s_diag=s_diag,
                w_diag=w_diag, iterations=qp_iterations, polish=qp_polish,
                polish_sweeps=qp_polish_sweeps,
                polish_refine=qp_polish_refine,
                polish_multi_swap=qp_polish_multi_swap,
                rows=rows, interpret=interpret)
            if qp_tail:
                x_p, s_p, z_p, diag_p = qp_tail_stage(
                    r_p, b_p, st_p, mu_p, fmin_p, fmax_p,
                    x_p, s_p, z_p, diag_p)
            state_new_p = stepper.packed(state_p, x_p.astype(state_p.dtype),
                                         tausw_p, st_p, dt, n_substeps)
            return state_new_p, carry_new_p, (st_p, diag_p)

    tick.consts = consts
    tick.stepper = stepper
    tick.rows = rows
    tick.warm_start = qp_warm_start
    return tick


def init_qp_warm_packed(nb: int, rows: int, dtype=jnp.float32):
    """First-tick warm carry for a ``qp_warm_start`` fused tick: zero
    (x, s, z) plus st_prev = -1 marks every cone row stale, which the
    kernel resets cold — tick 1 is bitwise the cold start.

    dtype should stay float32: the QP kernel computes (and returns) f32
    even on an f64 interpret path, and the scan carry structure must match
    the tick's outputs."""
    from quadruped_control_tpu.solver.pallas_ipm import M as _M, N as _N
    shp = lambda k: (nb, k, rows, LANE)  # noqa: E731
    return (jnp.zeros(shp(_N), dtype), jnp.zeros(shp(_M), dtype),
            jnp.zeros(shp(_M), dtype), -jnp.ones(shp(4), dtype))


def init_mpc_warm_packed(nb: int, *, horizon: int, rows: int,
                         dtype=jnp.float32):
    """First-tick warm carry for an ``mpc_warm_start`` fused tick:
    zero (F, s, z) plus schedule = -1, which mismatches every current
    schedule bit so the Riccati kernel resets every row cold — tick 1 is
    exactly the cold start (mpc/pallas_riccati.py warm semantics)."""
    shp = lambda k: (nb, k, rows, LANE)  # noqa: E731
    return (jnp.zeros(shp(horizon * 12), dtype),
            jnp.zeros(shp(2 * horizon * 24), dtype),
            -jnp.ones(shp(4 * horizon), dtype))


def pack_whole_body_state(state: WholeBodyState, rows: int):
    """WholeBodyState -> packed (nb, 58, rows, 128); pads with the free-
    falling-at-altitude pattern (finite on every kernel path)."""
    batch = state.x.shape[:-1]
    dtype = state.x.dtype
    B = 1
    for d in batch:
        B *= int(d)
    comps = jnp.concatenate([
        state.R.reshape(batch + (9,)),
        state.x,
        state.u,
        state.q.reshape(batch + (12,)),
        state.anchor.reshape(batch + (16,)),
    ], axis=-1).reshape(B, N_STATE)
    tile = rows * LANE
    B_pad = ((B + tile - 1) // tile) * tile
    if B_pad != B:
        pad = jnp.zeros((B_pad - B, N_STATE), dtype)
        pad = pad.at[:, 0].set(1.0).at[:, 4].set(1.0).at[:, 8].set(1.0)
        pad = pad.at[:, 11].set(100.0)
        comps = jnp.concatenate([comps, pad], axis=0)
    return pack_comps(comps, rows), B_pad


def unpack_whole_body_state(state_p, batch_shape) -> WholeBodyState:
    flat = unpack_comps(state_p)
    B = 1
    for d in batch_shape:
        B *= int(d)
    flat = flat[:B]
    return WholeBodyState(
        R=flat[:, 0:9].reshape(batch_shape + (3, 3)),
        x=flat[:, 9:12].reshape(batch_shape + (3,)),
        u=flat[:, 12:30].reshape(batch_shape + (18,)),
        q=flat[:, 30:42].reshape(batch_shape + (4, 3)),
        anchor=flat[:, 42:58].reshape(batch_shape + (8, 2)),
    )


def _pack_cmd(cmd_twist, batch, B, B_pad, rows, dtype, steps=None):
    """Broadcast + flatten + pad + pack a command twist.

    With ``steps``: cmd_twist is a (steps, ..., 6) PER-TICK schedule; each
    step is packed independently -> (steps, nb, 6, rows, LANE), the scan's
    xs. Without: one packed (nb, 6, rows, LANE) command."""
    if steps is not None:
        cmd = jnp.asarray(cmd_twist, dtype)
        assert cmd.shape[0] == steps, (cmd.shape, steps)
        if cmd.ndim == 2:  # (steps, 6) commands the whole batch uniformly
            cmd = cmd.reshape((steps,) + (1,) * len(batch) + (6,))
        cmd = jnp.broadcast_to(cmd,
                               (steps,) + batch + (6,)).reshape(steps, B, 6)
        if B_pad != B:
            cmd = jnp.concatenate(
                [cmd, jnp.zeros((steps, B_pad - B, 6), dtype)], axis=1)
        packed = pack_comps(cmd.reshape(steps * B_pad, 6), rows)
        return packed.reshape((steps, B_pad // (rows * LANE), 6, rows,
                               LANE))
    cmd = jnp.broadcast_to(jnp.asarray(cmd_twist, dtype), batch + (6,))
    cmd = cmd.reshape(B, 6)
    if B_pad != B:
        cmd = jnp.concatenate([cmd, jnp.zeros((B_pad - B, 6), dtype)],
                              axis=0)
    return pack_comps(cmd, rows)


@partial(jax.jit, static_argnames=("steps", "n_substeps", "tick", "record",
                                   "cmd_schedule"))
def rollout_whole_body_fused(plant: WholeBodyState, carry: CommanderCarry,
                             cmd_twist, steps: int, tick,
                             n_substeps: int = 10, record: bool = False,
                             warm: tuple | None = None,
                             cmd_schedule: bool = False
                             ) -> FusedWholeBodyResult:
    """Run ``steps`` fused control ticks (drop-in sibling of
    sim/rollout.rollout_whole_body for the balance-QP controller).

    Args:
      tick: built by :func:`make_fused_tick` (static; bakes cfg/model).
      cmd_twist: (..., 6), broadcast over the batch — or, with
        ``cmd_schedule=True``, a (steps, ..., 6) PER-TICK command schedule
        scanned alongside the loop (the reference's live-teleop genre:
        cmdCallback every tick, commander_node.cpp:191-202; build with
        control/rollout.piecewise_command).
      warm: for a ``qp_warm_start`` tick, the packed QP warm carry
        ``(x_p, s_p, z_p, st_p)`` from a previous rollout's ``.warm``
        (shapes must match this call's padded batch). None = cold first
        tick. The final warm carry comes back in ``result.warm``.
    """
    rows = tick.rows
    dt = tick.consts.dt
    batch = plant.x.shape[:-1]
    dtype = plant.x.dtype
    B = 1
    for d in batch:
        B *= int(d)

    state_p, B_pad = pack_whole_body_state(plant, rows)
    carry_flat = jax.tree.map(
        lambda a: jnp.broadcast_to(
            a, batch + a.shape[len(batch):]).reshape(
                (B,) + a.shape[len(batch):]),
        carry)
    if B_pad != B:
        carry_flat = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((B_pad - B,) + a.shape[1:], a.dtype)],
                axis=0),
            carry_flat)
    carry_p = pack_commander_carry(carry_flat, rows, B_pad)
    cmd_p = _pack_cmd(cmd_twist, batch, B, B_pad, rows, dtype,
                      steps=steps if cmd_schedule else None)
    xs = cmd_p if cmd_schedule else None

    warm_start = getattr(tick, "warm_start", False)
    warm_f = None

    if warm_start:
        def body(sc, cmd_t):
            cmd_s = cmd_t if cmd_schedule else cmd_p
            state_p, carry_p, warm_p = sc
            state_p, carry_p, warm_p, (st_p, diag_p) = tick(
                state_p, carry_p, warm_p, cmd_s, dt, n_substeps)
            out = None
            if record:
                out = (state_p[:, 9:12], carry_p[:, 0], st_p, diag_p[:, 1])
            return (state_p, carry_p, warm_p), out

        init_warm = getattr(
            tick, "init_warm",
            partial(init_qp_warm_packed, rows=rows, dtype=jnp.float32))
        warm_p0 = (warm if warm is not None
                   else init_warm(state_p.shape[0]))
        (state_p, carry_p, warm_f), rec = lax.scan(
            body, (state_p, carry_p, warm_p0), xs, length=steps)
    else:
        def body(sc, cmd_t):
            cmd_s = cmd_t if cmd_schedule else cmd_p
            state_p, carry_p = sc
            state_p, carry_p, (st_p, diag_p) = tick(state_p, carry_p, cmd_s,
                                                    dt, n_substeps)
            out = None
            if record:
                out = (state_p[:, 9:12], carry_p[:, 0], st_p, diag_p[:, 1])
            return (state_p, carry_p), out

        (state_p, carry_p), rec = lax.scan(body, (state_p, carry_p), xs,
                                           length=steps)

    trace = None
    if record:
        x_r, standing_r, st_r, conv_r = rec

        def unp(a, tail):
            # (steps, nb, k, rows, LANE) -> (steps, batch..., k)
            s = a.shape[0]
            flat = a.transpose(0, 1, 3, 4, 2).reshape(s, B_pad, -1)[:, :B]
            return flat.reshape((s,) + batch + tail)

        trace = FusedRolloutTrace(
            x=unp(x_r, (3,)),
            standing=unp(standing_r[:, :, None], (1,))[..., 0] > 0.5,
            in_stance=unp(st_r, (4,)) > 0.5,
            qp_converged=unp(conv_r[:, :, None], (1,))[..., 0] > 0.5,
        )

    carry_out = unpack_commander_carry(
        carry_p, batch,
        jax.tree.map(lambda a: jnp.broadcast_to(
            a, batch + a.shape[len(batch):]), carry))
    return FusedWholeBodyResult(
        plant=unpack_whole_body_state(state_p, batch),
        carry=carry_out,
        trace=trace,
        warm=warm_f,
    )


@partial(jax.jit, static_argnames=("steps", "mpc_every", "n_substeps",
                                   "tick", "record", "cmd_schedule",
                                   "hold_mode"))
def rollout_whole_body_fused_decimated(plant: WholeBodyState,
                                       carry: CommanderCarry, cmd_twist,
                                       steps: int, tick,
                                       mpc_every: int = 4,
                                       n_substeps: int = 10,
                                       record: bool = False,
                                       cmd_schedule: bool = False,
                                       hold_mode: str = "zoh"
                                       ) -> FusedWholeBodyResult:
    """Fused MPC closed loop with the MPC re-solved every ``mpc_every``
    ticks (sim twin of control/rollout.rollout_mpc_decimated): the outer
    scan body runs one full MPC tick, then ``mpc_every - 1`` held ticks
    (commander-pre + substeps with held horizon forces) — the Riccati
    kernel cost drops by ~mpc_every. ``steps`` must be a multiple of
    ``mpc_every``. Trace entries are per GROUP (one per MPC solve,
    post-group state), like the XLA driver. Requires a
    ``controller="mpc"`` tick (uses ``tick.held``).

    ``hold_mode``: what the held ticks apply (VERDICT round-2 #5).
      - "zoh": zero-order-hold the step-0 forces F_0 for the whole
        window — consistent when the hold window fits one horizon step
        (mpc_every * dt <= mpc_dt, the shipped configuration).
      - "horizon": held tick k applies the horizon's own plan for that
        moment, F_{floor(k dt / mpc_dt)} — the right semantics when the
        hold window OUTRUNS one horizon step; reduces BITWISE to "zoh"
        when every k maps to step 0 (tested).
    The k -> horizon-step map is static (dt, mpc_dt, mpc_every all
    compile-time), so "horizon" costs one stacked gather per group, no
    extra kernels.

    ``cmd_schedule=True``: (steps, ..., 6) per-tick commands; the solve
    tick consumes the group's first command, the held ticks the rest."""
    assert steps % mpc_every == 0, (steps, mpc_every)
    assert hasattr(tick, "held"), "needs a controller='mpc' fused tick"
    assert hold_mode in ("zoh", "horizon"), hold_mode
    rows = tick.rows
    dt = tick.consts.dt
    # Static held-tick -> horizon-step map (k = 1 .. mpc_every-1).
    if hold_mode == "horizon":
        # +1e-9: deterministic floor at exact tick/mpc_dt boundaries
        # (see control/rollout.py rollout_mpc_decimated).
        hold_idx = [min(int(k * dt / tick.mpc_dt + 1e-9),
                        tick.mpc_horizon - 1)
                    for k in range(1, mpc_every)]
    else:
        hold_idx = [0] * (mpc_every - 1)
    batch = plant.x.shape[:-1]
    dtype = plant.x.dtype
    B = 1
    for d in batch:
        B *= int(d)

    state_p, B_pad = pack_whole_body_state(plant, rows)
    carry_flat = jax.tree.map(
        lambda a: jnp.broadcast_to(
            a, batch + a.shape[len(batch):]).reshape(
                (B,) + a.shape[len(batch):]),
        carry)
    if B_pad != B:
        carry_flat = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((B_pad - B,) + a.shape[1:], a.dtype)],
                axis=0),
            carry_flat)
    carry_p = pack_commander_carry(carry_flat, rows, B_pad)
    if cmd_schedule:
        cmd_steps = _pack_cmd(cmd_twist, batch, B, B_pad, rows, dtype,
                              steps=steps)
        # (steps, nb, ...) -> (groups, mpc_every, nb, ...): the outer scan
        # consumes one group-slice per iteration.
        xs = cmd_steps.reshape((steps // mpc_every, mpc_every)
                               + cmd_steps.shape[1:])
    else:
        cmd_p = _pack_cmd(cmd_twist, batch, B, B_pad, rows, dtype)
        xs = None

    # A warm MPC tick threads its horizon carry across SOLVE GROUPS (the
    # hold ticks skip the Riccati kernel, so the carry ages mpc_every
    # control ticks between solves — schedule-changed rows still reset
    # cold in-kernel, which covers the larger per-group churn).
    warm_start = getattr(tick, "warm_start", False)

    def group_body(sc, cmd_g):
        cmd_solve = cmd_g[0] if cmd_schedule else cmd_p
        if warm_start:
            state_p, carry_p, warm_p = sc
        else:
            state_p, carry_p = sc
        (r_p, b_p, st_p, mu_p, fmin_p, fmax_p, tausw_p, carry_new_p,
         _qref_p, mpc_p) = tick.pre(state_p, carry_p, cmd_solve)
        if warm_start:
            F_p, dg, szf_new_p = tick.solve(mpc_p, warm_p)
            sched_p = mpc_p[:, 25:25 + 4 * tick.mpc_horizon].astype(
                jnp.float32)
            nszh = 2 * 24 * tick.mpc_horizon  # 2 * MC * N
            warm_p = (szf_new_p[:, nszh:], szf_new_p[:, :nszh], sched_p)
        else:
            F_p, dg = tick.solve(mpc_p)
        x_hold = F_p[:, 0:12]
        state_p = tick.stepper.packed(state_p,
                                      x_hold.astype(state_p.dtype),
                                      tausw_p, st_p, dt, n_substeps)
        carry_p = carry_new_p

        if mpc_every > 1:
            # (mpc_every-1, nb, 12, rows, LANE) horizon forces the held
            # ticks apply (all F_0 slices for "zoh"; the static k->step
            # map for "horizon").
            x_seq = jnp.stack(
                [F_p[:, 12 * i:12 * i + 12] for i in hold_idx])

            def held_body(inner, xs_t):
                if cmd_schedule:
                    x_h, cmd_h = xs_t
                else:
                    x_h, cmd_h = xs_t, cmd_p
                state_p, carry_p = inner
                state_p, carry_p, _st = tick.held(state_p, carry_p, x_h,
                                                  cmd_h, dt, n_substeps)
                return (state_p, carry_p), None

            (state_p, carry_p), _ = lax.scan(
                held_body, (state_p, carry_p),
                (x_seq, cmd_g[1:]) if cmd_schedule else x_seq,
                length=mpc_every - 1)
        out = None
        if record:
            diag_p = jnp.concatenate(
                [jnp.zeros_like(dg[:, 0:1]), dg[:, 0:4], dg[:, 4:5]],
                axis=1)
            out = (state_p[:, 9:12], carry_p[:, 0], st_p, diag_p[:, 1])
        sc = ((state_p, carry_p, warm_p) if warm_start
              else (state_p, carry_p))
        return sc, out

    sc0 = ((state_p, carry_p, tick.init_warm(state_p.shape[0]))
           if warm_start else (state_p, carry_p))
    sc_f, rec = lax.scan(group_body, sc0, xs,
                         length=steps // mpc_every)
    if warm_start:
        state_p, carry_p, _warm_f = sc_f
    else:
        state_p, carry_p = sc_f

    trace = None
    if record:
        x_r, standing_r, st_r, conv_r = rec

        def unp(a, tail):
            s = a.shape[0]
            flat = a.transpose(0, 1, 3, 4, 2).reshape(s, B_pad, -1)[:, :B]
            return flat.reshape((s,) + batch + tail)

        trace = FusedRolloutTrace(
            x=unp(x_r, (3,)),
            standing=unp(standing_r[:, :, None], (1,))[..., 0] > 0.5,
            in_stance=unp(st_r, (4,)) > 0.5,
            qp_converged=unp(conv_r[:, :, None], (1,))[..., 0] > 0.5,
        )

    carry_out = unpack_commander_carry(
        carry_p, batch,
        jax.tree.map(lambda a: jnp.broadcast_to(
            a, batch + a.shape[len(batch):]), carry))
    return FusedWholeBodyResult(
        plant=unpack_whole_body_state(state_p, batch),
        carry=carry_out,
        trace=trace,
    )


def rollout_whole_body_fused_chunked(plant: WholeBodyState,
                                     carry: CommanderCarry, cmd_twist,
                                     steps: int, tick, chunk: int = 50,
                                     n_substeps: int = 10,
                                     record: bool = False,
                                     warm: tuple | None = None,
                                     cmd_schedule: bool = False
                                     ) -> FusedWholeBodyResult:
    """``rollout_whole_body_fused`` split into host-side chunks.

    Long device rollouts must chunk (~50 ticks/call) because the axon
    tunnel aborts single XLA executions running tens of seconds (CLAUDE.md
    environment facts). This driver threads plant, commander carry AND the
    packed QP warm carry across chunk boundaries, so a 450-tick warm drive
    keeps the reference's hotstart economics end-to-end instead of
    resetting cold every ``chunk`` ticks. Traces concatenate on host.

    All chunks except possibly the last have ``chunk`` steps, so at most
    two programs compile. Parity: chunked == unchunked bitwise on CPU
    (tests/test_pallas_tick.py::test_fused_chunked_matches_unchunked).
    """
    traces = []
    done = 0
    res = None
    while done < steps:
        n = min(chunk, steps - done)
        cmd = cmd_twist[done:done + n] if cmd_schedule else cmd_twist
        res = jax.block_until_ready(rollout_whole_body_fused(
            plant, carry, cmd, n, tick, n_substeps=n_substeps,
            record=record, warm=warm, cmd_schedule=cmd_schedule))
        plant, carry, warm = res.plant, res.carry, res.warm
        if record:
            traces.append(res.trace)
        done += n
    trace = None
    if record:
        trace = jax.tree.map(lambda *a: jnp.concatenate(a), *traces)
    return FusedWholeBodyResult(plant=plant, carry=carry, trace=trace,
                                warm=warm)
