"""Closed-loop rollouts: commander x SRB plant composed in one lax.scan.

The reference's closed loop is two OS processes exchanging ROS topics at
100-600 Hz (SURVEY.md §3.1-3.2). Here the whole loop — control tick, QP
solve, plant step — is a single jitted scan body, so a multi-second gait
rollout for thousands of domain-randomized scenarios runs entirely on
device. This is the harness behind BASELINE configs 1-3 (stand-up, pose
tracking, trotting) and the walking-speed behavior checks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import ControlConfig
from quadruped_control_tpu.control.commander import (
    CommanderCarry,
    commander_step,
    init_commander_carry,
)
from quadruped_control_tpu.control.plant import (
    PlantState,
    init_plant_state,
    plant_step,
)


class RolloutTrace(NamedTuple):
    """Per-step telemetry (stacked along the leading time axis)."""

    x: jnp.ndarray  # (T, ..., 3) CoM position
    xdot: jnp.ndarray  # (T, ..., 3)
    standing: jnp.ndarray  # (T, ...)
    in_stance: jnp.ndarray  # (T, ..., 4)
    qp_converged: jnp.ndarray  # (T, ...)
    torque_max: jnp.ndarray  # (T, ...) inf-norm of commanded torques
    # Pose telemetry for utils/viz.animate_rollout (the rviz/GIF
    # equivalent, gait_visualizer_node.cpp:51-101): world foot positions
    # and base orientation.
    feet: jnp.ndarray = None  # (T, ..., 4, 3)
    R: jnp.ndarray = None  # (T, ..., 3, 3)


class RolloutResult(NamedTuple):
    plant: PlantState
    carry: CommanderCarry
    trace: RolloutTrace


@partial(jax.jit, static_argnames=("steps", "cfg", "qp_iterations",
                                   "qp_polish", "record", "qp_backend",
                                   "controller", "mpc_horizon", "mpc_dt",
                                   "mpc_iterations", "mpc_backend",
                                   "weight_shift", "cmd_schedule",
                                   "heading_hold", "foothold_trim"))
def rollout(plant: PlantState, carry: CommanderCarry, cmd_twist, steps: int,
            cfg: ControlConfig, qp_iterations: int = 12,
            qp_polish: bool = False, record: bool = True,
            qp_backend: str = "jnp", controller: str = "balance",
            mpc_horizon: int = 8, mpc_dt: float = 0.05,
            mpc_iterations: int = 25, mpc_backend: str = "structured",
            mpc_state_weights=None, weight_shift: float = 0.0,
            cmd_schedule: bool = False,
            heading_hold: bool = False,
            foothold_trim=None) -> RolloutResult:
    """Run ``steps`` control ticks of the closed loop.

    Args:
      plant: initial plant state (see control/plant.init_plant_state).
      carry: initial commander carry.
      cmd_twist: (..., 6) commanded body twist, constant over the rollout —
        or, with ``cmd_schedule=True``, a (steps, ..., 6) PER-TICK command
        scanned alongside the loop: the reference's teleop genre, where
        cmdCallback updates the twist every tick
        (commander_node.cpp:191-202) and the headline demo walks forward
        AND backward in one session (README.md:57). Build schedules with
        :func:`piecewise_command`.
      steps: number of control ticks (static).
      cfg: control configuration; the control period is 1/cfg.frequency and
        the plant integrates one step per tick.
      qp_polish: polish is OFF by default in rollouts — closed-loop control
        needs ~1e-3 N force accuracy, not certificate-grade parity, and the
        barrier solve alone is several times faster.
    Returns:
      RolloutResult with final states and (optionally) the telemetry trace.
    """
    dt = 1.0 / cfg.frequency
    xs = None
    if cmd_schedule:
        assert cmd_twist.shape[0] == steps, (cmd_twist.shape, steps)
        xs = cmd_twist
    if foothold_trim is not None and carry.ref_pose is None:
        carry = carry._replace(
            ref_pose=jnp.zeros(plant.com.x.shape[:-1] + (3,),
                               dtype=plant.com.x.dtype))

    def body(state, cmd_t):
        cmd = cmd_t if cmd_schedule else cmd_twist
        plant_s, carry_s = state
        out, carry_next = commander_step(
            plant_s.com, plant_s.joints, carry_s, cmd, dt, cfg,
            qp_iterations=qp_iterations, qp_polish=qp_polish,
            qp_backend=qp_backend, controller=controller,
            mpc_horizon=mpc_horizon, mpc_dt=mpc_dt,
            mpc_iterations=mpc_iterations, mpc_backend=mpc_backend,
            mpc_state_weights=mpc_state_weights, weight_shift=weight_shift,
            heading_hold=heading_hold, foothold_trim=foothold_trim,
        )
        plant_next = plant_step(
            plant_s, out.forces_world, out.gait.in_stance,
            out.foot_refs_world, dt, cfg,
        )
        if record:
            trace = RolloutTrace(
                x=plant_next.com.x,
                xdot=plant_next.com.xdot,
                standing=carry_next.standing,
                in_stance=out.gait.in_stance,
                qp_converged=out.qp_converged,
                torque_max=jnp.max(jnp.abs(out.torques), axis=(-2, -1)),
                feet=plant_next.feet_world,
                R=plant_next.com.R,
            )
        else:
            trace = 0
        return (plant_next, carry_next), trace

    (plant_f, carry_f), trace = lax.scan(body, (plant, carry), xs,
                                         length=steps)
    return RolloutResult(plant=plant_f, carry=carry_f, trace=trace)


def piecewise_command(segments, frequency: float, dtype=jnp.float32,
                      ramp: float = 0.0):
    """Build a (T, 6) per-tick command schedule from piecewise-constant
    segments — the teleop command stream as data.

    The reference's demos are driven by a human on a PS4 joystick whose
    cmd_vel messages update the commander's twist every tick
    (commander_node.cpp:191-202, teleop_ps4_walking.yaml:5-12). A rollout
    has no human in the loop; this encodes the same workflow as a schedule:

        cmd = piecewise_command([(1.5, [0, 0, 0, 0, 0, 0]),       # stand
                                 (2.0, [0.2, 0, 0, 0, 0, 0]),     # fwd
                                 (2.0, [-0.2, 0, 0, 0, 0, 0])],   # back
                                cfg.frequency, ramp=0.5)
        rollout(..., cmd, steps=cmd.shape[0], cfg, cmd_schedule=True)

    Args:
      segments: iterable of ``(seconds, twist6)`` pairs, each held constant
        for ``round(seconds * frequency)`` ticks.
      frequency: control-loop rate (cfg.frequency).
      ramp: seconds of linear interpolation at the START of each segment
        (from the previous segment's twist) — the finite slew of a human
        easing the stick. 0 = hard steps. Direction of the trade on full
        physics is NON-obvious: the reference-family trot has a measured
        low-speed instability band (~0.05-0.15 m/s, PARITY.md
        "Reverse-walking anatomy"), so a slow ramp DWELLS in the band and
        can fall where a hard step jumps over it — pick per scenario (the
        shipped whole-body transition test uses steps; SRB-surrogate
        rollouts are insensitive).

    Returns (T, 6) with T the total tick count. Broadcast against batched
    states by the rollout itself ((T, 6) commands a whole batch uniformly;
    for per-scenario schedules pass (T, B, 6) directly).
    """
    import numpy as np

    rows = []
    prev = None
    for seconds, twist in segments:
        n = int(round(float(seconds) * float(frequency)))
        tw = np.asarray(twist, np.float64)
        seg = np.broadcast_to(tw, (n, 6)).copy()
        if ramp > 0.0 and prev is not None:
            nr = min(int(round(float(ramp) * float(frequency))), n)
            if nr > 0:
                a = np.linspace(0.0, 1.0, nr + 1)[1:, None]
                seg[:nr] = (1.0 - a) * prev + a * tw
        rows.append(seg)
        prev = tw
    return jnp.asarray(np.concatenate(rows, axis=0), dtype)


@partial(jax.jit, static_argnames=("steps", "cfg", "mpc_every",
                                   "mpc_horizon", "mpc_dt", "mpc_iterations",
                                   "mpc_backend", "record", "hold_mode"))
def rollout_mpc_decimated(plant: PlantState, carry: CommanderCarry,
                          cmd_twist, steps: int, cfg: ControlConfig,
                          mpc_every: int = 10, mpc_horizon: int = 8,
                          mpc_dt: float = 0.05, mpc_iterations: int = 25,
                          mpc_backend: str = "structured",
                          mpc_state_weights=None,
                          record: bool = True,
                          hold_mode: str = "zoh") -> RolloutResult:
    """Closed loop with the MPC re-solved every ``mpc_every`` ticks.

    The reference-class convex MPC (Di Carlo et al. 2018) runs at 25-50 Hz
    while the joint loop ticks at 100-300 Hz and holds horizon forces
    between solves. Structured as scan-over-groups: the outer body solves
    the MPC once (full commander tick), then ``mpc_every - 1`` held ticks
    re-run only the swing pipeline + torque mapping with held forces
    (``forces_override``) — no per-tick branching, and the solve cost
    drops by ~mpc_every.

    ``hold_mode`` (VERDICT round-2 #5):
      - "zoh": zero-order-hold F_0 for the whole window. MEASURED
        envelope (SRB, mpc_dt=0.03, 300 Hz, pinned by
        tests/test_mpc_commander.py::test_decimation_envelope): exact
        speed tracking while the hold window fits one horizon step
        (mpc_every * dt <= mpc_dt, i.e. <= 9 ticks), catastrophic beyond
        (the held F_0 overdrives: 1.7x hold -> vx 0.43 for a 0.2 cmd and
        airborne; 3.3x -> vx 2.8).
      - "horizon": held tick k applies the horizon's own plan for that
        moment, F_{floor(k dt / mpc_dt)} — consistent at ANY decimation
        up to N * mpc_dt; reduces to "zoh" when every k maps to step 0.

    ``steps`` must be a multiple of ``mpc_every``. Telemetry is recorded at
    the group level (one entry per MPC solve, post-group state) to keep the
    trace layout identical to ``rollout``'s per-step one, time-decimated.
    """
    assert steps % mpc_every == 0, (steps, mpc_every)
    assert hold_mode in ("zoh", "horizon"), hold_mode
    dt = 1.0 / cfg.frequency
    if hold_mode == "horizon":
        # +1e-9 makes the floor deterministic at exact tick/mpc_dt
        # boundaries (e.g. dt=1/300, mpc_dt=0.03, k=9 -> 1.0000000000000002
        # would otherwise flip the chosen step with roundoff).
        hold_idx = [min(int(k * dt / mpc_dt + 1e-9), mpc_horizon - 1)
                    for k in range(1, mpc_every)]
    else:
        hold_idx = [0] * (mpc_every - 1)
    mpc_kw = dict(controller="mpc", mpc_horizon=mpc_horizon, mpc_dt=mpc_dt,
                  mpc_iterations=mpc_iterations, mpc_backend=mpc_backend,
                  mpc_state_weights=mpc_state_weights)

    def tick(plant_s, carry_s, **kw):
        out, carry_next = commander_step(
            plant_s.com, plant_s.joints, carry_s, cmd_twist, dt, cfg, **kw)
        plant_next = plant_step(
            plant_s, out.forces_world, out.gait.in_stance,
            out.foot_refs_world, dt, cfg,
        )
        return plant_next, carry_next, out

    def group(state, _):
        plant_s, carry_s = state
        plant_s, carry_s, out = tick(plant_s, carry_s, **mpc_kw)

        if mpc_every > 1:
            # (mpc_every-1, ..., 12) forces for the held ticks (all F_0
            # for "zoh"; the static k -> horizon-step map for "horizon").
            f_seq = jnp.stack(
                [out.forces_horizon[..., i, :] for i in hold_idx])

            def held(st, f_k):
                plant_h, carry_h = st
                plant_h, carry_h, _ = tick(plant_h, carry_h,
                                           forces_override=f_k)
                return (plant_h, carry_h), None

            (plant_s, carry_s), _ = lax.scan(held, (plant_s, carry_s),
                                             f_seq)
        if record:
            trace = RolloutTrace(
                x=plant_s.com.x,
                xdot=plant_s.com.xdot,
                standing=carry_s.standing,
                in_stance=out.gait.in_stance,
                qp_converged=out.qp_converged,
                torque_max=jnp.max(jnp.abs(out.torques), axis=(-2, -1)),
                feet=plant_s.feet_world,
                R=plant_s.com.R,
            )
        else:
            trace = 0
        return (plant_s, carry_s), trace

    (plant_f, carry_f), trace = lax.scan(group, (plant, carry), None,
                                         length=steps // mpc_every)
    return RolloutResult(plant=plant_f, carry=carry_f, trace=trace)


def rollout_chunked(plant: PlantState, carry: CommanderCarry, cmd_twist,
                    steps: int, cfg: ControlConfig, chunk: int = 50,
                    **kwargs) -> RolloutResult:
    """``rollout`` split into host-side chunks of ``chunk`` ticks.

    Two reasons to chunk: (a) remote-attached accelerators (the axon TPU
    tunnel) abort single XLA executions that run for tens of seconds, which
    a long scan of a heavy tick (e.g. controller="mpc") easily exceeds;
    (b) the compiled program is the same for every chunk, so arbitrarily
    long horizons reuse one compilation. Traces are concatenated on host.
    """
    cmd_schedule = kwargs.get("cmd_schedule", False)
    chunks = []
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        cmd = (cmd_twist[done:done + n] if cmd_schedule else cmd_twist)
        res = jax.block_until_ready(
            rollout(plant, carry, cmd, n, cfg, **kwargs))
        plant, carry = res.plant, res.carry
        chunks.append(res.trace)
        done += n
    if kwargs.get("record", True):
        trace = jax.tree.map(lambda *a: jnp.concatenate(a), *chunks)
    else:
        trace = 0
    return RolloutResult(plant=plant, carry=carry, trace=trace)


def stand_up_rollout(cfg: ControlConfig, seconds: float = 2.0,
                     batch_shape=(), dtype=jnp.float32,
                     qp_iterations: int = 12, **rollout_kwargs
                     ) -> RolloutResult:
    """The reference's stand_up scenario (§3.3): from the laying pose, pure
    balance control to the standing height, zero commanded twist."""
    steps = int(seconds * cfg.frequency)
    plant = init_plant_state(cfg, batch_shape, dtype=dtype)
    carry = init_commander_carry(batch_shape, dtype=dtype)
    cmd = jnp.zeros(batch_shape + (6,), dtype=dtype)
    return rollout(plant, carry, cmd, steps, cfg,
                   qp_iterations=qp_iterations, **rollout_kwargs)


def walk_rollout(cfg: ControlConfig, vx: float = 0.2, vy: float = 0.0,
                 wz: float = 0.0, seconds: float = 4.0, batch_shape=(),
                 dtype=jnp.float32, qp_iterations: int = 12,
                 **rollout_kwargs) -> RolloutResult:
    """Stand up, then trot with the commanded planar twist (the reference's
    teleop walking demo, README.md:54-63)."""
    stand = stand_up_rollout(cfg, seconds=1.5, batch_shape=batch_shape,
                             dtype=dtype, qp_iterations=qp_iterations,
                             **rollout_kwargs)
    steps = int(seconds * cfg.frequency)
    cmd = jnp.zeros(batch_shape + (6,), dtype=dtype)
    cmd = cmd.at[..., 0].set(vx).at[..., 1].set(vy).at[..., 5].set(wz)
    return rollout(stand.plant, stand.carry, cmd, steps, cfg,
                   qp_iterations=qp_iterations, **rollout_kwargs)
