"""Closed loop: commander x whole-body articulated plant in one scan.

The TPU-native equivalent of the reference's full validation setup — the
commander node and the Drake physics node exchanging torques/joint states
over TCPROS at 100-600 Hz (SURVEY.md §3.1-3.2) — fused into a single jitted
``lax.scan``. Unlike ``control/rollout.py`` (SRB surrogate with pinned
stance feet — the controller's OWN model class), this loop closes through
full articulated-body dynamics with compliant contact: leg masses, foot
slip, and impact transients are all real, so it validates the controller
under the same model mismatch the reference's Drake runs exercised.

The only coupling between controller and plant is the torque command and
the measured (base pose, joint) state — exactly the reference's topic
surface (joint_torque_cmd / joint_states / com_state).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from quadruped_control_tpu.config import ControlConfig
from quadruped_control_tpu.control.commander import (
    CommanderCarry,
    commander_step,
    init_commander_carry,
)
from quadruped_control_tpu.control.rollout import RolloutTrace
from quadruped_control_tpu.sim.dynamics import leg_gravity_torques
from quadruped_control_tpu.sim.model import WholeBodyModel
from quadruped_control_tpu.sim.plant import (
    ContactConfig,
    WholeBodyState,
    whole_body_step,
    whole_body_com_state,
)
from typing import NamedTuple


class WholeBodyRolloutResult(NamedTuple):
    plant: WholeBodyState
    carry: CommanderCarry
    trace: RolloutTrace


@partial(jax.jit, static_argnames=("steps", "cfg", "contact", "n_substeps",
                                   "qp_iterations", "qp_polish", "record", "qp_backend",
                                   "controller", "mpc_horizon", "mpc_dt",
                                   "mpc_iterations", "mpc_backend",
                                   "weight_shift", "m_update",
                                   "contact_gate", "raibert_cmd_symmetric",
                                   "heading_hold", "foothold_trim",
                                   "swing_vel_rescale", "swing_accel_ff",
                                   "stance_pose", "swing_start_ground",
                                   "body_frame_exact",
                                   "gravity_comp", "stepper",
                                   "cmd_schedule"))
def rollout_whole_body(plant: WholeBodyState, carry: CommanderCarry,
                       cmd_twist, steps: int, cfg: ControlConfig,
                       model: WholeBodyModel,
                       contact: ContactConfig = ContactConfig(),
                       n_substeps: int | None = None,
                       qp_iterations: int = 12, qp_polish: bool = False,
                       qp_backend: str = "jnp",
                       record: bool = True, controller: str = "balance",
                       mpc_horizon: int = 8, mpc_dt: float = 0.05,
                       mpc_iterations: int = 25,
                       mpc_backend: str = "structured",
                       mpc_state_weights=None,
                       weight_shift: float = 0.0,
                       m_update: str = "tick",
                       contact_gate: float = 0.0,
                       raibert_cmd_symmetric: bool = False,
                       heading_hold: bool = False,
                       foothold_trim=None,
                       swing_vel_rescale: bool = False,
                       swing_accel_ff: bool = False,
                       stance_pose=False,
                       swing_start_ground: bool = False,
                       body_frame_exact: bool = False,
                       gravity_comp: bool = False,
                       stepper=None,
                       cmd_schedule: bool = False
                       ) -> WholeBodyRolloutResult:
    """Run ``steps`` control ticks of the full-physics closed loop.

    One tick = measure (base pose + joints) -> commander_step -> joint
    torques (zero-order hold) -> ``n_substeps`` physics substeps.

    ``stepper`` (static): optional fused plant stepper built OUTSIDE jit by
    ``sim.pallas_substep.make_pallas_stepper(model, cfg, contact)`` — the
    Pallas replacement for the op-latency-bound XLA substep loop. It bakes
    the model/contact constants in, so it must match ``model``/``contact``;
    requires an explicit ``n_substeps`` and implies ``m_update="tick"``.

    ``cmd_schedule=True``: ``cmd_twist`` is a (steps, ..., 6) PER-TICK
    command scanned alongside the loop — the reference's live-teleop genre
    (cmdCallback every tick, commander_node.cpp:191-202; the fwd-AND-back
    gait-transition demo, README.md:57). Build with
    control/rollout.piecewise_command.
    """
    dt = 1.0 / cfg.frequency
    if stepper is not None and n_substeps is None:
        raise ValueError("stepper= requires explicit n_substeps")
    if foothold_trim is not None and carry.ref_pose is None:
        # Auto-allocate the regulator's carried reference pose so existing
        # init call sites keep working (before the scan: carry structure
        # must be consistent across it).
        carry = carry._replace(
            ref_pose=jnp.zeros(plant.x.shape[:-1] + (3,),
                               dtype=plant.x.dtype))
    if stance_pose is not False and stance_pose is not None \
            and carry.pose_cmd is None:
        carry = carry._replace(
            pose_cmd=jnp.zeros(plant.x.shape[:-1] + (4,),
                               dtype=plant.x.dtype))
    xs = None
    if cmd_schedule:
        assert cmd_twist.shape[0] == steps, (cmd_twist.shape, steps)
        xs = cmd_twist

    def body(state, cmd_t):
        cmd = cmd_t if cmd_schedule else cmd_twist
        wb, cc = state
        com, joints = whole_body_com_state(wb, cfg)
        g_tau = None
        if gravity_comp:
            g_tau = leg_gravity_torques(model, joints.q, com.R)
        sw_mass = None
        if swing_accel_ff:
            from quadruped_control_tpu.sim.dynamics import (
                leg_mass_matrices,
            )

            sw_mass = leg_mass_matrices(model, joints.q)
        out, cc = commander_step(
            com, joints, cc, cmd, dt, cfg,
            qp_iterations=qp_iterations, qp_polish=qp_polish,
            qp_backend=qp_backend, controller=controller,
            mpc_horizon=mpc_horizon, mpc_dt=mpc_dt,
            mpc_iterations=mpc_iterations, mpc_backend=mpc_backend,
            mpc_state_weights=mpc_state_weights,
            weight_shift=weight_shift, contact_gate=contact_gate,
            raibert_cmd_symmetric=raibert_cmd_symmetric,
            heading_hold=heading_hold,
            foothold_trim=foothold_trim,
            swing_vel_rescale=swing_vel_rescale,
            swing_accel_ff=swing_accel_ff,
            swing_mass=sw_mass,
            stance_pose=stance_pose,
            swing_start_ground=swing_start_ground,
            body_frame_exact=body_frame_exact,
            gravity_comp_tau=g_tau,
        )
        if stepper is not None:
            wb = stepper(wb, out.torques, dt, n_substeps)
        else:
            wb = whole_body_step(wb, out.torques, dt, model, cfg, contact,
                                 n_substeps=n_substeps, m_update=m_update)
        trace = None
        if record:
            from quadruped_control_tpu.ops.kinematics import (
                forward_kinematics,
            )

            feet_body = forward_kinematics(wb.q, cfg.kinematics)
            feet_w = jnp.einsum("...ij,...lj->...li", wb.R,
                                feet_body) + wb.x[..., None, :]
            trace = RolloutTrace(
                x=wb.x,
                xdot=(wb.R @ wb.u[..., 3:6, None])[..., 0],
                standing=cc.standing,
                in_stance=out.gait.in_stance,
                qp_converged=out.qp_converged,
                torque_max=jnp.max(jnp.abs(out.torques), axis=(-1, -2)),
                feet=feet_w,
                R=wb.R,
            )
        return (wb, cc), trace

    (wb, cc), trace = lax.scan(body, (plant, carry), xs, length=steps)
    return WholeBodyRolloutResult(plant=wb, carry=cc, trace=trace)


def init_whole_body_rollout(cfg: ControlConfig, batch_shape=(),
                            dtype=jnp.float32, **kwargs):
    """Convenience: (plant, carry) pair in the laying start pose."""
    from quadruped_control_tpu.sim.plant import init_whole_body_state

    plant = init_whole_body_state(cfg, batch_shape, dtype=dtype, **kwargs)
    carry = init_commander_carry(batch_shape, dtype=dtype)
    return plant, carry
