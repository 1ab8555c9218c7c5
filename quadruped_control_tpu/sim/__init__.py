"""Whole-body articulated rigid-body simulation (the reference's L7).

The reference validates its controller in closed loop against a Drake
``MultibodyPlant`` running full articulated-body physics in a second OS
process (drake_interface_node.cpp:96-391, SURVEY.md §3.2). This package is
the TPU-native equivalent: a floating-base 13-body (trunk + 4x3 leg links)
rigid-body dynamics engine written as pure batched JAX — spatial-algebra
RNEA for bias forces, mass matrix via vmapped unit-acceleration RNEA,
compliant point contact at the feet, torque-driven like the reference's sim
(the ONLY input is the joint torque command, drake_interface_node.cpp:63-87).

Everything vmaps over scenario batches and composes with ``lax.scan``, so a
full-physics closed-loop gait rollout is one device program — the fused
replacement for the reference's physics<->controller process pair.
"""

from quadruped_control_tpu.sim.model import (
    WholeBodyModel,
    mit_cheetah_urdf_model,
    mit_cheetah_whole_body_model,
)
from quadruped_control_tpu.sim.dynamics import (
    LegKinematics,
    precompute_leg_kinematics,
    rnea,
    rnea_bias,
    mass_matrix,
    body_coms_world,
    total_mass,
)
from quadruped_control_tpu.sim.plant import (
    ContactConfig,
    WholeBodyState,
    init_whole_body_state,
    whole_body_step,
    whole_body_com_state,
)
from quadruped_control_tpu.sim.pallas_substep import make_pallas_stepper
from quadruped_control_tpu.sim.rollout import (
    WholeBodyRolloutResult,
    init_whole_body_rollout,
    rollout_whole_body,
)

__all__ = [
    "WholeBodyModel",
    "mit_cheetah_urdf_model",
    "mit_cheetah_whole_body_model",
    "LegKinematics",
    "precompute_leg_kinematics",
    "rnea",
    "rnea_bias",
    "mass_matrix",
    "body_coms_world",
    "total_mass",
    "ContactConfig",
    "WholeBodyState",
    "init_whole_body_state",
    "whole_body_step",
    "whole_body_com_state",
    "WholeBodyRolloutResult",
    "init_whole_body_rollout",
    "make_pallas_stepper",
    "rollout_whole_body",
]
