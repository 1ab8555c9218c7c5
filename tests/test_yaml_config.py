"""YAML config loader vs the reference's mit_cheetah_config.yaml schema."""

import textwrap

import pytest

from quadruped_control_tpu.config import mit_cheetah_config
from quadruped_control_tpu.yaml_config import config_from_dict, load_config

REFERENCE_YAML = textwrap.dedent("""
    frequency: 300.0
    gait:
      t_stance: 0.8
      t_swing: 0.18
      height: 0.08
      gait_offset_phases: [0.0, 0.5, 0.5, 0.0]
    joint_control:
      kff: [0.0, 0.0, 0.0]
      kp: [40.0, 40.0, 50.0]
      kd: [1.0, 1.0, 1.0]
    balance_control:
      torque_min: -20.0
      torque_max: 20.0
      s_diagonal: [1.0, 1.0, 1.0, 10.0, 10.0, 5.0]
      w_diagonal: [0.00001]
      kff: [0.0, 0.0, 0.15, 0.0, 0.0, 0.0]
      kp_p: [100.0, 100.0, 100.0]
      kp_w: [5000.0, 5000.0, 5000.0]
      kd_p: [50.0, 50.0, 50.0]
      kd_w: [500.0, 500.0, 500.0]
    dynamics:
      Ib: [0.011253, 0.036203, 0.042673]
      mass: 11.0
      mu: 0.8
      fzmin: 10.0
      fzmax: 120.0
""")


def test_reference_yaml_equals_preset(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = load_config(str(p))
    assert cfg == mit_cheetah_config()


def test_overrides():
    cfg = config_from_dict({"dynamics": {"mass": 9.0, "mu": 0.6},
                            "gait": {"t_swing": 0.25}})
    assert cfg.balance.mass == 9.0
    assert cfg.balance.mu == 0.6
    assert cfg.gait.t_swing == 0.25
    # Untouched values keep preset defaults.
    assert cfg.balance.fz_max == 120.0


def test_empty_dict_is_preset():
    assert config_from_dict({}) == mit_cheetah_config()
