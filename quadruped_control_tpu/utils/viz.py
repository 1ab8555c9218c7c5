"""Offline visualization: the rviz/MarkerArray equivalent.

The reference visualizes foot trajectories and TF frames live in rviz
(commander_node.cpp:75-126, gait_visualizer_node.cpp:51-101). The TPU-native
stack runs headless; this module renders the same artifacts — swing-foot
trajectories, CoM track, gait diagram — from rollout traces to matplotlib
figures. Import cost is deferred so the core library never depends on
matplotlib.
"""

from __future__ import annotations

import numpy as np

from quadruped_control_tpu.config import LEG_NAMES
from quadruped_control_tpu.ops.trajectory import sextic_track

_LEG_COLORS = ("tab:blue", "tab:red", "tab:red", "tab:blue")  # diag pairs


def plot_rollout(trace, dt, path=None):
    """CoM track + height + gait diagram from a RolloutTrace (single
    scenario). Returns the figure; saves to ``path`` if given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(trace.x)
    stance = np.asarray(trace.in_stance)
    t = np.arange(x.shape[0]) * dt

    fig, axes = plt.subplots(3, 1, figsize=(9, 9), sharex=False)
    ax = axes[0]
    ax.plot(x[:, 0], x[:, 1], lw=1.5)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title("CoM ground track")
    ax.axis("equal")

    ax = axes[1]
    ax.plot(t, x[:, 2], lw=1.2)
    ax.axhline(0.26, color="gray", ls="--", lw=0.8, label="stand target")
    ax.set_xlabel("t [s]")
    ax.set_ylabel("z [m]")
    ax.set_title("CoM height")
    ax.legend()

    ax = axes[2]
    for leg in range(4):
        in_st = stance[:, leg].astype(float)
        ax.fill_between(t, leg + 0.1, leg + 0.9, where=in_st > 0.5,
                        color=_LEG_COLORS[leg], alpha=0.6, linewidth=0)
    ax.set_yticks([l + 0.5 for l in range(4)], LEG_NAMES)
    ax.set_xlabel("t [s]")
    ax.set_title("gait diagram (filled = stance)")

    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig


def plot_swing_trajectory(coeffs, n_points: int = 30, path=None):
    """Sample a (4, 7, 3) coefficient set like footTrajViz
    (commander_node.cpp:75-126): ``n_points`` spheres along each swing."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ts = np.linspace(0.0, 1.0, n_points)
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    import jax.numpy as jnp

    for leg in range(4):
        pts = np.asarray(
            sextic_track(jnp.asarray(coeffs)[leg], jnp.asarray(ts)).position
        )
        ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "o-", ms=2,
                color=_LEG_COLORS[leg], label=LEG_NAMES[leg])
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig
