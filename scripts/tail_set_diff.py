#!/usr/bin/env python
"""Where does the warm active set go stale? For each harvested failing
trot QP (scripts/tick_tail_diag.py capture), compare the PREVIOUS tick's
f64-optimal active set (the idealized warm carry) against the CURRENT
tick's f64-optimal set, by cone-row type:

  rows 0-3: friction pyramid (+-x, +-y), row 4: fz <= fz_max,
  row 5: -fz <= -fz_min   (per leg, ops/dynamics.cone_constraints order).

If the churn concentrates in predictable row types, the polish's initial
set can be pre-seeded smarter than "carry everything".

Run: PYTHONPATH="$PYTHONPATH:." JAX_PLATFORMS=cpu python scripts/tail_set_diff.py
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.pallas_commander import (
        CommanderConsts,
    )
    from quadruped_control_tpu.solver.ipm import solve_qp_ipm
    from scripts.tail_warm_polish_probe import build_qps, dense_qp

    cfg = mit_cheetah_physical_config()
    consts = CommanderConsts(cfg, dt=1.0 / cfg.frequency)
    d = np.load("/tmp/tail_diag.npz")
    diag = d["trot_diag"]
    conv = diag[:, :, 1] > 0.5
    fail_t, fail_i = np.nonzero(~conv)
    keep = fail_t >= 1
    fail_t, fail_i = fail_t[keep], fail_i[keep]
    take = min(fail_t.size, 512)
    sel = np.linspace(0, fail_t.size - 1, take).astype(int)
    ft, fi = fail_t[sel], fail_i[sel]
    log(f"{take} failing trot QPs")

    sets = {}
    stances = {}
    for tag, tt in (("cur", ft), ("prev", ft - 1)):
        r, b, st, mu, fmin, fmax = build_qps(
            d["trot_state"][tt, fi], d["trot_carry"][tt, fi], cfg, consts)
        Q, c, G, h = dense_qp(r, b, st, mu, fmin, fmax, cfg, jnp.float64)
        sol = solve_qp_ipm(Q, c, G, h, iterations=40, polish=True,
                           tol=1e-9)
        # Active set: z > s on the f64 solution (the polish's own a0 rule).
        sets[tag] = np.asarray(sol.z) > np.asarray(sol.s)
        stances[tag] = st

    cur, prev = sets["cur"], sets["prev"]  # (n, 24)
    st_cur, st_prev = stances["cur"], stances["prev"]
    # Rows the in-kernel warm start carries (leg stance unchanged).
    leg_kept = (st_cur == st_prev)  # (n, 4)
    row_kept = np.repeat(leg_kept, 6, axis=1)
    diff = (cur != prev) & row_kept
    n_diff = diff.sum(-1)
    log(f"set distance (kept rows only): mean {n_diff.mean():.2f} "
        f"p50 {np.median(n_diff):.0f} p90 {np.percentile(n_diff, 90):.0f} "
        f"max {n_diff.max()}")
    hist = np.bincount(n_diff, minlength=10)
    log(f"distance histogram 0..: {hist[:10].tolist()}")

    ty = diff.reshape(-1, 4, 6).sum((0, 1))
    log(f"differing rows by type [+x, +y, -y, -x, fzmax, fzmin]: "
        f"{ty.tolist()}")
    direction = (cur & ~prev & row_kept).reshape(-1, 4, 6).sum((0, 1))
    log(f"  rows that must be ADDED:   {direction.tolist()}")
    direction_d = (~cur & prev & row_kept).reshape(-1, 4, 6).sum((0, 1))
    log(f"  rows that must be DROPPED: {direction_d.tolist()}")

    # How often is the current set simply the previous set? (the 63%)
    same = (n_diff == 0).mean()
    log(f"identical kept-set fraction: {same:.3f}")


if __name__ == "__main__":
    sys.exit(main())
