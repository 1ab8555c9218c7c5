#!/usr/bin/env python
"""Numpy replica of the fused kernel's active-set polish SEARCH on the
harvested hard trot QPs: from the warm (previous-tick) active set, does
the add-most-violated / drop-most-negative rule reach the oracle set —
and when it doesn't (probe saturates at 84% for sweeps >= 4), HOW does it
fail: cycling, stalling (no swap triggers while uncertified), or NaN?

Mirrors solver/pallas_fused._polish: equilibrated units
(solver/ipm.equilibrate), reg=1e-4 quasidefinite KKT, f32 solve + 1
refine against the reg-free system, the kernel's cert thresholds, freeze
on cert, single add-or-drop per sweep.

Run: PYTHONPATH="$PYTHONPATH:." JAX_PLATFORMS=cpu python scripts/tail_polish_replica.py
"""

import sys
from collections import Counter

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

N, M, NK = 12, 24, 36


def log(m):
    print(m, file=sys.stderr, flush=True)


def polish_trace(Qs, cs, Gs, hs, a0, sweeps=12):
    """One instance, f32. Returns (certified_at, actions, sets)."""
    f32 = np.float32
    eps = f32(1.1920929e-07)
    reg = f32(1e-4)
    Qs, cs, Gs, hs = (x.astype(f32) for x in (Qs, cs, Gs, hs))
    obj_scale = max(1.0, 1.0 + np.abs(cs).max())
    h_scale = max(1.0, 1.0 + np.abs(hs).max())
    cert_dr = 30.0 * eps * obj_scale
    feas_tol = max(1e-6, 30.0 * eps) * h_scale
    z_tol = max(1e-6, 30.0 * eps)  # zmax term left out (z0 ~ O(1))

    a = a0.astype(f32).copy()
    actions = []
    sets = [a.copy()]
    for sw in range(sweeps):
        K = np.zeros((NK, NK), f32)
        K[:N, :N] = Qs
        K[N:, :N] = a[:, None] * Gs
        K[:N, N:] = (a[:, None] * Gs).T
        K[N:, N:] = -np.diag(reg * a + (1.0 - a))
        rhs = np.concatenate([-cs, a * hs]).astype(f32)
        try:
            u = np.linalg.solve(K, rhs).astype(f32)
        except np.linalg.LinAlgError:
            actions.append(("sing", -1))
            break
        for _ in range(1):  # refine vs reg-free system
            r1 = (-cs - Qs @ u[:N] - (a * Gs.T).T.T @ (a * u[N:])
                  if False else
                  -cs - Qs @ u[:N] - Gs.T @ (a * u[N:]))
            r2 = a * hs - (1.0 - a) * u[N:] - a * (Gs @ u[:N])
            du = np.linalg.solve(K, np.concatenate([r1, r2]).astype(f32))
            u = (u + du).astype(f32)
        xp, zp = u[:N], u[N:]
        # compensated dual residual (f64 here stands in for _ff_linear)
        dr = np.abs(np.float64(-cs) - np.float64(Qs) @ np.float64(xp)
                    - np.float64(Gs).T @ (np.float64(a) * np.float64(zp))
                    ).max()
        slack = hs - Gs @ xp
        ok = (np.isfinite(xp).all() and np.isfinite(zp).all()
              and slack.min() > -feas_tol
              and (zp * a).min() > -z_tol and dr < cert_dr)
        if ok:
            return sw, actions, sets
        viol = np.where(a > 0.5, -np.inf, -slack)
        negz = np.where(a > 0.5, zp, np.inf)
        if viol.max() > feas_tol:
            r = int(viol.argmax())
            a[r] = 1.0
            actions.append(("add", r))
        elif negz.min() < -z_tol:
            r = int(negz.argmin())
            a[r] = 0.0
            actions.append(("drop", r))
        else:
            actions.append(
                ("stall", -1, float(dr / cert_dr), float(slack.min()),
                 bool(np.isfinite(xp).all())))
            break
        sets.append(a.copy())
    return -1, actions, sets


def main():
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.pallas_commander import (
        CommanderConsts,
    )
    from quadruped_control_tpu.solver.ipm import equilibrate, solve_qp_ipm
    from scripts.tail_warm_polish_probe import build_qps, dense_qp

    cfg = mit_cheetah_physical_config()
    consts = CommanderConsts(cfg, dt=1.0 / cfg.frequency)
    d = np.load("/tmp/tail_diag.npz")
    diag = d["trot_diag"]
    conv = diag[:, :, 1] > 0.5
    fail_t, fail_i = np.nonzero(~conv)
    keep = fail_t >= 1
    fail_t, fail_i = fail_t[keep], fail_i[keep]
    take = min(fail_t.size, 256)
    sel = np.linspace(0, fail_t.size - 1, take).astype(int)
    ft, fi = fail_t[sel], fail_i[sel]
    log(f"{take} failing trot QPs")

    r, b, st, mu, fmin, fmax = build_qps(
        d["trot_state"][ft, fi], d["trot_carry"][ft, fi], cfg, consts)
    Q, c, G, h = dense_qp(r, b, st, mu, fmin, fmax, cfg, jnp.float64)
    rp_, bp_, stp_, mup_, fminp_, fmaxp_ = build_qps(
        d["trot_state"][ft - 1, fi], d["trot_carry"][ft - 1, fi], cfg,
        consts)
    Qp, cp, Gp, hp = dense_qp(rp_, bp_, stp_, mup_, fminp_, fmaxp_, cfg,
                              jnp.float64)
    prev = solve_qp_ipm(Qp, cp, Gp, hp, iterations=40, polish=True,
                        tol=1e-9)
    a0_all = (np.asarray(prev.z) > np.asarray(prev.s)).astype(np.float64)
    cur = solve_qp_ipm(Q, c, G, h, iterations=40, polish=True, tol=1e-9)
    a_star = (np.asarray(cur.z) > np.asarray(cur.s)).astype(np.float64)

    Qs, cs, Gs, hs, _, _, _ = equilibrate(
        jnp.asarray(Q), jnp.asarray(c), jnp.asarray(G), jnp.asarray(h))
    Qs, cs, Gs, hs = (np.asarray(x) for x in (Qs, cs, Gs, hs))

    outcomes = Counter()
    stall_dr = []
    cyc_examples = []
    cert_sweeps = Counter()
    for i in range(take):
        sw, actions, sets = polish_trace(Qs[i], cs[i], Gs[i], hs[i],
                                         a0_all[i], sweeps=12)
        if sw >= 0:
            outcomes["cert"] += 1
            cert_sweeps[sw] += 1
            continue
        kinds = [a[0] for a in actions]
        if kinds and kinds[-1] == "stall":
            outcomes["stall"] += 1
            stall_dr.append(actions[-1][2])
        elif kinds and kinds[-1] == "sing":
            outcomes["sing"] += 1
        else:
            # ran out of sweeps: cycling if a set repeats
            keys = [tuple(s) for s in sets]
            if len(set(keys)) < len(keys):
                outcomes["cycle"] += 1
                if len(cyc_examples) < 3:
                    cyc_examples.append(actions[-6:])
            else:
                outcomes["wander"] += 1
    log(f"outcomes over {take}: {dict(outcomes)}")
    log(f"certified-at-sweep histogram: "
        f"{dict(sorted(cert_sweeps.items()))}")
    if stall_dr:
        sd = np.array(stall_dr)
        log(f"stalled dr/cert_dr: p50 {np.median(sd):.1f} "
            f"p90 {np.percentile(sd, 90):.1f} max {sd.max():.1f}")
    for ex in cyc_examples:
        log(f"cycle example (last actions): {ex}")


if __name__ == "__main__":
    sys.exit(main())
