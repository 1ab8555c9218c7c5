#!/usr/bin/env python
"""Offline probe: does the PREVIOUS tick's certified solution, used to
seed both the barrier (warm start) and the polish's initial ACTIVE SET,
certify the harvested degenerate trot QPs at in-tick budgets
(6 barrier iterations + 1-2 polish sweeps)?

For each harvested failing (tick, instance) from /tmp/tail_diag.npz:
rebuild the PREVIOUS tick's QP, solve it in float64 (the idealized warm
carry), then run the f32 fused kernel on the CURRENT tick's QP in warm
mode with polish. Compare against the barrier-seeded polish (what
scripts/tick_certify_tune.py measured on device: conv 0.978).

Run: PYTHONPATH="$PYTHONPATH:." JAX_PLATFORMS=cpu python scripts/tail_warm_polish_probe.py
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_qps(state_in, carry_in, cfg, consts, cmd_vx=0.2):
    """states/carries -> (r_masked f32, b, st_bool, mu, fmin, fmax)."""
    from quadruped_control_tpu.control.pallas_commander import (
        commander_pre_pallas_packed,
        pack_comps,
    )

    n = state_in.shape[0]
    rows = 8
    tile = rows * 128
    n_pad = ((n + tile - 1) // tile) * tile
    pad = lambda a: np.concatenate(  # noqa: E731
        [a, np.repeat(a[:1], n_pad - n, 0)], 0)
    cmd = np.zeros((n_pad, 6), np.float32)
    cmd[:, 0] = cmd_vx
    outs = commander_pre_pallas_packed(
        pack_comps(jnp.asarray(pad(state_in), jnp.float32), rows),
        pack_comps(jnp.asarray(pad(carry_in), jnp.float32), rows),
        pack_comps(jnp.asarray(cmd), rows), consts=consts, rows=rows,
        interpret=True)

    def unp(a_p):
        return np.asarray(
            a_p.transpose(0, 2, 3, 1).reshape(n_pad, -1))[:n]

    r = unp(outs[0]).reshape(n, 4, 3)
    b = unp(outs[1])
    st = unp(outs[2]) > 0.5
    mu = unp(outs[3])[:, 0]
    fmin = unp(outs[4])[:, 0]
    fmax = unp(outs[5])[:, 0]
    return r, b, st, mu, fmin, fmax


def dense_qp(r, b, st, mu, fmin, fmax, cfg, dtype):
    from quadruped_control_tpu.math.rotations import skew
    from quadruped_control_tpu.ops.dynamics import (
        assemble_qp,
        cone_constraints,
    )

    eye3 = np.eye(3)
    top = np.concatenate(
        [eye3[None] * st[:, l, None, None] for l in range(4)], -1)
    bot = np.concatenate(
        [np.asarray(skew(jnp.asarray(np.float64(r[:, l])))) for l in
         range(4)], -1)
    A = np.concatenate([top, bot], -2)
    Q, c = assemble_qp(jnp.asarray(A, dtype), jnp.asarray(b, dtype),
                       cfg.balance)
    G, h = cone_constraints(jnp.asarray(st), mu=jnp.asarray(mu, dtype),
                            fz_min=jnp.asarray(fmin, dtype),
                            fz_max=jnp.asarray(fmax, dtype),
                            cfg=cfg.balance, dtype=dtype)
    return Q, c, G, h


def main():
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.pallas_commander import (
        CommanderConsts,
    )
    from quadruped_control_tpu.solver.ipm import solve_qp_ipm
    from quadruped_control_tpu.solver.pallas_fused import (
        solve_grf_qp_fused,
    )

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
    log(f"{take} failing trot QPs (tick >= 1)")

    # Current tick's QP precursors.
    r, b, st, mu, fmin, fmax = build_qps(
        d["trot_state"][ft, fi], d["trot_carry"][ft, fi], cfg, consts)
    # Previous tick's QP -> float64 certified warm point.
    rp_, bp_, stp_, mup_, fminp_, fmaxp_ = build_qps(
        d["trot_state"][ft - 1, fi], d["trot_carry"][ft - 1, fi], cfg,
        consts)
    Qp, cp, Gp, hp = dense_qp(rp_, bp_, stp_, mup_, fminp_, fmaxp_, cfg,
                              jnp.float64)
    prev = solve_qp_ipm(Qp, cp, Gp, hp, iterations=40, polish=True,
                        tol=1e-9)
    log(f"prev-tick f64 solve conv {np.asarray(prev.converged).mean():.3f}")
    warm = (prev.x.astype(jnp.float32), prev.s.astype(jnp.float32),
            prev.z.astype(jnp.float32))
    st_prev = jnp.asarray(stp_, jnp.float32)

    n = r.shape[0]
    rows = 8
    tile = rows * 128
    n_pad = ((n + tile - 1) // tile) * tile

    def pad(a):
        a = np.asarray(a)
        return jnp.asarray(
            np.concatenate([a, np.repeat(a[:1], n_pad - n, 0)], 0))

    rm = np.where(st[:, :, None], r, 0.0).astype(np.float32)
    args = (pad(rm), pad(b.astype(np.float32)),
            pad(st.astype(np.float32)), pad(mu), pad(fmin), pad(fmax))
    kw = dict(s_diag=tuple(cfg.balance.s_diag),
              w_diag=float(cfg.balance.w_diag), rows=rows, interpret=True)

    for name, solkw in (
        ("barrier-seeded p1r1 (control)",
         dict(iterations=6, polish=True, polish_sweeps=1,
              polish_refine=1)),
        ("warm p1r1", dict(iterations=6, polish=True, polish_sweeps=1,
                           polish_refine=1,
                           warm=tuple(pad(w) for w in warm),
                           warm_stance_prev=pad(st_prev))),
        ("warm p2r1", dict(iterations=6, polish=True, polish_sweeps=2,
                           polish_refine=1,
                           warm=tuple(pad(w) for w in warm),
                           warm_stance_prev=pad(st_prev))),
        ("warm p2r2", dict(iterations=6, polish=True, polish_sweeps=2,
                           polish_refine=2,
                           warm=tuple(pad(w) for w in warm),
                           warm_stance_prev=pad(st_prev))),
        ("warm p4r1", dict(iterations=6, polish=True, polish_sweeps=4,
                           polish_refine=1,
                           warm=tuple(pad(w) for w in warm),
                           warm_stance_prev=pad(st_prev))),
        ("warm p2r1 MULTI", dict(iterations=6, polish=True,
                                 polish_sweeps=2, polish_refine=1,
                                 polish_multi_swap=True,
                                 warm=tuple(pad(w) for w in warm),
                                 warm_stance_prev=pad(st_prev))),
        ("warm p3r1 MULTI", dict(iterations=6, polish=True,
                                 polish_sweeps=3, polish_refine=1,
                                 polish_multi_swap=True,
                                 warm=tuple(pad(w) for w in warm),
                                 warm_stance_prev=pad(st_prev))),
        ("warm p6r1", dict(iterations=6, polish=True, polish_sweeps=6,
                           polish_refine=1,
                           warm=tuple(pad(w) for w in warm),
                           warm_stance_prev=pad(st_prev))),
        ("warm p8r1", dict(iterations=6, polish=True, polish_sweeps=8,
                           polish_refine=1,
                           warm=tuple(pad(w) for w in warm),
                           warm_stance_prev=pad(st_prev))),
        ("barrier p3r1 MULTI", dict(iterations=6, polish=True,
                                    polish_sweeps=3, polish_refine=1,
                                    polish_multi_swap=True)),
    ):
        sol = solve_grf_qp_fused(*args, **kw, **solkw)
        cv = np.asarray(sol.converged)[:n]
        log(f"{name}: conv {cv.mean():.4f}")

    # Diagnosis control: seed with the CURRENT tick's own f64 solution
    # (perfect active set AND perfect point). If this fails to certify,
    # the polish's f32 LDL/refine/threshold is the blocker, not the
    # active-set search.
    Qc, cc, Gc, hc = dense_qp(r, b, st, mu, fmin, fmax, cfg, jnp.float64)
    cur = solve_qp_ipm(Qc, cc, Gc, hc, iterations=40, polish=True,
                       tol=1e-9)
    log(f"cur-tick f64 solve conv {np.asarray(cur.converged).mean():.3f}")
    warm_self = (cur.x.astype(jnp.float32), cur.s.astype(jnp.float32),
                 cur.z.astype(jnp.float32))
    for name, solkw in (
        ("oracle-seeded p1r1",
         dict(iterations=6, polish=True, polish_sweeps=1, polish_refine=1,
              warm=tuple(pad(w) for w in warm_self),
              warm_stance_prev=pad(jnp.asarray(st, jnp.float32)))),
        ("oracle-seeded p1r4",
         dict(iterations=6, polish=True, polish_sweeps=1, polish_refine=4,
              warm=tuple(pad(w) for w in warm_self),
              warm_stance_prev=pad(jnp.asarray(st, jnp.float32)))),
        ("oracle-seeded polish-only r4",
         dict(iterations=0, polish=True, polish_sweeps=2, polish_refine=4,
              warm=tuple(pad(w) for w in warm_self))),
    ):
        sol = solve_grf_qp_fused(*args, **kw, **solkw)
        cv = np.asarray(sol.converged)[:n]
        log(f"{name}: conv {cv.mean():.4f}")


if __name__ == "__main__":
    sys.exit(main())
