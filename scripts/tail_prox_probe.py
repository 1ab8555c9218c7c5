#!/usr/bin/env python
"""Offline probe (CPU f32): which in-tick strategy certifies the harvested
degenerate trot QPs from /tmp/tail_diag.npz?

Candidates, all costed in barrier-iteration-equivalents (the fused tick's
QP stage is ~6.7 us / 12 iterations at b4096):
  A. prox-k: k proximal restarts x j iterations (solver/ipm.solve_qp_prox
     semantics) warm-started from the PREVIOUS tick's solution;
  B. plain warm barrier with more iterations (control);
  C. long polish (control; known to work offline but too slow in-tick).

Run: PYTHONPATH="$PYTHONPATH:." JAX_PLATFORMS=cpu python scripts/tail_prox_probe.py
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.pallas_commander import (
        CommanderConsts,
        commander_pre_pallas_packed,
        pack_comps,
    )
    from quadruped_control_tpu.math.rotations import skew
    from quadruped_control_tpu.ops.dynamics import (
        assemble_qp,
        cone_constraints,
    )
    from quadruped_control_tpu.solver.ipm import solve_qp_ipm, solve_qp_prox

    cfg = mit_cheetah_physical_config()
    consts = CommanderConsts(cfg, dt=1.0 / cfg.frequency)
    d = np.load("/tmp/tail_diag.npz")

    diag = d["trot_diag"]
    conv = diag[:, :, 1] > 0.5
    fail_t, fail_i = np.nonzero(~conv)
    take = min(fail_t.size, 512)
    sel = np.linspace(0, fail_t.size - 1, take).astype(int)
    ft, fi = fail_t[sel], fail_i[sel]
    log(f"{take} harvested failing trot QPs")

    state_in = d["trot_state"][ft, fi]
    carry_in = d["trot_carry"][ft, fi]
    n = state_in.shape[0]
    rows = 8
    tile = rows * 128
    n_pad = ((n + tile - 1) // tile) * tile
    pad = lambda a: np.concatenate(  # noqa: E731
        [a, np.repeat(a[:1], n_pad - n, 0)], 0)
    cmd = np.zeros((n_pad, 6), np.float32)
    cmd[:, 0] = 0.2
    outs = commander_pre_pallas_packed(
        pack_comps(jnp.asarray(pad(state_in), jnp.float32), rows),
        pack_comps(jnp.asarray(pad(carry_in), jnp.float32), rows),
        pack_comps(jnp.asarray(cmd), rows), consts=consts, rows=rows,
        interpret=True)
    r_p, b_p, st_p, mu_p, fmin_p, fmax_p = outs[:6]

    def unp(a_p):
        return np.asarray(
            a_p.transpose(0, 2, 3, 1).reshape(n_pad, -1))[:n]

    r = unp(r_p).reshape(n, 4, 3).astype(np.float32)
    bvec = unp(b_p).astype(np.float32)
    stm = unp(st_p) > 0.5
    eye3 = np.eye(3, dtype=np.float32)
    top = np.concatenate(
        [eye3[None] * stm[:, l, None, None] for l in range(4)], -1)
    bot = np.concatenate(
        [np.asarray(skew(jnp.asarray(r[:, l]))) for l in range(4)], -1)
    A = np.concatenate([top, bot], -2).astype(np.float32)
    Q, c = assemble_qp(jnp.asarray(A), jnp.asarray(bvec), cfg.balance)
    G, h = cone_constraints(jnp.asarray(stm),
                            mu=jnp.asarray(unp(mu_p)[:, 0]),
                            fz_min=jnp.asarray(unp(fmin_p)[:, 0]),
                            fz_max=jnp.asarray(unp(fmax_p)[:, 0]),
                            cfg=cfg.balance, dtype=jnp.float32)

    # "Previous tick's solution" stand-in: solve each instance's QP once
    # cold (12 it) — the warm carry in the loop is at least this good once
    # inside a 4-stance window.
    sol0 = solve_qp_ipm(Q, c, G, h, iterations=12, polish=False, tol=3e-5)
    x0 = sol0.x
    log(f"control: cold-12 barrier conv {np.asarray(sol0.converged).mean():.3f}")

    for it in (24, 48):
        s = solve_qp_ipm(Q, c, G, h, iterations=it, polish=False, tol=3e-5)
        log(f"control: cold-{it} barrier conv "
            f"{np.asarray(s.converged).mean():.3f}")

    for steps, it, rho in ((1, 8, 1e-2), (2, 6, 1e-2), (2, 8, 1e-2),
                           (3, 8, 1e-2), (2, 8, 1e-1), (2, 8, 1e-3),
                           (4, 8, 1e-2)):
        ps = solve_qp_prox(Q, c, G, h, x0=x0, rho_rel=rho,
                           prox_steps=steps, iterations=it, tol=3e-5)
        cost = steps * it
        log(f"prox steps={steps} it={it} rho={rho:g}: conv "
            f"{np.asarray(ps.converged).mean():.4f} "
            f"(~{cost} barrier-iteration equivalents)")

    s = solve_qp_ipm(Q, c, G, h, iterations=12, polish=True, tol=3e-5)
    log(f"control: cold-12 + jnp polish conv "
        f"{np.asarray(s.converged).mean():.3f}")


if __name__ == "__main__":
    sys.exit(main())
