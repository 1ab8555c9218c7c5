#!/usr/bin/env python
"""Diagnose the ~2% uncertified QP ticks in the device gravity_comp trot
(VERDICT round-1 weak #3).

Two passes:

  capture (default, on the TPU): run the stand-up + 0.2 m/s trot through
    the warm-started fused tick at B=256, recording per tick the full QP
    diag row (conv, pr, dr, gap), the stance mask, the gait clock and the
    PRE-tick whole-body state + commander carry. Saves /tmp/tail_diag.npz.

  --analyze (CPU, float64): load the capture, locate failing (tick, inst)
    pairs, report the failure anatomy (stance count, distance from a
    stance transition, which residual trips and by how much), then rebuild
    the exact QPs at the failing ticks (commander-pre in interpret mode ->
    dense assembly) and re-solve them with the float64 active-set oracle
    to split "genuinely unsolved" from "solved but the f32 flag is at its
    measurement floor" (objective parity of the kernel's x vs the oracle).

Run:
  PYTHONPATH="$PYTHONPATH:." python scripts/tick_tail_diag.py
  PYTHONPATH="$PYTHONPATH:." python scripts/tick_tail_diag.py --analyze
"""

import sys

import numpy as np

B = 256
ROWS = 8
STEPS_STAND = 600
STEPS_TROT = 600
OUT = "/tmp/tail_diag.npz"


def log(m):
    print(m, file=sys.stderr, flush=True)


def capture():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.commander import init_commander_carry
    from quadruped_control_tpu.control.pallas_commander import (
        pack_commander_carry,
        pack_comps,
    )
    from quadruped_control_tpu.sim import (
        ContactConfig,
        init_whole_body_state,
        mit_cheetah_whole_body_model,
    )
    from quadruped_control_tpu.sim.pallas_tick import (
        init_qp_warm_packed,
        make_fused_tick,
        pack_whole_body_state,
    )

    cfg = mit_cheetah_physical_config()
    model = mit_cheetah_whole_body_model(cfg, dtype=jnp.float32)
    tick = make_fused_tick(model, cfg, ContactConfig(), rows=ROWS,
                           qp_polish=False, gravity_comp=True)
    log(f"device: {jax.devices()[0]} tick: warm-6 rows={ROWS}")

    wb = init_whole_body_state(cfg, (B,), dtype=jnp.float32)
    carry = init_commander_carry((B,), dtype=jnp.float32)
    state_p, B_pad = pack_whole_body_state(wb, ROWS)
    carry_flat = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape[1:]), carry)
    carry_flat = jax.tree.map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((B_pad - B,) + a.shape[1:], a.dtype)], axis=0),
        carry_flat)
    carry_p = pack_commander_carry(carry_flat, ROWS, B_pad)
    warm_p = init_qp_warm_packed(state_p.shape[0], ROWS, jnp.float32)

    def unp(a_p):
        # (nb, k, rows, LANE) packed tick tensors -> (B, k)
        k = a_p.shape[1]
        return a_p.transpose(0, 2, 3, 1).reshape(B_pad, k)[:B]

    def make_run(cmd):
        cmd_full = jnp.zeros((B_pad, 6), jnp.float32) + jnp.asarray(
            cmd, jnp.float32)
        cmd_p = pack_comps(cmd_full, ROWS)

        from functools import partial

        @partial(jax.jit, static_argnames=("steps",))
        def run(state_p, carry_p, warm_p, steps):
            def body(sc, _):
                state_p, carry_p, warm_p = sc
                state_pre, carry_pre = state_p, carry_p
                state_p, carry_p, warm_p, (st_p, diag_p) = tick(
                    state_p, carry_p, warm_p, cmd_p, 1.0 / cfg.frequency, 10)
                # warm_p[0] is the APPLIED GRF solution x (packed) — record
                # it so --analyze can audit the exact forces the plant saw.
                out = (unp(state_pre), unp(carry_pre), unp(st_p),
                       unp(diag_p), unp(warm_p[0]))
                return (state_p, carry_p, warm_p), out

            sc, ys = lax.scan(body, (state_p, carry_p, warm_p), None,
                              length=steps)
            return sc, ys

        return run

    log("stand-up 600 ticks ...")
    sc, ys_s = jax.block_until_ready(
        make_run(jnp.zeros(6))(state_p, carry_p, warm_p, STEPS_STAND))
    log("trot 600 ticks ...")
    cmd = jnp.zeros(6).at[0].set(0.2)
    sc, ys_t = jax.block_until_ready(make_run(cmd)(*sc, STEPS_TROT))

    save = {}
    for name, ys in (("stand", ys_s), ("trot", ys_t)):
        state_r, carry_r, st_r, diag_r, x_r = (np.asarray(a) for a in ys)
        save[f"{name}_state"] = state_r
        save[f"{name}_carry"] = carry_r
        save[f"{name}_st"] = st_r
        save[f"{name}_diag"] = diag_r
        save[f"{name}_x"] = x_r
        conv = diag_r[:, :, 1] > 0.5
        log(f"{name}: conv {conv.mean():.4f} "
            f"({(~conv).sum()} failing tick-instances)")
    np.savez_compressed(OUT, **save)
    log(f"saved {OUT}")


def analyze():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from quadruped_control_tpu.config import mit_cheetah_physical_config
    from quadruped_control_tpu.control.pallas_commander import (
        CommanderConsts,
        commander_pre_pallas_packed,
        pack_comps,
    )
    from quadruped_control_tpu.ops.dynamics import assemble_qp, cone_constraints
    from quadruped_control_tpu.math.rotations import skew
    from quadruped_control_tpu.solver.reference import solve_qp_batch_oracle

    cfg = mit_cheetah_physical_config()
    consts = CommanderConsts(cfg, dt=1.0 / cfg.frequency)
    d = np.load(OUT)

    for name in ("stand", "trot"):
        diag = d[f"{name}_diag"]  # (T, B, 6)
        st = d[f"{name}_st"]      # (T, B, 4)
        carry = d[f"{name}_carry"]
        conv = diag[:, :, 1] > 0.5
        fail_t, fail_i = np.nonzero(~conv)
        log(f"\n=== {name}: conv {conv.mean():.4f}, {fail_t.size} failures "
            f"over {conv.shape[0]} ticks x {conv.shape[1]} inst ===")
        if fail_t.size == 0:
            continue

        n_st = st.sum(-1)  # stance count per (t, i)
        log("failures by stance count: " + ", ".join(
            f"{k}: {(n_st[fail_t, fail_i] == k).sum()}"
            for k in range(5)))
        # Ticks since the last stance change of the SAME instance.
        changed = np.zeros(conv.shape, bool)
        changed[1:] = (st[1:] != st[:-1]).any(-1)
        age = np.zeros(conv.shape, np.int32)
        for t in range(1, conv.shape[0]):
            age[t] = np.where(changed[t], 0, age[t - 1] + 1)
        a = age[fail_t, fail_i]
        log(f"ticks since stance transition at failure: p50 "
            f"{np.median(a):.0f} p90 {np.percentile(a, 90):.0f} "
            f"max {a.max()} (trot gait period = 50 ticks)")
        hist = np.bincount(np.minimum(a, 20), minlength=21)
        log(f"  age histogram 0..20+: {hist.tolist()}")
        pr, dr, gap = (diag[fail_t, fail_i, k] for k in (2, 3, 4))
        log(f"failing residuals: pr p50 {np.median(pr):.2e} max "
            f"{pr.max():.2e} | dr p50 {np.median(dr):.2e} max "
            f"{dr.max():.2e} | gap p50 {np.median(gap):.2e} max "
            f"{gap.max():.2e}")
        gait_t = carry[fail_t, fail_i, 1]
        ph = np.mod(gait_t, cfg.gait.period) / cfg.gait.period
        ph_u = np.sort(np.unique(np.round(ph, 2))).tolist()
        log(f"gait phase at failure: {ph_u}")

        # Rebuild the failing QPs exactly (commander-pre interpret on the
        # PRE state) and judge against the f64 oracle.
        take = min(fail_t.size, 512)
        sel = np.linspace(0, fail_t.size - 1, take).astype(int)
        ft, fi = fail_t[sel], fail_i[sel]
        state_in = d[f"{name}_state"][ft, fi]   # (n, 58)
        carry_in = d[f"{name}_carry"][ft, fi]   # (n, 95)
        n = state_in.shape[0]
        rows = 8
        tile = rows * 128
        n_pad = ((n + tile - 1) // tile) * tile
        pad = lambda a: np.concatenate(  # noqa: E731
            [a, np.repeat(a[:1], n_pad - n, 0)], 0)
        cmd = np.zeros((n_pad, 6), np.float32)
        if name == "trot":
            cmd[:, 0] = 0.2
        state_p = pack_comps(jnp.asarray(pad(state_in), jnp.float32), rows)
        carry_p = pack_comps(jnp.asarray(pad(carry_in), jnp.float32), rows)
        cmd_p = pack_comps(jnp.asarray(cmd), rows)
        outs = commander_pre_pallas_packed(
            state_p, carry_p, cmd_p, consts=consts, rows=rows,
            interpret=True)
        r_p, b_p, st_p, mu_p, fmin_p, fmax_p = outs[:6]

        def unp(a_p):
            return np.asarray(
                a_p.transpose(0, 2, 3, 1).reshape(n_pad, -1))[:n]

        r = unp(r_p).reshape(n, 4, 3).astype(np.float64)
        bvec = unp(b_p).astype(np.float64)
        stm = unp(st_p) > 0.5
        # Dense assembly (ops/dynamics semantics, f64).
        eye3 = np.eye(3)
        top = np.concatenate(
            [eye3[None] * stm[:, l, None, None] for l in range(4)], -1)
        bot = np.concatenate(
            [np.asarray(skew(jnp.asarray(r[:, l]))) for l in range(4)], -1)
        A = np.concatenate([top, bot], -2)
        Q, c = assemble_qp(jnp.asarray(A), jnp.asarray(bvec), cfg.balance)
        G, h = cone_constraints(jnp.asarray(stm),
                                mu=jnp.asarray(unp(mu_p)[:, 0]),
                                fz_min=jnp.asarray(unp(fmin_p)[:, 0]),
                                fz_max=jnp.asarray(unp(fmax_p)[:, 0]),
                                cfg=cfg.balance, dtype=jnp.float64)
        Q, c, G, h = (np.asarray(a, np.float64) for a in (Q, c, G, h))
        x_star, obj_star, kkt = solve_qp_batch_oracle(
            Q, c, G, h, stm, cfg.balance.fz_min, cfg.balance.fz_max)
        log(f"oracle on {n} failing QPs: kkt max {np.abs(kkt).max():.2e} "
            f"(all solvable in f64: {np.isfinite(obj_star).all()})")

        # AUDIT: the forces the plant ACTUALLY saw at the failing ticks
        # (recorded from the tick's warm carry) vs the f64 oracle — the
        # "uncertified but never garbage" guarantee (best-iterate
        # fallback; reference analogue: balance_controller.cpp:182-216
        # logs and reuses the last solution on failure).
        if f"{name}_x" in d:
            xa = d[f"{name}_x"][ft, fi].astype(np.float64)
            obj_a = (0.5 * np.einsum("bi,bij,bj->b", xa, Q, xa)
                     + (c * xa).sum(-1))
            rel_a = np.abs(obj_a - obj_star) / (1.0 + np.abs(obj_star))
            viol_a = (np.einsum("bij,bj->bi", G, xa) - h).max(-1)
            ferr = np.abs(xa - x_star).max(-1)
            log(f"APPLIED forces at failing ticks vs oracle: obj rel gap "
                f"p50 {np.median(rel_a):.2e} p90 "
                f"{np.percentile(rel_a, 90):.2e} max {rel_a.max():.2e}; "
                f"cone violation max {max(viol_a.max(), 0):.2e}; "
                f"force err p50 {np.median(ferr):.2f} max "
                f"{ferr.max():.2f} N")
        # Condition of the reduced problem.
        ev = np.linalg.eigvalsh(Q)
        log(f"cond(Q): p50 {np.median(ev[:, -1] / ev[:, 0]):.2e} max "
            f"{(ev[:, -1] / ev[:, 0]).max():.2e}")

        # Re-solve the same QPs with the f32 fused kernel (interpret, cold
        # 12 it) to measure the objective gap of ITS solution vs oracle.
        from quadruped_control_tpu.solver.pallas_fused import (
            solve_grf_qp_fused,
        )
        sol = solve_grf_qp_fused(
            jnp.asarray(pad(np.where(stm[:, :, None], r, 0.0)),
                        jnp.float32),
            jnp.asarray(pad(bvec), jnp.float32),
            jnp.asarray(pad(stm.astype(np.float32))),
            jnp.asarray(pad(unp(mu_p)[:, 0:1])[:, 0]),
            jnp.asarray(pad(unp(fmin_p)[:, 0:1])[:, 0]),
            jnp.asarray(pad(unp(fmax_p)[:, 0:1])[:, 0]),
            s_diag=tuple(cfg.balance.s_diag), w_diag=cfg.balance.w_diag,
            iterations=12, polish=False, rows=rows, interpret=True)
        xk = np.asarray(sol.x, np.float64)[:n]
        obj = 0.5 * np.einsum("bi,bij,bj->b", xk, Q, xk) + (c * xk).sum(-1)
        rel = np.abs(obj - obj_star) / (1.0 + np.abs(obj_star))
        feas = (np.einsum("bij,bj->bi", G, xk) - h).max(-1)
        log(f"fused-kernel x on failing QPs (cold-12, interpret): obj rel "
            f"gap p50 {np.median(rel):.2e} p90 {np.percentile(rel, 90):.2e}"
            f" max {rel.max():.2e}; worst cone violation "
            f"{feas.max():.2e}")
        conv_re = np.asarray(sol.converged)[:n]
        log(f"  re-solve converged flag: {conv_re.mean():.3f}")


if __name__ == "__main__":
    if "--analyze" in sys.argv:
        analyze()
    else:
        capture()
