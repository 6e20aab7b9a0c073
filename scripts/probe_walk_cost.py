"""Ablate the bvh8t node-visit body to find the ~2.4us/visit serial wall.

probe_iter_cost.py established that neither lax.while_loop control, nor
dynamic block reads, nor a vector->scalar drain chain costs more than
~0.15us/iter — a brute MT body pipelines at ~0.4us. The real walk visit
pays ~2.4us. This probe rebuilds the visit incrementally:

  slab     pop-address chain + W=16 slab test + drain (probe-equivalent)
  smem     + SMEM stack pop/push + SMEM meta reads (real addressing)
  when     + @pl.when conditional stack store
  inner0   + nested leaf while_loop compiled in, but trip count == 0
  inner50  + nested leaf loop actually runs ~0.5 trips/visit (full MT)

The deltas attribute the wall. Usage: PROBE_ITERS=200000 python
scripts/probe_walk_cost.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_raytracing.ops.traverse_pallas import _ffs  # noqa: E402

LANE = 128
W = 16
R = 4
LG = 16
NB = int(os.environ.get("PROBE_NB", "16"))    # node/tri blocks resident
TILES = int(os.environ.get("PROBE_TILES", "1"))
ITERS = int(os.environ.get("PROBE_ITERS", "200000"))  # per tile
INF = float(np.inf)


def make(level: str):
    use_smem = level in ("smem", "when", "inner0", "inner50", "cond",
                         "cond50")
    use_when = level in ("when", "inner0", "inner50", "cond", "cond50")
    use_inner = level in ("inner0", "inner50", "cond50")
    leaf_rate = level in ("inner50", "cond50")
    cond_on_drain = level in ("cond", "cond50")

    def roll_lanes(x, sh):
        return pltpu.roll(x, (LANE - sh) % LANE, axis=1)

    def kernel(nodes_ref, tris_ref, meta_ref,
               o_ref, d_ref, t_ref, out_ref, stack_ref):
        w_col = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        wt = jnp.left_shift(jnp.int32(1), w_col)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)

        def colb(x, k, n):
            return jnp.broadcast_to(
                jax.lax.slice(x, (0, k), (n, k + 1)), (n, LANE))

        def rowb(x, r, n):
            return jnp.broadcast_to(
                jax.lax.slice(x, (r, 0), (r + 1, LANE)), (n, LANE))

        def run_tile(ti, _):
            o = [o_ref[pl.ds((ti * 3 + ax) * R, R), :] for ax in range(3)]
            d = [d_ref[pl.ds((ti * 3 + ax) * R, R), :] for ax in range(3)]
            inv = [1.0 / c for c in d]
            t_min = t_ref[pl.ds(ti * R, R), :]
            stack_ref[0] = jnp.int32(1)

            def visit(c):
                if cond_on_drain:
                    q, sp, _ms, t_best, best = c
                else:
                    q, sp, t_best, best = c
                if use_smem:
                    e = stack_ref[jnp.maximum(sp - 1, 0)]
                    mask = e & ((1 << W) - 1)
                    base = jax.lax.shift_right_logical(e, W)
                    slot, low = _ffs(mask, W)
                    rem = mask - low
                    stack_ref[jnp.maximum(sp - 1, 0)] = (base << W) | rem
                    nid = (base + slot + q) % (NB * 16)
                    m0 = meta_ref[nid & 1023, 0]
                    m1 = meta_ref[nid & 1023, 1]
                    cbase = jax.lax.shift_right_logical(m0, 5)
                    ni = m0 & 31
                    lbase = jax.lax.shift_right_logical(m1, 5)
                else:
                    nid = q % (NB * 16)
                    ni = jnp.int32(8)
                    lbase = q % 64

                blk = nodes_ref[pl.ds((nid // 16) * W, W), :]
                blk = roll_lanes(blk, (nid % 16) * 8)
                box = [colb(blk, k, W) for k in range(6)]

                hits = []
                cnt = jnp.zeros((W, 1), jnp.int32)
                for r in range(R):
                    t0 = jnp.full((W, LANE), -INF)
                    t1 = jnp.full((W, LANE), INF)
                    for ax in range(3):
                        ob = rowb(o[ax], r, W)
                        ib = rowb(inv[ax], r, W)
                        a = (box[ax] - ob) * ib
                        b = (box[3 + ax] - ob) * ib
                        t0 = jnp.maximum(t0, jnp.minimum(a, b))
                        t1 = jnp.minimum(t1, jnp.maximum(a, b))
                    h = ((t0 <= t1) & (t1 >= rowb(t_min, r, W))
                         & (t0 <= rowb(t_best, r, W)))
                    hits.append(h)
                    cnt = cnt + jnp.sum(h.astype(jnp.int32), axis=1,
                                        keepdims=True)
                valid = w_col < ni
                bits = jnp.where((cnt > 0) & valid, wt, 0)
                mask_s = jnp.sum(bits)         # the ONE vector->scalar drain

                imask = mask_s & ((jnp.int32(1) << ni) - 1)
                if use_when:
                    @pl.when(imask != 0)
                    def _():
                        stack_ref[sp] = (jnp.int32(NB * 16 // 2) << W) | imask
                    sp = jnp.where(imask != 0, jnp.minimum(sp + 1, 60), sp)
                elif use_smem:
                    sp = jnp.maximum(sp, 1)

                if use_inner:
                    if leaf_rate:
                        lm = jnp.where((q & 1) == 0, mask_s & 1, 0)
                    else:
                        lm = jnp.int32(0) & mask_s

                    def lcond(lc):
                        return lc[0] != 0

                    def lbody(lc):
                        lm, t_best, best = lc
                        s, llow = _ffs(lm, W)
                        lm = lm - llow
                        gq = (lbase + (W - 1 - s)) % (NB * 12)
                        tb = tris_ref[pl.ds((gq // 12) * LG, LG), :]
                        tb = roll_lanes(tb, (gq % 12) * 10)
                        p0 = [colb(tb, k, LG) for k in range(3)]
                        e1 = [colb(tb, 3 + k, LG) for k in range(3)]
                        e2 = [colb(tb, 6 + k, LG) for k in range(3)]
                        idb = jnp.broadcast_to(
                            jax.lax.bitcast_convert_type(
                                jax.lax.slice(tb, (0, 9), (LG, 10)), jnp.int32),
                            (LG, LANE))
                        sel = w_iota == s
                        for r in range(R):
                            hm = jnp.sum((hits[r] & sel).astype(jnp.int32),
                                         axis=0, keepdims=True)
                            hm8 = jnp.broadcast_to(hm, (LG, LANE)) > 0
                            dr = [rowb(d[ax], r, LG) for ax in range(3)]
                            orr = [rowb(o[ax], r, LG) for ax in range(3)]
                            pv0 = dr[1] * e2[2] - dr[2] * e2[1]
                            pv1 = dr[2] * e2[0] - dr[0] * e2[2]
                            pv2 = dr[0] * e2[1] - dr[1] * e2[0]
                            den = pv0 * e1[0] + pv1 * e1[1] + pv2 * e1[2]
                            sden = jnp.where(den == 0.0, 1.0, den)
                            tv = [orr[k] - p0[k] for k in range(3)]
                            u = (pv0 * tv[0] + pv1 * tv[1] + pv2 * tv[2]) / sden
                            qv0 = tv[1] * e1[2] - tv[2] * e1[1]
                            qv1 = tv[2] * e1[0] - tv[0] * e1[2]
                            qv2 = tv[0] * e1[1] - tv[1] * e1[0]
                            v = (qv0 * dr[0] + qv1 * dr[1] + qv2 * dr[2]) / sden
                            t = (qv0 * e2[0] + qv1 * e2[1] + qv2 * e2[2]) / sden
                            tb_row = jax.lax.slice(t_best, (r, 0), (r + 1, LANE))
                            ok = ((den != 0.0) & (u >= -1e-5) & (u <= 1.00001)
                                  & (v >= -1e-5) & (u + v <= 1.00001)
                                  & (t >= rowb(t_min, r, LG))
                                  & (t <= jnp.broadcast_to(tb_row, (LG, LANE)))
                                  & hm8)
                            t_sl = jnp.where(ok, t, INF)
                            tg = jnp.min(t_sl, axis=0, keepdims=True)
                            tg8 = jnp.broadcast_to(tg, (LG, LANE))
                            idw = jnp.min(
                                jnp.where(t_sl == tg8, idb, jnp.int32(1 << 30)),
                                axis=0, keepdims=True)
                            sel_r = row_iota == r
                            take = sel_r & (jnp.broadcast_to(tg, (R, LANE)) < INF)
                            t_best = jnp.where(
                                take, jnp.broadcast_to(tg, (R, LANE)), t_best)
                            best = jnp.where(
                                take, jnp.broadcast_to(idw, (R, LANE)), best)
                        return lm, t_best, best

                    _, t_best, best = jax.lax.while_loop(
                        lcond, lbody, (lm, t_best, best))
                else:
                    # keep a live use of hits so it isn't DCE'd
                    t_best = jnp.where(
                        jax.lax.slice(hits[0], (0, 0), (R, LANE))
                        & (mask_s > (1 << 20)),
                        t_best * 0.5, t_best)

                if cond_on_drain:
                    return q + 1, sp, mask_s, t_best, best
                return q + 1, sp, t_best, best

            if cond_on_drain:
                # the real walk's structure: the continue condition
                # depends on the PREVIOUS body's vector->scalar drain
                # (sp <- imask <- mask_s); mask_s >= 0 always holds at
                # runtime but the compiler cannot prove it
                def cond(c):
                    return (c[0] < ITERS) & (c[2] >= 0)

                c = (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                     jnp.full((R, LANE), INF, jnp.float32),
                     jnp.full((R, LANE), -1, jnp.int32))
                _, _, _, t_best, best = jax.lax.while_loop(cond, visit, c)
            else:
                def cond(c):
                    return c[0] < ITERS

                c = (jnp.int32(0), jnp.int32(1),
                     jnp.full((R, LANE), INF, jnp.float32),
                     jnp.full((R, LANE), -1, jnp.int32))
                _, _, t_best, best = jax.lax.while_loop(cond, visit, c)
            out_ref[pl.ds(ti * R, R), :] = (
                t_best + best.astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, TILES, run_tile, 0)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TILES * R, LANE), jnp.float32),
        in_specs=[full, full, pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full] * 3,
        out_specs=full,
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )


def main():
    mb = NB * (W + LG) * LANE * 4 / 1e6
    print(f"backend={jax.default_backend()} iters={ITERS} "
          f"tiles={TILES} nb={NB} ({mb:.1f} MB node+tri)")
    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.standard_normal((NB * W, LANE)), jnp.float32)
    tris = jnp.asarray(rng.standard_normal((NB * LG, LANE)), jnp.float32)
    meta = jnp.asarray(
        rng.integers(0, 1 << 10, (1024, 2)), jnp.int32)
    o = jnp.asarray(
        rng.standard_normal((TILES * 3 * R, LANE)), jnp.float32)
    d = jnp.asarray(
        rng.standard_normal((TILES * 3 * R, LANE)), jnp.float32)
    tmn = jnp.full((TILES * R, LANE), 1e-3, jnp.float32)
    levels = os.environ.get(
        "PROBE_LEVELS", "slab,smem,when,inner0,inner50,cond,cond50"
    ).split(",")
    for level in levels:
        f = jax.jit(make(level))
        np.asarray(f(nodes, tris, meta, o, d, tmn))
        PIPE = 10   # back-to-back async dispatches amortize tunnel RTT
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = None
            for _k in range(PIPE):
                r = f(nodes, tris, meta, o, d, tmn)
            np.asarray(r)
            times.append(time.perf_counter() - t0)
        ns = min(times) / (ITERS * TILES * PIPE) * 1e9
        print(f"{level:8s}: {ns:8.1f} ns/iter", flush=True)


if __name__ == "__main__":
    main()
