"""Price the visitk slab phase variants (round-4 per-visit vector-work hunt).

The bvh8t visitk body at kn=2/R=4/W=16 runs ~320 jnp ops per visit, of
which ~60 are rowb sublane-broadcasts of walk-invariant ray rows
(o/inv/t_min/want) recomputed every visit. At the measured ~750ns/visit
that is ~1.2ns per (16,128) vreg-op, i.e. near the VPU issue rate — so
the win, if any, comes from removing vector WORK, not from latency
scheduling. Variants priced here (all walk-shaped: while loop whose next
node address depends on the one vector->scalar drain):

  cur      exact visitk slab phase replica (kn=2): rowb inside the loops
  hoist    o/inv/t_min/want broadcasts precomputed per tile (closure
           constants; Mosaic will spill them to VMEM and reload)
  row0     slab on row 0 only + (W,1) interval test for the tile's
           o/inv/t envelope (conservative descent; leaf gating dropped)
  mxu      one f32 (96,128)@(128,128) jnp.dot per visit + min/max tree
           (prices MXU-in-kernel; lhs from the node block read)
  floor    block read + roll + drain only (no slab work)

Usage: python scripts/probe_slab_cost.py   (TPU via tunnel)
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

SUB, LANE = 8, 128
W = 16
R = 4
KN = 2
NB = 64          # node blocks resident (16 nodes each)
INF = float(np.inf)
ITERS = int(os.environ.get("PROBE_ITERS", "4096"))


def make(variant: str):
    def kernel(nodes_ref, ox, oy, oz, ix, iy, iz, tmn, act, out_ref):
        w_col = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        wt = jnp.left_shift(jnp.int32(1), w_col)

        def colb(x, k, n=W):
            return jnp.broadcast_to(
                jax.lax.slice(x, (0, k), (n, k + 1)), (n, LANE))

        def rowb(x, r, n=W):
            return jnp.broadcast_to(
                jax.lax.slice(x, (r, 0), (r + 1, LANE)), (n, LANE))

        o = (ox[pl.ds(0, R), :], oy[pl.ds(0, R), :], oz[pl.ds(0, R), :])
        inv = (ix[pl.ds(0, R), :], iy[pl.ds(0, R), :], iz[pl.ds(0, R), :])
        t_min = tmn[pl.ds(0, R), :]
        live0 = (act[pl.ds(0, R), :] > 0).astype(jnp.int32)

        hoisted = None
        if variant == "hoist":
            hoisted = (
                [[rowb(o[ax], r) for ax in range(3)] for r in range(R)],
                [[rowb(inv[ax], r) for ax in range(3)] for r in range(R)],
                [rowb(t_min, r) for r in range(R)],
                [rowb(live0, r) > 0 for r in range(R)],
            )
        if variant == "row0":
            # tile envelope: per-axis scalar lo/hi of o and inv (reduced
            # once per tile), plus the row-0 per-lane rows
            env = []
            for ax in range(3):
                env.append((jnp.min(o[ax]), jnp.max(o[ax]),
                            jnp.min(inv[ax]), jnp.max(inv[ax])))
            tmn_lo = jnp.min(t_min)

        def visit(st):
            sp, t_best, best, q = st
            nid = q % (NB * 16)
            blk = nodes_ref[pl.ds((nid // 16) * W, W), :]
            blk = pltpu.roll(blk, (LANE - (nid % 16) * 8) % LANE, axis=1)
            box = [colb(blk, k) for k in range(6)]

            if variant == "floor":
                mask_s = jnp.sum(
                    jnp.where(box[0] > 0.0, wt, 0).astype(jnp.int32))
                return sp, t_best, best, q + 1 + (mask_s & 1)

            if variant == "mxu":
                # lhs = the node block itself padded to (96,128) via
                # 6 stacked copies (prices the matmul, not the layout)
                lhs = jnp.concatenate([blk] * 6, axis=0)
                rhs = jnp.concatenate(
                    [o[0], o[1], o[2], inv[0], inv[1], inv[2]] * 6
                    + [o[0], o[1], o[2], inv[0], inv[1]], axis=0)[:128]
                out = jax.lax.dot_general(
                    lhs, rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # min/max tree over the 6 bound groups of 16 rows
                g = [jax.lax.slice(out, (16 * k, 0), (16 * k + 16, LANE))
                     for k in range(6)]
                t0 = jnp.maximum(jnp.maximum(jnp.minimum(g[0], g[3]),
                                             jnp.minimum(g[1], g[4])),
                                 jnp.minimum(g[2], g[5]))
                t1 = jnp.minimum(jnp.minimum(jnp.maximum(g[0], g[3]),
                                             jnp.maximum(g[1], g[4])),
                                 jnp.maximum(g[2], g[5]))
                h = (t0 <= t1) & (t1 >= 0.0)
                cnt = jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True)
                mask_s = jnp.sum(jnp.where(cnt > 0, wt, 0))
                return sp, t_best, best, q + 1 + (mask_s & 1)

            if variant == "row0":
                bits = jnp.zeros((W, 1), jnp.int32)
                # per-lane slab on row 0 only
                t0 = jnp.full((W, LANE), -INF)
                t1 = jnp.full((W, LANE), INF)
                for ax in range(3):
                    ob = rowb(o[ax], 0)
                    ib = rowb(inv[ax], 0)
                    a = (box[ax] - ob) * ib
                    b = (box[3 + ax] - ob) * ib
                    t0 = jnp.maximum(t0, jnp.minimum(a, b))
                    t1 = jnp.minimum(t1, jnp.maximum(a, b))
                tbb = rowb(t_best, 0)
                h = (t0 <= t1) & (t1 >= rowb(t_min, 0)) & (t0 <= tbb)
                cnt = jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True)
                # (W,1) interval slab for the whole-tile envelope
                i0 = jnp.full((W, 1), -INF)
                i1 = jnp.full((W, 1), INF)
                for ax in range(3):
                    olo, ohi, ilo, ihi = env[ax]
                    blo = jax.lax.slice(box[ax], (0, 0), (W, 1))
                    bhi = jax.lax.slice(box[3 + ax], (0, 0), (W, 1))
                    # interval (b - [olo,ohi]) * [ilo,ihi]: 4 products
                    dlo, dhi = blo - ohi, bhi - olo
                    p1, p2 = dlo * ilo, dlo * ihi
                    p3, p4 = dhi * ilo, dhi * ihi
                    lo = jnp.minimum(jnp.minimum(p1, p2),
                                     jnp.minimum(p3, p4))
                    hi = jnp.maximum(jnp.maximum(p1, p2),
                                     jnp.maximum(p3, p4))
                    i0 = jnp.maximum(i0, lo)
                    i1 = jnp.minimum(i1, hi)
                ih = (i0 <= i1) & (i1 >= tmn_lo)
                bits = jnp.where((cnt > 0) | ih, wt, 0)
                mask_s = jnp.sum(bits)
                take = jnp.broadcast_to(
                    jax.lax.slice(t0, (0, 0), (1, LANE)), (R, LANE))
                t_best = jnp.minimum(t_best, jnp.abs(take) + 1.0)
                return sp, t_best, best, q + 1 + (mask_s & 1)

            # cur / hoist: full kn x R x axes slab phase
            cnts = [jnp.zeros((W, 1), jnp.int32) for _ in range(KN)]
            for r in range(R):
                if variant == "hoist":
                    wb = hoisted[3][r]
                    tmb = hoisted[2][r]
                else:
                    wb = rowb(live0, r) > 0
                    tmb = rowb(t_min, r)
                tbb = rowb(t_best, r)
                for j in range(KN):
                    bx = box  # same block stands in for node j
                    t0 = jnp.full((W, LANE), -INF)
                    t1 = jnp.full((W, LANE), INF)
                    for ax in range(3):
                        if variant == "hoist":
                            ob = hoisted[0][r][ax]
                            ib = hoisted[1][r][ax]
                        else:
                            ob = rowb(o[ax], r)
                            ib = rowb(inv[ax], r)
                        a = (bx[ax] - ob) * ib
                        b = (bx[3 + ax] - ob) * ib
                        t0 = jnp.maximum(t0, jnp.minimum(a, b))
                        t1 = jnp.minimum(t1, jnp.maximum(a, b))
                    h = (t0 <= t1) & (t1 >= tmb) & (t0 <= tbb) & wb
                    cnts[j] = cnts[j] + jnp.sum(
                        h.astype(jnp.int32), axis=1, keepdims=True)
            bits = jnp.zeros((W, 1), jnp.int32)
            for j in range(KN):
                bits = bits + jnp.where(cnts[j] > 0, wt, 0)
            mask_s = jnp.sum(bits)
            # keep t_best live so the slab chain isn't dead-code'd
            t_best = jnp.minimum(
                t_best, t_best + jnp.float32(mask_s).astype(jnp.float32)
                * 0.0 + 1e30)
            return sp, t_best, best, q + 1 + (mask_s & 1)

        def wcond(c):
            return c[3] < ITERS

        sp0 = jnp.int32(1)
        t_best0 = jnp.full((R, LANE), INF, jnp.float32)
        best0 = jnp.full((R, LANE), -1, jnp.int32)
        _, t_best, best, _ = jax.lax.while_loop(
            wcond, lambda c: visit(c), (sp0, t_best0, best0, jnp.int32(0)))
        out_ref[pl.ds(0, R), :] = t_best + best.astype(jnp.float32)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        in_specs=[full] * 9,
        out_specs=full,
    )


def main():
    print(f"backend={jax.default_backend()} iters={ITERS}", flush=True)
    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.standard_normal((NB * W, LANE)), jnp.float32)
    args = [jnp.asarray(rng.standard_normal((R, LANE)), jnp.float32)
            for _ in range(6)]
    tmn = jnp.full((R, LANE), 1e-3, jnp.float32)
    act = jnp.ones((R, LANE), jnp.float32)
    sel = os.environ.get("PROBE_VARIANTS", "floor,cur,hoist,row0,mxu")
    for variant in sel.split(","):
        try:
            f = jax.jit(make(variant))
            np.asarray(f(nodes, *args, tmn, act))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(nodes, *args, tmn, act))
                times.append(time.perf_counter() - t0)
            ns = min(times) / ITERS * 1e9
            print(f"{variant:6s}: {ns:8.1f} ns/visit", flush=True)
        except Exception as e:
            print(f"{variant:6s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
