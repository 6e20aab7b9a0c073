"""Attribute the ~2.4-4.5us per-iteration wall of big Pallas loop bodies.

Round-3 finding: the bvh8t walk pays ~2.4us per node/leaf iteration and
the scalar-free brute kernel pays ~4.5us per group iteration — both far
above the ~0.1ns/op rate small probe bodies achieve. Hypothesis: Mosaic
stops software-pipelining (or spills vector registers to VMEM) once the
body's live set grows. This probe measures a brute-group-shaped body
(dynamic tri-block read + lane roll + R-row Moller-Trumbore + carry
update) as a function of:

  - R (MT rows per iteration: 1/2/4 — linear op-count scaling?)
  - roll on/off
  - dynamic vs static block read
  - chain: walk-like serial dependency (a vector->scalar drain whose
    result addresses the next iteration's block read) — the suspected
    pipelining killer behind the walk's ~2.4us/visit

Usage: python scripts/probe_iter_cost.py
"""
from __future__ import annotations

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

LANE = 128
LG = 16
NB = 8          # tri blocks resident
import os as _os
ITERS = int(_os.environ.get("PROBE_ITERS", "4096"))


def make(R: int, roll: bool, dynamic: bool, chain: bool = False, loop: str = 'fori'):
    def kernel(tris_ref, o_ref, d_ref, t_ref, out_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)

        def colb(x, k):
            return jnp.broadcast_to(
                jax.lax.slice(x, (0, k), (LG, k + 1)), (LG, LANE))

        def rowb(x, r):
            return jnp.broadcast_to(
                jax.lax.slice(x, (r, 0), (r + 1, LANE)), (LG, LANE))

        o = [o_ref[pl.ds(ax * R, R), :] for ax in range(3)]
        d = [d_ref[pl.ds(ax * R, R), :] for ax in range(3)]
        t_min = t_ref[pl.ds(0, R), :]

        def group(q, st):
            if chain:
                t_best, best, addr = st
                tb = tris_ref[pl.ds((addr % NB) * LG, LG), :]
            else:
                t_best, best = st
                if dynamic:
                    tb = tris_ref[pl.ds((q % NB) * LG, LG), :]
                else:
                    tb = tris_ref[pl.ds(0, LG), :]
            if roll:
                tb = pltpu.roll(tb, (LANE - (q % 12) * 10) % LANE, axis=1)
            p0 = [colb(tb, k) for k in range(3)]
            e1 = [colb(tb, 3 + k) for k in range(3)]
            e2 = [colb(tb, 6 + k) for k in range(3)]
            idb = jnp.broadcast_to(
                jax.lax.bitcast_convert_type(
                    jax.lax.slice(tb, (0, 9), (LG, 10)), jnp.int32),
                (LG, LANE))
            for r in range(R):
                dr = [rowb(d[ax], r) for ax in range(3)]
                orr = [rowb(o[ax], r) for ax in range(3)]
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
                      & (t >= rowb(t_min, r))
                      & (t <= jnp.broadcast_to(tb_row, (LG, LANE))))
                t_sl = jnp.where(ok, t, jnp.inf)
                tg = jnp.min(t_sl, axis=0, keepdims=True)
                tg8 = jnp.broadcast_to(tg, (LG, LANE))
                idw = jnp.min(
                    jnp.where(t_sl == tg8, idb, jnp.int32(1 << 30)),
                    axis=0, keepdims=True)
                sel_r = row_iota == r
                take = sel_r & (jnp.broadcast_to(tg, (R, LANE)) < jnp.inf)
                t_best = jnp.where(
                    take, jnp.broadcast_to(tg, (R, LANE)), t_best)
                best = jnp.where(
                    take, jnp.broadcast_to(idw, (R, LANE)), best)
            if chain:
                # the ONE vector->scalar drain: next address depends on it
                drain = jnp.sum(jnp.minimum(best, 1).astype(jnp.int32))
                return t_best, best, (addr + 1 + (drain & 1))
            return t_best, best

        init_c = (jnp.full((R, LANE), jnp.inf, jnp.float32),
                  jnp.full((R, LANE), -1, jnp.int32), jnp.int32(0))
        if loop == 'while':
            # walk-shaped control: data-dependent continue condition
            def wcond(c):
                return c[2] < ITERS
            def wbody(c):
                t_best, best, q = c
                st = group(q, (t_best, best, q) if chain else (t_best, best))
                if chain:
                    t_best, best, addr = st
                    return t_best, best, addr
                t_best, best = st
                return t_best, best, q + 1
            t_best, best, _ = jax.lax.while_loop(wcond, wbody, init_c)
        elif loop == 'dynfori':
            n_ref = jnp.int32(ITERS)  # traced trip count
            def wcond(c):
                return c[2] < n_ref
            def wbody(c):
                t_best, best, q = c
                t_best, best = group(q, (t_best, best))
                return t_best, best, q + 1
            t_best, best, _ = jax.lax.while_loop(wcond, wbody, init_c)
        elif chain:
            t_best, best, _ = jax.lax.fori_loop(
                0, ITERS, group,
                (jnp.full((R, LANE), jnp.inf, jnp.float32),
                 jnp.full((R, LANE), -1, jnp.int32), jnp.int32(0)))
        else:
            t_best, best = jax.lax.fori_loop(
                0, ITERS, group,
                (jnp.full((R, LANE), jnp.inf, jnp.float32),
                 jnp.full((R, LANE), -1, jnp.int32)))
        out_ref[pl.ds(0, R), :] = t_best + best.astype(jnp.float32)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        in_specs=[full] * 4,
        out_specs=full,
    )


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    Rmax = 4
    tris = jnp.asarray(rng.standard_normal((NB * LG, LANE)), jnp.float32)
    o = jnp.asarray(rng.standard_normal((3 * Rmax, LANE)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((3 * Rmax, LANE)), jnp.float32)
    tmn = jnp.full((Rmax, LANE), 1e-3, jnp.float32)
    grid = [(4, True, True, False, 'fori'),
            (4, True, True, False, 'dynfori'),
            (4, True, True, False, 'while'),
            (4, True, True, True, 'while'),
            (1, True, True, True, 'while')]
    for R, roll, dyn, chain, loop in grid:
                f = jax.jit(make(R, roll, dyn, chain, loop))
                np.asarray(f(tris, o, d, tmn))  # block_until_ready is a
                times = []                      # no-op on tunnel buffers
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(f(tris, o, d, tmn))
                    times.append(time.perf_counter() - t0)
                ns = min(times) / ITERS * 1e9
                print(f"R={R} roll={int(roll)} dyn={int(dyn)} "
                      f"chain={int(chain)} loop={loop}: "
                      f"{ns:8.1f} ns/iter", flush=True)


if __name__ == "__main__":
    main()
