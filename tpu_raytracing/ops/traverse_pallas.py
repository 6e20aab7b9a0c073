"""Pallas TPU traversal: lockstep broadcast walk over the skip-link BVH.

Per-lane gathers don't vectorize on TPU (and Mosaic doesn't lower them), so
this kernel inverts the data flow: a ray TILE (8x128 lanes) shares ONE
scalar node pointer that walks the preorder skip-link tree; every node is a
scalar-indexed VMEM row read broadcast to all lanes (no gathers anywhere),
lanes mask themselves with their own slab test, and the tile descends when
ANY lane hits, else follows the skip link. AABB containment (child box
inside parent box) guarantees a lane can never pass a node whose ancestor
it missed, so each lane's hit set — and therefore its closest hit — is
identical to an independent per-ray walk: winners are bit-equal to
ops/traverse.py's walk (t agrees to FMA-contraction ULPs).

VMEM tiling note: Mosaic pads an array's minor dimension to 128 lanes, so
narrow tables like (N, 8) would blow up 16x and OOM VMEM. Tables are packed
with full 128-lane rows instead: 16 node records (8 f32 each) or 8 triangle
records (16 f32) per row; a visit reads one row by dynamic sublane index
and selects its record with a static-slice switch. Integer fields ride as
f32 bit patterns and are recovered with a VECTOR bitcast (Mosaic forbids
scalar bitcasts).

Divergent tiles visit the union of their lanes' node sets; Morton-ordered
pixel chunks (integrator/render.py) keep primary tiles coherent.

Reference counterparts: per-ray DFS stack traversal accel.rs:65-259 /
OptiX hardware traversal (kernels/pathtracer.cu).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import MAX_LEAF_SIZE
from .intersect import BARY_EPS

SUB, LANE = 8, 128
TILE = SUB * LANE
INF = float(np.inf)

NODE_F = 8          # f32 per node record: min3 max3 meta skip
NODES_PER_ROW = LANE // NODE_F   # 16
TRI_F = 16          # f32 per triangle record (9 used, padded)
TRIS_PER_ROW = LANE // TRI_F     # 8

# VMEM budget for the resident tables
VMEM_TABLE_BYTES = 8 * 1024 * 1024


def pack_tables(bvh_nodes: np.ndarray, tri_pack: np.ndarray):
    """Host-side packing into 128-lane rows. Returns (nodes_pk, tris_pk)."""
    n = bvh_nodes.shape[0]
    n_pad = -n % NODES_PER_ROW
    nodes = np.concatenate(
        [bvh_nodes.astype(np.float32),
         np.zeros((n_pad, NODE_F), np.float32)]
    ) if n_pad else bvh_nodes.astype(np.float32)
    nodes_pk = nodes.reshape(-1, LANE)

    t = tri_pack.shape[0]
    tris = np.zeros((t + (-t % TRIS_PER_ROW), TRI_F), np.float32)
    tris[:t, :9] = tri_pack.astype(np.float32)
    tris_pk = tris.reshape(-1, LANE)
    return nodes_pk, tris_pk


class AccelView(NamedTuple):
    """One accel's tables + statics (main world soup or one shared BLAS)."""

    recs_pk: object
    rows_pk: object
    nodes_pk: object
    tris_pk: object
    quad_rows: object
    tri_rows: object
    n_tris: int
    root_meta4: int
    bvh4_stack: int
    root_meta: int
    bvh2_depth: int
    n_nodes: int
    root_meta4r: int
    t8_nodes: object
    t8_meta: object
    t8_tris: object
    t8_stack: int


def _accel_of(ds, blas) -> AccelView:
    if blas is None:
        m = ds.meta
        return AccelView(
            ds.bvh4_recs_pk, ds.bvh2_rows_pk, ds.bvh_nodes_pk, ds.tri_pack_pk,
            ds.bvh4_rows, ds.tri_rows,
            m.n_tris, m.root_meta4, m.bvh4_stack, m.root_meta, m.bvh2_depth,
            m.n_bvh_nodes, m.root_meta4r,
            ds.t8_nodes, ds.t8_meta, ds.t8_tris, m.t8_stack,
        )
    t = ds.blas_tables[blas]
    (n_tris, root_meta, bvh2_depth, root_meta4, bvh4_stack, n_nodes,
     root_meta4r, t8_stack) = ds.meta.blas_meta[blas]
    return AccelView(
        t.bvh4_recs_pk, t.bvh2_rows_pk, t.bvh_nodes_pk, t.tri_pack_pk,
        t.bvh4_rows, t.tri_rows,
        n_tris, root_meta4, bvh4_stack, root_meta, bvh2_depth, n_nodes,
        root_meta4r,
        t.t8_nodes, t.t8_meta, t.t8_tris, t8_stack,
    )


def _kernel_kind() -> str:
    import os as _o

    return _o.environ.get("TPU_RT_PALLAS_KERNEL", "bvh8t")


def _accel_supported(a: AccelView, chunked: bool = False) -> bool:
    kind = _kernel_kind()
    if kind == "bvh8t" and chunked:
        # big scene split into VMEM-sized subtree chunks: each chunk pass
        # stages its own tables, so the resident-size gate does not apply
        return a.n_tris > 0
    table = {"quad": a.recs_pk, "pair": a.rows_pk, "quadrow": a.quad_rows,
             "bvh8t": a.t8_nodes}.get(kind, a.nodes_pk)
    tris = {"quadrow": a.tri_rows, "bvh8t": a.t8_tris}.get(kind, a.tris_pk)
    if not (a.n_tris > 0 and (table.size + tris.size) * 4 < VMEM_TABLE_BYTES):
        return False
    # deep/degenerate trees whose stack bound exceeds the kernel's SMEM
    # stack degrade to the XLA walk instead of raising (ADVICE r1)
    if kind in ("quad", "quadrow") and a.bvh4_stack > STACK_CAP:
        return False
    if kind == "pair" and a.bvh2_depth > STACK_CAP:
        return False
    if kind == "bvh8t" and a.t8_stack > STACK_CAP:
        return False
    return True


def supports(ds) -> bool:
    """True when the main accel and every shared BLAS fit the kernel."""
    if ds.meta.n_tris > 0 and not _accel_supported(
        _accel_of(ds, None), chunked=bool(ds.meta.t8_chunk_meta)
    ):
        return False
    if ds.meta.n_tris == 0 and not ds.meta.instances:
        return False
    for b in range(len(ds.meta.blas_meta)):
        if not _accel_supported(_accel_of(ds, b)):
            return False
    return True


def _select_record(row, sub, n_records, width):
    """Static-slice switch: record `sub` (scalar) of a (1, 128) row."""
    return jax.lax.switch(
        sub,
        [
            (lambda r, k=k: jax.lax.slice(r, (0, k * width), (1, (k + 1) * width)))
            for k in range(n_records)
        ],
        row,
    )


def _walk_kernel(early_exit: bool, sentinel: int, n_tris: int):
    def kernel(
        nodes_ref, tris_ref,
        ox, oy, oz, dx, dy, dz, tmn, tmx, act,
        t_out, best_out,
    ):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        t_min = tmn[:]
        live0 = act[:] > 0

        t_best0 = tmx[:]
        best0 = jnp.full((SUB, LANE), -1, jnp.int32)

        def cond(c):
            return c[0] < sentinel

        def body(c):
            node, t_best, best = c
            row = nodes_ref[pl.ds(node // NODES_PER_ROW, 1), :]  # (1, 128)
            rec = _select_record(row, node % NODES_PER_ROW, NODES_PER_ROW,
                                 NODE_F)                          # (1, 8)
            ints = jax.lax.bitcast_convert_type(rec, jnp.int32)
            meta = ints[0, 6]
            skip = ints[0, 7]

            # slab test: scalars broadcast against (SUB, LANE) lanes
            t0 = jnp.full((SUB, LANE), -INF)
            t1 = jnp.full((SUB, LANE), INF)
            for ax in range(3):
                a = (rec[0, ax] - o[ax]) * inv[ax]
                b = (rec[0, 3 + ax] - o[ax]) * inv[ax]
                t0 = jnp.maximum(t0, jnp.minimum(a, b))
                t1 = jnp.minimum(t1, jnp.maximum(a, b))
            hit = (t0 <= t1) & (t1 >= t_min) & (t0 <= t_best) & live0
            if early_exit:
                hit = hit & (best == -1)

            count = meta & 7
            first = meta >> 3
            is_leaf = count > 0
            any_hit = jnp.any(hit)

            def leaf(args):
                t_best, best = args
                # first-min within the leaf (argmin tie semantics), then a
                # <=-update against t_best (cross-leaf semantics) — mirrors
                # the batched jnp leaf phase exactly.
                cur_t = jnp.full((SUB, LANE), INF)
                cur_k = jnp.zeros((SUB, LANE), jnp.int32)
                for k in range(MAX_LEAF_SIZE):
                    ti = jnp.minimum(first + k, n_tris - 1)
                    trow = tris_ref[pl.ds(ti // TRIS_PER_ROW, 1), :]
                    tri = _select_record(trow, ti % TRIS_PER_ROW,
                                         TRIS_PER_ROW, TRI_F)     # (1, 16)
                    p0 = (tri[0, 0], tri[0, 1], tri[0, 2])
                    e1 = (tri[0, 3] - p0[0], tri[0, 4] - p0[1], tri[0, 5] - p0[2])
                    e2 = (tri[0, 6] - p0[0], tri[0, 7] - p0[1], tri[0, 8] - p0[2])
                    # Moller-Trumbore against all lanes (scalar triangle)
                    pv0 = d[1] * e2[2] - d[2] * e2[1]
                    pv1 = d[2] * e2[0] - d[0] * e2[2]
                    pv2 = d[0] * e2[1] - d[1] * e2[0]
                    den = pv0 * e1[0] + pv1 * e1[1] + pv2 * e1[2]
                    sden = jnp.where(den == 0.0, 1.0, den)
                    tv = (o[0] - p0[0], o[1] - p0[1], o[2] - p0[2])
                    u = (pv0 * tv[0] + pv1 * tv[1] + pv2 * tv[2]) / sden
                    qv0 = tv[1] * e1[2] - tv[2] * e1[1]
                    qv1 = tv[2] * e1[0] - tv[0] * e1[2]
                    qv2 = tv[0] * e1[1] - tv[1] * e1[0]
                    v = (qv0 * d[0] + qv1 * d[1] + qv2 * d[2]) / sden
                    t = (qv0 * e2[0] + qv1 * e2[1] + qv2 * e2[2]) / sden
                    ok = (
                        (den != 0.0)
                        & (u >= -BARY_EPS) & (u <= 1.0 + BARY_EPS)
                        & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                        & (t >= t_min) & (t <= t_best)
                        & hit
                        & (k < count)
                    )
                    take = ok & (t < cur_t)
                    cur_t = jnp.where(take, t, cur_t)
                    cur_k = jnp.where(take, k, cur_k)
                leaf_hit = cur_t < INF
                t_best = jnp.where(leaf_hit, cur_t, t_best)
                best = jnp.where(leaf_hit, first + cur_k, best)
                return t_best, best

            t_best, best = jax.lax.cond(
                any_hit & is_leaf, leaf, lambda a: a, (t_best, best)
            )
            if early_exit:
                # pure bool algebra: jnp.where over bools lowers to an
                # unsupported i1 truncation in Mosaic
                done = jnp.all((best >= 0) | ~live0)
                node = jnp.where(
                    done, sentinel,
                    jnp.where(any_hit & ~is_leaf, node + 1, skip),
                )
            else:
                node = jnp.where(any_hit & ~is_leaf, node + 1, skip)
            return node, t_best, best

        _, t_best, best = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_best0, best0)
        )
        t_out[:] = t_best
        best_out[:] = best

    return kernel


PAIR_F = 16                      # f32 per child-pair record
PAIRS_PER_ROW = LANE // PAIR_F   # 8
STACK_CAP = 64                   # shared scalar stack bound (>= tree depth)


def _pair_kernel(early_exit: bool, root_meta: int, n_tris: int):
    """v2: child-pair walk with a SHARED scalar stack (SMEM) and
    majority-vote near-first ordering.

    Both children's boxes live in the parent record, so the tile only ever
    visits nodes at least one lane hit (missed subtrees are culled at the
    parent, halving visits vs the skip-link walk), and descending into the
    tile-majority nearer child first tightens t_best early. Leaf children
    are intersected immediately at the parent using the fresh per-lane
    child-box mask. The ordering is shared, so cross-leaf exact-t ties may
    resolve differently than the fixed-DFS walk — winners still agree
    everywhere t values differ (the generic case).

    meta encoding: leaf -> (first<<3)|count (count>0); internal -> row<<3;
    DONE = -1.
    """

    def kernel(
        pairs_ref, tris_ref,
        ox, oy, oz, dx, dy, dz, tmn, tmx, act,
        t_out, best_out, stack_ref,
    ):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        t_min = tmn[:]
        live0 = act[:] > 0

        def slab(rec, base, t_best):
            t0 = jnp.full((SUB, LANE), -INF)
            t1 = jnp.full((SUB, LANE), INF)
            for ax in range(3):
                a = (rec[0, base + ax] - o[ax]) * inv[ax]
                b = (rec[0, base + 3 + ax] - o[ax]) * inv[ax]
                t0 = jnp.maximum(t0, jnp.minimum(a, b))
                t1 = jnp.minimum(t1, jnp.maximum(a, b))
            hit = (t0 <= t1) & (t1 >= t_min) & (t0 <= t_best) & live0
            return hit, t0

        def leaf_phase(meta, hit, t_best, best):
            count = meta & 7
            first = meta >> 3
            cur_t = jnp.full((SUB, LANE), INF)
            cur_k = jnp.zeros((SUB, LANE), jnp.int32)
            for k in range(MAX_LEAF_SIZE):
                ti = jnp.minimum(first + k, n_tris - 1)
                trow = tris_ref[pl.ds(ti // TRIS_PER_ROW, 1), :]
                tri = _select_record(trow, ti % TRIS_PER_ROW,
                                     TRIS_PER_ROW, TRI_F)
                p0 = (tri[0, 0], tri[0, 1], tri[0, 2])
                e1 = (tri[0, 3] - p0[0], tri[0, 4] - p0[1], tri[0, 5] - p0[2])
                e2 = (tri[0, 6] - p0[0], tri[0, 7] - p0[1], tri[0, 8] - p0[2])
                pv0 = d[1] * e2[2] - d[2] * e2[1]
                pv1 = d[2] * e2[0] - d[0] * e2[2]
                pv2 = d[0] * e2[1] - d[1] * e2[0]
                den = pv0 * e1[0] + pv1 * e1[1] + pv2 * e1[2]
                sden = jnp.where(den == 0.0, 1.0, den)
                tv = (o[0] - p0[0], o[1] - p0[1], o[2] - p0[2])
                u = (pv0 * tv[0] + pv1 * tv[1] + pv2 * tv[2]) / sden
                qv0 = tv[1] * e1[2] - tv[2] * e1[1]
                qv1 = tv[2] * e1[0] - tv[0] * e1[2]
                qv2 = tv[0] * e1[1] - tv[1] * e1[0]
                v = (qv0 * d[0] + qv1 * d[1] + qv2 * d[2]) / sden
                t = (qv0 * e2[0] + qv1 * e2[1] + qv2 * e2[2]) / sden
                ok = (
                    (den != 0.0)
                    & (u >= -BARY_EPS) & (u <= 1.0 + BARY_EPS)
                    & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                    & (t >= t_min) & (t <= t_best)
                    & hit
                    & (k < count)
                )
                take = ok & (t < cur_t)
                cur_t = jnp.where(take, t, cur_t)
                cur_k = jnp.where(take, k, cur_k)
            leaf_hit = cur_t < INF
            t_best = jnp.where(leaf_hit, cur_t, t_best)
            best = jnp.where(leaf_hit, first + cur_k, best)
            return t_best, best

        t_best0 = tmx[:]
        best0 = jnp.full((SUB, LANE), -1, jnp.int32)

        if root_meta < 0:
            t_out[:] = t_best0
            best_out[:] = best0
            return
        if root_meta & 7:
            # degenerate single-leaf tree: every live lane tests the leaf
            t_best, best = leaf_phase(
                jnp.int32(root_meta), live0, t_best0, best0
            )
            t_out[:] = t_best
            best_out[:] = best
            return

        DONE = jnp.int32(-1)

        # tile majority direction sign per axis, computed ONCE: near-first
        # child order per node is then a scalar bit test on the stored
        # split axis (no per-visit cross-lane reductions)
        half = jnp.sum(live0.astype(jnp.int32))
        negbits = jnp.int32(0)
        for ax in range(3):
            nneg = jnp.sum(((d[ax] < 0.0) & live0).astype(jnp.int32))
            negbits = negbits | (
                (2 * nneg > half).astype(jnp.int32) << ax
            )

        def cond(c):
            return c[0] != DONE

        def body(c):
            cur, sp, t_best, best = c
            row = pairs_ref[pl.ds((cur >> 3) // PAIRS_PER_ROW, 1), :]
            rec = _select_record(row, (cur >> 3) % PAIRS_PER_ROW,
                                 PAIRS_PER_ROW, PAIR_F)  # (1, 16)
            ints = jax.lax.bitcast_convert_type(rec, jnp.int32)
            meta_l = ints[0, 12]
            meta_r = ints[0, 13]
            axis = ints[0, 14]

            if early_exit:
                want = live0 & (best == -1)
            else:
                want = live0
            hit_l, t0l = slab(rec, 0, t_best)
            hit_r, t0r = slab(rec, 6, t_best)
            hit_l = hit_l & want
            hit_r = hit_r & want

            leaf_l = (meta_l & 7) > 0
            leaf_r = (meta_r & 7) > 0
            any_l = jnp.any(hit_l)
            any_r = jnp.any(hit_r)

            # leaf children intersect immediately with their fresh mask
            t_best, best = jax.lax.cond(
                any_l & leaf_l,
                lambda a: leaf_phase(meta_l, hit_l, *a),
                lambda a: a,
                (t_best, best),
            )
            t_best, best = jax.lax.cond(
                any_r & leaf_r,
                lambda a: leaf_phase(meta_r, hit_r, *a),
                lambda a: a,
                (t_best, best),
            )

            go_l = any_l & ~leaf_l
            go_r = any_r & ~leaf_r
            both = go_l & go_r
            # static near-first: left child is the lower-coordinate side of
            # the split axis, so it is nearer iff the tile-majority
            # direction along that axis is positive
            l_near = ((negbits >> axis) & 1) == 0
            near = jnp.where(l_near, meta_l, meta_r)
            far = jnp.where(l_near, meta_r, meta_l)

            # push far on the shared stack when both internal children hit
            @pl.when(both)
            def _():
                stack_ref[sp] = far

            sp = jnp.where(both, sp + 1, sp)
            nxt = jnp.where(
                both, near,
                jnp.where(go_l, meta_l, jnp.where(go_r, meta_r, DONE)),
            )
            # pop when no internal child to visit
            need_pop = nxt == DONE
            can_pop = sp > 0
            popped = stack_ref[jnp.maximum(sp - 1, 0)]
            cur = jnp.where(need_pop, jnp.where(can_pop, popped, DONE), nxt)
            sp = jnp.where(need_pop & can_pop, sp - 1, sp)
            if early_exit:
                done = jnp.all((best >= 0) | ~live0)
                cur = jnp.where(done, DONE, cur)
            return cur, sp, t_best, best

        _, _, t_best, best = jax.lax.while_loop(
            cond, body, (jnp.int32(root_meta), jnp.int32(0), t_best0, best0)
        )
        t_out[:] = t_best
        best_out[:] = best

    return kernel


QUAD_F = 32                      # f32 per quad record
QUADS_PER_ROW = LANE // QUAD_F   # 4


def _parse_probe(spec: str):
    """'switch:2,cond:4' -> {'switch': 2, 'cond': 4} (perf attribution)."""
    out = {}
    for part in (spec or "").split(","):
        part = part.strip()
        if not part:
            continue
        name, _, n = part.partition(":")
        out[name] = int(n) if n else 1
    return out


def _quad_kernel(early_exit: bool, root_meta: int, n_tris: int,
                 tsub: int = SUB, count_visits: bool = False,
                 probe: str = "", rowrec: bool = False):
    """v3: BVH4 walk — each record holds up to 4 child boxes (two collapsed
    BVH2 levels), so iterations halve vs the pair walk. Hit children are
    visited in tile-majority near-first order (per-half split axes stored
    in the record); leaf children intersect immediately at the parent.

    tsub widens the walk tile to (tsub, LANE) lanes: the per-visit SCALAR
    program (the measured round-1 bottleneck, docs/PERF_LOG.md) is shared
    across tsub//8 vector subtiles, amortizing the ~0.9µs/visit scalar
    latency over K× more rays at the cost of a larger node-set union.

    probe adds REDUNDANT copies of individual body constructs (semantics
    preserved; results consumed via a provably-zero addend the compiler
    cannot fold) so their marginal cost is measurable on the real body —
    the round-1 isolated probes all ran at the ~40ns floor while the full
    body runs ~0.9µs/visit, so attribution must happen in situ.

    rowrec switches to the switch-free layouts: one quad record per VMEM
    row (dynamic sublane read replaces the ~144ns lax.switch select) and
    8-aligned leaf tri rows (one row read + static slot slices replace 4
    more switches per leaf; slot field 9 carries the original tri id)."""
    probes = _parse_probe(probe)

    def kernel(
        quads_ref, tris_ref,
        ox, oy, oz, dx, dy, dz, tmn, tmx, act,
        t_out, best_out, visits_out, stack_ref,
    ):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / c for c in d)
        t_min = tmn[:]
        live0 = act[:] > 0

        def leaf_phase(meta, hit, t_best, best):
            count = meta & 7
            first = meta >> 3
            cur_t = jnp.full((tsub, LANE), INF)
            cur_k = jnp.zeros((tsub, LANE), jnp.int32)
            if rowrec:
                lrow = tris_ref[pl.ds(first, 1), :]  # one aligned leaf row
                lrow_i = jax.lax.bitcast_convert_type(lrow, jnp.int32)
            for k in range(MAX_LEAF_SIZE):
                if rowrec:
                    tri = jax.lax.slice(lrow, (0, k * TRI_F),
                                        (1, (k + 1) * TRI_F))
                else:
                    ti = jnp.minimum(first + k, n_tris - 1)
                    trow = tris_ref[pl.ds(ti // TRIS_PER_ROW, 1), :]
                    tri = _select_record(trow, ti % TRIS_PER_ROW,
                                         TRIS_PER_ROW, TRI_F)
                p0 = (tri[0, 0], tri[0, 1], tri[0, 2])
                e1 = (tri[0, 3] - p0[0], tri[0, 4] - p0[1], tri[0, 5] - p0[2])
                e2 = (tri[0, 6] - p0[0], tri[0, 7] - p0[1], tri[0, 8] - p0[2])
                pv0 = d[1] * e2[2] - d[2] * e2[1]
                pv1 = d[2] * e2[0] - d[0] * e2[2]
                pv2 = d[0] * e2[1] - d[1] * e2[0]
                den = pv0 * e1[0] + pv1 * e1[1] + pv2 * e1[2]
                sden = jnp.where(den == 0.0, 1.0, den)
                tv = (o[0] - p0[0], o[1] - p0[1], o[2] - p0[2])
                u = (pv0 * tv[0] + pv1 * tv[1] + pv2 * tv[2]) / sden
                qv0 = tv[1] * e1[2] - tv[2] * e1[1]
                qv1 = tv[2] * e1[0] - tv[0] * e1[2]
                qv2 = tv[0] * e1[1] - tv[1] * e1[0]
                v = (qv0 * d[0] + qv1 * d[1] + qv2 * d[2]) / sden
                t = (qv0 * e2[0] + qv1 * e2[1] + qv2 * e2[2]) / sden
                ok = (
                    (den != 0.0)
                    & (u >= -BARY_EPS) & (u <= 1.0 + BARY_EPS)
                    & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                    & (t >= t_min) & (t <= t_best)
                    & hit
                    & (k < count)
                )
                take = ok & (t < cur_t)
                cur_t = jnp.where(take, t, cur_t)
                # rowrec rows carry the original tri id in slot field 9
                cur_k = jnp.where(
                    take, lrow_i[0, k * TRI_F + 9] if rowrec else k, cur_k
                )
            leaf_hit = cur_t < INF
            t_best = jnp.where(leaf_hit, cur_t, t_best)
            best = jnp.where(leaf_hit, cur_k if rowrec else first + cur_k,
                             best)
            return t_best, best

        t_best0 = tmx[:]
        best0 = jnp.full((tsub, LANE), -1, jnp.int32)

        if root_meta < 0:
            t_out[:] = t_best0
            best_out[:] = best0
            return
        if root_meta & 7:
            t_best, best = leaf_phase(
                jnp.int32(root_meta), live0, t_best0, best0
            )
            t_out[:] = t_best
            best_out[:] = best
            return

        DONE = jnp.int32(-1)
        half = jnp.sum(live0.astype(jnp.int32))
        negbits = jnp.int32(0)
        for ax in range(3):
            nneg = jnp.sum(((d[ax] < 0.0) & live0).astype(jnp.int32))
            negbits = negbits | ((2 * nneg > half).astype(jnp.int32) << ax)

        def cond(c):
            return c[0] != DONE

        def body(c):
            cur, sp, nv, t_best, best = c
            if count_visits:
                nv = nv + 1
            nid = cur >> 3
            if rowrec:
                row = quads_ref[pl.ds(nid, 1), :]
                rec = row  # record occupies lanes [0:32] of its own row
            else:
                row = quads_ref[pl.ds(nid // QUADS_PER_ROW, 1), :]
                rec = _select_record(row, nid % QUADS_PER_ROW,
                                     QUADS_PER_ROW, QUAD_F)  # (1, 32)
            ints = jax.lax.bitcast_convert_type(rec, jnp.int32)
            metas = [ints[0, 24 + j] for j in range(4)]
            axes = ints[0, 28]
            a_top = axes & 3
            a_l = (axes >> 2) & 3
            a_r = (axes >> 4) & 3
            nkids = (axes >> 6) & 7
            nleft = (axes >> 9) & 3

            if early_exit:
                want = live0 & (best == -1)
            else:
                want = live0

            hits = []
            for j in range(4):
                t0 = jnp.full((tsub, LANE), -INF)
                t1 = jnp.full((tsub, LANE), INF)
                for ax in range(3):
                    a = (rec[0, j * 6 + ax] - o[ax]) * inv[ax]
                    b = (rec[0, j * 6 + 3 + ax] - o[ax]) * inv[ax]
                    t0 = jnp.maximum(t0, jnp.minimum(a, b))
                    t1 = jnp.minimum(t1, jnp.maximum(a, b))
                hits.append(
                    (t0 <= t1) & (t1 >= t_min) & (t0 <= t_best) & want
                )
            # fused any-reductions: 2 packed sums for 4 children
            s01 = jnp.sum(
                hits[0].astype(jnp.int32) + (hits[1].astype(jnp.int32) << 16)
            )
            s23 = jnp.sum(
                hits[2].astype(jnp.int32) + (hits[3].astype(jnp.int32) << 16)
            )
            # keep these as i32 0/1: Mosaic cannot select between scalar
            # bools (arith.select on i1 fails to legalize)
            anys = [
                ((s01 & 0xFFFF) > 0).astype(jnp.int32),
                ((s01 >> 16) > 0).astype(jnp.int32),
                ((s23 & 0xFFFF) > 0).astype(jnp.int32),
                ((s23 >> 16) > 0).astype(jnp.int32),
            ]
            anys = [
                anys[j] * (jnp.int32(j) < nkids).astype(jnp.int32)
                for j in range(4)
            ]

            # ---- additive perf probes (redundant construct copies; the
            # accumulated junk is folded to a provably-zero scalar addend)
            junk = jnp.int32(0)
            for c in range(probes.get("row", 0)):
                row2 = quads_ref[pl.ds((nid // (2 + c)) // QUADS_PER_ROW, 1), :]
                junk = junk + jax.lax.bitcast_convert_type(row2, jnp.int32)[0, c]
            for c in range(probes.get("switch", 0)):
                rec2 = _select_record(row, (nid + 1 + c) % QUADS_PER_ROW,
                                      QUADS_PER_ROW, QUAD_F)
                junk = junk + jax.lax.bitcast_convert_type(rec2, jnp.int32)[0, c]
            for c in range(probes.get("extract", 0)):
                junk = junk + ints[0, c % 24]
            for c in range(probes.get("reduce", 0)):
                junk = junk + jnp.sum(hits[c % 4].astype(jnp.int32) << (1 + c))
            for c in range(probes.get("pick", 0)):
                # a pick_meta-like 4-deep scalar select chain
                x = metas[0]
                for j in range(1, 4):
                    x = jnp.where(nkids == j + c + 17, metas[j], x)
                junk = junk + x
            for c in range(probes.get("slab", 0)):
                # a full redundant 4-box slab block (scaled boxes defeat CSE)
                s = jnp.float32(c + 2)
                hsum = jnp.zeros((tsub, LANE), jnp.int32)
                for j in range(4):
                    t0 = jnp.full((tsub, LANE), -INF)
                    t1 = jnp.full((tsub, LANE), INF)
                    for ax in range(3):
                        a = (rec[0, j * 6 + ax] * s - o[ax]) * inv[ax]
                        b = (rec[0, j * 6 + 3 + ax] * s - o[ax]) * inv[ax]
                        t0 = jnp.maximum(t0, jnp.minimum(a, b))
                        t1 = jnp.minimum(t1, jnp.maximum(a, b))
                    hsum = hsum + (t0 <= t1).astype(jnp.int32)
                junk = junk + jnp.sum(hsum)

            if early_exit:
                # any-hit: visit order is irrelevant — static storage order
                # keeps the per-visit scalar program (the measured
                # bottleneck) minimal
                o0, o1, o2, o3 = (
                    jnp.int32(0), jnp.int32(1), jnp.int32(2), jnp.int32(3),
                )
            else:
                # tile-majority near-first order of the (up to) 4 slots
                sgn_top = (negbits >> a_top) & 1
                sgn_l = (negbits >> a_l) & 1
                sgn_r = (negbits >> a_r) & 1
                two_l = nleft == 2
                two_r = (nkids - nleft) == 2
                # left half slots: [0] or [0,1] ordered by sgn_l
                l0 = jnp.where(two_l & (sgn_l == 1), 1, 0)
                l1 = jnp.where(two_l, 1 - l0, -1)
                rb = nleft
                r0 = rb + jnp.where(two_r & (sgn_r == 1), 1, 0)
                r1 = jnp.where(two_r, rb + (1 - (r0 - rb)), -1)
                # halves ordered by sgn_top
                o0 = jnp.where(sgn_top == 0, l0, r0)
                o1 = jnp.where(sgn_top == 0, l1, r1)
                o2 = jnp.where(sgn_top == 0, r0, l0)
                o3 = jnp.where(sgn_top == 0, r1, l1)

            def pick_meta(s):
                m = metas[0]
                for j in range(1, 4):
                    m = jnp.where(s == j, metas[j], m)
                return jnp.where(s < 0, DONE, m)

            def pick_any(s):
                a = anys[0]
                for j in range(1, 4):
                    a = jnp.where(s == j, anys[j], a)
                return jnp.where(s < 0, 0, a) > 0

            def pick_hit(s):
                # i32 through the select chain: Mosaic cannot select i1
                h = hits[0].astype(jnp.int32)
                for j in range(1, 4):
                    h = jnp.where(s == j, hits[j].astype(jnp.int32), h)
                return h > 0

            # process ordered slots near-to-far: leaves intersect now;
            # internal hits: first becomes cur, later ones pushed in
            # reverse (so nearest is popped first)
            nxt = DONE
            pending = []  # (meta, take) for internal hits in near order
            for s in (o0, o1, o2, o3):
                m = pick_meta(s)
                a = pick_any(s)
                is_leaf = (m & 7) > 0
                do_leaf = a & is_leaf & (m != DONE)

                def leaf_run(args, s=s, m=m):
                    tb, bs = args
                    return leaf_phase(m, pick_hit(s), tb, bs)

                t_best, best = jax.lax.cond(
                    do_leaf, leaf_run, lambda args: args, (t_best, best)
                )
                go = a & ~is_leaf & (m != DONE)
                pending.append((m, go))
            for c in range(probes.get("cond", 0)):
                jj = c % 4

                def probe_leaf(args, m=metas[jj], h=hits[jj]):
                    return leaf_phase(m, h, *args)

                t_best, best = jax.lax.cond(
                    (anys[jj] > 0) & (metas[jj] == -0x7EAD - c),
                    probe_leaf, lambda args: args, (t_best, best),
                )
            for c in range(probes.get("leaftaken", 0)):
                # a cond TAKEN whenever slot 0 hits, running a full leaf
                # body with an all-false lane mask (bounded row, count=0):
                # measures what a real taken leaf phase costs
                def probe_leaf2(args, m=(metas[0] & (7 << 3)),
                                h=hits[0] & (metas[0] == -19 - c)):
                    return leaf_phase(m, h, *args)

                t_best, best = jax.lax.cond(
                    anys[0] + c > c, probe_leaf2, lambda args: args,
                    (t_best, best),
                )
            for c in range(probes.get("when", 0)):
                # never-taken predicated store (branch overhead only)
                @pl.when((anys[0] > 0) & (metas[0] == -77 - c))
                def _(c=c):
                    stack_ref[sp] = metas[0] + c

            for c in range(probes.get("whentaken", 0)):
                # always-taken predicated store to the dead slot at sp
                # (slots >= sp are never read; real pushes overwrite)
                @pl.when(anys[0] + c >= c)
                def _(c=c):
                    stack_ref[sp] = metas[0] + c

            if probes:
                # provably zero, but only by range analysis the compiler
                # does not perform — keeps every probe live
                sp = sp + jnp.minimum(jnp.abs(junk), 0)
            # nearest internal hit = cur; push the rest far-to-near
            for m, go in reversed(pending):
                later = nxt != DONE

                @pl.when(go & later)
                def _(m=m):
                    # nxt (nearer candidates come later in this loop) —
                    # push the current farther candidate
                    stack_ref[sp] = nxt

                sp = jnp.where(go & later, sp + 1, sp)
                nxt = jnp.where(go, m, nxt)

            need = nxt == DONE
            can = sp > 0
            popped = stack_ref[jnp.maximum(sp - 1, 0)]
            cur = jnp.where(need, jnp.where(can, popped, DONE), nxt)
            sp = jnp.where(need & can, sp - 1, sp)
            if early_exit:
                done = jnp.all((best >= 0) | ~live0)
                cur = jnp.where(done, DONE, cur)
            return cur, sp, nv, t_best, best

        _, _, nv, t_best, best = jax.lax.while_loop(
            cond, body,
            (jnp.int32(root_meta), jnp.int32(0), jnp.int32(0),
             t_best0, best0),
        )
        t_out[:] = t_best
        best_out[:] = best
        if count_visits:
            visits_out[0] = nv

    return kernel


def _gridless_kernel(tile_kernel_factory, early_exit, root_meta, n_tris, g,
                     tsub=SUB, count_visits=False, probe="", rowrec=False):
    """Wrap a per-tile kernel body into a single gridless invocation.

    With a grid, Pallas re-stages the full node/tri tables from HBM on
    EVERY grid step (~1ms for ~2.4MB) — that re-fetch, not the walk body,
    dominated kernel time. Gridless, the tables are fetched once and an
    in-kernel fori loops over ray tiles with dynamic sublane slices.
    """
    tile_kernel = tile_kernel_factory(early_exit, root_meta, n_tris,
                                      tsub=tsub, count_visits=count_visits,
                                      probe=probe, rowrec=rowrec)

    def kernel(table_ref, tris_ref, *refs):
        (ox, oy, oz, dx, dy, dz, tmn, tmx, act, t_out, best_out, visits_out,
         stack_ref) = refs

        def run_tile(i, _):
            sl = pl.ds(i * tsub, tsub)

            class View:
                def __init__(self, ref):
                    self.ref = ref

                def __getitem__(self, idx):
                    if idx == slice(None):
                        return self.ref[sl, :]
                    raise KeyError(idx)

                def __setitem__(self, idx, v):
                    assert idx == slice(None)
                    self.ref[sl, :] = v

            class VisitView:
                """Row i of the (g, 1) per-tile visit-count output."""

                def __setitem__(self, idx, v):
                    visits_out[i, 0] = v

            tile_kernel(
                table_ref, tris_ref,
                View(ox), View(oy), View(oz), View(dx), View(dy), View(dz),
                View(tmn), View(tmx), View(act),
                View(t_out), View(best_out), VisitView(), stack_ref,
            )
            return 0

        jax.lax.fori_loop(0, g, run_tile, 0)

    return kernel


# ---------------------------------------------------------------------------
# bvh8t: transposed wide-node walk (round-2 kernel)

N8T_PER_BLOCK = 16   # nodes per (8, 128) node block (8 lanes each)
G8T_PER_BLOCK = 12   # tri groups per (8, 128) tri block (10 lanes each)


def _i32(x: int):
    """int32 constant with two's-complement wrap (0xFFFF0000 etc.)."""
    return jnp.int32(x - (1 << 32) if x >= (1 << 31) else x)


def _ffs(m, w: int):
    """Bit index of the lowest set bit of a w-bit scalar mask (m != 0).

    For w=32 the mask occupies the full int32 (bit 31 = sign bit); all
    the arithmetic below is two's-complement-wrap safe: m & (-m) isolates
    the low bit even for INT32_MIN, and the magic comparands are wrapped
    int32 constants."""
    low = m & (-m)
    if w == 32:
        slot = (
            ((low & _i32(0xAAAAAAAA)) != 0).astype(jnp.int32)
            | (((low & _i32(0xCCCCCCCC)) != 0).astype(jnp.int32) << 1)
            | (((low & _i32(0xF0F0F0F0)) != 0).astype(jnp.int32) << 2)
            | (((low & _i32(0xFF00FF00)) != 0).astype(jnp.int32) << 3)
            | (((low & _i32(0xFFFF0000)) != 0).astype(jnp.int32) << 4)
        )
        return slot, low
    slot = (
        ((low & 0xAAAA) != 0).astype(jnp.int32)
        | (((low & 0xCCCC) != 0).astype(jnp.int32) << 1)
        | (((low & 0xF0F0) != 0).astype(jnp.int32) << 2)
    )
    if w > 8:
        slot = slot | (((low & 0xFF00) != 0).astype(jnp.int32) << 3)
    return slot, low


def _t8_kernel(early_exit: bool, g: int, R: int, interpret: bool,
               W: int, NW: int, LG: int = 8, kn: int = 1,
               order: bool = False, lk: int = 1):
    """Transposed wide-node walk: children in SUBLANES, rays in LANES.

    Round-2 redesign targeting the measured per-visit latency wall (~0.7 us,
    docs/PERF_LOG.md): each visit of the previous kernels made ~7 serial
    vector->scalar round trips (meta/axis extracts + vote reductions), and
    the TPU's single in-order scalar core turns every one into a VPU sync.
    This kernel makes exactly ONE vector->scalar crossing per node visit:

    - the node's 8 child boxes are tested as pure (8, 128) vector ops
      (children in sublanes, rays in lanes; box coords are lane-column
      broadcasts of the rolled node block, ray data are sublane-row
      broadcasts) — zero scalar extracts for geometry;
    - the per-child hit votes collapse into one packed bitmask via a
      lanes-axis reduce + weighted sublane sum -> single scalar read;
    - per-node scalars come from an SMEM int32 table (scalar memory, no
      VPU sync) and the shared stack holds (child_base<<8 | bitmask)
      entries — a pop is ffs + clear, no per-slot select chains;
    - leaf children (contiguous transposed tri groups, slots 7-j) are
      intersected in an inner mask loop whose Moller-Trumbore runs fully
      in the vector domain (8 tris x 128 rays per op, argmin winners via
      sublane reductions) — zero additional scalar crossings.

    Winner parity vs ops/traverse.py holds by AABB containment (see module
    docstring); cross-leaf equal-t ties may resolve differently (visit
    order + merged-group argmin), the documented measure-zero caveat.

    Role replaced: OptiX hardware traversal (reference
    csrc/host/scene.cu:89-160, kernels/pathtracer.cu:34-99).
    """

    def roll_lanes(x, sh):
        if interpret:
            return jnp.roll(x, -sh, axis=1)
        return pltpu.roll(x, (LANE - sh) % LANE, axis=1)

    FLD = 6 if W == 32 else 5  # meta child-count field width (builder _t8_fld)
    # order splits each node's votes into near/far groups (2 masks/node)
    GPN = 2 if order else 1   # drained mask groups per node
    if (kn > 1 or order) and kn * W * GPN > 32:
        raise ValueError("drained vote masks must share one int32")
    # kn>1/order can hold several stack entries per depth level, so the
    # SMEM stack is allocated at that multiple (same t8_stack check)
    CAPW = STACK_CAP * (2 if W == 32 else max(kn * GPN, 1))

    def kernel(nodes_ref, tris_ref, meta_ref,
               ox, oy, oz, dx, dy, dz, tmn, tmx, act,
               t_out, best_out, visits_out, stack_ref):
        w_col = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        wt = jnp.left_shift(jnp.int32(1), w_col)            # (W, 1)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, LANE), 0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)

        def colb(x, k, n=SUB):
            return jnp.broadcast_to(
                jax.lax.slice(x, (0, k), (n, k + 1)), (n, LANE))

        def rowb(x, r, n=SUB):
            return jnp.broadcast_to(
                jax.lax.slice(x, (r, 0), (r + 1, LANE)), (n, LANE))

        def run_tile(i, _):
            # NW independent walks interleaved in ONE while body: each
            # visit has a single vector->scalar drain, so walk A's scalar
            # phase overlaps walk B's queued vector work (the round-1
            # multi-walk experiment failed only because its ~7 drains per
            # visit serialized on the scalar core).
            rays = []
            for wk in range(NW):
                sl = pl.ds((i * NW + wk) * R, R)
                o = (ox[sl, :], oy[sl, :], oz[sl, :])
                d = (dx[sl, :], dy[sl, :], dz[sl, :])
                inv = tuple(1.0 / c for c in d)
                rays.append((o, d, inv, tmn[sl, :],
                             (act[sl, :] > 0).astype(jnp.int32)))
                if W == 32:
                    # dual-slot stack: (base, mask) int32 pairs — a 32-bit
                    # mask can't share an int32 with its base
                    stack_ref[wk * CAPW] = jnp.int32(0)
                    stack_ref[wk * CAPW + 1] = jnp.int32(1)
                else:
                    stack_ref[wk * CAPW] = jnp.int32(1)  # root entry

            def visit(wk, st):
                """One node visit of walk wk (no-op when its stack is
                empty: want masks to zero, so no votes and no pushes)."""
                sp, nv, t_best, best = st
                o, d, inv, t_min, live0 = rays[wk]
                walk_on = (sp > 0).astype(jnp.int32)
                nv = nv + walk_on
                if W == 32:
                    top = wk * STACK_CAP * 2 + 2 * jnp.maximum(sp - 1, 0)
                    base = stack_ref[top]
                    mask = stack_ref[top + 1]
                    slot, low = _ffs(mask, W)
                    rem = mask - low
                    stack_ref[top + 1] = rem
                else:
                    e = stack_ref[wk * STACK_CAP + jnp.maximum(sp - 1, 0)]
                    mask = e & ((1 << W) - 1)
                    base = jax.lax.shift_right_logical(e, W)
                    slot, low = _ffs(mask, W)
                    rem = mask - low
                    stack_ref[wk * STACK_CAP + jnp.maximum(sp - 1, 0)] = (
                        (base << W) | rem)
                sp = jnp.where((rem == 0) & (sp > 0), sp - 1, sp)
                nid = jnp.where(walk_on > 0, base + slot, 0)

                m0 = meta_ref[nid, 0]
                m1 = meta_ref[nid, 1]
                cbase = jax.lax.shift_right_logical(m0, FLD)
                ni = m0 & ((1 << FLD) - 1)
                lbase = jax.lax.shift_right_logical(m1, FLD)
                nl = m1 & ((1 << FLD) - 1)

                blk = nodes_ref[pl.ds((nid // N8T_PER_BLOCK) * W, W), :]
                blk = roll_lanes(blk, (nid % N8T_PER_BLOCK) * 8)
                box = [colb(blk, k, W) for k in range(6)]

                if early_exit:
                    want = live0 * (best == -1).astype(jnp.int32) * walk_on
                else:
                    want = live0 * walk_on

                cnt = jnp.zeros((W, 1), jnp.int32)
                hits = []
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
                         & (t0 <= rowb(t_best, r, W)) & (rowb(want, r, W) > 0))
                    hits.append(h)
                    cnt = cnt + jnp.sum(h.astype(jnp.int32), axis=1,
                                        keepdims=True)

                # empty child slots must not vote: their NaN boxes rely
                # on NaN-propagating min/max, but the real TPU VPU drops
                # NaNs (minNum/maxNum semantics), making empty slots hit
                # everything — mask by slot validity instead (scalar ni/nl
                # broadcasts; interpret mode is unaffected either way)
                valid = (w_col < ni) | (w_col >= W - nl)
                bits = jnp.where((cnt > 0) & valid, wt, 0)
                mask_s = jnp.sum(bits)       # the ONE vector->scalar drain
                if early_exit:
                    aw = jnp.sum(want)

                if W == 32:
                    # ni may be 32 (full internal fan-out): 1<<32 is UB in
                    # int32, so clamp the shift and select the full mask
                    part = mask_s & ((jnp.int32(1) << (ni & 31)) - 1)
                    imask = jnp.where(ni >= 32, mask_s, part)

                    @pl.when(imask != 0)
                    def _():
                        pos = wk * STACK_CAP * 2 + 2 * sp
                        stack_ref[pos] = cbase
                        stack_ref[pos + 1] = imask
                else:
                    imask = mask_s & ((jnp.int32(1) << ni) - 1)

                    @pl.when(imask != 0)
                    def _():
                        stack_ref[wk * STACK_CAP + sp] = (cbase << W) | imask

                sp = jnp.where(imask != 0, sp + 1, sp)

                # remaining hit bits sit in leaf child slots s = W-1-j
                # (empty slots have NaN boxes and can never vote)
                def lcond(lc):
                    return lc[0] != 0

                def lbody(lc):
                    lm, nv, t_best, best = lc
                    nv = nv + (1 << 16)
                    s, llow = _ffs(lm, W)
                    lm = lm - llow
                    q = lbase + (W - 1 - s)
                    tb = tris_ref[pl.ds((q // G8T_PER_BLOCK) * LG, LG), :]
                    tb = roll_lanes(tb, (q % G8T_PER_BLOCK) * 10)
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
                                     axis=0, keepdims=True)      # (1, 128)
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
                        ok = ((den != 0.0)
                              & (u >= -BARY_EPS) & (u <= 1.0 + BARY_EPS)
                              & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                              & (t >= rowb(t_min, r, LG))
                              & (t <= jnp.broadcast_to(tb_row, (LG, LANE)))
                              & hm8)
                        t_sl = jnp.where(ok, t, INF)
                        tg = jnp.min(t_sl, axis=0, keepdims=True)  # (1, 128)
                        tg8 = jnp.broadcast_to(tg, (LG, LANE))
                        idw = jnp.min(
                            jnp.where(t_sl == tg8, idb, jnp.int32(1 << 30)),
                            axis=0, keepdims=True)
                        # row-r writeback: static sublane mask select
                        # (Mosaic has no dynamic_update_slice)
                        sel_r = row_iota == r
                        updR = jnp.broadcast_to(tg, (R, LANE)) < INF
                        take = sel_r & updR
                        t_best = jnp.where(
                            take, jnp.broadcast_to(tg, (R, LANE)), t_best)
                        best = jnp.where(
                            take, jnp.broadcast_to(idw, (R, LANE)), best)
                    return lm, nv, t_best, best

                _, nv, t_best, best = jax.lax.while_loop(
                    lcond, lbody, (mask_s - imask, nv, t_best, best))

                if early_exit:
                    sp = jnp.where(aw == 0, 0, sp)
                return sp, nv, t_best, best

            def visitk(wk, st):
                """KN trip: up to KN node visits of walk wk (pop KN
                child bits from the top stack entry, test every node's
                boxes, pack all vote masks into the ONE drain — node j
                in bits j*W..(j+1)*W-1, KN*W <= 32). Visit count and
                vector work are unchanged vs visit(); the serial
                per-trip program (pop/meta/drain-sync/push), which the
                round-3 probes measured as the per-iteration floor, is
                amortized over KN nodes."""
                sp, nv, t_best, best = st
                o, d, inv, t_min, live0 = rays[wk]
                walk_on = (sp > 0).astype(jnp.int32)
                top = wk * CAPW + jnp.maximum(sp - 1, 0)
                e = stack_ref[top]
                mask = e & ((1 << W) - 1)
                base = jax.lax.shift_right_logical(e, W)
                slots, ons = [], []
                rem = mask
                for j in range(kn):
                    on = walk_on if j == 0 else (
                        walk_on * (rem != 0).astype(jnp.int32))
                    s_j, low_j = _ffs(rem, W)   # (0, 0) when rem == 0
                    slots.append(s_j)
                    ons.append(on)
                    rem = rem - low_j
                stack_ref[top] = (base << W) | rem
                sp = jnp.where((rem == 0) & (sp > 0), sp - 1, sp)
                nids = [jnp.where(ons[j] > 0, base + slots[j], 0)
                        for j in range(kn)]
                for j in range(kn):
                    nv = nv + ons[j]

                cbases, nis, lbases = [], [], []
                boxes = []
                for j in range(kn):
                    m0 = meta_ref[nids[j], 0]
                    m1 = meta_ref[nids[j], 1]
                    cbases.append(jax.lax.shift_right_logical(m0, FLD))
                    nis.append(m0 & ((1 << FLD) - 1))
                    lbases.append(jax.lax.shift_right_logical(m1, FLD))
                    blk = nodes_ref[
                        pl.ds((nids[j] // N8T_PER_BLOCK) * W, W), :]
                    blk = roll_lanes(blk, (nids[j] % N8T_PER_BLOCK) * 8)
                    boxes.append([colb(blk, k, W) for k in range(6)])
                    nls_j = m1 & ((1 << FLD) - 1)
                    if j == 0:
                        nls = [nls_j]
                    else:
                        nls.append(nls_j)

                if early_exit:
                    want = live0 * (best == -1).astype(jnp.int32) * walk_on
                else:
                    want = live0 * walk_on

                cnts = [jnp.zeros((W, 1), jnp.int32) for _ in range(kn)]
                ksums = [jnp.zeros((W, 1), jnp.float32) for _ in range(kn)]
                hits_k = [[] for _ in range(kn)]
                for r in range(R):
                    wb = rowb(want, r, W) > 0
                    tmb = rowb(t_min, r, W)
                    tbb = rowb(t_best, r, W)
                    for j in range(kn):
                        box = boxes[j]
                        t0 = jnp.full((W, LANE), -INF)
                        t1 = jnp.full((W, LANE), INF)
                        for ax in range(3):
                            ob = rowb(o[ax], r, W)
                            ib = rowb(inv[ax], r, W)
                            a = (box[ax] - ob) * ib
                            b = (box[3 + ax] - ob) * ib
                            t0 = jnp.maximum(t0, jnp.minimum(a, b))
                            t1 = jnp.minimum(t1, jnp.maximum(a, b))
                        h = (t0 <= t1) & (t1 >= tmb) & (t0 <= tbb) & wb
                        hits_k[j].append(h)
                        cnts[j] = cnts[j] + jnp.sum(
                            h.astype(jnp.int32), axis=1, keepdims=True)
                        if order:
                            # consensus entry distance for near/far split
                            ksums[j] = ksums[j] + jnp.sum(
                                jnp.where(h, jnp.maximum(t0, 0.0), 0.0),
                                axis=1, keepdims=True)

                bits = jnp.zeros((W, 1), jnp.int32)
                for j in range(kn):
                    valid = (w_col < nis[j]) | (w_col >= W - nls[j])
                    hitv = (cnts[j] > 0) & valid
                    if order:
                        # near = children whose mean entry distance is at
                        # most the mean over hit children (vector-only:
                        # sublane reductions, no extra drain). Votes go
                        # to bits (2j)W (near) / (2j+1)W (far); far
                        # entries are pushed below near, so the walk
                        # descends front-to-back and t_best tightens
                        # before far subtrees are expanded.
                        mean = ksums[j] / jnp.maximum(
                            cnts[j].astype(jnp.float32), 1.0)
                        nh = jnp.sum(hitv.astype(jnp.float32), axis=0,
                                     keepdims=True)
                        tot = jnp.sum(jnp.where(hitv, mean, 0.0), axis=0,
                                      keepdims=True)
                        thr = tot / jnp.maximum(nh, 1.0)
                        near = mean <= jnp.broadcast_to(thr, (W, 1))
                        wt_n = jnp.left_shift(
                            jnp.int32(1), w_col + 2 * j * W)
                        wt_f = jnp.left_shift(
                            jnp.int32(1), w_col + (2 * j + 1) * W)
                        vote = (jnp.where(hitv & near, wt_n, 0)
                                + jnp.where(hitv & ~near, wt_f, 0))
                    else:
                        # node j's votes in bits j*W.. (shift<=31)
                        wt_j = wt if j == 0 else jnp.left_shift(
                            jnp.int32(1), w_col + j * W)
                        vote = jnp.where(hitv, wt_j, 0)
                    bits = bits + (vote if j == 0 else vote * ons[j])
                mask_s = jnp.sum(bits)       # the ONE vector->scalar drain
                if early_exit:
                    aw = jnp.sum(want)

                imasks, lmasks = [], []
                fmasks = []
                for j in range(kn):
                    mask_j = jax.lax.shift_right_logical(
                        mask_s, GPN * j * W) & ((1 << W) - 1)
                    imask_j = mask_j & ((jnp.int32(1) << nis[j]) - 1)
                    imasks.append(imask_j)
                    lmask_j = mask_j - imask_j
                    if order:
                        far_j = jax.lax.shift_right_logical(
                            mask_s, (2 * j + 1) * W) & ((1 << W) - 1)
                        fmasks.append(far_j & ((jnp.int32(1) << nis[j]) - 1))
                        lmask_j = lmask_j + (far_j - fmasks[j])
                    lmasks.append(lmask_j)

                push = list(zip(fmasks, cbases)) if order else []
                push += list(zip(imasks, cbases))
                for imask_j, cbase_j in push:
                    sp_j = sp

                    @pl.when(imask_j != 0)
                    def _(imask_j=imask_j, cbase_j=cbase_j, sp_j=sp_j):
                        stack_ref[wk * CAPW + sp_j] = (
                            (cbase_j << W) | imask_j)

                    sp = sp + (imask_j != 0).astype(jnp.int32)

                def leaf_loop(lm0, lbase, hits, nv, t_best, best):
                    def mt_one(s, on, t_best, best):
                        """One leaf group's Moller-Trumbore (group s of
                        this node). on=None: unconditionally valid; else
                        a scalar guard (lk>1 pairing may run out of
                        pending groups — a guarded-off slot reads group
                        0 and contributes nothing)."""
                        q = lbase + (W - 1 - s)
                        if on is not None:
                            q = jnp.where(on, q, 0)
                        tb = tris_ref[pl.ds((q // G8T_PER_BLOCK) * LG, LG),
                                      :]
                        tb = roll_lanes(tb, (q % G8T_PER_BLOCK) * 10)
                        p0 = [colb(tb, k, LG) for k in range(3)]
                        e1 = [colb(tb, 3 + k, LG) for k in range(3)]
                        e2 = [colb(tb, 6 + k, LG) for k in range(3)]
                        idb = jnp.broadcast_to(
                            jax.lax.bitcast_convert_type(
                                jax.lax.slice(tb, (0, 9), (LG, 10)),
                                jnp.int32),
                            (LG, LANE))
                        sel = w_iota == s
                        for r in range(R):
                            hm = jnp.sum((hits[r] & sel).astype(jnp.int32),
                                         axis=0, keepdims=True)  # (1, 128)
                            hm8 = jnp.broadcast_to(hm, (LG, LANE)) > 0
                            if on is not None:
                                hm8 = hm8 & on
                            dr = [rowb(d[ax], r, LG) for ax in range(3)]
                            orr = [rowb(o[ax], r, LG) for ax in range(3)]
                            pv0 = dr[1] * e2[2] - dr[2] * e2[1]
                            pv1 = dr[2] * e2[0] - dr[0] * e2[2]
                            pv2 = dr[0] * e2[1] - dr[1] * e2[0]
                            den = pv0 * e1[0] + pv1 * e1[1] + pv2 * e1[2]
                            sden = jnp.where(den == 0.0, 1.0, den)
                            tv = [orr[k] - p0[k] for k in range(3)]
                            u = (pv0 * tv[0] + pv1 * tv[1]
                                 + pv2 * tv[2]) / sden
                            qv0 = tv[1] * e1[2] - tv[2] * e1[1]
                            qv1 = tv[2] * e1[0] - tv[0] * e1[2]
                            qv2 = tv[0] * e1[1] - tv[1] * e1[0]
                            v = (qv0 * dr[0] + qv1 * dr[1]
                                 + qv2 * dr[2]) / sden
                            t = (qv0 * e2[0] + qv1 * e2[1]
                                 + qv2 * e2[2]) / sden
                            tb_row = jax.lax.slice(
                                t_best, (r, 0), (r + 1, LANE))
                            ok = ((den != 0.0)
                                  & (u >= -BARY_EPS) & (u <= 1.0 + BARY_EPS)
                                  & (v >= -BARY_EPS)
                                  & (u + v <= 1.0 + BARY_EPS)
                                  & (t >= rowb(t_min, r, LG))
                                  & (t <= jnp.broadcast_to(
                                      tb_row, (LG, LANE)))
                                  & hm8)
                            sel_r = row_iota == r
                            if early_exit:
                                # any-hit: no winner argmin, no t_best
                                # refinement — only the hit/miss verdict
                                # is consumed (occluded(), prim >= 0);
                                # want drops the lane next visit anyway
                                occ = jnp.sum(ok.astype(jnp.int32),
                                              axis=0, keepdims=True)
                                take = sel_r & (jnp.broadcast_to(
                                    occ, (R, LANE)) > 0)
                                best = jnp.where(take, jnp.int32(0), best)
                                continue
                            t_sl = jnp.where(ok, t, INF)
                            tg = jnp.min(t_sl, axis=0, keepdims=True)
                            tg8 = jnp.broadcast_to(tg, (LG, LANE))
                            idw = jnp.min(
                                jnp.where(t_sl == tg8, idb,
                                          jnp.int32(1 << 30)),
                                axis=0, keepdims=True)
                            updR = jnp.broadcast_to(tg, (R, LANE)) < INF
                            take = sel_r & updR
                            t_best = jnp.where(
                                take, jnp.broadcast_to(tg, (R, LANE)),
                                t_best)
                            best = jnp.where(
                                take, jnp.broadcast_to(idw, (R, LANE)),
                                best)
                        return t_best, best

                    def lcond(lc):
                        return lc[0] != 0

                    def lbody(lc):
                        lm, nv, t_best, best = lc
                        nv = nv + (1 << 16)
                        s, llow = _ffs(lm, W)
                        lm = lm - llow
                        t_best, best = mt_one(s, None, t_best, best)
                        for _ in range(lk - 1):
                            # pair further pending groups into this trip
                            # (same vector work; the serial trip floor is
                            # amortized exactly like K2 node pairing)
                            on = lm != 0
                            s2, low2 = _ffs(lm, W)
                            lm = lm - low2
                            nv = nv + jnp.where(
                                on, jnp.int32(1 << 16), jnp.int32(0))
                            t_best, best = mt_one(s2, on, t_best, best)
                        return lm, nv, t_best, best

                    return jax.lax.while_loop(
                        lcond, lbody, (lm0, nv, t_best, best))

                for j in range(kn):
                    _, nv, t_best, best = leaf_loop(
                        lmasks[j], lbases[j], hits_k[j], nv, t_best, best)

                if early_exit:
                    sp = jnp.where(aw == 0, 0, sp)
                return sp, nv, t_best, best

            def cond(c):
                alive = c[0][0] > 0
                for wk in range(1, NW):
                    alive = alive | (c[wk][0] > 0)
                return alive

            def body(c):
                step = visitk if (kn > 1 or order) else visit
                return tuple(step(wk, c[wk]) for wk in range(NW))

            init = tuple(
                (jnp.int32(1), jnp.int32(0),
                 tmx[pl.ds((i * NW + wk) * R, R), :],
                 jnp.full((R, LANE), -1, jnp.int32))
                for wk in range(NW)
            )
            out = jax.lax.while_loop(cond, body, init)
            for wk in range(NW):
                sl = pl.ds((i * NW + wk) * R, R)
                _, nv, t_best, best = out[wk]
                t_out[sl, :] = t_best
                best_out[sl, :] = best
                visits_out[i * NW + wk, 0] = nv
            return 0

        jax.lax.fori_loop(0, g // NW, run_tile, 0)

    return kernel




def _t8_brute_kernel(g: int, R: int, interpret: bool, LG: int, NG: int):
    """Scalar-free brute-force triangle kernel for SMALL scenes.

    The bvh8t walk pays a ~2.2-2.6us *serial* wall per node/leaf
    iteration (scalar pops, SMEM meta reads, the vector->scalar drain —
    docs/PERF_LOG.md round 3). For scenes of a few hundred tris the tree
    is 1-2 levels deep and a tile's lockstep union touches most leaf
    groups anyway, so the BVH machinery is pure overhead: cb_texture
    (972 tris) spent 3.3s of a 4.5s render inside the walk kernels.

    This kernel drops the tree entirely: a static fori over ALL tri
    groups, Moller-Trumbore fully in the vector domain, not a single
    vector->scalar crossing or SMEM access in the loop — Mosaic can
    software-pipeline it at vector throughput. Reuses the bvh8t
    transposed tri blocks (group roll is a vector op); padded group
    slots hold zero triangles whose MT denominator is 0, so testing
    them is harmless.

    Selected by intersect_tris_pallas when the group count is at most
    TPU_RT_BRUTE_GROUPS (winner parity with the walk holds: same MT,
    same seam-inclusive bounds, min-t with min-id group ties).

    MEASURED NEGATIVE end-to-end (default off): despite ~6x better
    per-iteration probe cost, the walk still wins on real renders
    (cb 14.14 vs 10.67, cb_texture 3.74 vs 1.98 Mrays/s) because the
    walk prunes most groups per tile even on small scenes while brute
    pays all of them for every tile. The earlier ns/iter comparison
    was also partly a measurement artifact — bench_t8's sync-per-call
    timing includes the remote-tunnel dispatch floor."""

    def roll_lanes(x, sh):
        if interpret:
            return jnp.roll(x, -sh, axis=1)
        return pltpu.roll(x, (LANE - sh) % LANE, axis=1)

    def kernel(tris_ref, ox, oy, oz, dx, dy, dz, tmn, tmx, act,
               t_out, best_out):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)

        def colb(x, k, n):
            return jnp.broadcast_to(
                jax.lax.slice(x, (0, k), (n, k + 1)), (n, LANE))

        def rowb(x, r, n):
            return jnp.broadcast_to(
                jax.lax.slice(x, (r, 0), (r + 1, LANE)), (n, LANE))

        def run_tile(i, _):
            sl = pl.ds(i * R, R)
            o = (ox[sl, :], oy[sl, :], oz[sl, :])
            d = (dx[sl, :], dy[sl, :], dz[sl, :])
            t_min = tmn[sl, :]
            live = (act[sl, :] > 0)
            t_best0 = tmx[sl, :]

            def group(q, st):
                t_best, best = st
                tb = tris_ref[pl.ds((q // G8T_PER_BLOCK) * LG, LG), :]
                tb = roll_lanes(tb, (q % G8T_PER_BLOCK) * 10)
                p0 = [colb(tb, k, LG) for k in range(3)]
                e1 = [colb(tb, 3 + k, LG) for k in range(3)]
                e2 = [colb(tb, 6 + k, LG) for k in range(3)]
                idb = jnp.broadcast_to(
                    jax.lax.bitcast_convert_type(
                        jax.lax.slice(tb, (0, 9), (LG, 10)), jnp.int32),
                    (LG, LANE))
                for r in range(R):
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
                    ok = ((den != 0.0)
                          & (u >= -BARY_EPS) & (u <= 1.0 + BARY_EPS)
                          & (v >= -BARY_EPS) & (u + v <= 1.0 + BARY_EPS)
                          & (t >= rowb(t_min, r, LG))
                          & (t <= jnp.broadcast_to(tb_row, (LG, LANE))))
                    t_sl = jnp.where(ok, t, INF)
                    tg = jnp.min(t_sl, axis=0, keepdims=True)   # (1, 128)
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
                return t_best, best

            t_best, best = jax.lax.fori_loop(
                0, NG, group,
                (t_best0, jnp.full((R, LANE), -1, jnp.int32)))
            best = jnp.where(live, best, -1)
            t_out[sl, :] = t_best
            best_out[sl, :] = best
            return 0

        jax.lax.fori_loop(0, g, run_tile, 0)

    return kernel


@partial(jax.jit, static_argnums=(0,))
def _t8_brute_tiles(shape_key, tris, cols):
    interpret, R, LG, NG = shape_key
    g = cols[0].shape[0] // R
    kernel = _t8_brute_kernel(g, R, interpret, LG, NG)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((g * R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g * R, LANE), jnp.int32),
        ),
        in_specs=[full] + [full] * 9,
        out_specs=(full, full),
        interpret=interpret,
    )(tris, *cols)


def brute_groups_max() -> int:
    """Group-count threshold below which the brute kernel replaces the
    walk. Default 0 = never: the end-to-end A/B measured the brute
    kernel a clear LOSS even on the smallest scenes (cb 10.67 vs 14.14
    Mrays/s, cb_texture 1.98 vs 3.74 — docs/PERF_LOG.md round 3), the
    per-iteration probe numbers notwithstanding: the walk skips most
    groups per tile even on small scenes, while brute pays all of them.
    Kept as an opt-in knob (TPU_RT_BRUTE_GROUPS=N) with a tested
    parity path."""
    import os as _o

    return int(_o.environ.get("TPU_RT_BRUTE_GROUPS", "0"))


@partial(jax.jit, static_argnums=(0, 4))
def _t8_tiles(shape_key, nodes, tris, meta, early_exit, cols):
    interpret, R, W, NW, LG = shape_key[:5]
    kn = int(shape_key[5]) if len(shape_key) > 5 else 1
    order = bool(shape_key[6]) if len(shape_key) > 6 else False
    lk = int(shape_key[7]) if len(shape_key) > 7 else 1
    g = cols[0].shape[0] // R
    kernel = _t8_kernel(early_exit, g, R, interpret, W, NW, LG, kn, order,
                        lk)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((g * R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g * R, LANE), jnp.int32),
            jax.ShapeDtypeStruct((g, 1), jnp.int32),
        ),
        in_specs=[full, full, pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [full] * 9,
        out_specs=(full, full, pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM(
            (NW * STACK_CAP
             * (2 if W == 32 else max(kn * (2 if order else 1), 1)),),
            jnp.int32)],
        interpret=interpret,
    )(nodes, tris, meta, *cols)


def t8_rows() -> int:
    """Ray rows per bvh8t walk tile (tile = rows*128 rays).

    Default 4 (with W=16/NW=1) from the round-3 honest knob re-sweep —
    the round-2 R=8/NW=2 choice was measured on the corrupted renderer
    (docs/PERF_LOG.md). Must be >= 4 (Mosaic sublane-tile constraints
    reject R=1/2)."""
    import os as _o

    return max(1, int(_o.environ.get("TPU_RT_T8_R", "4")))


def t8_kn(width: int) -> int:
    """Node visits per while trip (TPU_RT_T8_K, default 2): same visit
    count and vector work, 1/K the serial per-trip overhead
    (pop/drain/push). Measured at K=2 (cbbunny 8spp, interleaved
    repeats): bunny 5.42 -> 5.62, transforms 4.47 -> 4.80, W8 bunny
    4.71 -> 5.33; cb (16-tri box) loses ~5% (extra slots mostly empty
    on a 1-level tree) and cb_texture is flat (texture-bound). Clamped
    so all K W-bit vote masks share the one drained int32 (K*W <= 32;
    W=32 always runs K=1). TPU_RT_T8_K2=0 is honoured as K=1 for
    back-compat with the knob's first landing."""
    import os as _o

    if _o.environ.get("TPU_RT_T8_K2") == "0":
        return 1
    k = int(_o.environ.get("TPU_RT_T8_K", "2"))
    return max(1, min(k, 32 // (width * (2 if t8_order() else 1))))


def t8_lk() -> int:
    """Leaf groups per leaf-loop trip (TPU_RT_T8_LK): pairs further
    pending groups into one while trip — same vector work, the serial
    trip floor amortized exactly like K2 node pairing. Only the
    visitk path (K>1 or ordered) has the pairing."""
    import os as _o

    return max(1, int(_o.environ.get("TPU_RT_T8_LK", "1")))


def t8_order() -> bool:
    """Near/far ordered pushes (TPU_RT_T8_ORDER): each visit splits its
    hit children into near/far groups by consensus entry distance (two
    W-bit masks per node in the one drained int32) and pushes far below
    near, so the walk descends front-to-back and t_best tightens before
    far subtrees expand. Costs half the drain bits, so K halves."""
    import os as _o

    return _o.environ.get("TPU_RT_T8_ORDER", "0") == "1"


def t8_nwalk() -> int:
    """Interleaved independent walks per while body (latency hiding).

    Default 1: on the honest renderer interleaving LOSES (round-3
    re-sweep: NW=1 4.53 vs NW=2 4.11 vs NW=4 3.76 at W=8R=8) — the body
    is scalar-throughput-bound, so a second walk only lengthens the
    serial scalar program per iteration."""
    import os as _o

    return max(1, int(_o.environ.get("TPU_RT_T8_NWALK", "1")))


@partial(jax.jit, static_argnums=(0, 3))
def _quad_tiles(shape_key, quads_pk, tris_pk, early_exit, cols):
    root_meta, n_tris, interpret, tsub, count_visits, probe, rowrec = shape_key
    g = cols[0].shape[0] // tsub
    kernel = _gridless_kernel(_quad_kernel, early_exit, root_meta, n_tris, g,
                              tsub=tsub, count_visits=count_visits,
                              probe=probe, rowrec=rowrec)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((g * tsub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g * tsub, LANE), jnp.int32),
            jax.ShapeDtypeStruct((g, 1), jnp.int32),
        ),
        in_specs=[full_spec] * 11,
        out_specs=(full_spec, full_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        interpret=interpret,
    )(quads_pk, tris_pk, *cols)


@partial(jax.jit, static_argnums=(0, 3))
def _pair_tiles(shape_key, pairs_pk, tris_pk, early_exit, cols):
    root_meta, n_tris, interpret = shape_key
    g = cols[0].shape[0] // SUB
    kernel = _pair_kernel(early_exit, root_meta, n_tris)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=(
            jax.ShapeDtypeStruct((g * SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g * SUB, LANE), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            *[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] * 9,
        ],
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)],
        interpret=interpret,
    )(pairs_pk, tris_pk, *cols)


@partial(jax.jit, static_argnums=(0, 3))
def _walk_tiles(shape_key, nodes_pk, tris_pk, early_exit, cols):
    """cols = (ox..tmx, act) stacked (G*SUB, LANE) arrays."""
    sentinel, n_tris, interpret = shape_key
    g = cols[0].shape[0] // SUB
    kernel = _walk_kernel(early_exit, sentinel, n_tris)
    grid = (g,)
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((g * SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((g * SUB, LANE), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed node rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed tri rows
            *[pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] * 9,
        ],
        out_specs=(ray_spec, ray_spec),
        interpret=interpret,
    )(nodes_pk, tris_pk, *cols)
    return out


def tile_k() -> int:
    """Walk-tile width multiplier: a tile is (8*K, 128) = K*1024 rays.

    K>1 amortizes the per-visit scalar program across K vector subtiles
    (docs/PERF_LOG.md round-2 experiments)."""
    import os as _o

    return max(1, int(_o.environ.get("TPU_RT_TILE_K", "1")))


def intersect_tris_pallas(ds, origin, direction, t_min, t_max, active,
                          early_exit=False, with_visits=False, blas=None,
                          t8_chunk=None):
    """Triangle-closest-hit via the lockstep kernel. Returns (t, best).

    with_visits=True additionally returns the per-tile visit counts (g,)
    — diagnostics for BVH quality / kernel tuning. blas selects a shared-
    BLAS accel (instanced geometry, object-space rays); t8_chunk selects
    one VMEM-sized subtree chunk of a big scene (bvh8t only).
    """
    av = _accel_of(ds, blas)
    if t8_chunk is not None:
        n, m, t = ds.t8_chunks[t8_chunk]
        stk = ds.meta.t8_chunk_meta[t8_chunk][0]
        av = av._replace(t8_nodes=n, t8_meta=m, t8_tris=t, t8_stack=stk)
    B = origin.shape[0]
    kind = _kernel_kind()
    k = tile_k()
    tsub = t8_rows() if kind == "bvh8t" else SUB * k
    nw = t8_nwalk() if kind == "bvh8t" else 1
    pad = (-B) % (tsub * LANE * nw)
    total = B + pad

    def col(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x
        return x.reshape(total // LANE, LANE)

    cols = (
        col(origin[:, 0], 0.0), col(origin[:, 1], 0.0), col(origin[:, 2], 0.0),
        col(direction[:, 0], 1.0), col(direction[:, 1], 1.0),
        col(direction[:, 2], 1.0),
        col(t_min, 0.0), col(t_max, -1.0),
        col(active.astype(jnp.int32), 0),
    )
    interpret = jax.default_backend() != "tpu"
    import os as _o

    visits = None
    if kind == "bvh8t":
        if av.t8_stack > STACK_CAP:
            raise ValueError(
                f"bvh8t stack bound {av.t8_stack} exceeds {STACK_CAP}"
            )
        lg = int(ds.meta.t8_leaf)
        ng = av.t8_tris.shape[0] // lg * G8T_PER_BLOCK
        if t8_chunk is None and ng <= brute_groups_max():
            # opt-in scalar-free brute kernel (default off — measured
            # slower than the walk end-to-end, see brute_groups_max)
            t, best = _t8_brute_tiles(
                (interpret, tsub, lg, ng), av.t8_tris, cols)
            visits = jnp.zeros((cols[0].shape[0] // tsub, 1), jnp.int32)
        else:
            w = int(ds.meta.t8_width)
            t, best, visits = _t8_tiles(
                (interpret, tsub, w, t8_nwalk(), lg, t8_kn(w),
                 t8_order() and w <= 16, t8_lk()),
                av.t8_nodes, av.t8_tris, av.t8_meta, early_exit, cols,
            )
    elif kind in ("quad", "quadrow"):
        if av.bvh4_stack > STACK_CAP:
            raise ValueError(
                f"BVH4 stack bound {av.bvh4_stack} exceeds {STACK_CAP}"
            )
        rowrec = kind == "quadrow"
        root = av.root_meta4r if rowrec else av.root_meta4
        nodes, tris = ((av.quad_rows, av.tri_rows) if rowrec
                       else (av.recs_pk, av.tris_pk))
        shape_key = (int(root), int(av.n_tris), interpret,
                     tsub, with_visits,
                     _o.environ.get("TPU_RT_KERNEL_PROBE", ""), rowrec)
        t, best, visits = _quad_tiles(
            shape_key, nodes, tris, early_exit, cols
        )
    elif kind == "pair":
        if av.bvh2_depth > STACK_CAP:
            raise ValueError(
                f"BVH depth {av.bvh2_depth} exceeds stack cap {STACK_CAP}"
            )
        shape_key = (int(av.root_meta), int(av.n_tris), interpret)
        t, best = _pair_tiles(shape_key, av.rows_pk, av.tris_pk,
                              early_exit, cols)
    else:
        sentinel = int(av.n_nodes)  # static per scene
        shape_key = (sentinel, int(av.n_tris), interpret)
        t, best = _walk_tiles(shape_key, av.nodes_pk, av.tris_pk,
                              early_exit, cols)
    t = t.reshape(-1)[:B]
    best = best.reshape(-1)[:B]
    if with_visits:
        return t, best, visits[:, 0]
    return t, best
