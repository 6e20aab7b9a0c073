"""Batched scene intersection: stackless skip-link BVH traversal (device).

TPU-native replacement for the reference's per-ray DFS stack traversal
(raytracing-cpu/src/accel.rs:65-259) and OptiX hardware traversal: the whole
ray batch advances one BVH node per iteration of a masked while_loop; each
lane keeps only a node pointer (see accel/bvh.py for the skip-link layout).
Leaves intersect up to MAX_LEAF_SIZE triangles vectorized across the batch.
Analytic spheres are brute-forced in object space before traversal so their
t tightens BVH pruning.

Winning primitive encoding: prim < n_tris -> triangle index (BVH order);
prim >= n_tris -> sphere index (prim - n_tris); prim < 0 -> miss.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.bvh import MAX_LEAF_SIZE
from ..device.scene_buffers import DeviceScene
from .intersect import ray_aabb, ray_sphere, ray_triangle, sphere_hit_geom
from .linalg import (
    apply_point, apply_vector, apply_vector_transposed, cross, dot, normalize,
)

INF = jnp.inf

# stack-based near-first traversal is the default; the skip-link walk
# remains as a debug/comparison fallback (TPU_RT_TRAVERSAL=skiplink)
import os as _os

_USE_STACK = _os.environ.get("TPU_RT_TRAVERSAL", "stack") == "stack"


def _use_pallas(ds) -> bool:
    """Lockstep Pallas traversal: default on TPU when tables fit VMEM.

    TPU_RT_PALLAS (auto | 1 | 0) is read PER CALL, not at import: the
    trace-mode bit-identity tests monkeypatch it after module import, and
    an import-frozen value silently routed every "pallas" leg of that
    matrix through the XLA walk (vacuous XLA-vs-XLA comparisons — round-5
    finding, same failure shape as the round-4 vacuous north-star test).
    """
    mode = _os.environ.get("TPU_RT_PALLAS", "auto")
    if mode == "0":
        return False
    from .traverse_pallas import supports

    if not supports(ds):
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def _intersect_stack(
    ds, origin, direction, t_min, t_max, t_best, best, active, early_exit,
    blas=None,
):
    """Near-first stack traversal over child-pair rows (ds.bvh2_rows).

    Each internal step gathers ONE 16-wide row holding both children's
    AABBs + metas, tests both slabs, descends into the nearer hit child and
    pushes the farther onto a per-lane register stack ((B, D) selects — D is
    the static tree depth). Near-first ordering tightens t_best early, so
    closest-hit visits far fewer nodes than a fixed-DFS skip-link walk —
    the iteration count is what a TPU while_loop pays for.

    Leaf phases are batched while-while style: the inner loop parks every
    live lane on a leaf meta, the outer loop intersects parked leaves.
    meta encoding: leaf -> (first<<3)|count (count>0), internal -> row<<3.

    blas selects a shared-BLAS accel (instanced geometry, object-space
    rays) instead of the main world-space accel; `best` is BLAS-local.
    """
    B = origin.shape[0]
    if blas is None:
        bvh2_rows, tri_pack = ds.bvh2_rows, ds.tri_pack
        n_tris = ds.meta.n_tris
        D = max(int(ds.meta.bvh2_depth), 1)
        root = ds.meta.root_meta
    else:
        bt = ds.blas_tables[blas]
        bvh2_rows, tri_pack = bt.bvh2_rows, bt.tri_pack
        n_tris, root, bvh2_depth = ds.meta.blas_meta[blas][:3]
        D = max(int(bvh2_depth), 1)
    inv_dir = 1.0 / direction

    DONE = jnp.int32(-1)
    cur0 = jnp.where(active, jnp.int32(root), DONE)
    if early_exit:
        cur0 = jnp.where(best >= 0, DONE, cur0)
    sp0 = jnp.zeros(B, jnp.int32)
    stack0 = jnp.zeros((B, D), jnp.int32)
    lane_iota = jnp.arange(D, dtype=jnp.int32)[None, :]

    def is_leaf(meta):
        return (meta & 7) > 0

    def pop(cur, sp, stack, do):
        """Lanes in `do` pop (or finish when their stack is empty)."""
        can = sp > 0
        top = jnp.sum(
            jnp.where(lane_iota == (sp - 1)[:, None], stack, 0), axis=1
        )
        cur = jnp.where(do, jnp.where(can, top, DONE), cur)
        sp = jnp.where(do & can, sp - 1, sp)
        return cur, sp

    def inner(cur, sp, stack, t_best):
        def cond(s):
            cur, _, _ = s
            return jnp.any((cur != DONE) & ~is_leaf(cur))

        def body(s):
            cur, sp, stack = s
            live = (cur != DONE) & ~is_leaf(cur)
            row = bvh2_rows[jnp.maximum(cur >> 3, 0)]
            tl0, tl1 = ray_aabb(origin, inv_dir, row[:, 0:3], row[:, 3:6])
            tr0, tr1 = ray_aabb(origin, inv_dir, row[:, 6:9], row[:, 9:12])
            hit_l = (tl0 <= tl1) & (tl1 >= t_min) & (tl0 <= t_best)
            hit_r = (tr0 <= tr1) & (tr1 >= t_min) & (tr0 <= t_best)
            meta_l = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
            meta_r = jax.lax.bitcast_convert_type(row[:, 13], jnp.int32)

            both = hit_l & hit_r & live
            l_near = tl0 <= tr0
            near = jnp.where(l_near, meta_l, meta_r)
            far = jnp.where(l_near, meta_r, meta_l)

            # push the far child when both hit
            stack = jnp.where(
                (both[:, None]) & (lane_iota == sp[:, None]),
                far[:, None], stack,
            )
            sp = jnp.where(both, sp + 1, sp)

            one = (hit_l ^ hit_r) & live
            nxt = jnp.where(both, near, jnp.where(hit_l, meta_l, meta_r))
            cur = jnp.where(live & (both | one), nxt, cur)
            none = live & ~hit_l & ~hit_r
            cur, sp = pop(cur, sp, stack, none)
            return cur, sp, stack

        return jax.lax.while_loop(cond, body, (cur, sp, stack))

    def outer_cond(state):
        cur, _, _, _, _ = state
        return jnp.any(cur != DONE)

    def outer_body(state):
        cur, sp, stack, t_best, best = state
        cur, sp, stack = inner(cur, sp, stack, t_best)

        do_leaf = (cur != DONE) & is_leaf(cur)
        count = jnp.where(do_leaf, cur & 7, 0)
        first = jnp.maximum(cur >> 3, 0)
        offs = jnp.arange(MAX_LEAF_SIZE, dtype=jnp.int32)
        tid = jnp.minimum(first[:, None] + offs[None, :], n_tris - 1)
        lane_ok = do_leaf[:, None] & (offs[None, :] < count[:, None])
        pack = tri_pack[tid]
        valid, t, _, _ = ray_triangle(
            origin[:, None, :], direction[:, None, :],
            pack[..., 0:3], pack[..., 3:6], pack[..., 6:9],
            t_min[:, None], t_best[:, None],
        )
        t = jnp.where(valid & lane_ok, t, INF)
        k = jnp.argmin(t, axis=1)
        t_leaf = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        leaf_hit = jnp.isfinite(t_leaf)
        t_best = jnp.where(leaf_hit, t_leaf, t_best)
        best = jnp.where(leaf_hit, first + k.astype(jnp.int32), best)

        if early_exit:
            fin = do_leaf & (best >= 0)
            cur = jnp.where(fin, DONE, cur)
            sp = jnp.where(fin, 0, sp)
            do_leaf = do_leaf & ~fin
        cur, sp = pop(cur, sp, stack, do_leaf)
        return cur, sp, stack, t_best, best

    _, _, _, t_best, best = jax.lax.while_loop(
        outer_cond, outer_body, (cur0, sp0, stack0, t_best, best)
    )
    return t_best, best


class Hit(NamedTuple):
    """SoA hit records (counterpart of accel.rs HitInfo)."""

    hit: jax.Array       # (B,) bool
    t: jax.Array         # (B,) f32
    prim: jax.Array      # (B,) i32 encoded winner
    uv: jax.Array        # (B, 2)
    point: jax.Array     # (B, 3) world
    normal: jax.Array    # (B, 3) world, unit
    dpdu: jax.Array      # (B, 3)
    dpdv: jax.Array      # (B, 3)
    material: jax.Array  # (B,) i32
    light: jax.Array     # (B,) i32 (-1 = not an emitter)


def _intersect_spheres(ds: DeviceScene, origin, direction, t_min, t_max):
    """Brute-force all spheres in object space. Returns (t, sphere_idx)."""
    S = ds.sph_center.shape[0]
    # (B, S, 3): transform rays into each sphere's object space
    o_o = apply_point(ds.sph_w2o[None, :], origin[:, None, :])
    d_o = apply_vector(ds.sph_w2o[None, :], direction[:, None, :])
    valid, t = ray_sphere(
        o_o, d_o, ds.sph_center[None, :], ds.sph_radius[None, :],
        t_min[:, None], t_max[:, None],
    )
    # padded entries have radius 0 -> c = |omc|^2 > 0 unless ray at origin;
    # mask them explicitly anyway
    real = (
        jnp.arange(S, dtype=jnp.int32)[None, :] < ds.meta.n_spheres
    )
    t = jnp.where(valid & real, t, INF)
    best = jnp.argmin(t, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
    return t_best, best


def intersect_scene(
    ds: DeviceScene,
    origin: jax.Array,     # (B, 3)
    direction: jax.Array,  # (B, 3)
    t_min: jax.Array,      # (B,)
    t_max: jax.Array,      # (B,)
    early_exit: bool = False,
    active: jax.Array | None = None,
    presorted: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Closest-hit (or any-hit) query. Returns (t, encoded prim or -1).

    presorted=True asserts the caller already ordered lanes coherently
    (e.g. the integrator's once-per-bounce path-state sort); the Pallas
    path then skips its internal sort + permutation gathers.
    """
    B = origin.shape[0]
    n_tris = ds.meta.n_tris
    t_best = jnp.broadcast_to(t_max, (B,)).astype(jnp.float32)
    best = jnp.full((B,), -1, jnp.int32)

    if active is None:
        active = jnp.ones((B,), bool)

    from ..utils import raydump

    raydump.emit(early_exit, origin, direction, t_min, t_max, active)

    if ds.meta.n_spheres:
        st, sidx = _intersect_spheres(ds, origin, direction, t_min, t_best)
        sph_hit = jnp.isfinite(st) & active
        t_best = jnp.where(sph_hit, st, t_best)
        best = jnp.where(sph_hit, n_tris + sidx, best)

    instances = ds.meta.instances
    if n_tris == 0 and not instances:
        t = jnp.where(best >= 0, t_best, INF)
        return t, best

    use_pallas = _use_pallas(ds)
    if use_pallas:
        from .traverse_pallas import intersect_tris_pallas

        # coherence sort: lanes are independent, so reordering only shrinks
        # each lockstep tile's node-set union — results are bit-identical.
        # dead lanes sort last: whole-dead tiles terminate immediately,
        # live tiles stay dense (late bounces have few survivors).
        # Everything (main pass + every instance pass) runs in SORTED lane
        # space: XLA TPU gathers cost ~per row regardless of width, so the
        # per-lane state crosses the permutation as ONE wide packed gather
        # in and one out, instead of 5-7 narrow gathers per pass (profiled
        # at ~0.5-1 ms each at B=131072 — they dominated device time).
        # presorted=True skips the permutation entirely: the integrator
        # sorts the whole path state once per bounce instead.
        act0 = active & (best < 0) if early_exit else active
        if presorted:
            s_o, s_d = origin, direction
            s_tmin, s_tbest = t_min, t_best
            s_act, s_best = act0, best
        else:
            key = ray_sort_key(ds, origin, direction)
            key = key | ((~act0).astype(jnp.int32) << 25)
            iota = jnp.arange(B, dtype=jnp.int32)
            _, order = jax.lax.sort_key_val(key, iota, is_stable=True)
            _, inv = jax.lax.sort_key_val(order, iota, is_stable=True)
            # int lanes cross the permutation in the INTEGER domain: the
            # TPU canonicalizes NaN payloads somewhere in the f32 path, so
            # bitcasting best (-1 = 0xFFFFFFFF, a NaN pattern) through f32
            # silently corrupts it into a positive int (fabricated hits)
            packed = jnp.concatenate(
                [
                    origin, direction,
                    t_min[:, None], t_best[:, None],
                    act0.astype(jnp.float32)[:, None],
                ],
                axis=1,
            )[order]
            s_o, s_d = packed[:, 0:3], packed[:, 3:6]
            s_tmin, s_tbest = packed[:, 6], packed[:, 7]
            s_act = packed[:, 8] > 0
            s_best = best[order]
        from .traverse_pallas import _kernel_kind

        chunked = bool(ds.meta.t8_chunk_meta) and _kernel_kind() == "bvh8t"
        if n_tris and not chunked:
            pt, pbest = intersect_tris_pallas(
                ds, s_o, s_d, s_tmin, s_tbest, s_act, early_exit=early_exit,
            )
            tri_hit = pbest >= 0
            s_tbest = jnp.where(tri_hit, pt, s_tbest)
            s_best = jnp.where(tri_hit, pbest, s_best)
        elif n_tris:
            # big scene: one masked pass per VMEM-sized subtree chunk;
            # t_best chains across passes so the union is the exact
            # closest hit (scalability path, VERDICT r1 item 4)
            s_inv0 = 1.0 / s_d
            for k, (_stk, cmn, cmx) in enumerate(ds.meta.t8_chunk_meta):
                a0, a1 = ray_aabb(
                    s_o, s_inv0,
                    jnp.broadcast_to(jnp.asarray(cmn, jnp.float32), (B, 3)),
                    jnp.broadcast_to(jnp.asarray(cmx, jnp.float32), (B, 3)),
                )
                act_k = s_act & (a0 <= a1) & (a1 >= s_tmin) & (a0 <= s_tbest)
                if early_exit:
                    act_k = act_k & (s_best < 0)
                pt, pbest = intersect_tris_pallas(
                    ds, s_o, s_d, s_tmin, s_tbest, act_k,
                    early_exit=early_exit, t8_chunk=k,
                )
                chit = pbest >= 0
                s_tbest = jnp.where(chit, pt, s_tbest)
                s_best = jnp.where(chit, pbest, s_best)

        # shared-BLAS instances: one pass per instance over the shared
        # object-space BVH with locally transformed rays; t is preserved by
        # the (unnormalized) affine ray transform, so t chains across
        # passes exactly like the reference's nested-BVH traversal
        # (accel.rs:183-214) and IAS (scene.cu:162-250). Each pass is
        # masked by the instance's world-AABB slab test, so culled tiles
        # exit the lockstep walk at the root.
        s_inv_dir = 1.0 / s_d
        for i, (blas_id, vtri_base, _nt_b, _so) in enumerate(instances):
            xf = ds.inst_xf[i]
            w2o = xf[16:].reshape(4, 4)
            o_l = apply_point(w2o[None], s_o)
            d_l = apply_vector(w2o[None], s_d)
            a0, a1 = ray_aabb(
                s_o, s_inv_dir,
                jnp.broadcast_to(ds.inst_aabb_min[i], (B, 3)),
                jnp.broadcast_to(ds.inst_aabb_max[i], (B, 3)),
            )
            act_i = s_act & (a0 <= a1) & (a1 >= s_tmin) & (a0 <= s_tbest)
            if early_exit:
                act_i = act_i & (s_best < 0)
            pt, pbest = intersect_tris_pallas(
                ds, o_l, d_l, s_tmin, s_tbest, act_i,
                early_exit=early_exit, blas=blas_id,
            )
            ihit = pbest >= 0
            s_tbest = jnp.where(ihit, pt, s_tbest)
            s_best = jnp.where(ihit, vtri_base + pbest, s_best)

        if presorted:
            t_best, best = s_tbest, s_best
        else:
            t_best = s_tbest[inv]
            best = s_best[inv]
        t = jnp.where(best >= 0, t_best, INF)
        return t, best

    if n_tris:
        if _USE_STACK:
            t_best, best = _intersect_stack(
                ds, origin, direction, t_min, t_max, t_best, best, active,
                early_exit,
            )
        else:
            t_best, best = _intersect_skiplink(
                ds, origin, direction, t_min, t_best, best, active,
                early_exit,
            )

    inv_dir = 1.0 / direction
    for i, (blas_id, vtri_base, _nt_b, _so) in enumerate(instances):
        xf = ds.inst_xf[i]
        w2o = xf[16:].reshape(4, 4)
        o_l = apply_point(w2o[None], origin)
        d_l = apply_vector(w2o[None], direction)
        a0, a1 = ray_aabb(
            origin, inv_dir,
            jnp.broadcast_to(ds.inst_aabb_min[i], (B, 3)),
            jnp.broadcast_to(ds.inst_aabb_max[i], (B, 3)),
        )
        act_i = active & (a0 <= a1) & (a1 >= t_min) & (a0 <= t_best)
        if early_exit:
            act_i = act_i & (best < 0)
        bt, bb = _intersect_stack(
            ds, o_l, d_l, t_min, t_max, t_best,
            jnp.full((B,), -1, jnp.int32), act_i, early_exit,
            blas=blas_id,
        )
        pt, pbest = bt, bb
        ihit = pbest >= 0
        t_best = jnp.where(ihit, pt, t_best)
        best = jnp.where(ihit, vtri_base + pbest, best)

    t = jnp.where(best >= 0, t_best, INF)
    return t, best


def _intersect_skiplink(
    ds, origin, direction, t_min, t_best, best, active, early_exit
):
    """Skip-link walk over the main accel (debug/comparison fallback)."""
    n_tris = ds.meta.n_tris
    n_nodes = ds.bvh_skip.shape[0]
    # sentinel: traversal ends when the node pointer reaches the unpadded node
    # count; every skip[] chain terminates there.
    sentinel = jnp.max(ds.bvh_skip)

    inv_dir = 1.0 / direction  # inf on zero components, like the reference

    # while-while traversal (the CUDA-classic restructure, reformulated for a
    # vector machine): the inner loop advances every lane through internal
    # nodes — one 8-wide packed gather + slab test per step — until each live
    # lane parks on a hit leaf; the outer loop then intersects the parked
    # leaves (one 9-wide gather + Moller-Trumbore per tri slot). Leaf work
    # runs once per leaf *visit* instead of once per node *step*, which is
    # the difference between O(nodes) and O(leaves) heavy iterations.
    # Per-lane node/leaf order is identical to a one-node-per-step walk, so
    # results are bit-identical.

    def find_leaf(node, t_best, best):
        """Advance lanes to their next hit leaf. Returns (node, first, count);
        count==0 lanes terminated instead."""

        def cond(s):
            node, _, count = s
            return jnp.any((node < sentinel) & (count == 0))

        def body(s):
            node, first, count = s
            live = (node < sentinel) & (count == 0)
            nidx = jnp.minimum(node, n_nodes - 1)
            nd = ds.bvh_nodes[nidx]
            t0, t1 = ray_aabb(origin, inv_dir, nd[:, 0:3], nd[:, 3:6])
            box_hit = (t0 <= t1) & (t1 >= t_min) & (t0 <= t_best) & live
            meta1 = jax.lax.bitcast_convert_type(nd[:, 6], jnp.int32)
            skip = jax.lax.bitcast_convert_type(nd[:, 7], jnp.int32)
            n_count = meta1 & 7
            n_first = meta1 >> 3
            is_leaf = n_count > 0
            park = box_hit & is_leaf
            first = jnp.where(park, n_first, first)
            count = jnp.where(park, n_count, count)
            nxt = jnp.where(box_hit & ~is_leaf, node + 1, skip)
            node = jnp.where(live, nxt, node)
            return node, first, count

        zero = jnp.zeros_like(best)
        return jax.lax.while_loop(cond, body, (node, zero, zero))

    def outer_cond(state):
        node, _, _, count = state
        return jnp.any((node < sentinel) | (count > 0))

    def outer_body(state):
        node, t_best, best, _ = state
        node, first, count = find_leaf(node, t_best, best)

        do_leaf = count > 0
        offs = jnp.arange(MAX_LEAF_SIZE, dtype=jnp.int32)
        tid = jnp.minimum(first[:, None] + offs[None, :], n_tris - 1)
        lane_ok = do_leaf[:, None] & (offs[None, :] < count[:, None])
        pack = ds.tri_pack[tid]  # (B, L, 9)
        valid, t, _, _ = ray_triangle(
            origin[:, None, :], direction[:, None, :],
            pack[..., 0:3], pack[..., 3:6], pack[..., 6:9],
            t_min[:, None], t_best[:, None],
        )
        t = jnp.where(valid & lane_ok, t, INF)
        k = jnp.argmin(t, axis=1)
        t_leaf = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        leaf_hit = jnp.isfinite(t_leaf)
        t_best = jnp.where(leaf_hit, t_leaf, t_best)
        best = jnp.where(leaf_hit, first + k.astype(jnp.int32), best)
        if early_exit:
            node = jnp.where(do_leaf & (best >= 0), sentinel, node)
        return node, t_best, best, jnp.zeros_like(count)

    node0 = jnp.where(active, 0, sentinel).astype(ds.bvh_skip.dtype)
    if early_exit:
        node0 = jnp.where(best >= 0, sentinel, node0)
    zero = jnp.zeros_like(best)
    _, t_best, best, _ = jax.lax.while_loop(
        outer_cond, outer_body, (node0, t_best, best, zero)
    )
    return t_best, best


def _interleave3(v):
    """Spread the low 7 bits of v 3 apart (canonical part-1-by-2)."""
    v = v & 0x7F
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _subtree_sort_key(ds: DeviceScene, origin, direction):
    """Round-4 coherence key: (nearest entered top-level subtree,
    quantized entry t). The candidates are the bvh8t root's internal
    children (their boxes are t8_nodes rows 0..ni-1 — no extra buffer)
    plus the instance world AABBs: rays grouped this way enter the SAME
    top subtree, so a lockstep tile's node-set union collapses toward a
    single ray's working set. Offline replay of honest dumped batches
    (scripts/probe_reorg.py, docs/PERF_LOG.md round 4) measured 2.8x
    fewer node visits and 1.6x fewer leaf iterations than the octant+
    Morton key on cbbunny. Like every sort key here it only affects tile
    grouping — results are bit-identical under any permutation."""
    d_safe = jnp.where(jnp.abs(direction) < 1e-20, 1e-20, direction)
    inv = 1.0 / d_safe
    B = origin.shape[0]
    inf = jnp.float32(jnp.inf)
    t_first = jnp.full(B, inf, origin.dtype)
    first = jnp.full(B, -1, jnp.int32)

    def consider(bmin, bmax, idx, t_first, first):
        lo = (bmin - origin) * inv
        hi = (bmax - origin) * inv
        t0 = jnp.max(jnp.minimum(lo, hi), axis=1)
        t1 = jnp.min(jnp.maximum(lo, hi), axis=1)
        tc = jnp.where((t0 <= t1) & (t1 >= 0.0), jnp.maximum(t0, 0.0), inf)
        better = tc < t_first  # strict: ties keep the lowest index
        return (jnp.where(better, tc, t_first),
                jnp.where(better, idx, first))

    idx = 0
    for s in range(ds.meta.t8_root_ints):
        box = ds.t8_nodes[s, 0:6]
        t_first, first = consider(box[0:3], box[3:6], idx, t_first, first)
        idx += 1
    for i in range(min(len(ds.meta.instances), 40)):
        t_first, first = consider(
            ds.inst_aabb_min[i], ds.inst_aabb_max[i], idx, t_first, first
        )
        idx += 1
    # 13-bit entry-t quantization over the scene diameter orders rays
    # within a subtree front-to-back (key stays < 2^25: callers OR the
    # dead-lane bit at 25)
    r = jnp.maximum(ds.bounds_radius, 1e-6)
    tq = jnp.clip(t_first / (2.0 * r) * 4096.0, 0.0, 8191.0)
    return ((first + 1) << 13) | tq.astype(jnp.int32)


def ray_sort_key(ds: DeviceScene, origin, direction):
    """Coherence key: rays sharing a key start near each other and point
    the same way, so lockstep tiles of sorted rays visit small node-set
    unions. The key only affects the tile grouping — outputs are
    bit-identical under any permutation (sorted lane space unsorts
    exactly).

    subtree (default when the scene has a wide tree or instances):
    (nearest top-level subtree candidate, entry t) — see
    _subtree_sort_key. TPU_RT_SORT_KEY=v1|v2 restore the round-3 keys:
    v1: 3 direction-octant bits + 21-bit origin Morton.
    v2: octant + coarse origin Morton (4 bits/axis) + 6 direction bits
    + fine origin Morton (3 bits/axis) — at 128Ki rays the v1 keys are
    near-unique, so sub-octant direction never influences the order; v2
    trades fine position for direction locality.
    """
    kind = os.environ.get("TPU_RT_SORT_KEY", "subtree")
    if kind == "subtree" and (
        ds.meta.t8_root_ints > 0 or ds.meta.instances
    ):
        return _subtree_sort_key(ds, origin, direction)
    c = ds.bounds_center
    r = jnp.maximum(ds.bounds_radius, 1e-6)
    q = jnp.clip((origin - c) / (2.0 * r) + 0.5, 0.0, 1.0)
    qi = (q * 127.0).astype(jnp.int32)
    morton = (
        _interleave3(qi[:, 0])
        | (_interleave3(qi[:, 1]) << 1)
        | (_interleave3(qi[:, 2]) << 2)
    )
    octant = (
        (direction[:, 0] < 0).astype(jnp.int32)
        | ((direction[:, 1] < 0).astype(jnp.int32) << 1)
        | ((direction[:, 2] < 0).astype(jnp.int32) << 2)
    )
    if os.environ.get("TPU_RT_SORT_KEY", "v1") == "v2":
        dq = jnp.clip(jnp.abs(direction), 0.0, 1.0)
        dirq = (
            ((dq[:, 0] > 0.5).astype(jnp.int32) << 2)
            | ((dq[:, 1] > 0.5).astype(jnp.int32) << 1)
            | (dq[:, 2] > 0.5).astype(jnp.int32)
        )
        dfine = (
            ((dq[:, 0] > 0.25).astype(jnp.int32) << 2)
            | ((dq[:, 1] > 0.25).astype(jnp.int32) << 1)
            | (dq[:, 2] > 0.25).astype(jnp.int32)
        )
        hi = jax.lax.shift_right_logical(morton, 9)   # 12 coarse bits
        lo = morton & 511                             # 9 fine bits
        return (octant << 27) | (hi << 15) | (dirq << 12) | (dfine << 9) | lo
    return (octant << 21) | morton


def hit_details(
    ds: DeviceScene, origin, direction, t, prim
) -> Hit:
    """Expand an encoded (t, prim) query result into full shading geometry.

    Triangles are world-space so interpolation happens directly in world
    coordinates; spheres are recomputed in object space and transformed out
    (geometry.rs:92-136 semantics).
    """
    B = origin.shape[0]
    n_tris = ds.meta.n_tris
    instances = ds.meta.instances
    hit = prim >= 0
    is_tri = hit & (prim < n_tris)

    point = origin + t[:, None] * direction

    # -------- triangle path: ONE wide gather replaces 13 narrow ones
    # (XLA TPU gathers cost ~the same per row regardless of width)
    if instances:
        # virtual-tri decode: instanced winners map to shared object-space
        # BLAS shade rows + a per-instance transform (applied below)
        base0 = ds.meta.inst_vtri_base0
        is_inst = hit & (prim >= base0)
        row = jnp.where(is_tri, prim, 0)
        xf_id = jnp.zeros_like(prim)
        for i, (_b, vbase, nt_b, shade_off) in enumerate(instances):
            m = (prim >= vbase) & (prim < vbase + nt_b)
            row = jnp.where(m, prim - vbase + shade_off, row)
            xf_id = jnp.where(m, i, xf_id)
        tid = jnp.clip(row, 0, ds.tri_shade.shape[0] - 1)
        xf = ds.inst_xf[xf_id]                    # (B, 32)
        o2w = xf[:, :16].reshape(B, 4, 4)
        w2o = xf[:, 16:].reshape(B, 4, 4)
        sel_i = is_inst[:, None]
        o_sel = jnp.where(sel_i, apply_point(w2o, origin), origin)
        d_sel = jnp.where(sel_i, apply_vector(w2o, direction), direction)
    else:
        is_inst = None
        tid = jnp.clip(jnp.where(is_tri, prim, 0), 0, max(n_tris - 1, 0))
        o_sel, d_sel = origin, direction
    sh = ds.tri_shade[tid]                       # (B, 32)
    p0, p1, p2 = sh[:, 0:3], sh[:, 3:6], sh[:, 6:9]
    sh_ints = jax.lax.bitcast_convert_type(sh[:, 24:28], jnp.int32)
    # recompute barycentrics for the winning triangle (per-lane space:
    # local rays against local rows for instanced lanes, world otherwise)
    _, _, u, v = ray_triangle(
        o_sel, d_sel, p0, p1, p2,
        jnp.full_like(t, -INF), jnp.full_like(t, INF),
    )
    w = 1.0 - u - v
    geo_n = normalize(cross(p2 - p0, p1 - p0))
    sn = (
        w[:, None] * sh[:, 9:12]
        + u[:, None] * sh[:, 12:15]
        + v[:, None] * sh[:, 15:18]
    )
    tri_normal = jnp.where(
        (sh_ints[:, 2] != 0)[:, None], normalize(sn), geo_n
    )
    default_uv0 = jnp.array([0.0, 0.0], jnp.float32)
    default_uv1 = jnp.array([1.0, 0.0], jnp.float32)
    default_uv2 = jnp.array([0.0, 1.0], jnp.float32)
    has_uv = (sh_ints[:, 3] != 0)[:, None]
    uv0 = jnp.where(has_uv, sh[:, 18:20], default_uv0)
    uv1 = jnp.where(has_uv, sh[:, 20:22], default_uv1)
    uv2 = jnp.where(has_uv, sh[:, 22:24], default_uv2)
    tri_uv = w[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    # pbrt 4ed eq. 6.7
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[:, 0] * duv12[:, 1] - duv02[:, 1] * duv12[:, 0]
    degenerate = jnp.abs(det) < 1e-9
    inv_det = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, det))
    tri_dpdu = inv_det[:, None] * (
        duv12[:, 1:2] * dp02 - duv02[:, 1:2] * dp12
    )
    tri_dpdv = inv_det[:, None] * (
        duv02[:, 0:1] * dp12 - duv12[:, 0:1] * dp02
    )
    tri_mat = sh_ints[:, 0]
    tri_light = sh_ints[:, 1]

    if instances:
        # instanced lanes computed in object space: transform out (normals
        # via inverse-transpose — geometry.rs:92-136 / transform.rs:67-72)
        tri_normal = jnp.where(
            sel_i, normalize(apply_vector_transposed(w2o, tri_normal)),
            tri_normal,
        )
        tri_dpdu = jnp.where(sel_i, apply_vector(o2w, tri_dpdu), tri_dpdu)
        tri_dpdv = jnp.where(sel_i, apply_vector(o2w, tri_dpdv), tri_dpdv)
        is_tri = is_tri | is_inst

    # -------- sphere path
    if ds.meta.n_spheres:
        sid = jnp.clip(jnp.where(is_tri, 0, prim - n_tris), 0, ds.sph_center.shape[0] - 1)
        w2o = ds.sph_w2o[sid]
        o2w = ds.sph_o2w[sid]
        o_o = apply_point(w2o, origin)
        d_o = apply_vector(w2o, direction)
        p_o = o_o + t[:, None] * d_o
        # robust sphere hit point: reproject onto the surface and inflate
        # a few ULPs outward. o + t*d rounding can land the point INSIDE
        # the sphere; a grazing reflection from an inside point re-enters
        # on a real chord (t >> t_min), which self-shadows the whole
        # silhouette band — backend-dependent (TPU FMA contraction lands
        # inside far more often than CPU; metal scene lost 19% of its
        # energy there). An outside point on a convex surface cannot be
        # re-hit by any reflected ray, and transmitted rays re-enter at
        # t ~ 1e-7 << t_min. (Robustness fix over geometry.rs:92-136,
        # which keeps the raw o + t*d point.)
        ctr = ds.sph_center[sid]
        rel = p_o - ctr
        rn = jnp.sqrt(jnp.sum(rel * rel, axis=-1, keepdims=True))
        safe_rn = jnp.where(rn == 0.0, 1.0, rn)
        p_o = ctr + rel * (
            ds.sph_radius[sid][:, None] / safe_rn) * (1.0 + 4.0e-7)
        sph_uv, n_o, dpdu_o, dpdv_o = sphere_hit_geom(
            p_o, ctr, ds.sph_radius[sid]
        )
        sph_point = apply_point(o2w, p_o)
        sph_normal = normalize(apply_vector_transposed(w2o, n_o))
        sph_dpdu = apply_vector(o2w, dpdu_o)
        sph_dpdv = apply_vector(o2w, dpdv_o)
        sph_mat = ds.sph_mat[sid]
        sph_light = ds.sph_light[sid]

        sel = is_tri[:, None]
        uv = jnp.where(sel, tri_uv, sph_uv)
        point = jnp.where(sel, point, sph_point)
        normal = jnp.where(sel, tri_normal, sph_normal)
        dpdu = jnp.where(sel, tri_dpdu, sph_dpdu)
        dpdv = jnp.where(sel, tri_dpdv, sph_dpdv)
        material = jnp.where(is_tri, tri_mat, sph_mat)
        light = jnp.where(is_tri, tri_light, sph_light)
    else:
        uv, normal, dpdu, dpdv = tri_uv, tri_normal, tri_dpdu, tri_dpdv
        material, light = tri_mat, tri_light

    zero3 = jnp.zeros((B, 3), jnp.float32)
    return Hit(
        hit=hit,
        t=jnp.where(hit, t, INF),
        prim=prim,
        uv=jnp.where(hit[:, None], uv, jnp.zeros((B, 2), jnp.float32)),
        point=jnp.where(hit[:, None], point, zero3),
        normal=jnp.where(hit[:, None], normal, zero3),
        dpdu=jnp.where(hit[:, None], dpdu, zero3),
        dpdv=jnp.where(hit[:, None], dpdv, zero3),
        material=jnp.where(hit, material, 0),
        light=jnp.where(hit, light, -1),
    )


def intersect_closest(ds: DeviceScene, origin, direction, t_min, t_max) -> Hit:
    t, prim = intersect_scene(ds, origin, direction, t_min, t_max)
    return hit_details(ds, origin, direction, t, prim)


def occluded(ds: DeviceScene, origin, direction, t_min, t_max, active=None,
             presorted=False):
    """Any-hit query for shadow rays (accel.rs early_exit semantics)."""
    _, prim = intersect_scene(
        ds, origin, direction, t_min, t_max, early_exit=True, active=active,
        presorted=presorted,
    )
    return prim >= 0
