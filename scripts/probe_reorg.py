"""Offline traversal-organization probe (round 4, VERDICT #1).

Replays honest dumped ray batches (scripts/dump_rays.py) through exact
numpy simulations of the bvh8t lockstep kernel and candidate
reorganizations, counting node visits and leaf-group iterations — the
two serial-trip currencies of the real kernel:

  V0   current org: bounce-sorted lanes, 512-ray tiles, one walk/tile
  V0b  same, 128-ray tiles (R1) — the closed R-sweep, for calibration
  V1   lane sort by (first depth-D subtree candidate, entry t), then
       the CURRENT kernel (no kernel change, just a better key)
  V2   two-phase: shared top walk to depth D, then per-round re-tiling
       of (ray, subtree) items sorted by subtree — tiles walk only the
       subtrees their lanes actually want (mid-walk re-tiling)

Usage: python scripts/probe_reorg.py [/tmp/raydump_cbbunny.npz] [D]
"""
from __future__ import annotations

import os
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

INF = np.inf
BARY_EPS = 1e-7


class Wide:
    """Decoded bvh8t wide tree (ground truth the kernel sees)."""

    def __init__(self, ds):
        from tpu_raytracing.device.scene_buffers import (
            G8_PER_BLOCK, N8_PER_BLOCK,
        )

        self.w = ds.meta.t8_width
        self.lg = ds.meta.t8_leaf
        fld = 6 if self.w == 32 else 5
        meta = np.asarray(ds.t8_meta)
        nodes = np.asarray(ds.t8_nodes)
        tris = np.asarray(ds.t8_tris)
        n8 = meta.shape[0]
        self.cbase = meta[:, 0] >> fld
        self.ni = meta[:, 0] & ((1 << fld) - 1)
        self.lbase = meta[:, 1] >> fld
        self.nl = meta[:, 1] & ((1 << fld) - 1)
        self.boxes = np.full((n8, self.w, 6), np.nan, np.float32)
        for nid in range(n8):
            b, g = divmod(nid, N8_PER_BLOCK)
            for s in range(self.w):
                self.boxes[nid, s] = nodes[b * self.w + s, g * 8:g * 8 + 6]
        ngroups = (tris.shape[0] // self.lg) * G8_PER_BLOCK
        self.gp0 = np.zeros((ngroups, self.lg, 3), np.float32)
        self.ge1 = np.zeros_like(self.gp0)
        self.ge2 = np.zeros_like(self.gp0)
        for q in range(ngroups):
            b, j = divmod(q, G8_PER_BLOCK)
            rows = tris[b * self.lg:(b + 1) * self.lg, j * 10:j * 10 + 9]
            self.gp0[q] = rows[:, 0:3]
            self.ge1[q] = rows[:, 3:6]
            self.ge2[q] = rows[:, 6:9]
        # BFS depth
        self.depth = np.zeros(n8, np.int32)
        for nid in range(n8):
            c0, k = int(self.cbase[nid]), int(self.ni[nid])
            self.depth[c0:c0 + k] = self.depth[nid] + 1

    def subtree_roots(self, d):
        """Nodes at depth exactly d, plus leaf groups attached above."""
        roots = np.nonzero(self.depth == d)[0]
        shallow = []
        for nid in np.nonzero(self.depth < d)[0]:
            lb, k = int(self.lbase[nid]), int(self.nl[nid])
            shallow.extend(range(lb, lb + k))
        return roots, np.array(shallow, np.int64)


def slab(boxes, o, inv, tmin, tbest, want):
    """boxes (S,6) x rays (T,) -> hit (S,T), entry t0 (S,T)."""
    t0 = np.full((boxes.shape[0], o.shape[0]), -INF, np.float32)
    t1 = np.full_like(t0, INF)
    with np.errstate(invalid="ignore"):
        for ax in range(3):
            a = (boxes[:, ax, None] - o[None, :, ax]) * inv[None, :, ax]
            b = (boxes[:, 3 + ax, None] - o[None, :, ax]) * inv[None, :, ax]
            lo = np.fmin(a, b)   # fmin/fmax: NaN boxes -> propagate below
            hi = np.fmax(a, b)
            t0 = np.maximum(t0, np.where(np.isnan(lo), INF, lo))
            t1 = np.minimum(t1, np.where(np.isnan(hi), -INF, hi))
    h = (t0 <= t1) & (t1 >= tmin[None, :]) & (t0 <= tbest[None, :])
    return h & want[None, :], t0


def mt_group(tree, q, o, d, tmin, tbest, hm):
    """Moller-Trumbore of leaf group q against the tile. Returns new
    (tbest, hitmask_any)."""
    p0, e1, e2 = tree.gp0[q], tree.ge1[q], tree.ge2[q]       # (LG, 3)
    with np.errstate(invalid="ignore", divide="ignore"):
        pv = np.cross(d[None, :, :], e2[:, None, :])          # (LG, T, 3)
        den = np.einsum("ltk,lk->lt", pv, e1)
        sden = np.where(den == 0.0, 1.0, den)
        tv = o[None, :, :] - p0[:, None, :]
        u = np.einsum("ltk,ltk->lt", pv, tv) / sden
        qv = np.cross(tv, e1[:, None, :])
        v = np.einsum("ltk,tk->lt", qv, d) / sden
        t = np.einsum("ltk,lk->lt", qv, e2) / sden
        ok = ((den != 0.0) & (u >= -BARY_EPS) & (u <= 1 + BARY_EPS)
              & (v >= -BARY_EPS) & (u + v <= 1 + BARY_EPS)
              & (t >= tmin[None, :]) & (t <= tbest[None, :]) & hm[None, :])
    tg = np.where(ok, t, INF).min(axis=0)
    hit = tg < INF
    return np.where(hit, np.minimum(tbest, tg), tbest), hit


def walk_tile(tree, o, d, tmin, tbest, act, early_exit,
              roots=(0,), targets=None):
    """Exact lockstep walk of one tile. roots: wide-node ids to seed the
    stack with; targets (T,) per-lane root index into roots (or None =
    all lanes want all roots). Returns (visits, leaf_iters, tbest, hitm).
    """
    T = o.shape[0]
    inv = np.where(d != 0, 1.0 / d, INF)
    best = np.full(T, False)
    visits = leaf_iters = 0
    w = tree.w
    for ri, root in enumerate(roots):
        want0 = act if targets is None else act & (targets == ri)
        if not want0.any():
            continue
        stack = [(int(root), -1)]   # (nid, -1) = visit this node directly
        while stack:
            nid, _ = stack.pop()
            want = want0 & (~best if early_exit else True)
            if not want.any():
                continue
            visits += 1
            ni, nl = int(tree.ni[nid]), int(tree.nl[nid])
            h, _ = slab(tree.boxes[nid], o, inv, tmin, tbest, want)
            votes = h.any(axis=1)
            cb = int(tree.cbase[nid])
            # kernel pops lowest slot first -> push in reverse
            for s in range(ni - 1, -1, -1):
                if votes[s]:
                    stack.append((cb + s, -1))
            for s in range(w - nl, w):
                if votes[s]:
                    leaf_iters += 1
                    q = int(tree.lbase[nid]) + (w - 1 - s)
                    hm = h[s] & want
                    if early_exit:
                        _, hit = mt_group(tree, q, o, d, tmin, tbest, hm)
                        best |= hit
                    else:
                        tbest, hit = mt_group(tree, q, o, d, tmin, tbest,
                                              hm)
                        best |= hit
            if early_exit and not (want0 & ~best).any():
                break
    return visits, leaf_iters, tbest, best


def sort_lanes(ds, o, d, act):
    import jax.numpy as jnp
    from tpu_raytracing.ops.traverse import ray_sort_key

    key = np.asarray(ray_sort_key(ds, jnp.asarray(o), jnp.asarray(d)))
    key = key | ((~act).astype(np.int32) << 25)
    return np.argsort(key, kind="stable")


def tile_iter(n, T):
    for i in range(0, n, T):
        yield slice(i, min(i + T, n))


def run_v0(tree, ds, b, T=512, order=None):
    o, d, act = b["o"], b["d"], b["act"].astype(bool)
    tmin = b["t_min"].astype(np.float32)
    tmax = np.minimum(b["t_max"].astype(np.float32), 3.4e38)
    ee = bool(b["kind"])
    if order is None:
        order = sort_lanes(ds, o, d, act)
    o, d, tmin, tmax, act = (x[order] for x in (o, d, tmin, tmax, act))
    tot_v = tot_l = 0
    per_tile = []
    for sl in tile_iter(o.shape[0], T):
        if not act[sl].any():
            continue
        v, li, _, _ = walk_tile(tree, o[sl], d[sl], tmin[sl], tmax[sl],
                                act[sl], ee)
        tot_v += v
        tot_l += li
        per_tile.append(v)
    return tot_v, tot_l, per_tile


def candidate_info(tree, o, d, tmin, tbest, act, D):
    """Per-ray nearest depth-D subtree candidate (root list index) and
    entry t; -1 / inf when the ray hits none."""
    roots, _ = tree.subtree_roots(D)
    inv = np.where(d != 0, 1.0 / d, INF)
    rb = tree.boxes[roots]
    rmin = np.nanmin(rb[:, :, 0:3], axis=1)
    rmax = np.nanmax(rb[:, :, 3:6], axis=1)
    cboxes = np.concatenate([rmin, rmax], axis=1)
    h, t0 = slab(cboxes, o, inv, tmin, tbest, act)
    t0 = np.where(h, np.maximum(t0, 0.0), INF)      # (Nr, B)
    first = np.argmin(t0, axis=0)
    tfirst = t0[first, np.arange(o.shape[0])]
    first = np.where(np.isfinite(tfirst), first, -1)
    return first, tfirst


def run_v1(tree, ds, b, D, T=512):
    """V1: the CURRENT kernel, but lanes sorted by (nearest depth-D
    subtree candidate, quantized entry t) instead of the octant key."""
    o, d, act = b["o"], b["d"], b["act"].astype(bool)
    tmin = b["t_min"].astype(np.float32)
    tmax = np.minimum(b["t_max"].astype(np.float32), 3.4e38)
    first, tfirst = candidate_info(tree, o, d, tmin, tmax, act, D)
    tq = np.minimum((np.maximum(tfirst, 0.0) * 64).astype(np.int64), 4095)
    key = ((first.astype(np.int64) + 1) << 13) | tq
    key |= (~act).astype(np.int64) << 62
    order = np.argsort(key, kind="stable")
    return run_v0(tree, ds, b, T=T, order=order)


def run_v2(tree, ds, b, D, T=512, max_rounds=12):
    """Two-phase: top walk to depth D (lockstep, per 512-tile), then
    per-round (ray, subtree) re-tiling sorted by subtree."""
    o, d, act = b["o"], b["d"], b["act"].astype(bool)
    tmin = b["t_min"].astype(np.float32)
    tbest = np.minimum(b["t_max"].astype(np.float32), 3.4e38)
    ee = bool(b["kind"])
    order = sort_lanes(ds, o, d, act)
    o, d, tmin, tbest, act = (x[order] for x in (o, d, tmin, tbest, act))
    B = o.shape[0]
    inv = np.where(d != 0, 1.0 / d, INF)
    roots, shallow = tree.subtree_roots(D)

    # phase 1a: lockstep walk of the ABOVE-cut internal nodes per tile
    # (their visits are the shared top cost); count them exactly as the
    # union over the tile of depth<D node hits
    top_v = 0
    above = np.nonzero(tree.depth < D)[0]
    for sl in tile_iter(B, T):
        if not act[sl].any():
            continue
        for nid in above:
            h, _ = slab(tree.boxes[nid], o[sl], inv[sl], tmin[sl],
                        tbest[sl], act[sl])
            if h.any():
                top_v += 1
    # phase 1b: shallow leaf groups (attached above the cut) — vector MT
    top_l = 0
    best = np.full(B, False)
    for q in shallow:
        for sl in tile_iter(B, T):
            hm = act[sl]
            if not hm.any():
                continue
            top_l += 1
            tb, hit = mt_group(tree, int(q), o[sl], d[sl], tmin[sl],
                               tbest[sl], hm)
            if not ee:
                tbest[sl] = tb
            best[sl] |= hit

    # per-ray candidates: depth-D roots whose box the ray hits, by t0
    rb = tree.boxes[roots]                     # (Nr, w, 6) -> root box =
    rmin = np.nanmin(rb[:, :, 0:3], axis=1)    # union of child slots
    rmax = np.nanmax(rb[:, :, 3:6], axis=1)
    cboxes = np.concatenate([rmin, rmax], axis=1)  # (Nr, 6)
    h, t0 = slab(cboxes.reshape(-1, 6), o, inv, tmin, tbest, act)
    t0 = np.where(h, np.maximum(t0, 0.0), INF)     # (Nr, B)
    cand_order = np.argsort(t0, axis=0, kind="stable")  # near to far
    n_cand = h.sum(axis=0)

    tot_v, tot_l = top_v, top_l
    rounds = 0
    items_total = 0
    for r in range(max_rounds):
        cand_r = cand_order[r] if r < len(roots) else None
        if cand_r is None:
            break
        t0_r = t0[cand_r, np.arange(B)]
        live = act & (t0_r < (np.where(best, -INF, tbest)
                              if ee else tbest)) & np.isfinite(t0_r)
        if ee:
            live = act & ~best & np.isfinite(t0_r)
        if not live.any():
            break
        rounds += 1
        idx = np.nonzero(live)[0]
        sub = cand_r[idx]
        so = np.argsort(sub, kind="stable")
        idx = idx[so]
        sub = sub[so]
        items_total += len(idx)
        for sl in tile_iter(len(idx), T):
            lanes = idx[sl]
            tile_roots = np.unique(sub[sl])
            tgt = np.searchsorted(tile_roots, sub[sl])
            v, li, tb, hit = walk_tile(
                tree, o[lanes], d[lanes], tmin[lanes], tbest[lanes],
                np.ones(len(lanes), bool), ee,
                roots=roots[tile_roots], targets=tgt)
            tot_v += v
            tot_l += li
            if not ee:
                tbest[lanes] = tb
            best[lanes] |= hit
    return (tot_v, tot_l, rounds, items_total, top_v, top_l,
            float(n_cand[act].mean()))


def summary(path):
    """Totals across ALL batches for V0 / V1(D) / V2(D=1) — the render's
    kernel time is proportional to these sums."""
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.utils import raydump

    scene_name = Path(path).stem.replace("raydump_", "")
    glb = {"cbbunny": "cbbunny_area_light.glb", "cb": "cb.glb",
           "cb_texture": "cb_texture.glb"}[scene_name]
    ds = compile_scene(scene_from_file(Path("/root/reference/scenes") / glb))
    tree = Wide(ds)
    batches = raydump.load(path)
    tot = defaultdict(lambda: [0, 0])
    for bi, b in enumerate(batches):
        if not b["act"].any():
            continue
        v, li, _ = run_v0(tree, ds, b)
        tot["V0"][0] += v
        tot["V0"][1] += li
        for D in (1, 2):
            v, li, _ = run_v1(tree, ds, b, D)
            tot[f"V1 D={D}"][0] += v
            tot[f"V1 D={D}"][1] += li
        v2 = run_v2(tree, ds, b, 1)
        tot["V2 D=1"][0] += v2[0]
        tot["V2 D=1"][1] += v2[1]
        print(f"  batch {bi} (kind {int(b['kind'])}, "
              f"{int(b['act'].sum())} act) done", flush=True)
    print(f"\n=== totals over {len(batches)} batches ===")
    for k, (v, li) in tot.items():
        print(f"{k:8s}: visits {v:8d} leaf_iters {li:8d}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "summary":
        summary(sys.argv[2] if len(sys.argv) > 2
                else "/tmp/raydump_cbbunny.npz")
        return
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raydump_cbbunny.npz"
    Ds = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                           else [1, 2])]
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.utils import raydump

    scene_name = Path(path).stem.replace("raydump_", "")
    glb = {"cbbunny": "cbbunny_area_light.glb", "cb": "cb.glb",
           "cb_texture": "cb_texture.glb"}[scene_name]
    ds = compile_scene(scene_from_file(Path("/root/reference/scenes") / glb))
    tree = Wide(ds)
    print(f"wide tree: {len(tree.ni)} nodes, w={tree.w}, lg={tree.lg}, "
          f"max depth {tree.depth.max()}")
    for D in Ds:
        r, sh = tree.subtree_roots(D)
        sizes = [np.sum((tree.depth >= D)
                        & (np.arange(len(tree.ni)) >= 0))]  # not per-root
        print(f"  D={D}: {len(r)} subtree roots, {len(sh)} shallow groups")

    batches = raydump.load(path)
    # pick representative batches: first closest (primary), a mid closest,
    # first shadow, a mid shadow
    closest = [i for i, b in enumerate(batches) if b["kind"] == 0]
    shadow = [i for i, b in enumerate(batches) if b["kind"] == 1]
    picks = []
    if closest:
        picks.append(("closest0", closest[0]))
        if len(closest) > 3:
            picks.append((f"closest{len(closest)//2}",
                          closest[len(closest) // 2]))
    if shadow:
        picks.append(("shadow0", shadow[0]))
        if len(shadow) > 3:
            picks.append((f"shadow{len(shadow)//2}",
                          shadow[len(shadow) // 2]))

    for tag, bi in picks:
        b = batches[bi]
        nact = int(b["act"].sum())
        print(f"\n=== batch {bi} ({tag}): {nact}/{len(b['act'])} active")
        v0, l0, pt = run_v0(tree, ds, b)
        n_tiles = max(len(pt), 1)
        print(f"V0  tile512: visits {v0:7d} leaf_iters {l0:7d} "
              f"({v0 / n_tiles:.1f}/tile, {n_tiles} tiles)")
        v0b, l0b, ptb = run_v0(tree, ds, b, T=128)
        print(f"V0b tile128: visits {v0b:7d} leaf_iters {l0b:7d} "
              f"({v0b / max(len(ptb), 1):.1f}/tile)")
        for D in Ds:
            v1, l1, pt1 = run_v1(tree, ds, b, D)
            print(f"V1  D={D}:    visits {v1:7d} leaf_iters {l1:7d} "
                  f"({v1 / max(len(pt1), 1):.1f}/tile)")
        for D in Ds:
            out = run_v2(tree, ds, b, D)
            tv, tl, rounds, items, topv, topl, avg_c = out
            print(f"V2  D={D}:    visits {tv:7d} leaf_iters {tl:7d} "
                  f"(top {topv}/{topl}, rounds {rounds}, items {items}, "
                  f"avg cand {avg_c:.2f})")


if __name__ == "__main__":
    main()
