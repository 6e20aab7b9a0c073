"""Envelope-vote traversal probe (round 5): can descent votes come from a
per-tile INTERVAL test instead of per-ray slabs?

probe_slab_cost.py (262144 iters, quiet host) prices the visitk trip:
floor (block+roll+drain) 96 ns, full slab phase 470 ns, hoist 465 ns
(broadcasts are free, the slab ops are the cost), row0+envelope 330 ns.
So replacing ALL per-ray box tests with one conservative interval test
per node (~110-215 ns/trip) erases ~60-75%% of visit cost — IF the
conservative descent does not inflate visits/leaf iters much. This
replay measures that inflation on honest dumped batches:

  V0    exact per-ray votes (current kernel)        [baseline]
  VE    tile envelope votes (1 interval per 512 rays)
  VE4   per-row envelopes (4 intervals, votes = OR) [tighter, ~4x cost]

Interval semantics: per axis, D = box_edge - [o_lo, o_hi]; V = interval
hull of 1/d over lanes with a CONSISTENT sign — a sign-mixed axis
contributes (-inf, inf) (still conservative). Hit if
t0_lo <= t1_hi and t1_hi >= min(tmin) and t0_lo <= max(tbest_live).

Usage: python scripts/probe_env_votes.py [/tmp/raydump_cbbunny.npz]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from probe_reorg import (
    INF, Wide, mt_group, run_v0, slab, sort_lanes, tile_iter,
)


def _axis_envelope(o, d, act):
    """Per axis: (o_lo, o_hi, inv_lo, inv_hi, valid) over live lanes."""
    env = []
    big = np.float32(3.4e38)
    for ax in range(3):
        oa = np.where(act, o[:, ax], np.nan)
        da = np.where(act, d[:, ax], np.nan)
        olo, ohi = np.nanmin(oa), np.nanmax(oa)
        pos = np.nanmin(da) > 0
        neg = np.nanmax(da) < 0
        if pos or neg:
            with np.errstate(divide="ignore"):
                inv = 1.0 / da
            ilo, ihi = np.nanmin(inv), np.nanmax(inv)
            env.append((olo, ohi, min(ilo, big), max(ihi, -big), True))
        else:
            env.append((olo, ohi, 0.0, 0.0, False))
    return env


def _env_hit(boxes, env, tmin_lo, tbest_hi):
    """Conservative per-slot hit for (S, 6) boxes vs one envelope."""
    S = boxes.shape[0]
    t0_lo = np.full(S, -INF, np.float32)
    t1_hi = np.full(S, INF, np.float32)
    with np.errstate(invalid="ignore"):
        for ax in range(3):
            olo, ohi, ilo, ihi, valid = env[ax]
            if not valid:
                continue
            lo_e = boxes[:, ax]
            hi_e = boxes[:, 3 + ax]
            bounds = []
            for edge in (lo_e, hi_e):
                dlo, dhi = edge - ohi, edge - olo
                prods = np.stack(
                    [dlo * ilo, dlo * ihi, dhi * ilo, dhi * ihi])
                bounds.append((np.min(prods, axis=0), np.max(prods, axis=0)))
            (alo, ahi), (blo, bhi) = bounds
            # per-ray min(a, b) \in [min(alo, blo), min(ahi, bhi)]
            t0_lo = np.fmax(t0_lo, np.fmin(alo, blo))
            t1_hi = np.fmin(t1_hi, np.fmax(ahi, bhi))
    # NaN box slots (empty children) never hit: fmax/fmin dropped NaNs,
    # but a fully-NaN slot keeps (-inf, inf) -> guard on finite edges
    empty = np.isnan(boxes[:, 0])
    h = (t0_lo <= t1_hi) & (t1_hi >= tmin_lo) & (t0_lo <= tbest_hi)
    return h & ~empty


def walk_tile_env(tree, o, d, tmin, tbest, act, early_exit, n_env=1):
    """Lockstep walk with envelope votes (n_env sub-envelopes of the
    tile, votes = OR). Leaf MT gates on live lanes only (no per-ray box
    masks). Returns (visits, leaf_iters, tbest, hitm)."""
    T = o.shape[0]
    best = np.full(T, False)
    visits = leaf_iters = 0
    w = tree.w
    if not act.any():
        return 0, 0, tbest, best
    rows = np.array_split(np.arange(T), n_env)
    envs = [
        _axis_envelope(o[r], d[r], act[r]) for r in rows if act[r].any()
    ]
    tmin_lo = tmin[act].min()
    stack = [0]
    while stack:
        nid = stack.pop()
        want = act & (~best if early_exit else np.full(T, True))
        if not want.any():
            continue
        visits += 1
        tbest_hi = tbest[want].max() if not early_exit else INF
        votes = np.zeros(w, bool)
        for env in envs:
            votes |= _env_hit(tree.boxes[nid], env, tmin_lo, tbest_hi)
        ni, nl = int(tree.ni[nid]), int(tree.nl[nid])
        cb = int(tree.cbase[nid])
        for s in range(ni - 1, -1, -1):
            if votes[s]:
                stack.append(cb + s)
        for s in range(w - nl, w):
            if votes[s]:
                leaf_iters += 1
                q = int(tree.lbase[nid]) + (w - 1 - s)
                tbest, hit = mt_group(tree, q, o, d, tmin, tbest, want)
                best |= hit
    return visits, leaf_iters, tbest, best


def run_env(tree, ds, b, T=512, n_env=1):
    o, d, act = b["o"], b["d"], b["act"].astype(bool)
    tmin = b["t_min"].astype(np.float32)
    tmax = np.minimum(b["t_max"].astype(np.float32), 3.4e38)
    ee = bool(b["kind"])
    order = sort_lanes(ds, o, d, act)
    o, d, tmin, tmax, act = (x[order] for x in (o, d, tmin, tmax, act))
    tot_v = tot_l = 0
    mixed = total_axes = 0
    for sl in tile_iter(o.shape[0], T):
        if not act[sl].any():
            continue
        env = _axis_envelope(o[sl], d[sl], act[sl])
        mixed += sum(1 for e in env if not e[4])
        total_axes += 3
        v, li, _, _ = walk_tile_env(tree, o[sl], d[sl], tmin[sl], tmax[sl],
                                    act[sl], ee, n_env=n_env)
        tot_v += v
        tot_l += li
    return tot_v, tot_l, mixed, total_axes


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raydump_cbbunny.npz"

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.utils import raydump

    scene_name = Path(path).stem.replace("raydump_", "")
    glb = {"cbbunny": "cbbunny_area_light.glb", "cb": "cb.glb",
           "cb_texture": "cb_texture.glb",
           "cbbunny_transforms": "cbbunny_area_light_transforms.glb"}[
        scene_name]
    ds = compile_scene(scene_from_file(Path("/root/reference/scenes") / glb))
    tree = Wide(ds)
    batches = raydump.load(path)

    tv0 = tl0 = tve = tle = tv4 = tl4 = 0
    mixed = axes = 0
    for i, b in enumerate(batches):
        v0, l0, _ = run_v0(tree, ds, b)
        ve, le, m, a = run_env(tree, ds, b, n_env=1)
        v4, l4, _, _ = run_env(tree, ds, b, n_env=4)
        tv0 += v0; tl0 += l0; tve += ve; tle += le; tv4 += v4; tl4 += l4
        mixed += m; axes += a
        kind = "shadow " if b["kind"] else "closest"
        print(f"batch {i:3d} {kind}: V0 {v0:6d}/{l0:6d}  "
              f"VE {ve:6d}/{le:6d} ({ve/max(v0,1):4.2f}x/{le/max(l0,1):4.2f}x)  "
              f"VE4 {v4:6d}/{l4:6d} ({v4/max(v0,1):4.2f}x/{l4/max(l0,1):4.2f}x)",
              flush=True)
    print(f"\nTOTAL  V0 {tv0}/{tl0}  VE {tve}/{tle} "
          f"({tve/tv0:4.2f}x visits, {tle/tl0:4.2f}x leaves)  "
          f"VE4 {tv4}/{tl4} ({tv4/tv0:4.2f}x, {tl4/tl0:4.2f}x)")
    print(f"sign-mixed axes: {mixed}/{axes} ({100*mixed/max(axes,1):.1f}%)")
    # cost model from probe_slab_cost (ns per 2-node trip): cur 470,
    # envelope ~215 (floor 96 + ~60/node interval), VE4 ~455
    for tag, v, l, cost in (("V0", tv0, tl0, 470), ("VE", tve, tle, 215),
                            ("VE4", tv4, tl4, 455)):
        print(f"  {tag}: visit time ~{v * cost / 2 / 1e6:.1f} ms-units"
              f" + leaves {l}")


if __name__ == "__main__":
    main()
