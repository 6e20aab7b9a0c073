"""Pipeline-faithful sort-key probe (round 4, VERDICT #1).

probe_reorg.py's V1 sorted EVERY dumped batch by its own key, but the
real integrator sorts ONCE per bounce on the continuation rays; shadow
batches inherit that order. This probe replays the dump with exactly
that structure:

  P0   order_i = argsort(current octant+morton key of closest_i),
       applied to closest_i and its following shadow batches
  P1   order_i = argsort(subtree key of closest_i), same inheritance
  P1s  P1, plus shadow batches re-sorted by their OWN subtree key
       (upper bound; would cost an extra permutation per shadow call)

Usage: python scripts/probe_pipeline_key.py [/tmp/raydump_cbbunny.npz] [D]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

from probe_reorg import Wide, candidate_info, run_v0, sort_lanes


def v1_order(tree, b, D):
    o, d, act = b["o"], b["d"], b["act"].astype(bool)
    tmin = b["t_min"].astype(np.float32)
    tmax = np.minimum(b["t_max"].astype(np.float32), 3.4e38)
    first, tfirst = candidate_info(tree, o, d, tmin, tmax, act, D)
    tq = np.minimum((np.maximum(tfirst, 0.0) * 64).astype(np.int64), 4095)
    key = ((first.astype(np.int64) + 1) << 13) | tq
    key |= (~act).astype(np.int64) << 62
    return np.argsort(key, kind="stable")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raydump_cbbunny.npz"
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.utils import raydump

    scene_name = Path(path).stem.replace("raydump_", "")
    glb = {"cbbunny": "cbbunny_area_light.glb", "cb": "cb.glb",
           "cb_texture": "cb_texture.glb"}[scene_name]
    ds = compile_scene(scene_from_file(Path("/root/reference/scenes") / glb))
    tree = Wide(ds)
    batches = raydump.load(path)

    tot = {"P0": [0, 0], "P1": [0, 0], "P1s": [0, 0]}
    cur0 = cur1 = None  # inherited per-bounce orders
    for bi, b in enumerate(batches):
        if not b["act"].any():
            continue
        if b["kind"] == 0:
            cur0 = sort_lanes(ds, b["o"], b["d"], b["act"].astype(bool))
            cur1 = v1_order(tree, b, D)
        v, li, _ = run_v0(tree, ds, b, order=cur0)
        tot["P0"][0] += v
        tot["P0"][1] += li
        v, li, _ = run_v0(tree, ds, b, order=cur1)
        tot["P1"][0] += v
        tot["P1"][1] += li
        if b["kind"] == 1:
            own = v1_order(tree, b, D)
            v, li, _ = run_v0(tree, ds, b, order=own)
        tot["P1s"][0] += v
        tot["P1s"][1] += li
        print(f"  batch {bi} (kind {int(b['kind'])}, "
              f"{int(b['act'].sum())} act) done", flush=True)

    print(f"\n=== pipeline-faithful totals over {len(batches)} batches "
          f"(D={D}) ===")
    for k, (v, li) in tot.items():
        print(f"{k:4s}: visits {v:8d} leaf_iters {li:8d}")


if __name__ == "__main__":
    main()
