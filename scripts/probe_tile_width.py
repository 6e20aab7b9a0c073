"""Lockstep-floor probe (round 5, VERDICT #2 feasibility): node-visit
unions vs tile width on honest dumped batches.

The megakernel lead assumes traversal time could shrink if shading moved
in-kernel and dead/incoherent lanes were regrouped more tightly. The TPU
vector unit fixes the MINIMUM lockstep group at 128 lanes (one vreg
row), so the question "how much union waste would ANY reorganization
recover?" reduces to: how do per-tile node-visit unions scale as the
tile narrows from the current 512 rays (R=4 rows) toward the 128-lane
hardware floor — and, for calibration, below it (32/8, widths no TPU
kernel can reach per-visit)?

Replays the pipeline-faithful P1 (subtree-key) schedule of
probe_pipeline_key.py at T in {512, 128, 32, 8} and reports total
visits + leaf iters per width. If visits(128)/visits(512) is ~0.7-0.8,
the ceiling is intra-row incoherence, not the tile organization, and a
megakernel's traversal side cannot beat the current kernel by more than
that ratio even before paying its own costs.

Usage: python scripts/probe_tile_width.py [/tmp/raydump_cbbunny.npz]
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

from probe_pipeline_key import v1_order
from probe_reorg import Wide, run_v0

WIDTHS = (512, 128, 32, 8)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/raydump_cbbunny.npz"

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.utils import raydump

    scene_name = Path(path).stem.replace("raydump_", "")
    glb = {"cbbunny": "cbbunny_area_light.glb", "cb": "cb.glb",
           "cb_texture": "cb_texture.glb"}[scene_name]
    ds = compile_scene(scene_from_file(Path("/root/reference/scenes") / glb))
    tree = Wide(ds)
    batches = raydump.load(path)

    tot = {T: [0, 0] for T in WIDTHS}
    n_act = 0
    cur = None
    for bi, b in enumerate(batches):
        if not b["act"].any():
            continue
        if b["kind"] == 0:
            cur = v1_order(tree, b, 1)
        n_act += int(b["act"].sum())
        for T in WIDTHS:
            v, li, _ = run_v0(tree, ds, b, T=T, order=cur)
            tot[T][0] += v
            tot[T][1] += li
        print(f"  batch {bi} (kind {int(b['kind'])}, "
              f"{int(b['act'].sum())} act) done", flush=True)

    print(f"\n=== P1-schedule visits vs tile width ({len(batches)} batches, "
          f"{n_act} active rays) ===")
    v512 = tot[512][0]
    for T in WIDTHS:
        v, li = tot[T]
        # a tile of T rays costs its union ONCE per 128-lane row it holds:
        # vector work/visit scales with rows, so visits * rows(T) is the
        # row-visit count a kernel at that width would execute
        rows = max(T // 128, 1)
        print(f"T={T:4d}: visits {v:8d} ({v / v512:5.3f}x of T=512) "
              f"leaf_iters {li:8d} row-visits {v * rows:9d}")


if __name__ == "__main__":
    main()
