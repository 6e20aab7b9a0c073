"""Alive-lane fraction per bounce (sizes the prefix-ladder opportunity).

Uses the TPU_RT_DUMP_RAYS hook on a small CPU render of each perf scene
and prints, per closest-hit batch (= per bounce per chunk), the active
fraction — if late bounces stay >50% alive, laddering the bounce body to
the alive prefix cannot win; if they decay fast, full-B per-bounce work
(gathers, fusions, kernel tiles) is mostly dead lanes.

Usage: python scripts/probe_alive.py [scene ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["TPU_RT_DUMP_RAYS"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from tpu_raytracing.integrator.render import render
from tpu_raytracing.scene.loaders import scene_from_file
from tpu_raytracing.settings import RaytracerSettings
from tpu_raytracing.device import compile_scene
from tpu_raytracing.utils import raydump

REF_SCENES = Path("/root/reference/scenes")
CONFIGS = {
    "cb": REF_SCENES / "cb.glb",
    "cbbunny": REF_SCENES / "cbbunny_area_light.glb",
    "cbbunny_transforms": REF_SCENES / "cbbunny_area_light_transforms.glb",
}


def main():
    names = sys.argv[1:] or ["cbbunny", "cb"]
    for name in names:
        scene = scene_from_file(CONFIGS[name])
        scene.camera = scene.camera.with_resolution(128, 128)
        st = RaytracerSettings(
            samples_per_pixel=2, max_ray_depth=8, light_sample_count=1
        )
        ds = compile_scene(scene)
        raydump.clear()
        render(ds, st)
        print(f"== {name} (128x128, 2spp, depth 8)")
        b = 0
        for batch in raydump.BATCHES:
            act = batch["act"]
            kind = "shadow " if batch["kind"] else "closest"
            frac = float(np.mean(act))
            n = int(np.sum(act))
            if not batch["kind"]:
                print(f"  bounce {b:2d} {kind}: alive {n:7d}/{act.size} "
                      f"({100*frac:5.1f}%)")
                b += 1
            else:
                print(f"            {kind}: act   {n:7d}/{act.size} "
                      f"({100*frac:5.1f}%)")


if __name__ == "__main__":
    main()
