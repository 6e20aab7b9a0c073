"""Capture honest per-bounce ray batches from a real render (CPU).

Renders one Morton pixel chunk of the bench scene at 1 spp through the
real integrator with TPU_RT_DUMP_RAYS=1 and saves every traversal call's
inputs to /tmp/raydump_<scene>.npz for scripts/probe_reorg.py.

Usage: python scripts/dump_rays.py [scene] [chunk_pow2] [offset|mid]

The default offset "mid" takes the chunk centered in Morton order —
the first chunk is the image's top-left corner, where most primary
rays miss the whole scene and the batches are unrepresentative.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["TPU_RT_PALLAS"] = "0"      # XLA walk: fast on CPU, same rays
os.environ["TPU_RT_DUMP_RAYS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tpu_raytracing.device import compile_scene  # noqa: E402
from tpu_raytracing.integrator.render import (  # noqa: E402
    StaticSettings, _pixel_grid, trace_radiance,
)
from tpu_raytracing.ops.rng import SamplerConfig  # noqa: E402
from tpu_raytracing.scene.loaders import scene_from_file  # noqa: E402
from tpu_raytracing.settings import RaytracerSettings  # noqa: E402
from tpu_raytracing.utils import raydump  # noqa: E402

SCENES = {
    "cbbunny": "/root/reference/scenes/cbbunny_area_light.glb",
    "cb": "/root/reference/scenes/cb.glb",
    "cb_texture": "/root/reference/scenes/cb_texture.glb",
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cbbunny"
    chunk = 1 << int(sys.argv[2] if len(sys.argv) > 2 else "17")
    scene = scene_from_file(Path(SCENES[name]))
    settings = RaytracerSettings(
        samples_per_pixel=1, light_sample_count=1, max_ray_depth=8)
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)
    px, py, _ = _pixel_grid(ds.meta.width, ds.meta.height)
    n = min(chunk, px.shape[0])
    off_arg = sys.argv[3] if len(sys.argv) > 3 else "mid"
    off = (px.shape[0] - n) // 2 if off_arg == "mid" else int(off_arg)
    off = max(0, min(off, px.shape[0] - n))
    print(f"chunk [{off}:{off+n}] of {px.shape[0]} px")
    t0 = time.time()
    r, nrays = trace_radiance(ds, cfg, st, px[off:off + n],
                              py[off:off + n], 0)
    np.asarray(r)
    print(f"rendered {n} px, {int(nrays)} rays, {time.time()-t0:.1f}s, "
          f"{len(raydump.BATCHES)} batches")
    out = f"/tmp/raydump_{name}.npz"
    raydump.save(out)
    print("saved", out)


if __name__ == "__main__":
    main()
