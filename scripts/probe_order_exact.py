"""Probe 3: WHICH batch property changes per-pixel radiance on
cbbunny_transforms? Candidates left after probe 2: pixel ORDER within the
batch (morton vs raster), batch SIZE through the chunk_fn/trace_radiance
path, or the active argument.

Runs trace_radiance for sample 0 only (no fori, no accumulation) at:
  R3072  raster order, one batch
  M3072  morton order, one batch  (scatter back to raster for compare)
  R384   raster order, 8 slices
  REV    reversed raster order, one batch (pure permutation test)
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_raytracing.device import compile_scene
from tpu_raytracing.integrator.render import (
    StaticSettings, _pixel_grid, trace_radiance,
)
from tpu_raytracing.ops.rng import SamplerConfig
from tpu_raytracing.scene.loaders import scene_from_file
from tpu_raytracing.settings import RaytracerSettings


def main():
    glb = Path("/root/reference/scenes/cbbunny_area_light_transforms.glb")
    scene = scene_from_file(glb)
    scene.camera = scene.camera.with_resolution(64, 48)
    settings = RaytracerSettings(
        samples_per_pixel=4, light_sample_count=1, max_ray_depth=3,
    )
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)

    fn = jax.jit(lambda a, b: trace_radiance(ds, cfg, st, a, b, jnp.uint32(0))[0])

    xs = np.arange(64, dtype=np.uint32)
    ys = np.arange(48, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.reshape(-1), gy.reshape(-1)
    n = px.shape[0]

    r3072 = np.asarray(fn(jnp.asarray(px), jnp.asarray(py)))

    mpx, mpy, unm = _pixel_grid(64, 48)
    m = np.asarray(fn(jnp.asarray(mpx), jnp.asarray(mpy)))[unm]

    parts = []
    for i in range(8):
        sl = slice(i * n // 8, (i + 1) * n // 8)
        parts.append(np.asarray(fn(jnp.asarray(px[sl]), jnp.asarray(py[sl]))))
    r384 = np.concatenate(parts)

    rev = np.asarray(fn(jnp.asarray(px[::-1]), jnp.asarray(py[::-1])))[::-1]

    def rep(tag, a, b):
        npx = (a != b).any(axis=-1).sum()
        print(f"{tag}: differing pixels {npx}/{n}"
              + (f", max {np.abs(a-b).max():.3e}" if npx else ""), flush=True)

    rep("R3072 vs M3072 (order)", r3072, m)
    rep("R3072 vs R384 (size)", r3072, r384)
    rep("R3072 vs REV (permutation)", r3072, rev)


if __name__ == "__main__":
    main()
