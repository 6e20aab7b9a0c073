"""Probe: is per-pixel radiance bit-exact across BATCH SHAPES on one device?

The north-star test (tests/test_parallel.py:145) fails with ~1-ULP diffs on
cbbunny_transforms under 8-tile sharding. Hypothesis (VERDICT r4): the
divergence is shard-SHAPE-dependent compilation (fusion/FMA contraction on
the CPU backend), not anything about the mesh/collectives. This probe
removes the mesh: render the same 3072 pixels once at B=3072 and once as
8 sequential chunks of B=384, single device, identical code path.

If they differ, bit-exactness across tile shardings is unattainable on a
shape-specializing compiler and the invariant must be re-scoped to
ULP-tolerance; if they match, the mesh path itself is the bug.
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
    StaticSettings, render_beauty_chunk,
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

    xs = np.arange(64, dtype=np.uint32)
    ys = np.arange(48, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.reshape(-1), gy.reshape(-1)
    n = px.shape[0]

    full, _ = render_beauty_chunk(ds, cfg, st, jnp.asarray(px), jnp.asarray(py))
    full = np.asarray(full)

    parts = []
    for i in range(8):
        sl = slice(i * n // 8, (i + 1) * n // 8)
        r, _ = render_beauty_chunk(
            ds, cfg, st, jnp.asarray(px[sl]), jnp.asarray(py[sl])
        )
        parts.append(np.asarray(r))
    split = np.concatenate(parts, axis=0)

    diff = full != split
    npix = diff.any(axis=1).sum()
    print(f"B=3072 vs 8x B=384 (single device, no mesh):")
    print(f"  differing pixels: {npix}/{n}")
    if npix:
        ad = np.abs(full - split)
        mask = ad > 0
        print(f"  max abs diff: {ad.max():.3e}")
        # ULP distance in f32
        fi = full.view(np.int32).astype(np.int64)
        si = split.view(np.int32).astype(np.int64)
        ulp = np.abs(fi - si)[mask]
        print(f"  ulp: max={ulp.max()} mean={ulp.mean():.2f}")
        idx = np.argwhere(diff.any(axis=1))[:5, 0]
        for i in idx:
            print(f"    pixel ({px[i]},{py[i]}): {full[i]} vs {split[i]}")
    # also: does a second identical B=3072 run match itself? (sanity)
    full2, _ = render_beauty_chunk(
        ds, cfg, st, jnp.asarray(px), jnp.asarray(py)
    )
    print(f"  self-reproducible at B=3072: {np.array_equal(full, np.asarray(full2))}")


if __name__ == "__main__":
    main()
