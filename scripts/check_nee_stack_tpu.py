"""TPU bit-identity check for TPU_RT_NEE_STACK (round 5).

The CPU leg is locked by tests/test_trace_modes.py; this verifies the
same property on the real chip: stacking the n_s area-light shadow
walks into one lane-major interleaved occluded() call must leave the
radiance image AND ray count bit-identical (per-lane walk results are
tile-grouping-invariant — the chunk-invariance property the Pallas
path also guarantees, CLAUDE.md Invariants).

Usage: python scripts/check_nee_stack_tpu.py  (needs the TPU; uses the
executables the perf_scenes warm runs already compiled)
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import (
        StaticSettings, _pixel_grid, trace_radiance,
    )
    from tpu_raytracing.ops.rng import SamplerConfig
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.settings import RaytracerSettings

    scene = scene_from_file(
        Path("/root/reference/scenes/cbbunny_area_light.glb"))
    s = RaytracerSettings(
        samples_per_pixel=8, light_sample_count=4, max_ray_depth=8)
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(s.sampler, s.seed)
    st = StaticSettings.from_settings(s)
    px, py, _ = _pixel_grid(ds.meta.width, ds.meta.height)
    n = min(1 << 17, px.shape[0])
    off = (px.shape[0] - n) // 2
    px, py = px[off:off + n], py[off:off + n]

    import functools

    # one jitted executable per leg (eager trace_radiance dispatches
    # thousands of ops at ~30 ms each over the tunnel); the static flag
    # argument keeps the two legs' cache entries distinct even though
    # the knob itself is read from the environment at trace time
    @functools.partial(jax.jit, static_argnums=(0,))
    def leg(flag, px, py):
        return trace_radiance(ds, cfg, st, px, py, 0)

    imgs, rays = [], []
    for flag in ("0", "1"):
        os.environ["TPU_RT_NEE_STACK"] = flag
        r, nr = leg(flag, px, py)
        imgs.append(np.asarray(r))
        rays.append(int(nr))
        print(f"stack={flag}: rays {rays[-1]}, mean {imgs[-1].mean():.6f}",
              flush=True)

    same_img = bool(np.array_equal(imgs[0], imgs[1]))
    same_rays = rays[0] == rays[1]
    print(f"image bit-identical: {same_img}; rays equal: {same_rays}")
    if not (same_img and same_rays):
        d = np.abs(imgs[0] - imgs[1])
        print(f"  max abs diff {d.max():.3e} on {(d > 0).sum()} lanes")
        sys.exit(1)


if __name__ == "__main__":
    main()
