"""Dump the optimized TPU HLO for the headline render_beauty_chunk.

Uses the warm .jax_cache executable (no new compile when run at HEAD
right after bench/profile). Writes /tmp/beauty_chunk_opt.hlo for layout
forensics — which consumers force the {0,1} transposed copies of the
while-carry packs (docs/PERF_LOG.md round 3 profile: copy/slice churn
is 61% of device-op time).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from tpu_raytracing.device import compile_scene
    import importlib

    R = importlib.import_module("tpu_raytracing.integrator.render")
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.settings import AovFlags, RaytracerSettings
    from tpu_raytracing.ops.rng import SamplerConfig

    scene = scene_from_file(Path("/root/reference/scenes/cbbunny_area_light.glb"))
    settings = RaytracerSettings(
        samples_per_pixel=int(os.environ.get("BENCH_SPP", "8")),
        light_sample_count=1,
        max_ray_depth=8,
        outputs=AovFlags.BEAUTY,
    )
    ds = compile_scene(scene)
    st = R.StaticSettings.from_settings(settings)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)

    n = R._default_chunk()
    px = jnp.zeros((n,), jnp.uint32)
    py = jnp.zeros((n,), jnp.uint32)
    act = jnp.ones((n,), bool)
    lowered = R.render_beauty_chunk.lower(ds, cfg, st, px, py, act)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = Path("/tmp/beauty_chunk_opt.hlo")
    out.write_text(txt)
    print(f"wrote {out} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
