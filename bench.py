"""Headline benchmark: Mrays/s on the cbbunny Cornell-box scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json): >=500 Mrays/s per chip on cbbunny
(cbbunny_area_light.glb when available, else the builtin
coated_diffuse_bunny scene) — the reference publishes no numbers of its
own (SURVEY.md §6), so vs_baseline is value/500.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_MRAYS = 500.0
REPO = Path(__file__).resolve().parent


def _load_scene():
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.scene.test_scenes import get_test_scene

    glb = Path("/root/reference/scenes/cbbunny_area_light.glb")
    if glb.exists():
        return "cbbunny", scene_from_file(glb)
    ts = get_test_scene("coated_diffuse_bunny")
    return "coated_diffuse_bunny", ts.scene_func()


def main() -> None:
    import jax

    # persistent compile cache: remote-TPU compiles take minutes; cache
    # survives across processes/rounds
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    platform = jax.default_backend()
    # default spp sized so warmup+timed renders stay within a driver-friendly
    # wall-clock at current chip throughput; BENCH_SPP overrides
    spp = int(os.environ.get("BENCH_SPP", "8" if platform == "tpu" else "2"))

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import render
    from tpu_raytracing.settings import AovFlags, RaytracerSettings

    name, scene = _load_scene()
    settings = RaytracerSettings(
        samples_per_pixel=spp,
        light_sample_count=1,
        max_ray_depth=8,
        outputs=AovFlags.BEAUTY,
    )

    ds = compile_scene(scene)
    chunk = None if platform == "tpu" else 1 << 13  # platform default on TPU
    t0 = time.perf_counter()
    out = render(ds, settings, chunk_pixels=chunk)
    wall = time.perf_counter() - t0
    # second run is compile-cache warm: report steady-state throughput
    t0 = time.perf_counter()
    out = render(ds, settings, chunk_pixels=chunk)
    wall = time.perf_counter() - t0

    assert out.beauty is not None and np.isfinite(out.beauty).all()
    mrays = out.rays_traced / wall / 1e6
    print(
        json.dumps(
            {
                "metric": f"pathtrace_{name}_{spp}spp_mrays_per_s",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
