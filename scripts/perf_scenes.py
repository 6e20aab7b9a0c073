"""Multi-scene throughput table (verdict r2 #7: stop overfitting cbbunny).

Times a beauty render of each BASELINE.json perf config present in the
reference checkout — cb (diffuse+NEE), cb_texture (textured), cbbunny
(mesh BVH), cbbunny_area_light_transforms (shared-BLAS instancing) — on
the current backend and prints one table row per scene. 8 spp / depth 8
/ 1 light sample everywhere so rows are comparable; kernel knobs come
from the environment so this doubles as an A/B harness:

    python scripts/perf_scenes.py                    # TPU, defaults
    TPU_RT_BOUNCE_SORT=0 python scripts/perf_scenes.py
    SCENES=cbbunny,cbbunny_transforms python scripts/perf_scenes.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

REF_SCENES = Path("/root/reference/scenes")
CONFIGS = {
    "cb": REF_SCENES / "cb.glb",
    "cb_texture": REF_SCENES / "cb_texture.glb",
    "cbbunny": REF_SCENES / "cbbunny_area_light.glb",
    "cbbunny_transforms": REF_SCENES / "cbbunny_area_light_transforms.glb",
}


def main():
    import jax

    if os.environ.get("BENCH_BACKEND") == "cpu":
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_raytracing.integrator.render import render
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.settings import AovFlags, RaytracerSettings

    wanted = os.environ.get("SCENES")
    names = wanted.split(",") if wanted else list(CONFIGS)
    spp = int(os.environ.get("BENCH_SPP", "8"))
    print(f"backend={jax.default_backend()} spp={spp} "
          f"sort={os.environ.get('TPU_RT_BOUNCE_SORT', '1')} "
          f"regen={os.environ.get('TPU_RT_REGEN', '0')}", flush=True)
    rows = []
    for name in names:
        path = CONFIGS[name]
        if not path.exists():
            print(f"{name:<22} MISSING {path}")
            continue
        scene = scene_from_file(path)
        settings = RaytracerSettings(
            samples_per_pixel=spp, light_sample_count=1, max_ray_depth=8,
            outputs=AovFlags.BEAUTY,
        )
        ds = compile_scene(scene)
        out = render(ds, settings)        # compile + warm
        t0 = time.perf_counter()
        out = render(ds, settings)
        wall = time.perf_counter() - t0
        assert np.isfinite(out.beauty).all()
        mrays = out.rays_traced / wall / 1e6
        rows.append((name, wall, out.rays_traced, mrays))
        print(f"[{time.strftime('%H:%M:%S')}] {name:<22} {wall:7.2f}s "
              f"{out.rays_traced:>12d} rays  {mrays:7.3f} Mrays/s",
              flush=True)
    print()
    print(f"{'scene':<22} {'wall s':>8} {'Mrays/s':>9}")
    for name, wall, rays, mrays in rows:
        print(f"{name:<22} {wall:8.2f} {mrays:9.3f}")


if __name__ == "__main__":
    main()
