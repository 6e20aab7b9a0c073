"""Multi-scene throughput table (verdict r2 #7: stop overfitting cbbunny).

Times a beauty render of each BASELINE.json perf config present in the
reference checkout — cb (diffuse+NEE), cb_texture (textured), cbbunny
(mesh BVH), cbbunny_area_light_transforms (shared-BLAS instancing) — on
the current backend and prints one table row per scene. 8 spp / depth 8
/ 1 light sample everywhere so rows are comparable; kernel knobs come
from the environment so this doubles as an A/B harness:

    python scripts/perf_scenes.py                    # TPU, defaults
    TPU_RT_BOUNCE_SORT=0 python scripts/perf_scenes.py
    SCENES=cbbunny,cbbunny_transforms REPEATS=5 python scripts/perf_scenes.py

Measurement protocol (round-4 ±2% resolution, docs/PERF_LOG.md):
REPEATS warm renders per scene (default 3), report min and median, and
record the 1-minute loadavg around every repeat — the host is 1-core
and concurrent CPU work depresses TPU walls ~15%, so any repeat with
loadavg > 0.7 is flagged LOAD and should not be trusted. For knob A/Bs
use scripts/ab.py, which interleaves control/treatment processes.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path
from statistics import median

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
LOAD_FLAG = 0.7  # 1-core host: above this the wall is depressed ~15%


def loadavg() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:
        return -1.0


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
    reps = int(os.environ.get("REPEATS", "3"))
    knobs = {k: v for k, v in os.environ.items() if k.startswith("TPU_RT_")}
    print(f"backend={jax.default_backend()} spp={spp} reps={reps} "
          f"load={loadavg():.2f} knobs={knobs}", flush=True)
    rows = []
    for name in names:
        path = CONFIGS[name]
        if not path.exists():
            print(f"{name:<22} MISSING {path}")
            continue
        scene = scene_from_file(path)
        settings = RaytracerSettings(
            samples_per_pixel=spp,
            light_sample_count=int(os.environ.get("BENCH_LIGHT_SAMPLES",
                                                  "1")),
            max_ray_depth=8,
            outputs=AovFlags.BEAUTY,
        )
        ds = compile_scene(scene)
        out = render(ds, settings)        # compile + warm
        samples = []
        for r in range(reps):
            la0 = loadavg()
            t0 = time.perf_counter()
            out = render(ds, settings)
            wall = time.perf_counter() - t0
            la1 = loadavg()
            assert np.isfinite(out.beauty).all()
            mrays = out.rays_traced / wall / 1e6
            hot = max(la0, la1) > LOAD_FLAG
            samples.append((mrays, wall, hot))
            print(f"[{time.strftime('%H:%M:%S')}] {name:<22} rep{r} "
                  f"{wall:7.2f}s {mrays:7.3f} Mrays/s  load={la1:.2f}"
                  f"{'  **LOAD**' if hot else ''}", flush=True)
        clean = [(m, w) for m, w, hot in samples if not hot] or [
            (m, w) for m, w, _ in samples]
        rows.append((name, out.rays_traced,
                     max(m for m, _ in clean),
                     median(m for m, _ in clean),
                     min(w for _, w in clean),
                     len(samples) - len(clean)
                     if len(clean) < len(samples) else 0))
    print()
    print(f"{'scene':<22} {'rays':>12} {'best':>8} {'median':>8} "
          f"{'min wall':>9} flagged")
    for name, rays, best, med, wall, flagged in rows:
        print(f"{name:<22} {rays:>12d} {best:8.3f} {med:8.3f} "
              f"{wall:9.2f} {flagged}")
    # machine-parsable summary (scripts/ab.py reads these); wall is the
    # leg-comparable number when a knob changes rays_traced itself
    for name, rays, best, med, wall, flagged in rows:
        print(f"RESULT {name} best={best:.3f} median={med:.3f} "
              f"wall={wall:.3f} flagged={flagged}", flush=True)


if __name__ == "__main__":
    main()
