"""Bisect the TPU specular zero-pixel bug (round-3).

Renders the metal scene at 8spp on the ambient (TPU) backend under the
config named by argv[1], then probes the known-bad highlight pixels.
CPU truth at (249,171): ~17790 per-sample radiance (all samples bright).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_raytracing.integrator.render import render
    from tpu_raytracing.scene.test_scenes import get_test_scene
    from tpu_raytracing.settings import AovFlags

    ts = get_test_scene("metal")
    scene, settings = ts.scene_func(), ts.settings_func()
    settings.samples_per_pixel = 8
    settings.light_sample_count = 1
    settings.outputs = AovFlags.BEAUTY
    t0 = time.perf_counter()
    out = render(scene, settings)
    wall = time.perf_counter() - t0
    b = out.beauty
    probe = [(249, 171), (250, 172), (244, 35), (284, 75)]
    print(f"[{time.strftime('%H:%M:%S')}] wall={wall:.1f}s "
          f"backend={jax.default_backend()}", flush=True)
    for x, y in probe:
        print(f"  pix({x},{y}) rgb={np.asarray(b[y, x]).round(2)}")
    region = b[160:185, 235:265]
    zero = (region.max(axis=-1) == 0.0).sum()
    print(f"  zero pixels in highlight region: {zero}/{region.shape[0]*region.shape[1]}")
    print(f"  image mean: {b.mean():.4f}")


if __name__ == "__main__":
    main()
