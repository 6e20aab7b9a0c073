"""Converged cross-backend evidence for the specular scenes (verdict r3 #3).

Renders dielectric / metal / rough_dielectric / out_of_focus_sphere at
SPP (default 64) on the CURRENT backend and writes beauty + stats to
.tpu_logs/specular/<backend>_<scene>.npz. Run once per backend:

    SPECULAR_BACKEND=cpu python scripts/specular_gap.py
    python scripts/specular_gap.py            # TPU (ambient)
    python scripts/specular_gap.py compare    # print the gap table

The recorded tonemapped means/block stats are the evidence tests.toml
tolerances must cite (docs/SPECULAR_GAP_r3.md).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

SCENES = ["dielectric", "metal", "rough_dielectric", "out_of_focus_sphere"]
OUT = REPO / ".tpu_logs" / "specular"


def tm(x):
    x = np.maximum(x.astype(np.float64), 0.0)
    return x / (1.0 + x)


def block_rel(ta, tb, grid=8):
    denom = max(float(tb.mean()), 1e-9)
    worst = 0.0
    for ra, rb in zip(np.array_split(ta, grid, 0), np.array_split(tb, grid, 0)):
        for ba, bb in zip(np.array_split(ra, grid, 1), np.array_split(rb, grid, 1)):
            worst = max(worst, abs(float(ba.mean() - bb.mean())) / denom)
    return worst


def render_all():
    import jax

    if os.environ.get("SPECULAR_BACKEND") == "cpu":
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_raytracing.integrator.accumulate import render_accumulated
    from tpu_raytracing.scene.test_scenes import get_test_scene
    from tpu_raytracing.settings import AovFlags

    backend = jax.default_backend()
    spp = int(os.environ.get("SPP", "64"))
    OUT.mkdir(parents=True, exist_ok=True)
    for name in SCENES:
        ts = get_test_scene(name)
        scene, settings = ts.scene_func(), ts.settings_func()
        settings.samples_per_pixel = spp
        settings.light_sample_count = 1
        settings.outputs = AovFlags.BEAUTY
        t0 = time.perf_counter()
        # spp-chunked accumulation: same executable size at any spp (the
        # 64spp one-shot executable is the known TPU worker crasher)
        out = render_accumulated(scene, settings, spp_chunk=16)
        wall = time.perf_counter() - t0
        path = OUT / f"{backend}_{name}.npz"
        np.savez_compressed(path, beauty=out.beauty.astype(np.float32))
        t = tm(out.beauty)
        print(
            f"[{time.strftime('%H:%M:%S')}] {backend} {name}: {wall:.1f}s "
            f"tm_mean={t.mean():.6f} raw_mean={out.beauty.mean():.5f}",
            flush=True,
        )


def compare():
    print(f"{'scene':<22} {'cpu tm-mean':>12} {'tpu tm-mean':>12} "
          f"{'rel gap':>9} {'block_rel':>9}")
    for name in SCENES:
        try:
            cpu = np.load(OUT / f"cpu_{name}.npz")["beauty"]
            tpu = np.load(OUT / f"tpu_{name}.npz")["beauty"]
        except FileNotFoundError as e:
            print(f"{name:<22} missing: {e.filename}")
            continue
        tc, tt = tm(cpu), tm(tpu)
        gap = abs(tt.mean() - tc.mean()) / tc.mean()
        br = block_rel(tt, tc)
        print(f"{name:<22} {tc.mean():12.6f} {tt.mean():12.6f} "
              f"{gap:9.4f} {br:9.4f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare()
    else:
        render_all()
