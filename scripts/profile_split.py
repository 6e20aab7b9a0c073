"""Device-time split of the headline render from a jax.profiler trace.

Renders cbbunny at BENCH_SPP (default 8) under jax.profiler, then parses
the xplane proto and prints the top device ops grouped into
traversal-kernel vs integrator-fusion buckets — the honest profile the
round-3 verdict asks to drive integrator work from.

Usage: [TPU_RT_*=...] python scripts/profile_split.py
"""
from __future__ import annotations

import glob
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def parse_xplane(trace_dir: Path):
    """Aggregate device-plane XEvent durations by event name.

    Uses the dependency-free wire-format reader in xplane_parse.py (the
    tensorflow xplane_pb2 proto is not importable in this image)."""
    from xplane_parse import device_op_totals

    files = glob.glob(str(trace_dir / "**" / "*.xplane.pb"), recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    latest = max(files, key=os.path.getmtime)
    totals, _planes = device_op_totals(Path(latest))
    return totals, latest


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import render
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.settings import AovFlags, RaytracerSettings

    log(f"backend={jax.default_backend()}")
    name = os.environ.get("PROFILE_SCENE", "cbbunny_area_light")
    glb = Path(f"/root/reference/scenes/{name}.glb")
    scene = scene_from_file(glb)
    spp = int(os.environ.get("BENCH_SPP", "8"))
    settings = RaytracerSettings(
        samples_per_pixel=spp, light_sample_count=1, max_ray_depth=8,
        outputs=AovFlags.BEAUTY,
    )
    ds = compile_scene(scene)
    out = render(ds, settings)  # warm compile outside the trace
    log(f"warm render done ({out.rays_traced} rays)")

    trace_dir = REPO / ".tpu_logs" / "trace"
    with jax.profiler.trace(str(trace_dir)):
        t0 = time.perf_counter()
        out = render(ds, settings)
        wall = time.perf_counter() - t0
    log(f"traced render: {wall:.2f}s wall, "
        f"{out.rays_traced / wall / 1e6:.3f} Mrays/s")

    totals, path = parse_xplane(trace_dir)
    log(f"parsed {path}")
    dev_total = sum(totals.values())
    log(f"device op total: {dev_total:.3f}s")
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    buckets = defaultdict(float)
    for name, t in items:
        ln = name.lower()
        if "walk" in ln or "t8" in ln or "custom-call" in ln:
            buckets["pallas-traversal"] += t
        elif "sort" in ln:
            buckets["sort"] += t
        elif "gather" in ln or "scatter" in ln or "dynamic" in ln:
            buckets["gather/slice"] += t
        elif "fusion" in ln:
            buckets["fusion"] += t
        elif "while" in ln or "conditional" in ln:
            buckets["control"] += t
        else:
            buckets["other"] += t
    for b, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        log(f"  bucket {b:<18} {t:8.3f}s  ({100 * t / max(dev_total, 1e-9):.1f}%)")
    log("top 30 ops:")
    for name, t in items[:30]:
        log(f"  {t * 1e3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
