"""Traversal-kernel microbenchmark on the real TPU (round-2 K sweep).

Times intersect_tris_pallas on realistic cbbunny workloads (coherent
primary rays, bounced secondary rays, shadow rays) for each walk-tile
width K in TPU_RT_TILE_KS (comma list). Per-tile node-visit counts are
measured separately so the K scaling law (visits vs amortization) can be
read directly in the log.

Usage:  TPU_RT_TILE_KS=1,2,4,8 python scripts/bench_traversal.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_raytracing.device import compile_scene
from tpu_raytracing.integrator.render import StaticSettings, _pixel_grid
from tpu_raytracing.ops.camera_rays import generate_rays
from tpu_raytracing.ops.rng import SamplerConfig, make_stream
from tpu_raytracing.ops.traverse import ray_sort_key
from tpu_raytracing.scene.test_scenes import get_test_scene

N = 1 << 17  # rays per batch
REPS = 5


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_workloads():
    ts = get_test_scene("coated_diffuse_bunny")
    scene = ts.scene_func()
    settings = ts.settings_func()
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)

    px, py, _ = _pixel_grid(ds.meta.width, ds.meta.height)
    px, py = jnp.asarray(px[:N]), jnp.asarray(py[:N])
    stream = make_stream(px, py, 0)
    o, d, _, _ = generate_rays(ds, px, py, cfg, stream, 1, jitter=True)

    # primary hit points for the secondary/shadow batches (via the XLA walk
    # on whatever backend; correctness only, timing unaffected)
    from tpu_raytracing.ops.traverse import intersect_scene

    t, prim = intersect_scene(
        ds, o, d, jnp.full(N, 1e-3), jnp.full(N, jnp.inf)
    )
    hitp = o + jnp.where(jnp.isfinite(t), t, 1.0)[:, None] * d

    rng = np.random.default_rng(0)
    sd = rng.normal(size=(N, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sec_o, sec_d = hitp, jnp.asarray(sd)

    light = ds.bounds_center + np.array([0, 0.9, 0]) * ds.bounds_radius
    ld = light[None, :] - hitp
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    sha_o, sha_d = hitp, ld / jnp.maximum(dist, 1e-6)

    def sorted_batch(o, d):
        key = ray_sort_key(ds, o, d)
        order = jnp.argsort(key)
        return (np.asarray(o)[order], np.asarray(d)[order])

    return ds, {
        "primary": (*sorted_batch(o, d), False),
        "secondary": (*sorted_batch(sec_o, sec_d), False),
        "shadow": (*sorted_batch(sha_o, sha_d), True),
    }


def main():
    ks = [int(x) for x in os.environ.get("TPU_RT_TILE_KS", "1,2,4,8").split(",")]
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    ds, work = build_workloads()
    log(f"bunny: {ds.meta.n_tris} tris, quad recs table "
        f"{ds.bvh4_recs_pk.size * 4 / 1e6:.2f} MB")

    from tpu_raytracing.ops.traverse_pallas import intersect_tris_pallas

    tmin = jnp.full(N, 1e-3, jnp.float32)
    tmax = jnp.full(N, np.inf, jnp.float32)
    act = jnp.ones(N, bool)

    results = {}
    for k in ks:
        os.environ["TPU_RT_TILE_K"] = str(k)
        for name, (o, d, early) in work.items():
            o, d = jnp.asarray(o), jnp.asarray(d)
            for attempt in range(2):
                try:
                    t0 = time.perf_counter()
                    t, best = intersect_tris_pallas(
                        ds, o, d, tmin, tmax, act, early_exit=early)
                    jax.block_until_ready((t, best))
                    compile_s = time.perf_counter() - t0
                    times = []
                    for _ in range(REPS):
                        t0 = time.perf_counter()
                        t, best = intersect_tris_pallas(
                            ds, o, d, tmin, tmax, act, early_exit=early)
                        jax.block_until_ready((t, best))
                        times.append(time.perf_counter() - t0)
                    dt = min(times)
                    mrays = N / dt / 1e6
                    # visit counts (separate executable; run once)
                    _, _, visits = intersect_tris_pallas(
                        ds, o, d, tmin, tmax, act, early_exit=early,
                        with_visits=True)
                    visits = np.asarray(visits)
                    results[(k, name)] = (mrays, dt, visits)
                    log(
                        f"K={k:2d} {name:9s}: {mrays:8.2f} Mrays/s "
                        f"({dt*1e3:7.2f} ms, compile {compile_s:.1f}s) "
                        f"visits/tile mean={visits.mean():.0f} "
                        f"max={visits.max()} total={visits.sum()}"
                    )
                    break
                except Exception as e:  # TPU worker crash: retry once
                    log(f"K={k} {name}: attempt {attempt} failed: {e!r}")
                    if attempt:
                        raise

    log("=== summary (closest-hit primary) ===")
    for k in ks:
        if (k, "primary") in results:
            m, dt, v = results[(k, "primary")]
            log(f"K={k:2d}: {m:8.2f} Mrays/s  visits total {v.sum()}")


if __name__ == "__main__":
    main()
