"""In-situ attribution of the quad kernel's ~0.9µs/visit cost (round 2).

Times the REAL quad kernel on the heavy cbbunny secondary-ray workload with
additive construct probes (TPU_RT_KERNEL_PROBE): each probe adds redundant
copies of one body construct with semantics preserved, so

    marginal_cost(construct) = (t_probe - t_base) / copies / visits.

R kernel calls are wrapped in ONE jit so the ~40ms/call eager tunnel
dispatch overhead amortizes away.

Usage: python scripts/bench_quad_probe.py [probe ...]
       default probes: '' row:2 switch:2 extract:8 reduce:2 cond:4
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 1 << 17
R = 10  # kernel calls per jit dispatch


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import _pixel_grid
    from tpu_raytracing.ops.camera_rays import generate_rays
    from tpu_raytracing.ops.rng import SamplerConfig, make_stream
    from tpu_raytracing.ops.traverse import intersect_scene, ray_sort_key
    from tpu_raytracing.ops import traverse_pallas as TP
    from tpu_raytracing.scene.test_scenes import get_test_scene

    ts = get_test_scene("coated_diffuse_bunny")
    scene, settings = ts.scene_func(), ts.settings_func()
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)

    px, py, _ = _pixel_grid(ds.meta.width, ds.meta.height)
    px, py = jnp.asarray(px[:N]), jnp.asarray(py[:N])
    stream = make_stream(px, py, 0)
    o, d, _, _ = generate_rays(ds, px, py, cfg, stream, 1, jitter=True)
    t, prim = intersect_scene(ds, o, d, jnp.full(N, 1e-3), jnp.full(N, jnp.inf))
    hitp = o + jnp.where(jnp.isfinite(t), t, 1.0)[:, None] * d
    rng = np.random.default_rng(0)
    sd = rng.normal(size=(N, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sec_o, sec_d = hitp, jnp.asarray(sd)
    key = ray_sort_key(ds, sec_o, sec_d)
    order = np.asarray(jnp.argsort(key))
    o_s = jnp.asarray(np.asarray(sec_o)[order])
    d_s = jnp.asarray(np.asarray(sec_d)[order])

    tmin = jnp.full(N, 1e-3, jnp.float32)
    tmax = jnp.full(N, np.inf, jnp.float32)
    act = jnp.ones(N, bool)

    @partial(jax.jit, static_argnums=(0,))
    def run_r(probe_key, o, dd, tmn, tmx, a):
        # R chained calls: each consumes the previous best as t_max scale
        # guard (prevents CSE; visits shrink slightly after call 1, then fix)
        acc = jnp.zeros((), jnp.float32)
        tmx_i = tmx
        for i in range(R):
            t, b = TP.intersect_tris_pallas(ds, o, dd, tmn, tmx_i, a)
            acc = acc + jnp.sum(jnp.where(b >= 0, t, 0.0))
            # keep t_max = inf but data-dependent: min(inf, big*(1+t0))
            tmx_i = tmx + jnp.abs(acc) * 0.0 + jnp.float32(i) * 0.0
            tmx_i = jnp.where(t < -1.0, t, tmx)  # always tmx, unfoldable
        return acc

    probes = sys.argv[1:] or ["", "row:2", "switch:2", "extract:8",
                              "reduce:2", "cond:4"]

    # visit count for per-visit math (probe-independent)
    os.environ["TPU_RT_KERNEL_PROBE"] = ""
    _, _, visits = TP.intersect_tris_pallas(
        ds, o_s, d_s, tmin, tmax, act, with_visits=True)
    total_visits = int(np.asarray(visits).sum())
    log(f"workload: {N} secondary rays, {total_visits} tile-visits")

    results = {}
    for p in probes:
        os.environ["TPU_RT_KERNEL_PROBE"] = p
        t0 = time.perf_counter()
        run_r(p, o_s, d_s, tmin, tmax, act).block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_r(p, o_s, d_s, tmin, tmax, act).block_until_ready()
            times.append(time.perf_counter() - t0)
        dt = min(times) / R
        per_visit = dt / total_visits * 1e9
        results[p] = dt
        log(f"probe {p or '(none)':12s}: {dt*1e3:7.2f} ms/call "
            f"({per_visit:6.1f} ns/visit, compile {compile_s:.1f}s)")

    base = results.get("", None)
    if base:
        log("=== marginal cost per added construct copy ===")
        for p, dt in results.items():
            if not p:
                continue
            name, _, n = p.partition(":")
            n = int(n or 1)
            log(f"{name:8s}: {(dt - base) / n / total_visits * 1e9:7.1f} ns/visit/copy")


if __name__ == "__main__":
    main()
