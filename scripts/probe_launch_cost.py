"""Per-launch fixed cost of the t8 Pallas kernel (table staging + setup).

An all-dead launch (act=0 everywhere: every tile's root visit votes
nothing and the walk ends after one trip) isolates the per-launch fixed
costs — HBM->VMEM table staging, kernel setup, the fori tile loop's
empty trips — from the real walk work. The gap between all-dead wall
and live wall is the walk; the all-dead wall itself, multiplied by the
launches per render (chunks x bounces x 2 passes), bounds what merging
the shadow walk into the next bounce's closest-hit launch could save.

Usage: python scripts/probe_launch_cost.py  (TPU; BENCH_* knobs apply)
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_BACKEND") == "cpu":
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.ops.traverse_pallas import intersect_tris_pallas
    from tpu_raytracing.scene.loaders import scene_from_file

    ds = compile_scene(
        scene_from_file("/root/reference/scenes/cbbunny_area_light.glb"))
    n = int(os.environ.get("PROBE_RAYS", str(128 * 1024)))
    rng = np.random.RandomState(0)
    # rays from the camera region toward the box: realistic walk load
    origin = jnp.asarray(
        np.tile([[278.0, 273.0, -800.0]], (n, 1)).astype(np.float32))
    d = rng.rand(n, 3).astype(np.float32) - 0.5
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    direction = jnp.asarray(d)
    t_min = jnp.zeros(n, jnp.float32)
    t_max = jnp.full(n, np.inf, jnp.float32)

    @jax.jit
    def live(o, dr, act):
        t, best = intersect_tris_pallas(
            ds, o, dr, t_min, t_max, act, early_exit=False)
        return t.sum(), best.min()

    for label, act in (
        ("live", jnp.ones(n, bool)),
        ("dead", jnp.zeros(n, bool)),
    ):
        r = live(origin, direction, act)  # compile
        jax.block_until_ready(r)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = live(origin, direction, act)
        jax.block_until_ready(r)
        wall = (time.perf_counter() - t0) / reps
        print(f"{label:<6} {n} rays: {wall * 1e3:8.3f} ms/launch", flush=True)


if __name__ == "__main__":
    main()
