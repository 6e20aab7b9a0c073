"""Edge-cost breakdown of the headline render (round 5).

The HEAD profile shows the device 100% busy for 1.37s inside a 1.73s
render wall: ~0.36s happens outside the device window. This brackets
the host-side phases of render() (pixel grid, dispatch loop, ray-count
fetch, beauty fetch, unmorton) with perf_counter to attribute it.

Usage: python scripts/probe_edges.py  (TPU, warm cache)
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


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import (
        StaticSettings, _default_chunk, _pixel_grid, render_beauty_chunk,
    )
    from tpu_raytracing.ops.rng import SamplerConfig
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.settings import RaytracerSettings

    scene = scene_from_file(
        Path("/root/reference/scenes/cbbunny_area_light.glb"))
    s = RaytracerSettings(
        samples_per_pixel=8, light_sample_count=1, max_ray_depth=8)
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(s.sampler, s.seed)
    st = StaticSettings.from_settings(s)

    for rep in range(3):
        t0 = time.perf_counter()
        px, py, unmorton = _pixel_grid(ds.meta.width, ds.meta.height)
        t_grid = time.perf_counter()

        chunk = _default_chunk()
        n = px.shape[0]
        chunk = min(chunk, n)
        results, counts, sizes = [], [], []
        for start in range(0, n, chunk):
            cpx, cpy = px[start:start + chunk], py[start:start + chunk]
            act = np.ones(chunk, bool)
            if cpx.shape[0] < chunk:
                pad = chunk - cpx.shape[0]
                act[chunk - pad:] = False
                cpx = np.concatenate([cpx, np.zeros(pad, cpx.dtype)])
                cpy = np.concatenate([cpy, np.zeros(pad, cpy.dtype)])
            r, nr = render_beauty_chunk(
                ds, cfg, st, jnp.asarray(cpx), jnp.asarray(cpy),
                jnp.asarray(act))
            results.append(r)
            counts.append(nr)
            sizes.append(min(chunk, n - start))
        t_dispatch = time.perf_counter()

        jax.block_until_ready(results)
        t_done = time.perf_counter()

        total_rays = int(sum(int(c) for c in counts))
        t_counts = time.perf_counter()

        host = [np.asarray(r)[:sz] for r, sz in zip(results, sizes)]
        t_fetch = time.perf_counter()

        beauty = np.concatenate(host, axis=0)
        img = beauty[unmorton].reshape(ds.meta.height, ds.meta.width, 3)
        t_host = time.perf_counter()

        wall = t_host - t0
        print(f"rep{rep}: wall {wall:.3f}s = grid {t_grid-t0:.3f} + "
              f"dispatch {t_dispatch-t_grid:.3f} + device-drain "
              f"{t_done-t_dispatch:.3f} + count-fetch {t_counts-t_done:.3f}"
              f" + beauty-fetch {t_fetch-t_counts:.3f} + host-assemble "
              f"{t_host-t_fetch:.3f}  ({total_rays/wall/1e6:.2f} Mrays/s, "
              f"img mean {img.mean():.4f})", flush=True)


if __name__ == "__main__":
    main()
