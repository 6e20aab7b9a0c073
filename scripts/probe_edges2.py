"""Edge-cost probe, part 2: can result fetches overlap chunk compute?

Variant A (HEAD render() order): drain implicit via count fetch first,
then beauty fetch fully exposed.
Variant B: fetch beauty chunks in dispatch order immediately (no
pre-drain) so chunk i's D2H overlaps chunk i+1's execute, counts last.
Variant C: B + all counts fetched via one stacked device op.
"""
from __future__ import annotations

import time
from pathlib import Path
import sys

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
    px, py, unmorton = _pixel_grid(ds.meta.width, ds.meta.height)
    chunk = min(_default_chunk(), px.shape[0])
    n = px.shape[0]

    def dispatch():
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
        return results, counts, sizes

    def finish(beauty, total):
        img = beauty[unmorton].reshape(ds.meta.height, ds.meta.width, 3)
        return img, total

    # warm everything incl. the stack op
    res, cts, szs = dispatch()
    _ = np.asarray(jnp.stack(cts))
    jax.block_until_ready(res)

    for rep in range(3):
        for tag in ("A", "B", "C"):
            t0 = time.perf_counter()
            results, counts, sizes = dispatch()
            if tag == "A":
                total = int(sum(int(c) for c in counts))
                host = [np.asarray(r)[:sz] for r, sz in zip(results, sizes)]
            elif tag == "B":
                host = [np.asarray(r)[:sz] for r, sz in zip(results, sizes)]
                total = int(sum(int(c) for c in counts))
            else:
                host = [np.asarray(r)[:sz] for r, sz in zip(results, sizes)]
                total = int(np.asarray(jnp.stack(counts)).sum())
            img, total = finish(np.concatenate(host, axis=0), total)
            wall = time.perf_counter() - t0
            print(f"rep{rep} {tag}: wall {wall:.3f}s "
                  f"{total/wall/1e6:6.2f} Mrays/s (mean {img.mean():.4f})",
                  flush=True)


if __name__ == "__main__":
    main()
