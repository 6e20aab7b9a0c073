"""Probe 2: bisect the north-star divergence between the accumulate paths.

probe_batchshape_exact.py showed batch SHAPE is innocent (B=3072 vs 8x384
bit-equal through render_beauty_chunk). So compare, on cbbunny_transforms:

  A. render_accumulated (morton, single device, chunk_fn fori)
  B. render_accumulated_distributed (raster, 8-tile shard_map fori)
  C. chunk_fn applied per raster 384-slice on one device (no shard_map)
  D. sharded accum step output, per shard

A vs B is the failing test's comparison. C isolates the fori+raster leg
without shard_map; D vs C isolates shard_map itself.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_raytracing.device import compile_scene
from tpu_raytracing.integrator.accumulate import render_accumulated
from tpu_raytracing.integrator.render import StaticSettings, trace_radiance
from tpu_raytracing.ops.rng import SamplerConfig
from tpu_raytracing.parallel import (
    make_render_mesh, render_accumulated_distributed,
)
from tpu_raytracing.parallel.mesh import make_sharded_accum_step
from tpu_raytracing.scene.loaders import scene_from_file
from tpu_raytracing.settings import RaytracerSettings


def report(tag, a, b):
    d = a != b
    npx = d.any(axis=-1).sum()
    print(f"{tag}: differing pixels {npx}/{a.shape[0]*a.shape[1] if a.ndim==3 else a.shape[0]}", flush=True)
    if npx:
        ad = np.abs(a - b)
        print(f"   max abs diff {ad.max():.3e}")
    return npx


def main():
    glb = Path("/root/reference/scenes/cbbunny_area_light_transforms.glb")
    scene = scene_from_file(glb)
    scene.camera = scene.camera.with_resolution(64, 48)
    settings = RaytracerSettings(
        samples_per_pixel=4, light_sample_count=1, max_ray_depth=3,
    )
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)

    ref = render_accumulated(ds, settings, spp_chunk=2)
    mesh = make_render_mesh(n_spp=1)
    out = render_accumulated_distributed(ds, settings, mesh=mesh, spp_chunk=2)
    report("A(single morton) vs B(8-tile dist)", ref.beauty, out.beauty)

    # C: raster-ordered chunk_fn per 384-slice, single device, fori over 2
    # samples x 2 chunks — same association as A/B.
    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def chunk_fn(s0, px_, py_, n_samples):
        def body(i, carry):
            acc, rays = carry
            s = s0 + jnp.uint32(i)
            r, n = trace_radiance(ds, cfg, st, px_, py_, s)
            return acc + r, rays + n

        return jax.lax.fori_loop(
            0, n_samples, body,
            (jnp.zeros((px_.shape[0], 3), jnp.float32),
             jnp.zeros((), jnp.int32)),
        )

    xs = np.arange(64, dtype=np.uint32)
    ys = np.arange(48, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.reshape(-1), gy.reshape(-1)
    n = px.shape[0]

    accC = np.zeros((n, 3), np.float32)
    for s0 in (0, 2):
        parts = []
        for i in range(8):
            sl = slice(i * n // 8, (i + 1) * n // 8)
            r, _ = chunk_fn(
                jnp.uint32(s0), jnp.asarray(px[sl]), jnp.asarray(py[sl]), 2
            )
            parts.append(np.asarray(r))
        accC = accC + np.concatenate(parts, axis=0)
    imgC = (accC / np.float32(4)).reshape(48, 64, 3)
    report("A vs C(raster slices, no shard_map)", ref.beauty, imgC)
    report("B vs C", out.beauty, imgC)

    # D: the sharded accum step directly
    step = make_sharded_accum_step(ds, cfg, st, mesh, 2)
    sh = NamedSharding(mesh, P("tiles"))
    px_d = jax.device_put(jnp.asarray(px), sh)
    py_d = jax.device_put(jnp.asarray(py), sh)
    act_d = jax.device_put(jnp.ones(n, bool), sh)
    accD = np.zeros((n, 3), np.float32)
    for s0 in (0, 2):
        part, _ = step(jnp.uint32(s0), px_d, py_d, act_d)
        accD = accD + np.asarray(part)
    imgD = (accD / np.float32(4)).reshape(48, 64, 3)
    report("C vs D(shard_map step)", imgC, imgD)
    report("B vs D", out.beauty, imgD)


if __name__ == "__main__":
    main()
