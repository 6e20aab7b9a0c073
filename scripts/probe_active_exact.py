"""Probe 4: does the `active` argument x batch size change per-pixel bits?

Probe 2/3 narrowed the north-star divergence to path A (render_accumulated:
B=3072, morton, active=ones) vs everything else (B=384 shards). Probe 3
cleared order/size/permutation WITHOUT active. Here: trace_radiance with
active=ones at B=3072 vs B=384, raster order, sample 0, no fori.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_raytracing.device import compile_scene
from tpu_raytracing.integrator.render import StaticSettings, trace_radiance
from tpu_raytracing.ops.rng import SamplerConfig
from tpu_raytracing.scene.loaders import scene_from_file
from tpu_raytracing.settings import RaytracerSettings


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

    fn_act = jax.jit(
        lambda a, b, act: trace_radiance(
            ds, cfg, st, a, b, jnp.uint32(0), active=act
        )[0]
    )
    fn_plain = jax.jit(
        lambda a, b: trace_radiance(ds, cfg, st, a, b, jnp.uint32(0))[0]
    )

    xs = np.arange(64, dtype=np.uint32)
    ys = np.arange(48, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.reshape(-1), gy.reshape(-1)
    n = px.shape[0]

    big_act = np.asarray(
        fn_act(jnp.asarray(px), jnp.asarray(py), jnp.ones(n, bool))
    )
    big_plain = np.asarray(fn_plain(jnp.asarray(px), jnp.asarray(py)))

    parts = []
    for i in range(8):
        sl = slice(i * n // 8, (i + 1) * n // 8)
        parts.append(np.asarray(fn_act(
            jnp.asarray(px[sl]), jnp.asarray(py[sl]),
            jnp.ones(n // 8, bool),
        )))
    small_act = np.concatenate(parts)

    def rep(tag, a, b):
        npx = (a != b).any(axis=-1).sum()
        print(f"{tag}: differing pixels {npx}/{n}"
              + (f", max {np.abs(a-b).max():.3e}" if npx else ""), flush=True)

    rep("B3072+active vs B3072 plain", big_act, big_plain)
    rep("B3072+active vs 8xB384+active", big_act, small_act)
    rep("B3072 plain  vs 8xB384+active", big_plain, small_act)


if __name__ == "__main__":
    main()
