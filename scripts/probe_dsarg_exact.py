"""Probe 5: does passing DeviceScene as a jit ARGUMENT (vs closure constant)
change per-pixel bits?

render_accumulated's chunk_fn is the only call site that passes ds as a
traced argument (accumulate.py:100-111); render_beauty_chunk, the shard_map
paths, and all probes close over it. Closure arrays become XLA constants
(foldable), arguments are runtime buffers — different fusion/contraction.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

from functools import partial

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

    @partial(jax.jit, static_argnums=(1, 2))
    def fn_arg(ds_, cfg_, st_, a, b):
        return trace_radiance(ds_, cfg_, st_, a, b, jnp.uint32(0))[0]

    fn_closed = jax.jit(
        lambda a, b: trace_radiance(ds, cfg, st, a, b, jnp.uint32(0))[0]
    )

    xs = np.arange(64, dtype=np.uint32)
    ys = np.arange(48, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.reshape(-1), gy.reshape(-1)
    n = px.shape[0]

    arg = np.asarray(fn_arg(ds, cfg, st, jnp.asarray(px), jnp.asarray(py)))
    closed = np.asarray(fn_closed(jnp.asarray(px), jnp.asarray(py)))

    npx = (arg != closed).any(axis=-1).sum()
    print(f"ds-as-argument vs ds-closed-over: differing pixels {npx}/{n}"
          + (f", max {np.abs(arg-closed).max():.3e}" if npx else ""))


if __name__ == "__main__":
    main()
