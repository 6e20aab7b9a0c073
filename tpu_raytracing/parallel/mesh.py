"""Multi-chip sharded rendering over a (tiles, spp) device mesh.

TPU-native replacement for the reference's two parallel mechanisms
(SURVEY.md §2.7): the CPU backend's mutex tile work-queue
(raytracing-cpu/src/lib.rs:481-504,705-805) becomes data parallelism over a
``tiles`` mesh axis (deterministic tile -> device assignment instead of work
stealing), and high-spp renders additionally shard the sample loop over an
``spp`` axis whose partial sums are combined with an ICI all-reduce
(``jax.lax.psum``).

Determinism contract: RNG streams are keyed by (pixel, sample), never by
worker (ops/rng.py), so images are bit-identical for any ``tiles`` sharding
— the same property the reference guarantees across thread counts
(visual-testing/README.md:103). Sharding ``spp`` changes only the floating-
point summation order of per-sample radiance.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..device import DeviceScene, compile_scene
from ..integrator.render import StaticSettings, trace_radiance
from ..ops.rng import SamplerConfig
from ..settings import AovFlags, RaytracerSettings, RenderOutput

TILE_AXIS = "tiles"
SPP_AXIS = "spp"


def make_render_mesh(
    n_tiles: Optional[int] = None,
    n_spp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (tiles, spp) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tiles is None:
        n_tiles = len(devices) // n_spp
    if n_tiles * n_spp != len(devices):
        raise ValueError(
            f"mesh {n_tiles}x{n_spp} != device count {len(devices)}"
        )
    dev_grid = np.asarray(devices).reshape(n_tiles, n_spp)
    return Mesh(dev_grid, (TILE_AXIS, SPP_AXIS))


def make_sharded_step(
    ds: DeviceScene,
    cfg: SamplerConfig,
    st: StaticSettings,
    mesh: Mesh,
):
    """jit-compiled sharded render step: (px, py) -> (radiance, rays).

    px/py are sharded over ``tiles``; each spp-shard accumulates its
    contiguous block of sample indices and the blocks are psum-reduced, so
    chip count only affects fp summation order, not which samples exist.
    """
    n_spp_shards = mesh.shape[SPP_AXIS]
    if st.samples_per_pixel % n_spp_shards != 0:
        raise ValueError(
            f"samples_per_pixel={st.samples_per_pixel} not divisible by "
            f"spp mesh axis {n_spp_shards}"
        )
    spp_per = st.samples_per_pixel // n_spp_shards
    inv_spp = np.float32(1.0 / st.samples_per_pixel)

    def shard_fn(px, py, active):
        spp_rank = jax.lax.axis_index(SPP_AXIS)

        def body(i, carry):
            acc, rays = carry
            s = (spp_rank * spp_per + i).astype(jnp.uint32)
            r, n = trace_radiance(ds, cfg, st, px, py, s, active=active)
            return acc + r, rays + n

        total, rays = jax.lax.fori_loop(
            0, spp_per, body,
            (jnp.zeros((px.shape[0], 3), jnp.float32), jnp.zeros((), jnp.int32)),
        )
        total = jax.lax.psum(total, SPP_AXIS)
        rays = jax.lax.psum(rays, (TILE_AXIS, SPP_AXIS))
        return total * inv_spp, rays

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
        out_specs=(P(TILE_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def render_distributed(
    scene_or_device,
    settings: RaytracerSettings,
    mesh: Optional[Mesh] = None,
    n_spp_shards: int = 1,
) -> RenderOutput:
    """Full-frame beauty render sharded over a device mesh.

    The pixel grid is padded to a multiple of the tile axis; every device
    renders its contiguous slice (deterministic assignment). AOV passes are
    single-device (cheap) — use integrator.render for them.
    """
    ds = (
        scene_or_device
        if isinstance(scene_or_device, DeviceScene)
        else compile_scene(scene_or_device)
    )
    if mesh is None:
        mesh = make_render_mesh(n_spp=n_spp_shards)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)
    step = make_sharded_step(ds, cfg, st, mesh)

    width, height = ds.meta.width, ds.meta.height
    xs = np.arange(width, dtype=np.uint32)
    ys = np.arange(height, dtype=np.uint32)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.reshape(-1), gy.reshape(-1)
    n = px.shape[0]
    n_tiles = mesh.shape[TILE_AXIS]
    pad = (-n) % n_tiles
    # padded lanes carry active=False: they trace nothing and are excluded
    # from the psum'd ray count
    active = np.ones(n + pad, bool)
    if pad:
        px = np.concatenate([px, np.zeros(pad, px.dtype)])
        py = np.concatenate([py, np.zeros(pad, py.dtype)])
        active[n:] = False

    sharding = NamedSharding(mesh, P(TILE_AXIS))
    px_d = jax.device_put(jnp.asarray(px), sharding)
    py_d = jax.device_put(jnp.asarray(py), sharding)
    act_d = jax.device_put(jnp.asarray(active), sharding)
    radiance, rays = step(px_d, py_d, act_d)
    beauty = np.asarray(radiance)[:n].reshape(height, width, 3)

    out = RenderOutput(width=width, height=height)
    if settings.outputs & AovFlags.BEAUTY:
        out.beauty = beauty
    out.rays_traced = int(rays)
    return out


def dryrun_step(mesh: Mesh, n_pixels: int = 256, spp: int = 8) -> np.ndarray:
    """Compile + execute one full sharded render step on tiny shapes.

    Used by the driver's multi-chip dry run: builds a builtin scene, jits
    the sharded step over the given mesh, and runs it once.
    """
    from ..scene.test_scenes import get_test_scene

    ts = get_test_scene("checkered_plane")
    scene = ts.scene_func()
    settings = ts.settings_func()
    settings.samples_per_pixel = spp
    settings.light_sample_count = 1
    settings.max_ray_depth = 2

    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)
    step = make_sharded_step(ds, cfg, st, mesh)

    n_tiles = mesh.shape[TILE_AXIS]
    n_pixels = max(n_pixels, n_tiles)
    n_pixels += (-n_pixels) % n_tiles
    rng = np.random.default_rng(0)
    px = rng.integers(0, ds.meta.width, n_pixels, dtype=np.uint32)
    py = rng.integers(0, ds.meta.height, n_pixels, dtype=np.uint32)
    sharding = NamedSharding(mesh, P(TILE_AXIS))
    px_d = jax.device_put(jnp.asarray(px), sharding)
    py_d = jax.device_put(jnp.asarray(py), sharding)
    act_d = jax.device_put(jnp.ones(n_pixels, bool), sharding)
    radiance, rays = step(px_d, py_d, act_d)
    jax.block_until_ready(radiance)
    return np.asarray(radiance)
