"""Batched light sampling + environment lighting (device).

Counterpart of raytracing-cpu/src/lights.rs. Shadow rays run from the light
toward the shading point (lights.rs:28-36) and occlusion is tested on
t in [1e-3, distance - 1e-3] (lights.rs:159-168).

Note one deliberate divergence: the reference converts the area-light pdf to
solid angle with `d^2 / |dot(dir_world, n)|` where dir_world is UNNORMALIZED
(length d), i.e. effectively d/cos(theta) (lights.rs:113) — and uses the
*object-space* triangle area under instance transforms. We use the correct
world-space conversion pdf_area * d^2 / cos(theta); snapshots are blessed
against this renderer's own output.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..device.scene_buffers import (
    DeviceScene, LIGHT_AREA, LIGHT_DIRECTION, LIGHT_POINT,
)
from .linalg import cross, dot, normalize
from .tables import select_rows
from .rng import SampleStream, SamplerConfig, sample_uniform, sample_uniform2
from .textures import EvalCtx, eval_texture


class LightSample(NamedTuple):
    radiance: jax.Array    # (B, 3)
    origin: jax.Array      # (B, 3) shadow-ray origin (on the light)
    direction: jax.Array   # (B, 3) shadow-ray direction (light -> point)
    distance: jax.Array    # (B,)
    pdf: jax.Array         # (B,)


def sample_light(
    ds: DeviceScene,
    light_index: int,          # static
    point,                     # (B, 3) shading points
    cfg: SamplerConfig,
    stream: SampleStream,
) -> Tuple[LightSample, SampleStream]:
    kind = ds.meta.light_kinds[light_index]
    li = light_index
    B = point.shape[0]

    if kind == LIGHT_POINT:
        pos = ds.light_va[li]
        d_vec = point - pos
        d = jnp.linalg.norm(d_vec, axis=-1)
        safe_d = jnp.where(d == 0.0, 1.0, d)
        return (
            LightSample(
                radiance=ds.light_vb[li] / (safe_d * safe_d)[:, None],
                origin=jnp.broadcast_to(pos, point.shape),
                direction=d_vec / safe_d[:, None],
                distance=d,
                pdf=jnp.ones(B, point.dtype),
            ),
            stream,
        )

    if kind == LIGHT_DIRECTION:
        direction = ds.light_va[li]
        diameter = ds.bounds_radius * 2.0
        origin = point - direction * diameter
        return (
            LightSample(
                radiance=jnp.broadcast_to(ds.light_vb[li], point.shape),
                origin=origin,
                direction=jnp.broadcast_to(normalize(direction), point.shape),
                distance=jnp.broadcast_to(diameter, (B,)),
                pdf=jnp.ones(B, point.dtype),
            ),
            stream,
        )

    assert kind == LIGHT_AREA
    n_tris = ds.light_emit_count[li]
    u_tri, stream = sample_uniform(cfg, stream)
    tri_rel = jnp.minimum(
        (u_tri * n_tris.astype(jnp.float32)).astype(jnp.int32), n_tris - 1
    )
    idx = ds.light_emit_first[li] + tri_rel
    u, stream = sample_uniform2(cfg, stream)
    # low-distortion square -> triangle mapping (lights.rs:66-77)
    u0, u1 = u[:, 0], u[:, 1]
    lt = u0 < u1
    b0 = jnp.where(lt, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(lt, u1 - u0 / 2.0, u1 / 2.0)
    b2 = 1.0 - b0 - b1

    # one wide fetch instead of 8 narrow ones; select-chain when the
    # emitter set is tiny (ops/tables.py)
    sh = select_rows(ds.em_shade, idx)
    p0, p1, p2 = sh[:, 0:3], sh[:, 3:6], sh[:, 6:9]
    p_world = b0[:, None] * p0 + b1[:, None] * p1 + b2[:, None] * p2
    dir_world = point - p_world
    d = jnp.linalg.norm(dir_world, axis=-1)
    safe_d = jnp.where(d == 0.0, 1.0, d)
    dir_unit = dir_world / safe_d[:, None]

    n_interp = (
        b0[:, None] * sh[:, 9:12]
        + b1[:, None] * sh[:, 12:15]
        + b2[:, None] * sh[:, 15:18]
    )
    n_geo = normalize(cross(p2 - p0, p1 - p0))
    has_n = jax.lax.bitcast_convert_type(sh[:, 19], jnp.int32) != 0
    n = jnp.where(has_n[:, None], normalize(n_interp), n_geo)

    cos = dot(dir_unit, n)
    radiance = jnp.where(
        (cos < 0.0)[:, None], 0.0, jnp.broadcast_to(ds.light_vb[li], point.shape)
    )
    area = sh[:, 18]
    safe_cos = jnp.maximum(jnp.abs(cos), 1e-9)
    pdf = (
        (1.0 / n_tris.astype(jnp.float32))
        * (1.0 / jnp.maximum(area, 1e-20))
        * (d * d)
        / safe_cos
    )
    return (
        LightSample(
            radiance=radiance,
            origin=p_world,
            direction=dir_unit,
            distance=d,
            pdf=pdf,
        ),
        stream,
    )


def light_emitted_radiance(ds: DeviceScene, light_idx):
    """Radiance seen when a path directly hits an emitter (lights.rs:124-135)."""
    li = jnp.maximum(light_idx, 0)
    is_area = select_rows(ds.light_kind, li) == LIGHT_AREA
    return jnp.where(
        ((light_idx >= 0) & is_area)[:, None], select_rows(ds.light_vb, li), 0.0
    )


def environment_radiance(ds: DeviceScene, direction):
    """Spherical lat-long environment lookup (lights.rs:137-157)."""
    d = normalize(direction)
    t = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0)) / jnp.pi
    s = (jnp.arctan2(d[..., 0], d[..., 1]) + jnp.pi) / (2.0 * jnp.pi)
    uv = jnp.stack([s, t], axis=-1)
    ctx = EvalCtx.without_antialiasing(uv)
    tid = jnp.full(direction.shape[:-1], ds.meta.env_tex, jnp.int32)
    kinds = ds.meta.env_kinds or None  # static: reach set of env_tex only
    return eval_texture(ds, tid, ctx, has_derivs=False, kinds=kinds)[..., :3]
