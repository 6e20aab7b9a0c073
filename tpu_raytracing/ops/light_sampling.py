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

Vectors are lane-major V3 component triples (ops/vec.py).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..device.scene_buffers import (
    DeviceScene, LIGHT_AREA, LIGHT_DIRECTION, LIGHT_POINT,
)
from .rng import SampleStream, SamplerConfig, sample_uniform, sample_uniform2c
from .textures import EvalCtx, eval_texture
from .vec import V3


class LightSample(NamedTuple):
    radiance: V3           # per-lane components
    origin: V3             # shadow-ray origin (on the light)
    direction: V3          # shadow-ray direction (light -> point)
    distance: jax.Array    # (B,)
    pdf: jax.Array         # (B,)


def sample_light(
    ds: DeviceScene,
    light_index: int,          # static
    point: V3,                 # shading points
    cfg: SamplerConfig,
    stream: SampleStream,
) -> Tuple[LightSample, SampleStream]:
    kind = ds.meta.light_kinds[light_index]
    li = light_index
    B = point.x.shape[0]
    f32 = point.x.dtype

    if kind == LIGHT_POINT:
        pos = V3.from_rows(ds.light_va[li])  # (3,) consts
        d_vec = point - pos
        d = d_vec.norm()
        safe_d = jnp.where(d == 0.0, 1.0, d)
        ones = jnp.ones(B, f32)
        return (
            LightSample(
                radiance=V3.from_rows(ds.light_vb[li]) / (safe_d * safe_d),
                origin=pos * ones,
                direction=d_vec / safe_d,
                distance=d,
                pdf=ones,
            ),
            stream,
        )

    if kind == LIGHT_DIRECTION:
        direction = V3.from_rows(ds.light_va[li])
        diameter = ds.bounds_radius * 2.0
        origin = point - direction * diameter
        ones = jnp.ones(B, f32)
        return (
            LightSample(
                radiance=V3.from_rows(ds.light_vb[li]) * ones,
                origin=origin,
                direction=direction.normalize() * ones,
                distance=jnp.broadcast_to(diameter, (B,)),
                pdf=ones,
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
    u0, u1, stream = sample_uniform2c(cfg, stream)
    # low-distortion square -> triangle mapping (lights.rs:66-77)
    lt = u0 < u1
    b0 = jnp.where(lt, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(lt, u1 - u0 / 2.0, u1 / 2.0)
    b2 = 1.0 - b0 - b1

    sh = ds.em_shade[idx]  # one wide gather instead of 8 narrow ones
    p0 = V3.from_rows(sh[:, 0:3])
    p1 = V3.from_rows(sh[:, 3:6])
    p2 = V3.from_rows(sh[:, 6:9])
    p_world = p0 * b0 + p1 * b1 + p2 * b2
    dir_world = point - p_world
    d = dir_world.norm()
    safe_d = jnp.where(d == 0.0, 1.0, d)
    dir_unit = dir_world / safe_d

    n_interp = (
        V3.from_rows(sh[:, 9:12]) * b0
        + V3.from_rows(sh[:, 12:15]) * b1
        + V3.from_rows(sh[:, 15:18]) * b2
    )
    n_geo = (p2 - p0).cross(p1 - p0).normalize()
    has_n = jax.lax.bitcast_convert_type(sh[:, 19], jnp.int32) != 0
    n = V3.where(has_n, n_interp.normalize(), n_geo)

    cos = dir_unit.dot(n)
    radiance = V3.where(
        cos < 0.0, V3.const(0.0, 0.0, 0.0),
        V3.from_rows(ds.light_vb[li]) * jnp.ones(B, f32),
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


def light_emitted_radiance(ds: DeviceScene, light_idx) -> V3:
    """Radiance seen when a path directly hits an emitter (lights.rs:124-135)."""
    li = jnp.maximum(light_idx, 0)
    is_area = ds.light_kind[li] == LIGHT_AREA
    vb = V3.from_rows(ds.light_vb[li])
    return V3.where((light_idx >= 0) & is_area, vb, V3.const(0.0, 0.0, 0.0))


def environment_radiance(ds: DeviceScene, direction: V3) -> V3:
    """Spherical lat-long environment lookup (lights.rs:137-157)."""
    d = direction.normalize()
    t = jnp.arccos(jnp.clip(d.z, -1.0, 1.0)) / jnp.pi
    s = (jnp.arctan2(d.x, d.y) + jnp.pi) / (2.0 * jnp.pi)
    ctx = EvalCtx.without_antialiasing(s, t)
    tid = jnp.full(s.shape, ds.meta.env_tex, jnp.int32)
    r, g, b, _ = eval_texture(ds, tid, ctx, has_derivs=False)
    return V3(r, g, b)
