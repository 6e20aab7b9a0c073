"""Batched camera ray generation + ray differentials (device).

Counterpart of raytracing-cpu/src/lib.rs:111-245: orthographic / pinhole /
thin-lens rays through raster_to_camera + camera_to_world, per-pixel jitter,
concentric-disk lens sampling, and differentials scaled by
max(0.125, sqrt(1/spp)) to account for supersampling.

Vectors are lane-major V3 component triples (ops/vec.py) — dense 1-D
layouts on TPU instead of 128-lane-padded (B, 3) rows.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..device.scene_buffers import (
    CAM_ORTHOGRAPHIC, CAM_PINHOLE, CAM_THIN_LENS, DeviceScene,
)
from .linalg import apply_point, apply_vector
from .rng import (
    SampleStream, SamplerConfig, sample_uniform2, sample_unit_disk_concentric,
)
from .vec import V3


def _camera_ray(ds: DeviceScene, x, y, lens):
    """One ray per lane from raster coords (x, y); lens: ((B,), (B,)) or None."""
    kind = ds.meta.cam_kind
    r2c = ds.cam_raster_to_camera
    c2w = ds.cam_camera_to_world
    raster = V3(x, y, jnp.zeros_like(x))

    if kind == CAM_ORTHOGRAPHIC:
        o_cam = apply_point(r2c, raster)
        d_cam = V3(jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x))
        o = apply_point(c2w, o_cam)
        d = apply_vector(c2w, d_cam).normalize()
        return o, d

    p_cam = apply_point(r2c, raster)
    if kind == CAM_PINHOLE or lens is None:
        o_cam = V3.zeros(x.shape, x.dtype)
        d_cam = p_cam.normalize()
    else:
        assert kind == CAM_THIN_LENS
        ap = ds.meta.aperture_radius
        focal = ds.meta.focal_distance
        t = focal / p_cam.z
        focus = p_cam * t
        o_cam = V3(lens[0] * ap, lens[1] * ap, jnp.zeros_like(x))
        d_cam = (focus - o_cam).normalize()
    o = apply_point(c2w, o_cam)
    d = apply_vector(c2w, d_cam).normalize()
    return o, d


def generate_rays(
    ds: DeviceScene,
    px, py,                    # (B,) integer pixel coords
    cfg: SamplerConfig,
    stream: SampleStream,
    spp: int,
    jitter: bool,
) -> Tuple[V3, V3, tuple, SampleStream]:
    """Returns (origin V3, direction V3, differentials, stream).

    Differentials: (x_origin, y_origin, x_direction, y_direction) V3s.
    """
    fx = px.astype(jnp.float32)
    fy = py.astype(jnp.float32)
    if jitter:
        u, stream = sample_uniform2(cfg, stream)
        x = fx + u[:, 0]
        y = fy + u[:, 1]
    else:
        x = fx + 0.5
        y = fy + 0.5

    lens = None
    if ds.meta.cam_kind == CAM_THIN_LENS:
        ul, stream = sample_uniform2(cfg, stream)
        disk = sample_unit_disk_concentric(ul)
        lens = (disk[..., 0], disk[..., 1])

    o, d = _camera_ray(ds, x, y, lens)
    ox, dx = _camera_ray(ds, x + 1.0, y, lens)
    oy, dy = _camera_ray(ds, x, y + 1.0, lens)

    scale = max(0.125, (1.0 / spp) ** 0.5)
    scaled_x = (d + (dx - d) * scale).normalize()
    scaled_y = (d + (dy - d) * scale).normalize()
    diff = (ox - o, oy - o, scaled_x - d, scaled_y - d)
    return o, d, diff, stream
