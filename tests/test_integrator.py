"""Integrator-level correctness: analytic radiance, occlusion, bounce gating.

Counterparts of the reference's implicit correctness contract (§3.2):
direct lighting obeys the inverse-square/cosine law, shadow rays occlude,
accumulate_bounces=False keeps only the final-depth contribution.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_raytracing.device import compile_scene
from tpu_raytracing.geometry import Mesh, Sphere, TriangleMesh
from tpu_raytracing.integrator.render import (
    StaticSettings, render, trace_radiance,
)
from tpu_raytracing.materials import ConstantTexture, Diffuse
from tpu_raytracing.ops.rng import SamplerConfig
from tpu_raytracing.scene.camera import Camera
from tpu_raytracing.scene.scene import SceneBuilder
from tpu_raytracing.settings import AovFlags, RaytracerSettings

F = np.float32


def _plane_mesh(half=50.0, z=0.0):
    v = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        F,
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    normals = np.tile(np.array([[0, 0, 1]], F), (4, 1))
    return Mesh(vertices=v, tris=tris, normals=normals)


def _plane_scene(albedo=(1.0, 1.0, 1.0), light_z=5.0, intensity=100.0,
                 blocker=False):
    sb = SceneBuilder()
    tex = sb.add_texture(ConstantTexture(value=np.asarray([*albedo, 1.0], F)))
    mat = sb.add_material(Diffuse(albedo=tex))
    from tpu_raytracing.geometry import Transform

    sb.add_shape_with_transform(
        TriangleMesh(mesh=_plane_mesh()), mat, Transform.identity(), None
    )
    if blocker:
        sb.add_shape_at_position(
            Sphere(center=np.zeros(3, F), radius=0.5), mat, [0, 0, light_z / 2]
        )
    sb.add_point_light([0.0, 0.0, light_z], [intensity] * 3)
    # camera off the light axis so a blocker on that axis is not in view
    cam_pos = [3.0, 0.0, 4.0] if blocker else [0.0, 0.0, 5.0]
    sb.add_camera(
        Camera.lookat_camera_perspective(
            cam_pos, [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], False,
            np.deg2rad(40.0), 64, 64,
        )
    )
    return sb.build()


def _center_radiance(scene, **kw):
    settings = RaytracerSettings(
        samples_per_pixel=1, light_sample_count=1, max_ray_depth=1,
        antialias_primary_rays=False, outputs=AovFlags.BEAUTY, **kw,
    )
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)
    px = jnp.asarray([32], jnp.uint32)
    py = jnp.asarray([32], jnp.uint32)
    r, _ = trace_radiance(ds, cfg, st, px, py, jnp.uint32(0))
    return np.asarray(r)[0]


def test_direct_lighting_inverse_square():
    """Diffuse plane, normal-incidence point light: L = albedo/pi * I/d^2."""
    r = _center_radiance(_plane_scene(light_z=5.0, intensity=100.0))
    expected = (1.0 / np.pi) * 100.0 / 25.0
    np.testing.assert_allclose(r, expected, rtol=2e-2)


def test_albedo_scales_radiance():
    r_half = _center_radiance(_plane_scene(albedo=(0.5, 0.25, 1.0)))
    r_full = _center_radiance(_plane_scene())
    np.testing.assert_allclose(r_half, r_full * np.array([0.5, 0.25, 1.0]),
                               rtol=1e-5)


def test_shadow_occlusion():
    """A sphere between light and plane center blocks direct light."""
    r = _center_radiance(_plane_scene(blocker=True))
    assert np.all(r < 1e-6), r


def test_accumulate_bounces_false_drops_direct():
    """With accumulate_bounces=False only final-depth light is kept
    (renderer/mod.rs:84-117 semantics: depth-gated contributions)."""
    scene = _plane_scene()
    full = _center_radiance(scene)
    settings = dict(accumulate_bounces=False)
    ds = compile_scene(scene)
    s = RaytracerSettings(
        samples_per_pixel=1, light_sample_count=1, max_ray_depth=2,
        antialias_primary_rays=False, accumulate_bounces=False,
    )
    cfg = SamplerConfig.from_settings(s.sampler, s.seed)
    st = StaticSettings.from_settings(s)
    r, _ = trace_radiance(
        ds, cfg, st, jnp.asarray([32], jnp.uint32), jnp.asarray([32], jnp.uint32),
        jnp.uint32(0),
    )
    r = np.asarray(r)[0]
    # depth-1 direct lighting must be excluded; only depth-2 light remains,
    # which for this one-plane scene is tiny (bounce off plane to nothing)
    assert np.all(r < full * 0.1)


def test_render_full_frame_finite_and_deterministic():
    scene = _plane_scene()
    s = RaytracerSettings(samples_per_pixel=2, light_sample_count=1)
    out1 = render(scene, s, chunk_pixels=1 << 10)
    out2 = render(scene, s, chunk_pixels=1 << 11)
    assert np.isfinite(out1.beauty).all()
    np.testing.assert_array_equal(out1.beauty, out2.beauty)
    assert out1.rays_traced > 0
