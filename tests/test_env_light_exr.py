"""Image-mapped EnvironmentLight through a real lat-long EXR file.

Exercises the full chain the reference uses for its lake_pier map
(lights.rs:137-157): EXR file -> Image decode -> mip atlas ->
eval_texture -> spherical mapping -> miss radiance. The builtin
environment_light scene substitutes a procedural sky (the reference's
EXR is a missing blob upstream); this test gates the EXR-file path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_raytracing.device import compile_scene
from tpu_raytracing.geometry import v3, v4
from tpu_raytracing.lights import EnvironmentLight, TextureMapping
from tpu_raytracing.materials import (
    FilterMode, Image, ImageTexture, TextureSampler, WrapMode,
)
from tpu_raytracing.ops.light_sampling import environment_radiance
from tpu_raytracing.scene import SceneBuilder
from tpu_raytracing.scene.camera import Camera
from tpu_raytracing.utils.exr import write_exr

W, H = 64, 32


def _latlong_exr(tmp_path):
    """Deterministic gradient lat-long map written through our EXR codec."""
    s = (np.arange(W) + 0.5) / W
    t = (np.arange(H) + 0.5) / H
    img = np.zeros((H, W, 3), np.float32)
    img[:, :, 0] = s[None, :]
    img[:, :, 1] = t[:, None]
    img[:, :, 2] = 0.25
    path = tmp_path / "env.exr"
    write_exr(path, {"R": img[:, :, 0], "G": img[:, :, 1], "B": img[:, :, 2]})
    return path, img


@pytest.fixture(scope="module")
def env_scene(tmp_path_factory):
    path, img = _latlong_exr(tmp_path_factory.mktemp("env"))
    sb = SceneBuilder()
    image = Image.load_from_bytes(path.read_bytes())
    env_img = sb.add_image(image)
    env_tex = sb.add_texture(
        ImageTexture(
            image=env_img,
            sampler=TextureSampler(
                filter=FilterMode.NEAREST, wrap=WrapMode.REPEAT
            ),
        )
    )
    sb.add_environment_light(
        EnvironmentLight(radiance=env_tex, mapping=TextureMapping.SPHERICAL)
    )
    sb.add_camera(
        Camera.lookat_camera_perspective(
            v3(0, 0, 0), v3(0, 1, 0), v3(0, 0, 1), False,
            np.deg2rad(45.0), 64, 48,
        )
    )
    return sb.build(), img


def test_exr_roundtrip_radiance(env_scene):
    """environment_radiance returns the expected texel for known directions."""
    scene, img = env_scene
    ds = compile_scene(scene)

    def latlong_dir(s, t):
        # inverse of the spherical mapping in environment_radiance
        theta = t * np.pi                      # angle from +z
        phi = s * 2.0 * np.pi - np.pi          # atan2(x, y)
        return np.array(
            [np.sin(theta) * np.sin(phi), np.sin(theta) * np.cos(phi),
             np.cos(theta)], np.float32,
        )

    # texel centers -> exact nearest-neighbour expectations
    cases = [(4, 7), (31, 16), (60, 30), (0, 0)]
    dirs = np.stack(
        [latlong_dir((x + 0.5) / W, (y + 0.5) / H) for x, y in cases]
    )
    rad = np.asarray(environment_radiance(ds, jnp.asarray(dirs)))
    want = np.stack([img[y, x] for x, y in cases])
    np.testing.assert_allclose(rad, want, atol=1e-3)


def test_env_miss_render(env_scene):
    """A geometry-free render is lit entirely by the EXR environment."""
    from tpu_raytracing.integrator.render import render
    from tpu_raytracing.settings import AovFlags, RaytracerSettings

    scene, _ = env_scene
    s = RaytracerSettings(
        samples_per_pixel=1, light_sample_count=1, max_ray_depth=2,
        outputs=AovFlags.BEAUTY, antialias_primary_rays=False,
    )
    out = render(scene, s)
    assert out.beauty is not None
    # every primary ray misses -> env radiance everywhere; B channel 0.25
    assert np.isfinite(out.beauty).all()
    np.testing.assert_allclose(out.beauty[..., 2], 0.25, atol=1e-3)
    assert (out.beauty[..., 0] > 0).all() and (out.beauty[..., 1] > 0).all()
