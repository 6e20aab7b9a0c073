"""Multi-chip sharding: mesh construction, dry run, determinism across shardings.

Mirrors the reference's bit-exactness-across-thread-counts requirement
(visual-testing/README.md:103): RNG streams are keyed by (pixel, sample),
so the image must be identical for any tile sharding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_raytracing.device import compile_scene
from tpu_raytracing.integrator.render import StaticSettings, render_beauty_chunk
from tpu_raytracing.ops.rng import SamplerConfig
from tpu_raytracing.parallel import make_render_mesh, make_sharded_step
from tpu_raytracing.scene.test_scenes import get_test_scene


@pytest.fixture(scope="module")
def scene_setup():
    ts = get_test_scene("checkered_plane")
    scene = ts.scene_func()
    settings = ts.settings_func()
    settings.samples_per_pixel = 4
    settings.light_sample_count = 1
    settings.max_ray_depth = 2
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)
    return ds, cfg, st


def _pixels(ds, n):
    rng = np.random.default_rng(7)
    px = rng.integers(0, ds.meta.width, n, dtype=np.uint32)
    py = rng.integers(0, ds.meta.height, n, dtype=np.uint32)
    return px, py


def _run(ds, cfg, st, mesh, px, py, active=None):
    step = make_sharded_step(ds, cfg, st, mesh)
    sh = NamedSharding(mesh, P("tiles"))
    px_d = jax.device_put(jnp.asarray(px), sh)
    py_d = jax.device_put(jnp.asarray(py), sh)
    if active is None:
        active = np.ones(px.shape[0], bool)
    act_d = jax.device_put(jnp.asarray(active), sh)
    radiance, rays = step(px_d, py_d, act_d)
    return np.asarray(radiance), int(rays)


def test_tile_sharding_bit_exact(scene_setup):
    """8-way tile sharding == 1-device reference, bitwise."""
    ds, cfg, st = scene_setup
    px, py = _pixels(ds, 256)

    ref, _ = render_beauty_chunk(ds, cfg, st, jnp.asarray(px), jnp.asarray(py))
    ref = np.asarray(ref)

    mesh8 = make_render_mesh(n_tiles=8, n_spp=1)
    out8, rays8 = _run(ds, cfg, st, mesh8, px, py)
    np.testing.assert_array_equal(out8, ref)
    assert rays8 > 0

    mesh2 = make_render_mesh(n_tiles=2, n_spp=1, devices=jax.devices()[:2])
    out2, _ = _run(ds, cfg, st, mesh2, px, py)
    np.testing.assert_array_equal(out2, ref)


def test_spp_sharding_close(scene_setup):
    """spp-sharded psum accumulation matches within fp reassociation noise."""
    ds, cfg, st = scene_setup
    px, py = _pixels(ds, 128)

    ref, _ = render_beauty_chunk(ds, cfg, st, jnp.asarray(px), jnp.asarray(py))
    ref = np.asarray(ref)

    mesh = make_render_mesh(n_tiles=2, n_spp=4)
    out, _ = _run(ds, cfg, st, mesh, px, py)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_spp_not_divisible_raises(scene_setup):
    ds, cfg, st = scene_setup
    mesh = make_render_mesh(n_tiles=2, n_spp=4)
    bad = st._replace(samples_per_pixel=6)
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_step(ds, cfg, bad, mesh)


def _tiny_frame_scene():
    """checkered_plane with the camera rebuilt at 37x27 (999 pixels: not a
    multiple of 8 tiles, so render_distributed must pad a dead lane)."""
    from tpu_raytracing.scene.camera import create_perspective_transform

    ts = get_test_scene("checkered_plane")
    scene = ts.scene_func()
    cam = scene.camera
    w, h = 37, 27
    c2r = create_perspective_transform(
        cam.far_clip, cam.near_clip, cam.camera_type.yfov, w, h
    )
    cam.raster_width, cam.raster_height = w, h
    cam.world_to_raster = cam.camera_to_world.invert().compose(c2r)
    cam.raster_to_camera = c2r.invert()
    settings = ts.settings_func()
    settings.samples_per_pixel = 2
    settings.light_sample_count = 1
    settings.max_ray_depth = 2
    return scene, settings


def test_render_distributed_full_frame():
    """Full-frame distributed render (parallel/mesh.py:107-152): padding,
    bit-exact beauty vs the single-device driver, and an exact ray count
    (padded lanes must not be traced or counted)."""
    from tpu_raytracing.integrator.render import render
    from tpu_raytracing.parallel import render_distributed

    scene, settings = _tiny_frame_scene()
    ref = render(scene, settings)
    mesh = make_render_mesh(n_tiles=8, n_spp=1)
    out = render_distributed(scene, settings, mesh=mesh)
    np.testing.assert_array_equal(out.beauty, ref.beauty)
    assert out.rays_traced == ref.rays_traced
    assert out.normals is None  # AOV passes are not distributed


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_north_star_checkpoint_resume_tile_sharding(tmp_path):
    """North-star composition (BASELINE config 5, scaled for CI):
    cbbunny_transforms through render_accumulated_distributed with
    checkpoint-resume on the 8-device mesh — bit-exact vs the
    single-device checkpointed render."""
    from pathlib import Path

    from tpu_raytracing.integrator.accumulate import render_accumulated
    from tpu_raytracing.parallel import render_accumulated_distributed
    from tpu_raytracing.scene.loaders import scene_from_file
    from tpu_raytracing.settings import RaytracerSettings

    glb = Path("/root/reference/scenes/cbbunny_area_light_transforms.glb")
    if not glb.exists():
        pytest.skip("reference scenes not mounted")
    scene = scene_from_file(glb)
    # shrink the camera raster for CI; the scene/instancing stays intact
    scene.camera = scene.camera.with_resolution(64, 48)
    settings = RaytracerSettings(
        samples_per_pixel=4, light_sample_count=1, max_ray_depth=3,
    )
    ds = compile_scene(scene)

    ref = render_accumulated(ds, settings, spp_chunk=2)

    # interrupted + resumed distributed render over the full 8-tile mesh
    mesh = make_render_mesh(n_spp=1)
    ck = tmp_path / "north_star.npz"
    seen = []

    def interrupt(img, spp_done):
        seen.append(spp_done)
        if spp_done >= 2:
            raise KeyboardInterrupt  # simulate a mid-render failure

    try:
        render_accumulated_distributed(
            ds, settings, mesh=mesh, spp_chunk=2, checkpoint_path=ck,
            on_chunk=interrupt,
        )
    except KeyboardInterrupt:
        pass
    assert seen == [2] and ck.exists()

    out = render_accumulated_distributed(
        ds, settings, mesh=mesh, spp_chunk=2, checkpoint_path=ck,
    )
    assert out.beauty is not None
    assert np.array_equal(out.beauty, ref.beauty), (
        "checkpoint-resume x tile-sharding broke bit-exactness"
    )
    assert out.rays_traced == ref.rays_traced


def test_accum_distributed_spp_sharding_close():
    """(tiles, spp) = (4, 2): spp sharding changes only fp association."""
    from tpu_raytracing.integrator.accumulate import render_accumulated
    from tpu_raytracing.parallel import render_accumulated_distributed

    ts = get_test_scene("checkered_plane")
    scene = ts.scene_func()
    settings = ts.settings_func()
    settings.samples_per_pixel = 4
    settings.light_sample_count = 1
    settings.max_ray_depth = 2
    ds = compile_scene(scene)

    ref = render_accumulated(ds, settings, spp_chunk=4)
    mesh = make_render_mesh(n_tiles=4, n_spp=2)
    out = render_accumulated_distributed(ds, settings, mesh=mesh, spp_chunk=4)
    np.testing.assert_allclose(out.beauty, ref.beauty, rtol=2e-5, atol=2e-5)
    assert out.rays_traced == ref.rays_traced
