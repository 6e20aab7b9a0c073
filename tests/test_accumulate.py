"""Checkpoint/resume accumulation (integrator/accumulate.py)."""
import numpy as np
import pytest

from tpu_raytracing.integrator.accumulate import render_accumulated
from tpu_raytracing.integrator.render import render
from tpu_raytracing.scene.test_scenes import get_test_scene
from tpu_raytracing.settings import AovFlags


@pytest.fixture(scope="module")
def scene_settings():
    ts = get_test_scene("checkered_plane")
    s = ts.settings_func()
    s.samples_per_pixel = 4
    s.light_sample_count = 1
    s.max_ray_depth = 2
    s.outputs = AovFlags.BEAUTY
    # ray-differential scale depends on total spp; disable antialiasing so a
    # 2-spp run reproduces the 4-spp run's first chunk bit-exactly
    s.antialias_primary_rays = False
    return ts.scene_func(), s


def test_chunked_matches_oneshot_samples(scene_settings):
    """Chunked accumulation covers the same absolute sample set; result
    matches the one-shot render within f32 reassociation noise."""
    scene, s = scene_settings
    full = render(scene, s, chunk_pixels=1 << 12)
    acc = render_accumulated(scene, s, spp_chunk=2, chunk_pixels=1 << 12)
    np.testing.assert_allclose(acc.beauty, full.beauty, rtol=1e-5, atol=1e-6)
    assert acc.rays_traced > 0


def test_ragged_final_chunk(scene_settings):
    """total_spp % spp_chunk != 0 renders exactly total_spp samples (the
    final chunk is sized to the remainder, not a full spp_chunk)."""
    scene, s = scene_settings
    s3 = type(s)(**{**s.__dict__})
    s3.samples_per_pixel = 3
    full = render(scene, s3, chunk_pixels=1 << 12)
    acc = render_accumulated(scene, s3, spp_chunk=2, chunk_pixels=1 << 12)
    np.testing.assert_allclose(acc.beauty, full.beauty, rtol=1e-5, atol=1e-6)
    assert acc.rays_traced == full.rays_traced


def test_resume_from_partial_checkpoint(scene_settings, tmp_path):
    """A checkpoint holding only the first chunk resumes to the same final
    image as an uninterrupted run (sample indices are absolute)."""
    scene, s = scene_settings
    ck = tmp_path / "ck.npz"
    ref = render_accumulated(scene, s, spp_chunk=2, checkpoint_path=ck,
                             chunk_pixels=1 << 12)
    full = dict(np.load(ck, allow_pickle=False))

    # a genuine partial state: same chunking, total spp=2 (samples 0..1)
    s2 = type(s)(**{**s.__dict__})
    s2.samples_per_pixel = 2
    ck2 = tmp_path / "ck2.npz"
    render_accumulated(scene, s2, spp_chunk=2, checkpoint_path=ck2,
                       chunk_pixels=1 << 12)
    partial = dict(np.load(ck2, allow_pickle=False))

    # graft the partial accumulator into the 4-spp fingerprint context
    np.savez(
        ck, accum=partial["accum"], spp_done=2, rays=partial["rays"],
        fingerprint=full["fingerprint"], spp_chunk=2,
    )
    resumed = render_accumulated(scene, s, spp_chunk=2, checkpoint_path=ck,
                                 chunk_pixels=1 << 12)
    np.testing.assert_array_equal(resumed.beauty, ref.beauty)


def test_mismatched_checkpoint_restarts(scene_settings, tmp_path, caplog):
    scene, s = scene_settings
    ck = tmp_path / "ck.npz"
    render_accumulated(scene, s, spp_chunk=2, checkpoint_path=ck,
                       chunk_pixels=1 << 12)
    s2 = type(s)(**{**s.__dict__})
    s2.seed = 123  # different settings -> fingerprint mismatch
    out = render_accumulated(scene, s2, spp_chunk=2, checkpoint_path=ck,
                             chunk_pixels=1 << 12)
    assert np.isfinite(out.beauty).all()


def test_on_chunk_progressive_hook(scene_settings):
    """on_chunk gets a live partial average after every spp chunk."""
    scene, s = scene_settings
    seen = []
    out = render_accumulated(
        scene, s, spp_chunk=2, chunk_pixels=1 << 12,
        on_chunk=lambda img, done: seen.append((img.copy(), done)),
    )
    assert [d for _, d in seen] == list(
        range(2, s.samples_per_pixel + 1, 2)
    ) or [d for _, d in seen][-1] == s.samples_per_pixel
    np.testing.assert_array_equal(seen[-1][0], out.beauty)
