"""Quad-atlas bilinear fetch: the (P, 16) footprint table must reproduce
the 4-gather bilerp bit-exactly on every edge case (low/high clamp, exact
integer coordinates, 1-wide levels). Counterpart of the reference's single
bilinear path (crates/raytracing-cpu/src/texture.rs sampling)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpu_raytracing.materials import (  # noqa: E402
    FilterMode, Image, ImageTexture, TextureSampler, WrapMode,
)
from tpu_raytracing.ops.textures import _bilerp  # noqa: E402


def _tiny_scene_ds(monkeypatch, quad):
    from tpu_raytracing.device.scene_buffers import compile_scene
    from tpu_raytracing.scene.test_scenes import checkered_plane_scene

    monkeypatch.setenv("TPU_RT_QUAD_ATLAS", "1" if quad else "0")
    scene = checkered_plane_scene()
    rng = np.random.RandomState(7)
    # odd sizes exercise mip rounding; include a 1-wide image
    for w, h in [(5, 3), (1, 4), (530, 7)]:
        data = rng.rand(h, w, 4).astype(np.float32)
        scene.images.append(Image(data=data))
        scene.textures.append(ImageTexture(
            image=len(scene.images) - 1,
            sampler=TextureSampler(
                filter=FilterMode.BILINEAR, wrap=WrapMode.REPEAT),
        ))
    return compile_scene(scene)


def test_quad_atlas_bit_exact(monkeypatch):
    ds_q = _tiny_scene_ds(monkeypatch, quad=True)
    ds_g = _tiny_scene_ds(monkeypatch, quad=False)
    assert ds_q.img_quads is not None and ds_g.img_quads is None

    n_lv = int(ds_q.lvl_pack.shape[0])
    rng = np.random.RandomState(3)
    # hit the edge strips (u*w-0.5 < 0), exact texel centers, corners
    u = np.concatenate([
        rng.rand(256), np.zeros(8), np.ones(8),
        np.linspace(0, 1, 17), np.full(8, 1e-4),
    ]).astype(np.float32)
    v = np.concatenate([
        rng.rand(256), np.ones(8), np.zeros(8),
        np.linspace(1, 0, 17), np.full(8, 1.0 - 1e-4),
    ]).astype(np.float32)
    for lv in range(n_lv):
        level = jnp.full(u.shape, lv, jnp.int32)
        a = np.asarray(_bilerp(ds_q, level, jnp.asarray(u), jnp.asarray(v)))
        b = np.asarray(_bilerp(ds_g, level, jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_array_equal(a, b, err_msg=f"level {lv}")


def test_quad_atlas_cap(monkeypatch):
    ds = _tiny_scene_ds(monkeypatch, quad=True)
    # rows match the base atlas; 16-wide footprints
    assert ds.img_quads.shape == (ds.img_texels.shape[0], 16)
