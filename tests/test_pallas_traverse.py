"""Lockstep Pallas traversal vs the batched jnp walk (interpret mode on CPU).

The kernel shares one scalar node pointer per tile; AABB containment makes
each lane's hit set identical to an independent walk, so the winning
primitive must match exactly and t within FMA-contraction ULPs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tpu_raytracing.ops.traverse as T
from tpu_raytracing.device import compile_scene
from tpu_raytracing.ops.traverse_pallas import intersect_tris_pallas, supports
from tpu_raytracing.scene.test_scenes import get_test_scene


@pytest.fixture(scope="module")
def bunny_ds():
    ts = get_test_scene("coated_diffuse_bunny")
    return compile_scene(ts.scene_func())


def _rays(ds, n, seed):
    rng = np.random.default_rng(seed)
    c = np.asarray(ds.bounds_center)
    r = float(ds.bounds_radius)
    o = (c[None, :] + rng.normal(0, 0.15, (n, 3)) * r).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_supports(bunny_ds):
    assert supports(bunny_ds)


def test_closest_hit_parity(bunny_ds):
    ds = bunny_ds
    B = 1024  # one tile; interpret mode is slow
    o, d = _rays(ds, B, 3)
    tmin = jnp.full(B, 1e-3)
    tmax = jnp.full(B, jnp.inf)
    t_ref, p_ref = T.intersect_scene(ds, o, d, tmin, tmax)
    t_p, p_p = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool),
    )
    p_ref, p_p = np.asarray(p_ref), np.asarray(p_p)
    # sphere hits are handled outside the kernel; compare triangle winners
    tri_lanes = p_ref < ds.meta.n_tris
    np.testing.assert_array_equal(p_ref[tri_lanes], p_p[tri_lanes])
    t_p = np.where(p_p >= 0, np.asarray(t_p), np.inf)
    np.testing.assert_allclose(
        t_p[tri_lanes & (p_p >= 0)],
        np.asarray(t_ref)[tri_lanes & (p_p >= 0)],
        rtol=1e-5,
    )


def test_occlusion_parity(bunny_ds):
    ds = bunny_ds
    B = 1024
    o, d = _rays(ds, B, 4)
    tmin = jnp.full(B, 1e-3)
    tmax = jnp.full(B, 10.0)
    _, p_ref = T.intersect_scene(ds, o, d, tmin, tmax, early_exit=True)
    _, p_p = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool), early_exit=True,
    )
    # any-hit agreement (modulo sphere-only hits, absent in this scene)
    np.testing.assert_array_equal(
        np.asarray(p_ref) >= 0, np.asarray(p_p) >= 0
    )


def test_closest_hit_parity_wide_tile(bunny_ds, monkeypatch):
    """K>1 walk tiles (scalar-program amortization) stay bit-faithful."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "quadrow")
    monkeypatch.setenv("TPU_RT_TILE_K", "4")
    ds = bunny_ds
    B = 4096
    o, d = _rays(ds, B, 3)
    tmin = jnp.full(B, 1e-3)
    tmax = jnp.full(B, jnp.inf)
    t_ref, p_ref = T.intersect_scene(ds, o, d, tmin, tmax)
    t_p, p_p, visits = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool), with_visits=True,
    )
    assert visits.shape == (1,) and int(visits[0]) > 0
    p_ref, p_p = np.asarray(p_ref), np.asarray(p_p)
    tri_lanes = p_ref < ds.meta.n_tris
    np.testing.assert_array_equal(p_ref[tri_lanes], p_p[tri_lanes])
    t_p = np.where(p_p >= 0, np.asarray(t_p), np.inf)
    np.testing.assert_allclose(
        t_p[tri_lanes & (p_p >= 0)],
        np.asarray(t_ref)[tri_lanes & (p_p >= 0)],
        rtol=1e-5,
    )


def test_inactive_lanes_stay_missed(bunny_ds):
    ds = bunny_ds
    B = 1024
    o, d = _rays(ds, B, 5)
    act = jnp.asarray(np.arange(B) % 2 == 0)
    t_p, p_p = intersect_tris_pallas(
        ds, o, d, jnp.full(B, 1e-3), jnp.full(B, np.inf), act
    )
    assert np.all(np.asarray(p_p)[1::2] == -1)


@pytest.mark.parametrize("r_rows", ["1", "4"])
def test_bvh8t_parity_row_widths(bunny_ds, monkeypatch, r_rows):
    """bvh8t walk (transposed wide nodes) is bit-faithful at any tile R."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_T8_R", r_rows)
    ds = bunny_ds
    B = 2048
    o, d = _rays(ds, B, 11)
    tmin = jnp.full(B, 1e-3)
    tmax = jnp.full(B, jnp.inf)
    t_ref, p_ref = T.intersect_scene(ds, o, d, tmin, tmax)
    t_p, p_p = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool),
    )
    p_ref, p_p = np.asarray(p_ref), np.asarray(p_p)
    tri_lanes = p_ref < ds.meta.n_tris
    np.testing.assert_array_equal(p_ref[tri_lanes], p_p[tri_lanes])
    t_p = np.where(p_p >= 0, np.asarray(t_p), np.inf)
    np.testing.assert_allclose(
        t_p[tri_lanes & (p_p >= 0)],
        np.asarray(t_ref)[tri_lanes & (p_p >= 0)],
        rtol=1e-5,
    )


def test_bvh8t_occlusion_parity(bunny_ds, monkeypatch):
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    ds = bunny_ds
    B = 1024
    o, d = _rays(ds, B, 13)
    tmin = jnp.full(B, 1e-3)
    tmax = jnp.full(B, 25.0, jnp.float32)
    _, p_ref = T.intersect_scene(ds, o, d, tmin, tmax)
    _, p_p = intersect_tris_pallas(
        ds, o, d, tmin, tmax, jnp.ones(B, bool), early_exit=True,
    )
    occ_ref = np.asarray(p_ref) >= 0
    # early-exit may stop at ANY hit; occlusion verdicts must agree on
    # lanes whose reference winner is a triangle (spheres are external)
    tri = np.asarray(p_ref) < ds.meta.n_tris
    np.testing.assert_array_equal(
        (np.asarray(p_p) >= 0)[tri], occ_ref[tri]
    )
