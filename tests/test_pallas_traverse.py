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


def test_bvh8t_chunked_big_scene(monkeypatch):
    """Big scenes partition into VMEM-sized chunk passes whose union is
    the exact closest hit (scalability path; tiny budget forces chunks)."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_T8_CHUNK_BYTES", str(64 * 1024))
    from tpu_raytracing.geometry import Mesh, TriangleMesh, v3, v4
    from tpu_raytracing.materials import Diffuse
    from tpu_raytracing.scene import SceneBuilder

    rng = np.random.default_rng(7)
    n = 3000
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    verts = np.concatenate(
        [base, base + rng.normal(0, 0.05, (n, 3)).astype(np.float32),
         base + rng.normal(0, 0.05, (n, 3)).astype(np.float32)], axis=1
    ).reshape(n * 3, 3).astype(np.float32)
    mesh = Mesh(
        vertices=verts,
        tris=np.arange(n * 3, dtype=np.uint32).reshape(n, 3),
    )
    from tpu_raytracing.scene.camera import Camera

    sb = SceneBuilder()
    sb.add_camera(
        Camera.lookat_camera_perspective(
            v3(0, 0, 5), v3(0, 0, 0), v3(0, 1, 0), False,
            np.deg2rad(45.0), 64, 64,
        )
    )
    alb = sb.add_constant_texture(v4(0.5, 0.5, 0.5, 1))
    mat = sb.add_material(Diffuse(albedo=alb))
    sb.add_shape_at_position(TriangleMesh(mesh), mat, v3(0, 0, 0))
    scene = sb.build()
    ds = compile_scene(scene)
    assert len(ds.meta.t8_chunk_meta) > 1, "expected chunked accel"
    assert supports(ds)

    B = 1024
    rng2 = np.random.default_rng(3)
    o = rng2.uniform(-2, 2, (B, 3)).astype(np.float32)
    d = rng2.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.full(B, 1e-3)
    tmax = jnp.full(B, jnp.inf)

    import tpu_raytracing.ops.traverse as TT
    t_ref, p_ref = T.intersect_scene(ds, o, d, tmin, tmax)
    monkeypatch.setattr(TT, "_use_pallas", lambda _ds: True)
    t_c, p_c = TT.intersect_scene(ds, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_c))
    sel = np.asarray(p_ref) >= 0
    np.testing.assert_allclose(
        np.asarray(t_c)[sel], np.asarray(t_ref)[sel], rtol=1e-5)


def test_bvh8t_width32_parity(monkeypatch):
    """32-wide transposed nodes (four sublane blocks, full-int32 masks,
    dual-slot SMEM stack, 6-bit meta fields) stay bit-faithful. The mask
    occupies all 32 bits including the sign bit — this exercises the
    wrapped-constant _ffs path and the ni==32 push guard."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_T8_W", "32")
    ds = compile_scene(get_test_scene("coated_diffuse_bunny").scene_func())
    assert ds.meta.t8_width == 32
    B = 2048
    o, d = _rays(ds, B, 17)
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
    # early-exit (shadow) variant must agree on hit/miss
    _, p_s = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool), early_exit=True,
    )
    np.testing.assert_array_equal(
        (np.asarray(p_s) >= 0)[tri_lanes], (p_ref >= 0)[tri_lanes])


def test_bvh8t_width16_parity(monkeypatch):
    """16-wide transposed nodes (two sublane blocks, 16-bit masks) stay
    bit-faithful; scene compiled fresh under TPU_RT_T8_W=16."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_T8_W", "16")
    ds = compile_scene(get_test_scene("coated_diffuse_bunny").scene_func())
    assert ds.meta.t8_width == 16
    B = 1024
    o, d = _rays(ds, B, 17)
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


def test_brute_kernel_parity(monkeypatch):
    """Opt-in scalar-free brute kernel (TPU_RT_BRUTE_GROUPS) matches the
    walk's winners exactly on a small scene. Measured slower end-to-end
    than the walk even on the smallest scenes (docs/PERF_LOG.md round 3)
    so it defaults off; this keeps the knob's parity honest."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_BRUTE_GROUPS", "4096")
    ds = compile_scene(get_test_scene("cube").scene_func())
    B = 1024
    o, d = _rays(ds, B, 29)
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


def test_bvh8t_k2_parity(bunny_ds, monkeypatch):
    """K2 (two node visits per while trip, TPU_RT_T8_K) matches the
    XLA walk's winners exactly, closest-hit and early-exit."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_T8_K", "2")
    ds = bunny_ds
    B = 1024
    o, d = _rays(ds, B, 41)
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
    _, p_s = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool), early_exit=True,
    )
    np.testing.assert_array_equal(
        (np.asarray(p_s) >= 0)[tri_lanes], (p_ref >= 0)[tri_lanes])


def test_bvh8t_k4_w8_parity(monkeypatch):
    """K=4 at W=8 (four 8-bit vote masks in the one drained int32,
    top byte in bits 24..31 incl the sign bit) stays bit-faithful."""
    monkeypatch.setenv("TPU_RT_PALLAS_KERNEL", "bvh8t")
    monkeypatch.setenv("TPU_RT_T8_W", "8")
    monkeypatch.setenv("TPU_RT_T8_K", "4")
    ds = compile_scene(get_test_scene("coated_diffuse_bunny").scene_func())
    assert ds.meta.t8_width == 8
    B = 1024
    o, d = _rays(ds, B, 53)
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
    _, p_s = intersect_tris_pallas(
        ds, o, d, tmin, jnp.broadcast_to(tmax, (B,)).astype(jnp.float32),
        jnp.ones(B, bool), early_exit=True,
    )
    np.testing.assert_array_equal(
        (np.asarray(p_s) >= 0)[tri_lanes], (p_ref >= 0)[tri_lanes])
