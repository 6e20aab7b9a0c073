import jax.numpy as jnp
import numpy as np

from tpu_raytracing.accel import build_bvh
from tpu_raytracing.device import compile_scene
from tpu_raytracing.ops.intersect import ray_triangle
from tpu_raytracing.ops.traverse import intersect_closest, intersect_scene, occluded
from tpu_raytracing.scene.test_scenes import (
    coated_diffuse_bunny_scene, cube_scene, dielectric_scene, sphere_scene,
)

F = np.float32


def _random_rays(rng, n, lo=-3, hi=3, target_lo=-1, target_hi=1):
    o = rng.uniform(lo, hi, (n, 3)).astype(F)
    target = rng.uniform(target_lo, target_hi, (n, 3)).astype(F)
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(F))


def _brute_force(ds, o, d, t_min, t_max):
    n = ds.meta.n_tris
    valid, t, _, _ = ray_triangle(
        o[:, None, :], d[:, None, :],
        ds.tri_p0[None, :n], ds.tri_p1[None, :n], ds.tri_p2[None, :n],
        t_min[:, None], t_max[:, None],
    )
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    tb = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
    return np.asarray(tb)


def test_bvh_build_structure():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-10, 10, (500, 3)).astype(F)
    half = rng.uniform(0.01, 0.3, (500, 1)).astype(F)
    bvh = build_bvh(centers - half, centers + half)
    # every prim appears exactly once
    assert sorted(bvh.prim_order.tolist()) == list(range(500))
    # leaves cover all prims contiguously
    leaves = bvh.count > 0
    covered = np.zeros(500, bool)
    for first, cnt in zip(bvh.left_first[leaves], bvh.count[leaves]):
        assert not covered[first:first + cnt].any()
        covered[first:first + cnt] = True
    assert covered.all()
    # skip links in range
    assert (bvh.skip <= bvh.n_nodes).all()
    assert (bvh.skip > np.arange(bvh.n_nodes)).all()


def test_traversal_matches_brute_force_cube():
    ds = compile_scene(cube_scene())
    rng = np.random.default_rng(2)
    o, d = _random_rays(rng, 512, target_lo=-1, target_hi=1)
    # aim at cube at (0,0,-3)
    o = o + jnp.asarray([0.0, 0.0, 2.0])
    d = jnp.asarray(
        np.asarray(jnp.asarray([0.0, 0.0, -3.0]) - o)
        / np.linalg.norm(np.asarray(jnp.asarray([0.0, 0.0, -3.0]) - o), axis=-1, keepdims=True)
    ).astype(jnp.float32)
    t_min = jnp.zeros(512)
    t_max = jnp.full(512, jnp.inf)
    t, prim = intersect_scene(ds, o, d, t_min, t_max)
    tb = _brute_force(ds, o, d, t_min, t_max)
    np.testing.assert_allclose(np.asarray(t), tb, rtol=1e-5)


def test_traversal_matches_brute_force_bunny():
    ds = compile_scene(coated_diffuse_bunny_scene())
    rng = np.random.default_rng(3)
    n = 256
    o = np.tile(np.array([[0.0, 4.4, 0.4]], F), (n, 1))
    target = rng.uniform(-1, 1, (n, 3)).astype(F) * np.array([1.0, 1.0, 0.75], F)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_min = jnp.zeros(n)
    t_max = jnp.full(n, jnp.inf)
    t, prim = intersect_scene(ds, o, d, t_min, t_max)
    tb = _brute_force(ds, o, d, t_min, t_max)
    hit = np.isfinite(tb)
    assert hit.sum() > n // 2
    np.testing.assert_allclose(np.asarray(t)[hit], tb[hit], rtol=1e-4)
    assert np.array_equal(np.isfinite(np.asarray(t)), hit)


def test_sphere_hit_normal_and_uv():
    ds = compile_scene(sphere_scene())
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_closest(ds, o, d, jnp.zeros(1), jnp.full(1, jnp.inf))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(hit.point[0]), [0, 0, -2], atol=1e-5)


def test_sphere_uv_off_center_parity():
    # mirror of reference test geometry.rs:342-373 (sphere at (0,3,0), r=1)
    from tpu_raytracing.geometry import Sphere
    from tpu_raytracing.scene import SceneBuilder
    from tpu_raytracing.scene.camera import Camera
    from tpu_raytracing.materials import Diffuse

    sb = SceneBuilder()
    white = sb.add_constant_texture([1, 1, 1, 1])
    mat = sb.add_material(Diffuse(albedo=white))
    sb.add_shape_at_position(Sphere([0, 3, 0], 1.0), mat, [0, 0, 0])
    sb.add_camera(
        Camera.lookat_camera_perspective(
            [0, 0, 0], [0, 3, 0], [0, 0, 1], False, 0.7, 64, 64
        )
    )
    ds = compile_scene(sb.build())
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    hit = intersect_closest(ds, o, d, jnp.full(1, 0.001), jnp.full(1, jnp.inf))
    np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, -1, 0], atol=1e-5)
    np.testing.assert_allclose(float(hit.uv[0, 0]), 0.75, atol=1e-4)
    np.testing.assert_allclose(float(hit.uv[0, 1]), 0.5, atol=1e-4)


def test_occlusion_cornell():
    ds = compile_scene(dielectric_scene())
    # ray from the point light down to the floor center: unoccluded until the
    # sphere blocks it (sphere at (0,0,0.75), r=0.5, light at (0,0,1.4))
    o = jnp.asarray([[0.0, 0.0, 1.4]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    assert bool(
        occluded(ds, o, d, jnp.full(1, 0.001), jnp.full(1, 1.4 - 0.001))[0]
    )
    # sideways ray to the wall: nothing between
    d2 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    assert not bool(
        occluded(ds, o, d2, jnp.full(1, 0.001), jnp.full(1, 0.9))[0]
    )


def test_hit_details_interpolated_normals():
    ds = compile_scene(cube_scene())
    o = jnp.asarray([[3.0, 0.0, -3.0]], jnp.float32)
    d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    hit = intersect_closest(ds, o, d, jnp.zeros(1), jnp.full(1, jnp.inf))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(float(hit.t[0]), 2.5, rtol=1e-5)
    assert int(hit.material[0]) == 0
    assert int(hit.light[0]) == -1
