import numpy as np

from tpu_raytracing.geometry import Sphere, TriangleMesh
from tpu_raytracing.scene import BasicPrimitive
from tpu_raytracing.scene.test_scenes import (
    all_test_scenes, cornell_box, get_test_scene, load_bunny, make_cube,
)


def test_all_test_scenes_present():
    names = [ts.name for ts in all_test_scenes()]
    assert names == [
        "sphere", "cube", "cube_orthographic", "checkered_plane",
        "dielectric", "metal", "rough_metal", "rough_dielectric",
        "out_of_focus_sphere", "environment_light", "coated_diffuse_bunny",
    ]


def test_scene_construction_and_descendants():
    scene = get_test_scene("dielectric").scene_func()
    # 5 walls + 1 sphere, transform chains flattened
    descendants = list(scene.descendants(scene.root_index()))
    assert len(descendants) == 6
    for idx, transform in descendants:
        prim = scene.get_primitive(idx)
        assert isinstance(prim, BasicPrimitive)
    sphere_prims = [
        scene.get_primitive(i)
        for i, _ in descendants
        if isinstance(scene.get_primitive(i).shape, Sphere)
    ]
    assert len(sphere_prims) == 1
    # sphere sits at z=0.75 via its transform chain
    sphere_t = [
        t for i, t in descendants
        if isinstance(scene.get_primitive(i).shape, Sphere)
    ][0]
    assert np.allclose(sphere_t.apply_point([0, 0, 0]), [0, 0, 0.75], atol=1e-6)


def test_cube_mesh():
    cube = make_cube(1.0)
    assert cube.vertices.shape == (24, 3)
    assert cube.tris.shape == (12, 3)
    assert np.isclose(cube.area(), 6.0, atol=1e-5)


def test_cornell_box_camera():
    scene = cornell_box().build()
    cam = scene.camera
    assert cam.raster_width == 500 and cam.raster_height == 500
    # camera at (0, front+3.4, 0.4) looking at box center
    assert np.allclose(cam.camera_position, [0, 4.4, 0.4], atol=1e-5)
    # center of raster maps to a ray through the lookat target direction
    p = cam.raster_to_camera.apply_point([250.0, 250.0, 0.0])
    d = cam.camera_to_world.apply_vector(p / np.linalg.norm(p))
    target_dir = np.array([0, 0, 0.75]) - np.array([0, 4.4, 0.4])
    target_dir = target_dir / np.linalg.norm(target_dir)
    assert np.allclose(d / np.linalg.norm(d), target_dir, atol=1e-4)


def test_bunny_loads():
    bunny = load_bunny()
    assert bunny.tris.shape[0] == 28576
    assert bunny.vertices.shape[0] == 14431
    assert bunny.has_normals


def test_area_light_builder():
    sb = cornell_box()
    white = sb.add_constant_texture([1, 1, 1, 1])
    from tpu_raytracing.materials import Diffuse
    from tpu_raytracing.geometry import Transform

    mat = sb.add_material(Diffuse(albedo=white))
    from tpu_raytracing.scene.test_scenes import make_plane

    light_quad = make_plane(
        [-0.25, -0.25, 1.49], [0.25, -0.25, 1.49],
        [0.25, 0.25, 1.49], [-0.25, 0.25, 1.49], [0, 0, 1],
    )
    sb.add_shape_with_transform(
        TriangleMesh(light_quad), mat, Transform.identity(),
        area_light_radiance=[10, 10, 10],
    )
    scene = sb.build()
    from tpu_raytracing.lights import DiffuseAreaLight

    area_lights = [l for l in scene.lights if isinstance(l, DiffuseAreaLight)]
    assert len(area_lights) == 1
    prim = scene.get_basic(area_lights[0].prim_id)
    assert prim.area_light is not None
