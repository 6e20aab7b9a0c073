"""GLTF and PBRT importer tests (structure-level; rendering covered by the
visual-testing harness)."""
from pathlib import Path

import numpy as np
import pytest

from tpu_raytracing.lights import DiffuseAreaLight, PointLight
from tpu_raytracing.materials import ConstantTexture, Diffuse, ScaleTexture
from tpu_raytracing.scene.camera import Orthographic, PinholePerspective
from tpu_raytracing.scene.loaders import (
    scene_from_file, scene_from_pbrt_file,
)
from tpu_raytracing.scene.primitive import (
    BasicPrimitive, TransformPrimitive,
)

SCENES = Path("/root/reference/scenes")

needs_scenes = pytest.mark.skipif(
    not SCENES.exists(), reason="reference scene assets unavailable"
)


@needs_scenes
def test_gltf_cornell_box_structure():
    sc = scene_from_file(SCENES / "cb.glb")
    basics = [p for p in sc.primitives if isinstance(p, BasicPrimitive)]
    transforms = [p for p in sc.primitives if isinstance(p, TransformPrimitive)]
    assert len(basics) == 6 and len(transforms) == 6
    assert len(sc.materials) == 6
    # emissive panel -> one diffuse area light
    assert len(sc.lights) == 1
    assert isinstance(sc.lights[0], DiffuseAreaLight)
    # raster height fixed at 600, width from aspect
    assert sc.camera.raster_height == 600
    assert isinstance(sc.camera.camera_type, PinholePerspective)
    # base-color + metallic-roughness constants materialized per material
    assert len(sc.textures) == 12


@needs_scenes
def test_gltf_punctual_light():
    sc = scene_from_file(SCENES / "test.glb")
    points = [l for l in sc.lights if isinstance(l, PointLight)]
    assert len(points) == 1


@needs_scenes
def test_gltf_instancing_shares_mesh():
    sc = scene_from_file(SCENES / "cbbunny_area_light_transforms.glb")
    basics = [
        i for i, p in enumerate(sc.primitives) if isinstance(p, BasicPrimitive)
    ]
    transforms = [
        p for p in sc.primitives if isinstance(p, TransformPrimitive)
    ]
    # every transform references a basic primitive (instancing keeps the
    # referenced set within the emitted basics)
    for t in transforms:
        assert t.primitive in basics


@needs_scenes
def test_pbrt_test_scene():
    sc = scene_from_pbrt_file(SCENES / "test.pbrt")
    assert sc.camera.raster_width == 400 and sc.camera.raster_height == 400
    points = [l for l in sc.lights if isinstance(l, PointLight)]
    assert len(points) == 1
    np.testing.assert_allclose(points[0].position, [2, 2, 2])
    np.testing.assert_allclose(points[0].intensity, [100, 100, 100])
    assert len(sc.materials) == 3
    kinds = {type(m) for m in sc.materials}
    assert kinds == {Diffuse}


def test_pbrt_named_materials_and_textures(tmp_path):
    (tmp_path / "s.pbrt").write_text(
        """
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
LookAt 0 0 4 0 0 0 0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
LightSource "distant" "rgb L" [1 2 3] "point3 from" [0 0 1] "point3 to" [0 0 0]
Texture "red" "spectrum" "constant" "rgb value" [1 0 0]
MakeNamedMaterial "mymat" "string type" "diffuse" "texture reflectance" "red"
NamedMaterial "mymat"
Shape "sphere" "float radius" [2]
AttributeBegin
Material "conductor" "float roughness" [0.2]
Shape "sphere" "float radius" [1]
AttributeEnd
"""
    )
    sc = scene_from_pbrt_file(tmp_path / "s.pbrt")
    assert len(sc.materials) == 2
    assert isinstance(sc.materials[0], Diffuse)
    # the named texture is referenced by id
    tex = sc.textures[sc.materials[0].albedo]
    assert isinstance(tex, ConstantTexture)
    np.testing.assert_allclose(tex.value[:3], [1, 0, 0])
    from tpu_raytracing.lights import DirectionLight

    assert isinstance(sc.lights[0], DirectionLight)
    np.testing.assert_allclose(sc.lights[0].direction, [0, 0, -1], atol=1e-6)


def test_pbrt_area_light_applies_to_next_shape(tmp_path):
    (tmp_path / "a.pbrt").write_text(
        """
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
LookAt 0 0 4 0 0 0 0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
AttributeBegin
AreaLightSource "diffuse" "rgb L" [5 5 5] "float scale" [2]
Shape "sphere" "float radius" [1]
AttributeEnd
Shape "sphere" "float radius" [0.5]
"""
    )
    sc = scene_from_pbrt_file(tmp_path / "a.pbrt")
    area = [l for l in sc.lights if isinstance(l, DiffuseAreaLight)]
    assert len(area) == 1
    np.testing.assert_allclose(area[0].radiance, [10, 10, 10])
    basics = [p for p in sc.primitives if isinstance(p, BasicPrimitive)]
    lit = [p for p in basics if p.area_light is not None]
    assert len(lit) == 1


@needs_scenes
def test_gltf_camera_with_resolution_preserves_view():
    """with_resolution on a GLTF camera must keep the same view.

    The GLTF importer builds the raster transform with NEGATED clip
    arguments (cameras look down -z, gltf.py _camera_from_node) and
    composes world_to_raster from a world_to_camera without the flip_y
    baked into camera_to_world; rebuilding from the positive
    near/far_clip fields silently produced all-miss renders (round-4
    regression fix). Pixel centers of the resized raster must map to
    the same camera-space ray directions as the original raster.
    """
    sc = scene_from_file(SCENES / "cb.glb")
    cam = sc.camera
    cam2 = cam.with_resolution(cam.raster_width // 2, cam.raster_height // 2)

    def center_dir(c, px, py):
        # raster -> camera via the stored transform, normalized direction
        p = np.array([px, py, 0.0, 1.0], np.float32)
        m = np.asarray(c.raster_to_camera.forward)
        q = m @ p
        v = q[:3] / q[3]
        return v / np.linalg.norm(v)

    for fx, fy in [(0.5, 0.5), (0.25, 0.75), (0.9, 0.1)]:
        d1 = center_dir(cam, fx * cam.raster_width, fy * cam.raster_height)
        d2 = center_dir(cam2, fx * cam2.raster_width, fy * cam2.raster_height)
        np.testing.assert_allclose(d1, d2, atol=1e-5)

    # and the full world_to_raster round trip agrees: a world point on the
    # original center ray lands at the scaled raster coordinate
    m1 = np.asarray(cam.world_to_raster.forward)
    m2 = np.asarray(cam2.world_to_raster.forward)
    rng = np.random.default_rng(0)
    for _ in range(4):
        w = np.append(rng.normal(size=3).astype(np.float32), 1.0)
        a = m1 @ w
        b = m2 @ w
        if abs(a[3]) < 1e-6:
            continue
        pa = a[:2] / a[3]
        pb = b[:2] / b[3]
        np.testing.assert_allclose(pb, pa / 2.0, rtol=1e-4, atol=1e-3)
