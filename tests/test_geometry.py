import numpy as np
import pytest

from tpu_raytracing.geometry import (
    AABB, Transform, cross, mat_from_basis, mat_identity, mat_invert,
    mat_rotation, normalize, quat_from_rotation_matrix, quat_rotate,
    quat_to_matrix, v3,
)


def test_matrix_invert_roundtrip():
    m = mat_rotation(0.7, [0.3, 0.5, 0.8]) @ np.diag([2.0, 3.0, 0.5, 1.0]).astype(np.float32)
    m[0, 3], m[1, 3], m[2, 3] = 1.0, -2.0, 3.0
    inv = mat_invert(m)
    assert np.allclose(m @ inv, mat_identity(), atol=1e-5)


def test_rotation_preserves_length_and_axis():
    axis = normalize(v3(1, 2, 3))
    m = mat_rotation(1.2, axis)
    assert np.allclose(m[:3, :3] @ axis, axis, atol=1e-6)
    v = v3(0.3, -0.4, 0.5)
    assert np.isclose(np.linalg.norm(m[:3, :3] @ v), np.linalg.norm(v), atol=1e-6)


@pytest.mark.parametrize("angle", [0.01, 0.5, 1.5, 3.0])
@pytest.mark.parametrize("axis", [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)])
def test_quaternion_matrix_roundtrip(angle, axis):
    m = mat_rotation(angle, normalize(np.array(axis, np.float32)))
    q = quat_from_rotation_matrix(m)
    m2 = quat_to_matrix(q)
    assert np.allclose(m, m2, atol=1e-5)


def test_quat_rotate_matches_matrix():
    m = mat_rotation(2.2, normalize(v3(0.2, -0.7, 0.4)))
    q = quat_from_rotation_matrix(m)
    v = v3(1.5, -0.5, 2.0)
    assert np.allclose(quat_rotate(q, v), m[:3, :3] @ v, atol=1e-5)


def test_transform_compose_order():
    # compose applies self first, then other
    t = Transform.translate([1, 0, 0]).compose(Transform.scale([2, 2, 2]))
    p = t.apply_point([0, 0, 0])
    assert np.allclose(p, [2, 0, 0], atol=1e-6)


def test_transform_normal_nonuniform_scale():
    t = Transform.scale([2.0, 1.0, 1.0])
    # plane x+y=1 has normal (1,1,0)/sqrt2; after scaling x by 2 the plane
    # is x/2+y=1 with normal (1,2,0)/sqrt5
    n = t.apply_normal(normalize(v3(1, 1, 0)))
    assert np.allclose(normalize(n), normalize(v3(1, 2, 0)), atol=1e-6)


def test_look_at_points_at_target():
    t = Transform.look_at(v3(1, 2, 3), v3(4, 5, 6), v3(0, 1, 0))
    # camera looks down +z in its local frame
    d = t.apply_vector(v3(0, 0, 1))
    assert np.allclose(normalize(d), normalize(v3(3, 3, 3)), atol=1e-6)
    assert np.allclose(t.apply_point(v3(0, 0, 0)), v3(1, 2, 3), atol=1e-6)


def test_basis_matrix():
    z = normalize(v3(0.262, -0.151, 0.370))
    a = v3(0, 0, 1) if abs(z[2]) < 0.8 else v3(0, 1, 0)
    x = normalize(cross(a, z))
    y = cross(z, x)
    m = mat_from_basis(x, y, z)
    assert np.allclose(m[:3, :3] @ v3(0, 0, 1), z, atol=1e-6)
    assert np.allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-5)


def test_aabb_transform():
    box = AABB(v3(-1, -1, -1), v3(1, 1, 1))
    t = Transform.rotate(np.pi / 4, v3(0, 0, 1))
    tb = box.transformed(t)
    s = np.sqrt(2.0)
    assert np.allclose(tb.minimum, [-s, -s, -1], atol=1e-5)
    assert np.allclose(tb.maximum, [s, s, 1], atol=1e-5)
