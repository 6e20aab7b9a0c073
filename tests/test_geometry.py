import numpy as np
import pytest

from tpu_raytracing.geometry import (
    AABB, Transform, cross, mat_from_basis, mat_identity, mat_invert,
    mat_rotation, normalize, quat_dot, quat_from_axis_angle,
    quat_from_rotation_matrix, quat_identity, quat_inverse, quat_mul,
    quat_norm, quat_normalize, quat_rotate, quat_to_matrix, v3,
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


# --- quaternion suite: semantics of the reference's 16-case unit suite
# (crates/raytracing/src/geometry/quaternion.rs:347-531) ---


def test_quat_mul_identity():
    q = np.array([0.5, 0.3, 0.4, 0.5], np.float32)
    ident = quat_identity()
    assert np.allclose(quat_mul(q, ident), q, atol=1e-6)
    assert np.allclose(quat_mul(ident, ident), ident, atol=1e-6)


def test_quat_norm_and_normalize():
    q = np.array([3.0, 4.0, 0.0, 0.0], np.float32)
    assert np.isclose(quat_norm(q), 5.0)
    assert np.isclose(quat_norm(quat_normalize(q)), 1.0, atol=1e-6)


def test_quat_inverse_is_identity_product():
    q = np.array([0.6, 0.8, 0.0, 0.0], np.float32)
    assert np.allclose(quat_mul(q, quat_inverse(q)), quat_identity(),
                       atol=1e-6)
    # non-unit quaternion too: inverse divides by |q|^2
    q2 = np.array([1.0, 2.0, -1.0, 0.5], np.float32)
    assert np.allclose(quat_mul(q2, quat_inverse(q2)), quat_identity(),
                       atol=1e-6)


def test_quat_rotate_preserves_length():
    q = quat_from_axis_angle(normalize(v3(1, 1, 1)), np.pi / 4)
    for v in [v3(1, 0, 0), v3(0, 1, 0), v3(0, 0, 1),
              normalize(v3(1, 1, 1)), normalize(v3(1, 2, 3))]:
        assert np.isclose(np.linalg.norm(quat_rotate(q, v)),
                          np.linalg.norm(v), atol=1e-6)


def test_quat_rotate_90_degrees_x_axis():
    q = quat_from_axis_angle(v3(1, 0, 0), np.pi / 2)
    assert np.allclose(quat_rotate(q, v3(0, 1, 0)), v3(0, 0, 1), atol=1e-6)
    assert np.allclose(quat_rotate(q, v3(0, 0, 1)), v3(0, -1, 0), atol=1e-6)


def test_quat_rotate_180_degrees():
    q = quat_from_axis_angle(v3(0, 1, 0), np.pi)
    assert np.allclose(quat_rotate(q, v3(1, 0, 0)), v3(-1, 0, 0), atol=1e-6)


def test_quat_rotate_zero_angle_identity():
    q = quat_from_axis_angle(v3(1, 0, 0), 0.0)
    v = v3(1, 2, 3)
    assert np.allclose(quat_rotate(q, v), v, atol=1e-6)


def test_quat_rotate_composition():
    # rotating by q1 then q2 == rotating by (q2 * q1)
    q1 = quat_from_axis_angle(v3(1, 0, 0), np.pi / 4)
    q2 = quat_from_axis_angle(v3(0, 1, 0), np.pi / 4)
    v = v3(1, 0, 0)
    two_step = quat_rotate(q2, quat_rotate(q1, v))
    composed = quat_rotate(quat_mul(q2, q1), v)
    assert np.allclose(two_step, composed, atol=1e-6)


def test_quat_dot():
    a = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    b = np.array([5.0, 6.0, 7.0, 8.0], np.float32)
    assert np.isclose(quat_dot(a, b), 70.0)


def _assert_same_rotation(q, m):
    # q and -q encode the same rotation; compare as matrices
    assert np.allclose(quat_to_matrix(q)[:3, :3], m[:3, :3], atol=1e-5)


@pytest.mark.parametrize(
    "angle,axis,branch",
    [
        # trace > 0 branch: small rotation, trace near 3
        (0.3, (0, 0, 1), "trace"),
        # 180-degree rotations zero the trace+1 term and force the
        # largest-diagonal branches of Shepperd's method:
        # R(pi, x) = diag(1,-1,-1) -> m00 branch
        (np.pi, (1, 0, 0), "m00"),
        # R(pi, y) = diag(-1,1,-1) -> m11 branch
        (np.pi, (0, 1, 0), "m11"),
        # R(pi, z) = diag(-1,-1,1) -> m22 branch
        (np.pi, (0, 0, 1), "m22"),
        # near-180 rotations about skew axes stress the same branches
        # with non-zero off-diagonals
        (np.pi - 1e-3, (1, 1, 0), "m00/m11"),
        (np.pi - 1e-3, (0, 1, 1), "m11/m22"),
        (np.pi - 1e-3, (1, 0, 1), "m00/m22"),
    ],
)
def test_from_rotation_matrix_shepperd_branches(angle, axis, branch):
    axis = normalize(np.asarray(axis, np.float32))
    m = mat_rotation(angle, axis)
    q = quat_from_rotation_matrix(m)
    assert np.isclose(quat_norm(q), 1.0, atol=1e-5)
    _assert_same_rotation(q, m)
    # the recovered rotation must act identically on a probe vector
    v = normalize(v3(0.3, -0.7, 0.2))
    assert np.allclose(quat_rotate(q, v), m[:3, :3] @ v, atol=1e-5)


def test_from_rotation_matrix_exact_branch_selection():
    # explicitly verify each branch's discriminant ordering on the pure
    # 180-degree diagonals (trace = -1 in all three)
    for axis, big in [((1, 0, 0), 0), ((0, 1, 0), 1), ((0, 0, 1), 2)]:
        m = mat_rotation(np.pi, normalize(np.asarray(axis, np.float32)))
        r = m[:3, :3]
        assert r[0, 0] + r[1, 1] + r[2, 2] < 0  # trace branch NOT taken
        assert np.argmax(np.diag(r)) == big
        q = quat_from_rotation_matrix(m)
        # the dominant component matches the axis (up to global sign)
        comp = np.abs(q[1 + big])
        assert comp > 0.99


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
