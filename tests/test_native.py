"""Native (C++) vs Python BVH builder equivalence.

The snapshot harness depends on deterministic BVH layouts; the native
builder (csrc/bvh_builder.cpp) must be bit-identical to the numpy fallback
so that .so availability never changes render output.
"""
import gzip
from pathlib import Path

import numpy as np
import pytest

from tpu_raytracing.accel.bvh import build_bvh
from tpu_raytracing.geometry import load_ply
from tpu_raytracing.native import get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _assert_identical(pmin, pmax):
    a = build_bvh(pmin, pmax, use_native=True)
    b = build_bvh(pmin, pmax, use_native=False)
    np.testing.assert_array_equal(a.node_min, b.node_min)
    np.testing.assert_array_equal(a.node_max, b.node_max)
    np.testing.assert_array_equal(a.left_first, b.left_first)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.skip, b.skip)
    np.testing.assert_array_equal(a.prim_order, b.prim_order)


def test_random_boxes(rng):
    c = rng.random((2000, 3)).astype(np.float32) * 50
    h = rng.random((2000, 3)).astype(np.float32)
    _assert_identical(c - h, c + h)


def test_bunny_mesh():
    asset = (
        Path(__file__).parent.parent
        / "tpu_raytracing/scene/assets/bunny.ply.gz"
    )
    mesh = load_ply(gzip.decompress(asset.read_bytes()))
    p = mesh.vertices[mesh.tris]
    _assert_identical(p.min(axis=1), p.max(axis=1))


def test_degenerate_same_centroid():
    pmin = np.zeros((20, 3), np.float32)
    _assert_identical(pmin, pmin + 1.0)


def test_single_prim():
    _assert_identical(np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32))
