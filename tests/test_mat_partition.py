"""Material-partitioned layered dispatch == predicated dispatch.

The partitioned path (bsdf_dispatch._layered_*_partitioned) sorts active
coated lanes into fixed-shape tiles and runs the stochastic layered walk
only there; on the lanes whose results are consumed it must agree with
the full predicated evaluation (TPU_RT_MAT_PART A/B contract)."""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_raytracing.device.scene_buffers import (
    MAT_COATED_DIFFUSE, MAT_DIFFUSE, MAT_ROUGH_DIELECTRIC,
    MAT_SMOOTH_DIELECTRIC,
)
from tpu_raytracing.ops import bsdf as B
from tpu_raytracing.ops import bsdf_dispatch as D


def _mixed_params(rng, n):
    kind = jnp.asarray(
        rng.choice([MAT_DIFFUSE, MAT_COATED_DIFFUSE], size=n, p=[0.6, 0.4]),
        jnp.int32,
    )
    top = jnp.asarray(
        rng.choice([MAT_SMOOTH_DIELECTRIC, MAT_ROUGH_DIELECTRIC], size=n),
        jnp.int32,
    )
    f = lambda *s: jnp.asarray(rng.uniform(0.05, 0.95, s), jnp.float32)
    return B.BsdfParams(
        kind=kind,
        albedo=f(n, 3),
        eta=jnp.asarray(rng.uniform(1.2, 1.8, (n, 3)), jnp.float32),
        kappa=f(n, 3),
        alpha_x=f(n),
        alpha_y=f(n),
        top_kind=top,
        thickness=f(n),
        coat_albedo=jnp.where(
            jnp.asarray(rng.uniform(size=(n, 1)) < 0.5), f(n, 3), 0.0
        ),
    )


def _dirs(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = np.abs(v[:, 2]) + 1e-3
    return jnp.asarray(v)


@pytest.mark.parametrize("n,tile", [(300, 4096), (600, 64), (64, 64)])
def test_layered_eval_partitioned_matches(monkeypatch, n, tile):
    monkeypatch.setattr(D, "MAT_TILE", tile)
    rng = np.random.default_rng(7)
    params = _mixed_params(rng, n)
    wo, wi = _dirs(rng, n), _dirs(rng, n)
    act = jnp.asarray(rng.uniform(size=n) < 0.8)
    kinds = (MAT_DIFFUSE, MAT_COATED_DIFFUSE)

    monkeypatch.setenv("TPU_RT_MAT_PART", "0")
    f0 = np.asarray(D.bsdf_eval(params, wo, wi, kinds, active=act))
    monkeypatch.setenv("TPU_RT_MAT_PART", "1")
    f1 = np.asarray(D.bsdf_eval(params, wo, wi, kinds, active=act))

    consumed = np.asarray(act) | (np.asarray(params.kind) != MAT_COATED_DIFFUSE)
    # the tiled walk differs from the full-batch walk by shape-dependent
    # XLA fusion ULPs only; non-coated lanes must be bit-identical
    noncoated = np.asarray(params.kind) != MAT_COATED_DIFFUSE
    np.testing.assert_array_equal(f0[noncoated], f1[noncoated])
    np.testing.assert_allclose(
        f0[consumed], f1[consumed], rtol=1e-4, atol=1e-7
    )


@pytest.mark.parametrize("n,tile", [(300, 4096), (600, 64)])
def test_layered_sample_partitioned_matches(monkeypatch, n, tile):
    monkeypatch.setattr(D, "MAT_TILE", tile)
    rng = np.random.default_rng(11)
    params = _mixed_params(rng, n)
    wo = _dirs(rng, n)
    draw = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    act = jnp.asarray(rng.uniform(size=n) < 0.8)

    s0 = D.layered_sample(params, wo, draw)
    s1 = D._layered_sample_partitioned(params, wo, draw, act)

    consumed = np.asarray(act) & (np.asarray(params.kind) == MAT_COATED_DIFFUSE)
    # discrete outcomes (branch taken, validity) must agree exactly;
    # float payloads may differ by shape-dependent fusion ULPs
    for field in ("component", "valid"):
        a = np.asarray(getattr(s0, field))[consumed]
        b = np.asarray(getattr(s1, field))[consumed]
        np.testing.assert_array_equal(a, b, err_msg=field)
    for field in ("wi", "f", "pdf"):
        a = np.asarray(getattr(s0, field))[consumed]
        b = np.asarray(getattr(s1, field))[consumed]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7, err_msg=field)


def test_no_coated_lanes(monkeypatch):
    """n_coated == 0: zero tile iterations, all-zero layered output."""
    monkeypatch.setattr(D, "MAT_TILE", 64)
    rng = np.random.default_rng(3)
    params = _mixed_params(rng, 128)
    params = params._replace(kind=jnp.full(128, MAT_DIFFUSE, jnp.int32))
    wo, wi = _dirs(rng, 128), _dirs(rng, 128)
    f = np.asarray(
        D._layered_eval_partitioned(params, wo, wi, jnp.ones(128, bool))
    )
    np.testing.assert_array_equal(f, 0.0)
