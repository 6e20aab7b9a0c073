"""BSDF-level invariants: reciprocity of sampling/eval, energy conservation,
specular laws. Mirrors the correctness the reference encodes in its
microfacet/Fresnel implementations (raytracing-cpu/src/materials.rs)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_raytracing.ops import bsdf as B

F = np.float32


def _hemisphere_dirs(rng, n):
    u = rng.random((n, 2)).astype(F)
    z = u[:, 0]
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * np.pi * u[:, 1]
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(F)


def test_diffuse_white_furnace(rng):
    """E[f cos / pdf] over cosine-sampled wi == albedo (energy conserved)."""
    n = 4096
    albedo = jnp.asarray(np.tile([[0.8, 0.6, 0.4]], (n, 1)), jnp.float32)
    wo = jnp.asarray(_hemisphere_dirs(rng, n))
    u2 = jnp.asarray(rng.random((n, 2)).astype(F))
    s = B.diffuse_sample(albedo, wo, u2)
    cos = jnp.abs(s.wi[:, 2])
    est = np.asarray(s.f * (cos / jnp.maximum(s.pdf, 1e-12))[:, None])
    mean = est.mean(axis=0)
    np.testing.assert_allclose(mean, [0.8, 0.6, 0.4], rtol=5e-2)


def test_diffuse_pdf_matches_eval_ratio(rng):
    n = 1024
    albedo = jnp.ones((n, 3), jnp.float32)
    wo = jnp.asarray(_hemisphere_dirs(rng, n))
    wi = jnp.asarray(_hemisphere_dirs(rng, n))
    f = np.asarray(B.diffuse_eval(albedo, wo, wi))
    pdf = np.asarray(B.diffuse_pdf(wo, wi, jnp.full(n, B.ALL_COMPONENTS)))
    # f = albedo/pi; evaluate_pdf is uniform 1/(2pi) — a reference quirk
    # (materials.rs:340-351, used only for layered-BSDF MIS)
    np.testing.assert_allclose(f[:, 0], 1.0 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(pdf, 1.0 / (2.0 * np.pi), rtol=1e-5)


def test_smooth_conductor_mirror(rng):
    n = 256
    wo = jnp.asarray(_hemisphere_dirs(rng, n))
    eta = jnp.full((n, 3), 0.2, jnp.float32)
    kappa = jnp.full((n, 3), 3.0, jnp.float32)
    s = B.smooth_conductor_sample(eta, kappa, wo)
    wi = np.asarray(s.wi)
    woa = np.asarray(wo)
    # mirror about z: (x, y) flip sign, z preserved
    np.testing.assert_allclose(wi[:, 2], woa[:, 2], rtol=1e-5)
    np.testing.assert_allclose(wi[:, :2], -woa[:, :2], atol=1e-6)
    assert np.all(np.asarray(s.pdf) == 1.0)


def test_smooth_dielectric_snell(rng):
    """Transmitted rays obey Snell's law for eta=1.5."""
    n = 2048
    wo = jnp.asarray(_hemisphere_dirs(rng, n))
    eta = jnp.full((n,), 1.5, jnp.float32)
    u1 = jnp.asarray(rng.random(n).astype(F))
    s = B.smooth_dielectric_sample(eta, wo, u1, jnp.full(n, B.ALL_COMPONENTS))
    wi = np.asarray(s.wi)
    woa = np.asarray(wo)
    trans = wi[:, 2] * woa[:, 2] < 0  # crossed the surface
    assert trans.any()
    sin_o = np.sqrt(np.maximum(1 - woa[trans, 2] ** 2, 0))
    sin_i = np.sqrt(np.maximum(1 - wi[trans, 2] ** 2, 0))
    np.testing.assert_allclose(sin_o, sin_i * 1.5, rtol=1e-3, atol=1e-5)


def test_rough_conductor_vndf_consistency(rng):
    """sample() then eval()/pdf() agree on the sampled direction."""
    n = 2048
    z = rng.random(n).astype(F) * 0.8 + 0.2
    r = np.sqrt(1 - z * z)
    phi = rng.random(n).astype(F) * 2 * np.pi
    wo = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    eta = jnp.full((n, 3), 0.2, jnp.float32)
    kappa = jnp.full((n, 3), 3.0, jnp.float32)
    ax = ay = jnp.full(n, 0.3, jnp.float32)
    u2 = jnp.asarray(rng.random((n, 2)).astype(F))
    s = B.ts_refl_sample(wo, eta, kappa, ax, ay, u2)
    ok = np.asarray(s.valid) & (np.asarray(s.pdf) > 1e-6)
    f_eval = np.asarray(B.ts_refl_eval(wo, s.wi, eta, kappa, ax, ay))
    pdf_eval = np.asarray(B.ts_refl_pdf(wo, s.wi, ax, ay))
    np.testing.assert_allclose(
        np.asarray(s.f)[ok], f_eval[ok], rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.pdf)[ok], pdf_eval[ok], rtol=1e-3, atol=1e-5
    )


def test_fresnel_dielectric_limits():
    # normal incidence: R = ((eta-1)/(eta+1))^2; grazing: R -> 1
    r0 = float(B.fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.5)))
    np.testing.assert_allclose(r0, ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)
    rg = float(B.fresnel_dielectric(jnp.asarray(1e-4), jnp.asarray(1.5)))
    assert rg > 0.98


def test_refract_tir():
    """Total internal reflection: refract flags TIR beyond the critical
    angle when leaving the dense medium (materials.rs:992-1009)."""
    normal = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    # grazing ray from inside glass: cos_i < 0 flips eta to 1/1.5 internally
    grazing = jnp.asarray([[0.95, 0.0, -np.sqrt(1 - 0.95**2)]], jnp.float32)
    _, tir = B.refract(jnp.asarray([1.5], jnp.float32), grazing, normal)
    assert bool(np.asarray(tir)[0])
    # near-normal ray refracts fine
    steep = jnp.asarray([[0.1, 0.0, np.sqrt(1 - 0.01)]], jnp.float32)
    wi, tir2 = B.refract(jnp.asarray([1.5], jnp.float32), steep, normal)
    assert not bool(np.asarray(tir2)[0])
    # Snell: sin_t = sin_i / eta
    sin_i = 0.1
    sin_t = float(jnp.sqrt(wi[0, 0] ** 2 + wi[0, 1] ** 2))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, rtol=1e-4)
