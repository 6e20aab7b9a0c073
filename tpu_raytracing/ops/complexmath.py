"""Batched complex arithmetic as (re, im) array pairs (device).

Counterpart of raytracing/src/geometry/complex.rs for the conductor Fresnel
path; principal-branch square root.
"""
from __future__ import annotations

import jax.numpy as jnp


def c_mul(a, b):
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def c_div(a, b):
    ar, ai = a
    br, bi = b
    d = br * br + bi * bi
    d = jnp.where(d == 0.0, 1.0, d)
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def c_add(a, b):
    return a[0] + b[0], a[1] + b[1]


def c_sub(a, b):
    return a[0] - b[0], a[1] - b[1]


def c_scale(a, s):
    return a[0] * s, a[1] * s


def c_abs2(a):
    return a[0] * a[0] + a[1] * a[1]


def c_sqrt(a):
    """Principal-branch complex sqrt."""
    re, im = a
    mag = jnp.hypot(re, im)
    sr = jnp.sqrt(jnp.maximum((mag + re) * 0.5, 0.0))
    si_mag = jnp.sqrt(jnp.maximum((mag - re) * 0.5, 0.0))
    si = jnp.where(im < 0.0, -si_mag, si_mag)
    return sr, si


def fresnel_complex(cos_theta_i, eta_re, eta_im):
    """Conductor Fresnel reflectance (materials.rs:1045-1065 semantics)."""
    eta = (eta_re, eta_im)
    sin2_i = 1.0 - cos_theta_i * cos_theta_i
    eta2 = c_mul(eta, eta)
    sin2_t = c_div((sin2_i, jnp.zeros_like(sin2_i)), eta2)
    cos2_t = c_sub((jnp.ones_like(sin2_i), jnp.zeros_like(sin2_i)), sin2_t)
    cos_t = c_sqrt(cos2_t)
    eta_cos_i = c_scale(eta, cos_theta_i)
    cos_i = (cos_theta_i, jnp.zeros_like(cos_theta_i))
    r_parl = c_div(c_sub(eta_cos_i, cos_t), c_add(eta_cos_i, cos_t))
    eta_cos_t = c_mul(eta, cos_t)
    r_perp = c_div(c_sub(cos_i, eta_cos_t), c_add(cos_i, eta_cos_t))
    return (c_abs2(r_parl) + c_abs2(r_perp)) * 0.5
