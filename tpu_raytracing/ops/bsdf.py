"""Batched BSDF evaluation/sampling in the local shading frame (device).

TPU-native counterpart of raytracing-cpu/src/materials.rs: the same BSDF set
(diffuse, smooth/rough dielectric + conductor, coated-diffuse layered in
layered.py) restructured from enum dispatch into masked SIMD evaluation over
the whole ray batch — every kind present in the scene is evaluated on all
lanes and per-lane kinds select the result (OptiX used SBT program selection;
a vector machine prefers predication).

Conventions (identical to the reference):
- wo/wi in local shading coordinates, +z = shading normal
- microfacet model is Trowbridge-Reitz with Smith masking and VNDF sampling
  (PBRT 4ed 9.6), dielectric uses the generalized half-vector (9.7)
- rough surfaces fall back to the smooth BSDF below MINIMUM_ROUGHNESS
- pdfs of delta BSDFs are "1 against the implied delta"

Directions and colors are lane-major V3 component triples (ops/vec.py) —
dense 1-D TPU layouts instead of 128-lane-padded (B, 3) rows.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..device.scene_buffers import (
    DeviceScene, MAT_COATED_DIFFUSE, MAT_DIFFUSE, MAT_ROUGH_CONDUCTOR,
    MAT_ROUGH_DIELECTRIC, MAT_SMOOTH_CONDUCTOR, MAT_SMOOTH_DIELECTRIC,
)
from .complexmath import fresnel_complex
from .rng import sample_unit_disk_c
from .textures import EvalCtx, eval_texture
from .vec import V3

MINIMUM_ROUGHNESS = 1.0e-3

# component flags (bitmask per lane)
NONSPECULAR_REFLECTION = 1
SPECULAR_REFLECTION = 2
NONSPECULAR_TRANSMISSION = 4
SPECULAR_TRANSMISSION = 8
REFLECTION = NONSPECULAR_REFLECTION | SPECULAR_REFLECTION
TRANSMISSION = NONSPECULAR_TRANSMISSION | SPECULAR_TRANSMISSION
SPECULAR = SPECULAR_REFLECTION | SPECULAR_TRANSMISSION
NONSPECULAR = NONSPECULAR_REFLECTION | NONSPECULAR_TRANSMISSION
ALL_COMPONENTS = REFLECTION | TRANSMISSION


class BsdfParams(NamedTuple):
    """Per-lane material parameters after texture evaluation.

    kind is the *effective* kind (rough kinds degrade to their smooth
    counterpart below MINIMUM_ROUGHNESS, materials.rs:884-908)."""

    kind: jax.Array       # (B,) i32
    albedo: V3            # diffuse / layered-bottom albedo
    eta: V3               # ior (dielectric uses .x)
    kappa: V3
    alpha_x: jax.Array    # (B,)
    alpha_y: jax.Array    # (B,)
    top_kind: jax.Array   # (B,) layered top (smooth/rough dielectric)
    thickness: jax.Array  # (B,)
    coat_albedo: V3


class BsdfSample(NamedTuple):
    wi: V3
    f: V3
    pdf: jax.Array        # (B,)
    component: jax.Array  # (B,) i32 flags (single bit)
    valid: jax.Array      # (B,) bool: usable sample (not null/invalid)


def get_bsdf_params(
    ds: DeviceScene, mat_id, ctx: EvalCtx, has_derivs=True
) -> BsdfParams:
    """Gather + evaluate material textures -> per-lane BSDF parameters
    (materials.rs get_bsdf semantics incl. roughness remap + smooth fallback).
    has_derivs: static no-footprint promise, see ops/textures.eval_texture."""
    mat_id = jnp.maximum(mat_id, 0)
    mp = ds.mat_pack[mat_id]  # one wide gather: kind, tex0..4, remap
    kind = mp[:, 0]
    tex = mp[:, 1:6]
    remap = mp[:, 6] != 0

    t0 = eval_texture(ds, tex[:, 0], ctx, has_derivs)  # albedo / eta
    t1 = eval_texture(ds, tex[:, 1], ctx, has_derivs)  # kappa / dielectric eta
    t2 = eval_texture(ds, tex[:, 2], ctx, has_derivs)  # roughness
    has_rough_tex = tex[:, 2] >= 0

    is_layered = kind == MAT_COATED_DIFFUSE
    albedo = V3(t0[0], t0[1], t0[2])
    eta = V3.where(is_layered, V3(t1[0], t1[1], t1[2]), albedo)
    kappa = V3(t1[0], t1[1], t1[2])

    def remapped(a):
        a = jnp.where(remap, jnp.sqrt(jnp.maximum(a, 0.0)), a)
        # materials with an unset roughness slot are perfectly smooth
        return jnp.where(has_rough_tex, a, 0.0)

    alpha_x = remapped(t2[0])
    alpha_y = remapped(t2[1])
    too_smooth = jnp.maximum(alpha_x, alpha_y) < MINIMUM_ROUGHNESS

    effective = kind
    effective = jnp.where(
        (kind == MAT_ROUGH_CONDUCTOR) & too_smooth, MAT_SMOOTH_CONDUCTOR, effective
    )
    effective = jnp.where(
        (kind == MAT_ROUGH_DIELECTRIC) & too_smooth, MAT_SMOOTH_DIELECTRIC, effective
    )
    top_kind = jnp.where(
        too_smooth, MAT_SMOOTH_DIELECTRIC, MAT_ROUGH_DIELECTRIC
    ).astype(jnp.int32)

    if MAT_COATED_DIFFUSE in ds.meta.mat_kinds_present:
        thickness = eval_texture(ds, tex[:, 3], ctx, has_derivs)[0]
        t4 = eval_texture(ds, tex[:, 4], ctx, has_derivs)
        coat_albedo = V3(t4[0], t4[1], t4[2])
    else:
        thickness = jnp.zeros_like(alpha_x)
        coat_albedo = V3.zeros(alpha_x.shape, alpha_x.dtype)

    # clamp alphas so rough-path math stays finite on lanes that use the
    # smooth fallback (their results are masked out anyway)
    safe_ax = jnp.maximum(alpha_x, MINIMUM_ROUGHNESS)
    safe_ay = jnp.maximum(alpha_y, MINIMUM_ROUGHNESS)

    return BsdfParams(
        kind=effective.astype(jnp.int32),
        albedo=albedo,
        eta=eta,
        kappa=kappa,
        alpha_x=safe_ax,
        alpha_y=safe_ay,
        top_kind=top_kind,
        thickness=thickness,
        coat_albedo=coat_albedo,
    )


def is_delta_bsdf(params: BsdfParams):
    return (params.kind == MAT_SMOOTH_DIELECTRIC) | (
        params.kind == MAT_SMOOTH_CONDUCTOR
    )


def bsdf_components(params: BsdfParams):
    """Component flags supported per lane (materials.rs components())."""
    k = params.kind
    out = jnp.zeros_like(k)
    out = jnp.where(k == MAT_DIFFUSE, NONSPECULAR_REFLECTION, out)
    out = jnp.where(
        k == MAT_SMOOTH_DIELECTRIC, SPECULAR_REFLECTION | SPECULAR_TRANSMISSION, out
    )
    out = jnp.where(k == MAT_SMOOTH_CONDUCTOR, SPECULAR_REFLECTION, out)
    out = jnp.where(k == MAT_ROUGH_CONDUCTOR, NONSPECULAR_REFLECTION, out)
    out = jnp.where(
        k == MAT_ROUGH_DIELECTRIC,
        NONSPECULAR_REFLECTION | NONSPECULAR_TRANSMISSION,
        out,
    )
    out = jnp.where(k == MAT_COATED_DIFFUSE, NONSPECULAR, out)
    return out


# ------------------------------------------------------------ scalar pieces

def reflect_z(wo: V3, n: V3) -> V3:
    return n * (2.0 * wo.dot(n)) - wo


def fresnel_dielectric(cos_theta_i, eta):
    """(materials.rs:1018-1042). Backside flips eta; TIR -> 1."""
    flip = cos_theta_i < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_theta_i = jnp.abs(cos_theta_i)
    sin2_i = 1.0 - cos_theta_i * cos_theta_i
    sin2_t = sin2_i / (eta * eta)
    tir = sin2_t >= 1.0
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_parl = (eta * cos_theta_i - cos_theta_t) / (eta * cos_theta_i + cos_theta_t)
    r_perp = (cos_theta_i - eta * cos_theta_t) / (cos_theta_i + eta * cos_theta_t)
    r = (r_parl * r_parl + r_perp * r_perp) * 0.5
    return jnp.where(tir, 1.0, r)


def fresnel_complex_rgb(cos_theta, eta3: V3, kappa3: V3) -> V3:
    return V3(
        fresnel_complex(cos_theta, eta3.x, kappa3.x),
        fresnel_complex(cos_theta, eta3.y, kappa3.y),
        fresnel_complex(cos_theta, eta3.z, kappa3.z),
    )


def refract(eta, wo: V3, normal: V3):
    """(materials.rs:992-1009). Returns (wi, tir_mask)."""
    cos_i = wo.dot(normal)
    flip = cos_i < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_i = jnp.abs(cos_i)
    normal = V3.where(flip, -normal, normal)
    sin2_i = 1.0 - cos_i * cos_i
    sin2_t = sin2_i / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi = -wo / eta + normal * (cos_i / eta - cos_t)
    return wi, tir


# ------------------------------------------------------------ microfacet

def tr_distribution(wm: V3, ax, ay):
    """Anisotropic Trowbridge-Reitz D in its compact form
    D = 1 / (pi ax ay ((x/ax)^2 + (y/ay)^2 + z^2)^2)  (PBRT 4ed 9.16).

    Note: the reference's distribution() (materials.rs:1080-1092) uses the
    unnormalized wm.x/wm.y as cos_phi/sin_phi, scaling its D by sin^2(theta)
    relative to PBRT; we use the correct form (self-consistent with the VNDF
    sampler below, and we bless snapshots against our own output).
    """
    q = (wm.x / ax) ** 2 + (wm.y / ay) ** 2 + wm.z ** 2
    safe_q = jnp.where(q == 0.0, 1.0, q)
    d = 1.0 / (jnp.pi * ax * ay * safe_q * safe_q)
    return jnp.where(q == 0.0, 0.0, d)


def tr_lambda(w: V3, ax, ay):
    """Smith Lambda: ( sqrt(1 + ((ax x)^2 + (ay y)^2) / z^2) - 1 ) / 2."""
    z2 = w.z ** 2
    a2 = (ax * w.x) ** 2 + (ay * w.y) ** 2
    safe_z2 = jnp.where(z2 == 0.0, 1.0, z2)
    lam = (jnp.sqrt(1.0 + a2 / safe_z2) - 1.0) * 0.5
    return jnp.where(z2 == 0.0, 1e8, lam)


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def tr_visible_distribution(w: V3, wm: V3, ax, ay):
    cos_theta = jnp.abs(w.z)
    safe = jnp.where(cos_theta == 0.0, 1.0, cos_theta)
    return (
        (tr_g1(w, ax, ay) / safe)
        * tr_distribution(wm, ax, ay)
        * jnp.abs(w.dot(wm))
    )


def tr_sample_wm(w: V3, ax, ay, u0, u1) -> V3:
    """VNDF sampling (materials.rs:1125-1165 / PBRT 4ed 9.6.4)."""
    wh = V3(ax * w.x, ay * w.y, w.z).normalize()
    wh = V3.where(wh.z < 0.0, -wh, wh)
    px_d, py_d = sample_unit_disk_c(u0, u1)
    zero = jnp.zeros_like(w.x)
    one = jnp.ones_like(w.x)
    z_axis = V3(zero, zero, one)
    x_axis = V3(one, zero, zero)
    t1 = V3.where(wh.z < 0.9999, z_axis.cross(wh), x_axis)
    t2 = wh.cross(t1)
    h = jnp.sqrt(jnp.maximum(1.0 - px_d ** 2, 0.0))
    offset = 0.5 * h * (1.0 - wh.z)
    scale = 0.5 * (1.0 + wh.z)
    py = offset + scale * py_d
    px = px_d
    pz = jnp.sqrt(jnp.maximum(1.0 - px * px - py * py, 0.0))
    nh = t1 * px + t2 * py + wh * pz
    wm = V3(ax * nh.x, ay * nh.y, jnp.maximum(nh.z, 1.0e-6))
    return wm.normalize()


# ---------------------------------------------------------------- diffuse

def diffuse_eval(albedo: V3, wo: V3, wi: V3) -> V3:
    same_side = wo.z * wi.z >= 0.0
    return V3.where(same_side, albedo / jnp.pi, V3.const(0.0, 0.0, 0.0))


def diffuse_pdf(wo, wi, allowed):
    ok = (allowed & NONSPECULAR_REFLECTION) != 0
    same_side = wo.z * wi.z > 0.0
    return jnp.where(ok & same_side, 1.0 / (2.0 * jnp.pi), 0.0)


def diffuse_sample(albedo: V3, wo: V3, u0, u1) -> BsdfSample:
    from .rng import sample_cosine_hemisphere_c

    wx, wy, wz = sample_cosine_hemisphere_c(u0, u1)
    wi = V3(wx, wy, wz)
    pdf = wz / jnp.pi
    return BsdfSample(
        wi=wi,
        f=albedo / jnp.pi,
        pdf=pdf,
        component=jnp.full(wo.x.shape, NONSPECULAR_REFLECTION, jnp.int32),
        valid=pdf > 0.0,
    )


# ------------------------------------------------------------ smooth kinds

def smooth_dielectric_sample(eta, wo: V3, u1, allowed) -> BsdfSample:
    """(materials.rs:398-486)."""
    R = fresnel_dielectric(wo.z, eta)
    T = 1.0 - R
    p_reflect = jnp.where((allowed & SPECULAR_REFLECTION) != 0, R, 0.0)
    p_transmit = jnp.where((allowed & SPECULAR_TRANSMISSION) != 0, T, 0.0)
    p_total = p_reflect + p_transmit
    safe_total = jnp.where(p_total == 0.0, 1.0, p_total)
    choose_reflect = u1 * safe_total < p_reflect

    # reflection branch
    wi_r = V3(-wo.x, -wo.y, wo.z)
    cos_r = jnp.abs(wi_r.z)
    safe_cos_r = jnp.where(cos_r == 0.0, 1.0, cos_r)
    f_r = R / safe_cos_r
    pdf_r = R / safe_total

    # transmission branch
    zero = jnp.zeros_like(wo.x)
    normal = V3(zero, zero, jnp.ones_like(wo.x))
    wi_t, tir = refract(eta, wo, normal)
    eta_corr = jnp.where(wo.z < 0.0, 1.0 / eta, eta)
    cos_t = jnp.abs(wi_t.z)
    safe_cos_t = jnp.where(cos_t == 0.0, 1.0, cos_t)
    f_t = (T / safe_cos_t) / (eta_corr * eta_corr)
    pdf_t = T / safe_total

    wi = V3.where(choose_reflect, wi_r, wi_t)
    f = jnp.where(choose_reflect, f_r, f_t)
    pdf = jnp.where(choose_reflect, pdf_r, pdf_t)
    component = jnp.where(
        choose_reflect, SPECULAR_REFLECTION, SPECULAR_TRANSMISSION
    ).astype(jnp.int32)
    valid = (p_total > 0.0) & (pdf > 0.0) & ~(~choose_reflect & tir)
    return BsdfSample(
        wi=wi, f=V3(f, f, f), pdf=pdf, component=component, valid=valid,
    )


def smooth_conductor_sample(eta3: V3, kappa3: V3, wo: V3) -> BsdfSample:
    wi = V3(-wo.x, -wo.y, wo.z)
    cos = wo.z
    safe_cos = jnp.where(cos == 0.0, 1.0, cos)
    f = fresnel_complex_rgb(cos, eta3, kappa3) / safe_cos
    pdf = jnp.ones_like(cos)
    # cos <= 0 means the lane hit the conductor from INSIDE (a grazing
    # self-reintersection artifact on spheres); the reference's F/wo.z
    # would emit a huge NEGATIVE weight there (materials.rs:486-489 has
    # no sign guard), which explodes on the TPU backend where ULP-level
    # geometry flips whole grazing bands. Killing the path is the
    # physical behavior; divergence recorded in PARITY.md.
    return BsdfSample(
        wi=wi, f=f, pdf=pdf,
        component=jnp.full(cos.shape, SPECULAR_REFLECTION, jnp.int32),
        valid=cos > 0.0,
    )


# --------------------------------------------------- rough conductor (BRDF)

def _half_or_one(h: V3):
    degenerate = ~h.any_nonzero()
    wm = V3.where(degenerate, V3.const(1.0, 1.0, 1.0), h).normalize()
    return degenerate, wm


def ts_refl_pdf(wo: V3, wi: V3, ax, ay):
    degenerate, wm = _half_or_one(wo + wi)
    wm = V3.where(wm.z < 0.0, -wm, wm)
    safe_dot = jnp.maximum(jnp.abs(wo.dot(wm)), 1e-20)
    pdf = tr_visible_distribution(wo, wm, ax, ay) / (4.0 * safe_dot)
    return jnp.where(degenerate, 0.0, pdf)


def ts_refl_eval(wo: V3, wi: V3, eta3: V3, kappa3: V3, ax, ay) -> V3:
    degenerate, wm = _half_or_one(wo + wi)
    cos_theta = jnp.abs(wm.dot(wi))
    fres = fresnel_complex_rgb(cos_theta, eta3, kappa3)
    denom = 4.0 * wo.z * wi.z
    safe_denom = jnp.where(denom == 0.0, 1.0, denom)
    f = fres * (tr_distribution(wm, ax, ay) * tr_g(wo, wi, ax, ay) / safe_denom)
    # opposite-hemisphere pairs (inside-hits) would yield a negative
    # denominator and negative reflectance — physically zero for a
    # reflection-only conductor (guard absent in materials.rs:1210-1213;
    # divergence recorded in PARITY.md)
    bad = degenerate | (denom <= 0.0)
    return V3.where(bad, V3.const(0.0, 0.0, 0.0), f)


def ts_refl_sample(wo: V3, eta3: V3, kappa3: V3, ax, ay, u0, u1) -> BsdfSample:
    wm = tr_sample_wm(wo, ax, ay, u0, u1)
    wi = reflect_z(wo, wm)
    below = wo.z * wi.z < 0.0
    pdf = ts_refl_pdf(wo, wi, ax, ay)
    f = ts_refl_eval(wo, wi, eta3, kappa3, ax, ay)
    return BsdfSample(
        wi=wi, f=f, pdf=pdf,
        component=jnp.full(pdf.shape, NONSPECULAR_REFLECTION, jnp.int32),
        valid=~below & (pdf > 0.0),
    )


# -------------------------------------------------- rough dielectric (BSDF)

def _ts_halfvector(wo: V3, wi: V3, eta):
    reflect_case = wo.z * wi.z > 0.0
    eta_wm = jnp.where(
        reflect_case, 1.0, jnp.where(wo.z > 0.0, eta, 1.0 / eta)
    )
    degenerate, wm = _half_or_one(wi * eta_wm + wo)
    wm = V3.where(wm.z < 0.0, -wm, wm)
    grazing = (wi.z == 0.0) | (wo.z == 0.0) | degenerate
    backfacing = (wm.dot(wi) * wi.z < 0.0) | (wm.dot(wo) * wo.z < 0.0)
    return reflect_case, eta_wm, wm, grazing | backfacing


def ts_pdf(wo: V3, wi: V3, eta, ax, ay, allowed):
    reflect_case, eta_wm, wm, invalid = _ts_halfvector(wo, wi, eta)
    R = fresnel_dielectric(wo.dot(wm), eta)
    T = 1.0 - R
    p_reflect = jnp.where((allowed & NONSPECULAR_REFLECTION) != 0, R, 0.0)
    p_transmit = jnp.where((allowed & NONSPECULAR_TRANSMISSION) != 0, T, 0.0)
    p_total = p_reflect + p_transmit
    safe_total = jnp.where(p_total == 0.0, 1.0, p_total)
    vd = tr_visible_distribution(wo, wm, ax, ay)
    safe_dot = jnp.maximum(jnp.abs(wo.dot(wm)), 1e-20)
    pdf_r = (p_reflect / safe_total) * vd / (4.0 * safe_dot)
    denom = (wi.dot(wm) + wo.dot(wm) / eta_wm) ** 2
    safe_denom = jnp.where(denom == 0.0, 1.0, denom)
    dwm_dwi = jnp.abs(wi.dot(wm)) / safe_denom
    pdf_t = (p_transmit / safe_total) * vd * dwm_dwi
    pdf = jnp.where(reflect_case, pdf_r, pdf_t)
    return jnp.where(invalid | (p_total == 0.0) | (denom == 0.0), 0.0, pdf)


def ts_eval(wo: V3, wi: V3, eta, ax, ay) -> V3:
    reflect_case, eta_wm, wm, invalid = _ts_halfvector(wo, wi, eta)
    F = fresnel_dielectric(wo.dot(wm), eta)
    d = tr_distribution(wm, ax, ay)
    g = tr_g(wo, wi, ax, ay)
    denom_r = jnp.abs(4.0 * wo.z * wi.z)
    safe_r = jnp.where(denom_r == 0.0, 1.0, denom_r)
    brdf = d * F * g / safe_r
    denom_t = wi.z * wo.z * (wi.dot(wm) + wo.dot(wm) / eta_wm) ** 2
    safe_t = jnp.where(denom_t == 0.0, 1.0, denom_t)
    btdf = (
        d * (1.0 - F) * g
        * jnp.abs(wi.dot(wm) * wo.dot(wm) / safe_t)
        / (eta_wm * eta_wm)
    )
    f = jnp.where(reflect_case, brdf, btdf)
    f = jnp.where(invalid | (denom_r == 0.0) & reflect_case, 0.0, f)
    return V3(f, f, f)


def ts_sample(wo: V3, eta, ax, ay, allowed, u0, u1, uc) -> BsdfSample:
    """(materials.rs:1388-1473)."""
    wm = tr_sample_wm(wo, ax, ay, u0, u1)
    R = fresnel_dielectric(wo.dot(wm), eta)
    T = 1.0 - R
    p_reflect = jnp.where((allowed & REFLECTION) != 0, R, 0.0)
    p_transmit = jnp.where((allowed & TRANSMISSION) != 0, T, 0.0)
    p_total = p_reflect + p_transmit
    safe_total = jnp.where(p_total == 0.0, 1.0, p_total)
    choose_reflect = uc * safe_total < p_reflect

    wi_r = reflect_z(wo, wm)
    null_r = wo.z * wi_r.z < 0.0
    wi_t, tir = refract(eta, wo, wm)
    null_t = (wo.z * wi_t.z > 0.0) | (wi_t.z == 0.0) | tir

    wi = V3.where(choose_reflect, wi_r, wi_t)
    null = jnp.where(choose_reflect, null_r, null_t) | (p_total == 0.0)
    pdf = ts_pdf(wo, wi, eta, ax, ay, allowed)
    f = ts_eval(wo, wi, eta, ax, ay)
    component = jnp.where(
        choose_reflect, NONSPECULAR_REFLECTION, NONSPECULAR_TRANSMISSION
    ).astype(jnp.int32)
    return BsdfSample(
        wi=wi, f=f, pdf=pdf, component=component,
        valid=~null & (pdf > 0.0),
    )
