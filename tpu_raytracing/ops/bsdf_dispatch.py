"""Top-level BSDF dispatch over per-lane material kinds (device).

Each material kind present in the scene (static, from SceneMeta) is evaluated
on the full batch and per-lane kinds select the result — predication instead
of the reference CPU's enum match / OptiX's SBT program selection.

Every bsdf_sample call consumes exactly 3 sampler dimensions regardless of
the lane's material so streams stay aligned across the batch; the layered
BSDF derives an internal hashed sub-stream for its random walk.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..device.scene_buffers import (
    MAT_COATED_DIFFUSE, MAT_DIFFUSE, MAT_ROUGH_CONDUCTOR,
    MAT_ROUGH_DIELECTRIC, MAT_SMOOTH_CONDUCTOR, MAT_SMOOTH_DIELECTRIC,
)
from . import bsdf as B
from .layered import layered_eval, layered_sample
from .rng import SampleStream, SamplerConfig, hash_u32, sample_uniform, sample_uniform2


def _rough_kinds(kinds: Tuple[int, ...]):
    """Kinds that can appear at runtime given the compile-time kind set
    (rough kinds can degrade to smooth per-lane)."""
    out = set(kinds)
    if MAT_ROUGH_CONDUCTOR in out:
        out.add(MAT_SMOOTH_CONDUCTOR)
    if MAT_ROUGH_DIELECTRIC in out:
        out.add(MAT_SMOOTH_DIELECTRIC)
    return out


def bsdf_eval(params: B.BsdfParams, wo, wi, kinds: Tuple[int, ...]):
    """f(wo, wi) per lane; delta BSDFs evaluate to zero."""
    kinds = _rough_kinds(kinds)
    k = params.kind
    f = jnp.zeros_like(wo)
    if MAT_DIFFUSE in kinds:
        f = jnp.where(
            (k == MAT_DIFFUSE)[..., None],
            B.diffuse_eval(params.albedo, wo, wi),
            f,
        )
    if MAT_ROUGH_CONDUCTOR in kinds:
        f = jnp.where(
            (k == MAT_ROUGH_CONDUCTOR)[..., None],
            B.ts_refl_eval(
                wo, wi, params.eta, params.kappa, params.alpha_x, params.alpha_y
            ),
            f,
        )
    if MAT_ROUGH_DIELECTRIC in kinds:
        f = jnp.where(
            (k == MAT_ROUGH_DIELECTRIC)[..., None],
            B.ts_eval(wo, wi, params.eta[..., 0], params.alpha_x, params.alpha_y),
            f,
        )
    if MAT_COATED_DIFFUSE in kinds:
        f = jnp.where(
            (k == MAT_COATED_DIFFUSE)[..., None],
            layered_eval(params, wo, wi),
            f,
        )
    return f


def bsdf_pdf(params: B.BsdfParams, wo, wi, allowed, kinds: Tuple[int, ...]):
    kinds = _rough_kinds(kinds)
    k = params.kind
    pdf = jnp.zeros(wo.shape[:-1], wo.dtype)
    if MAT_DIFFUSE in kinds:
        pdf = jnp.where(
            k == MAT_DIFFUSE, B.diffuse_pdf(wo, wi, allowed), pdf
        )
    if MAT_ROUGH_CONDUCTOR in kinds:
        ok = (allowed & B.NONSPECULAR_REFLECTION) != 0
        p = B.ts_refl_pdf(wo, wi, params.alpha_x, params.alpha_y)
        pdf = jnp.where((k == MAT_ROUGH_CONDUCTOR) & ok, p, pdf)
    if MAT_ROUGH_DIELECTRIC in kinds:
        p = B.ts_pdf(
            wo, wi, params.eta[..., 0], params.alpha_x, params.alpha_y, allowed
        )
        pdf = jnp.where(k == MAT_ROUGH_DIELECTRIC, p, pdf)
    # layered pdf is not defined (reference: todo!()); never needed at top
    # level because the integrator has no BSDF-vs-light MIS.
    return pdf


def bsdf_sample(
    params: B.BsdfParams,
    wo,
    allowed,
    cfg: SamplerConfig,
    stream: SampleStream,
    kinds: Tuple[int, ...],
) -> Tuple[B.BsdfSample, SampleStream]:
    kinds = _rough_kinds(kinds)
    k = params.kind
    u2, stream = sample_uniform2(cfg, stream)
    u1, stream = sample_uniform(cfg, stream)

    B_ = wo.shape[0]
    out = B.BsdfSample(
        wi=jnp.zeros_like(wo),
        f=jnp.zeros_like(wo),
        pdf=jnp.zeros(B_, wo.dtype),
        component=jnp.zeros(B_, jnp.int32),
        valid=jnp.zeros(B_, bool),
    )

    def merge(out, mask, s: B.BsdfSample):
        m = mask[..., None]
        return B.BsdfSample(
            wi=jnp.where(m, s.wi, out.wi),
            f=jnp.where(m, s.f, out.f),
            pdf=jnp.where(mask, s.pdf, out.pdf),
            component=jnp.where(mask, s.component, out.component),
            valid=jnp.where(mask, s.valid, out.valid),
        )

    if MAT_DIFFUSE in kinds:
        ok = (allowed & B.NONSPECULAR_REFLECTION) != 0
        s = B.diffuse_sample(params.albedo, wo, u2)
        s = s._replace(valid=s.valid & ok)
        out = merge(out, k == MAT_DIFFUSE, s)
    if MAT_SMOOTH_DIELECTRIC in kinds:
        s = B.smooth_dielectric_sample(params.eta[..., 0], wo, u1, allowed)
        out = merge(out, k == MAT_SMOOTH_DIELECTRIC, s)
    if MAT_SMOOTH_CONDUCTOR in kinds:
        ok = (allowed & B.SPECULAR_REFLECTION) != 0
        s = B.smooth_conductor_sample(params.eta, params.kappa, wo)
        s = s._replace(valid=s.valid & ok)
        out = merge(out, k == MAT_SMOOTH_CONDUCTOR, s)
    if MAT_ROUGH_CONDUCTOR in kinds:
        ok = (allowed & B.REFLECTION) != 0
        s = B.ts_refl_sample(
            wo, params.eta, params.kappa, params.alpha_x, params.alpha_y, u2
        )
        s = s._replace(valid=s.valid & ok)
        out = merge(out, k == MAT_ROUGH_CONDUCTOR, s)
    if MAT_ROUGH_DIELECTRIC in kinds:
        s = B.ts_sample(
            wo, params.eta[..., 0], params.alpha_x, params.alpha_y,
            allowed, u2, u1,
        )
        out = merge(out, k == MAT_ROUGH_DIELECTRIC, s)
    if MAT_COATED_DIFFUSE in kinds:
        draw_base = hash_u32(
            stream.px, stream.py, stream.sample, stream.dim,
            jnp.uint32(0xC0A7ED),
        )
        s = layered_sample(params, wo, draw_base)
        out = merge(out, k == MAT_COATED_DIFFUSE, s)

    return out, stream
