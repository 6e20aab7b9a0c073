"""Top-level BSDF dispatch over per-lane material kinds (device).

Each material kind present in the scene (static, from SceneMeta) is evaluated
on the full batch and per-lane kinds select the result — predication instead
of the reference CPU's enum match / OptiX's SBT program selection.

Exception: the stochastic layered BSDF (CoatedDiffuse) is ~100x the vector
work of every other kind (8 samples x 8 depth random walk, layered.py), so
paying it on every lane just to mask the result dominated device time
(round-2 profile: ~50%). The MATERIAL-PARTITIONED path sorts lanes so
coated ones are contiguous, then a while_loop runs the walk on only
ceil(n_coated / TILE) fixed-shape tiles — cost proportional to the actual
coated+active fraction, with static shapes throughout (the SBT-dispatch
role of the OptiX backend, SURVEY.md §2.3, recast as a compacted tile
queue). Results merge back through the same per-lane kind masks, so the
predicated and partitioned paths agree (TPU_RT_MAT_PART=0/1 A/B knob).

Every bsdf_sample call consumes exactly 3 sampler dimensions regardless of
the lane's material so streams stay aligned across the batch; the layered
BSDF derives an internal hashed sub-stream for its random walk.

Directions/colors are lane-major V3 component triples (ops/vec.py); the
partitioned path packs them into one wide row array only to cross its
permutation gather + tile windows.
"""
from __future__ import annotations

import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..device.scene_buffers import (
    MAT_COATED_DIFFUSE, MAT_DIFFUSE, MAT_ROUGH_CONDUCTOR,
    MAT_ROUGH_DIELECTRIC, MAT_SMOOTH_CONDUCTOR, MAT_SMOOTH_DIELECTRIC,
)
from . import bsdf as B
from .layered import layered_eval, layered_sample
from .rng import SampleStream, SamplerConfig, hash_u32, sample_uniform, sample_uniform2c
from .vec import V3

MAT_TILE = int(_os.environ.get("TPU_RT_MAT_TILE", "4096"))


def _mat_partition(B_: int) -> bool:
    """Partitioned layered dispatch: default on TPU.

    auto depends ONLY on the backend (not the batch size) so a TPU render
    takes the same numerical path at every pixel-chunk size — the
    cross-chunking determinism invariant. Tiles are fixed-shape
    (MAT_TILE) with padding, so small batches just waste part of one
    tile. The partitioned walk differs from the predicated one by
    shape-dependent XLA fusion ULPs (tests/test_mat_partition.py), which
    is why it must not toggle within a backend."""
    mode = _os.environ.get("TPU_RT_MAT_PART", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _coated_order(kind, active):
    """Stable order putting active coated lanes first; returns
    (order, inverse, n_coated)."""
    B_ = kind.shape[0]
    wanted = kind == MAT_COATED_DIFFUSE
    if active is not None:
        wanted = wanted & active
    key = (~wanted).astype(jnp.int32)
    iota = jnp.arange(B_, dtype=jnp.int32)
    _, order = jax.lax.sort_key_val(key, iota, is_stable=True)
    _, inv = jax.lax.sort_key_val(order, iota, is_stable=True)
    return order, inv, jnp.sum(wanted.astype(jnp.int32))


def _pad_tile(a, T):
    """Pad axis 0 up to T rows so dynamic_slice windows always fit.

    The tile shape is always exactly (T, ...) regardless of the batch
    size, so the layered walk compiles to ONE executable shape — renders
    stay identical across pixel-chunk sizes (determinism invariant)."""
    B_ = a.shape[0]
    if B_ >= T:
        return a
    pad = [(0, T - B_)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def _tile_loop(n_wanted, T, bufs, tile_fn):
    """Run tile_fn over the first ceil(n_wanted/T) T-sized windows of the
    sorted buffers. dynamic_slice clamps the final window into bounds;
    the overlap just recomputes identical values (pure function of lane
    inputs), so clamping is harmless."""
    n_tiles = (n_wanted + T - 1) // T

    def cond(c):
        return c[0] < n_tiles

    def body(c):
        i = c[0]
        start = i * T
        outs = tile_fn(start, *c[1:])
        return (i + 1,) + outs

    out = jax.lax.while_loop(cond, body, (jnp.int32(0),) + bufs)
    return out[1:]


def _cols(*vals):
    """Stack scalars/V3s into one (B, K) row array (pack for permutation)."""
    cols = []
    for v in vals:
        if isinstance(v, V3):
            cols.extend([v.x, v.y, v.z])
        else:
            cols.append(v)
    return jnp.stack(cols, axis=1)


def _layered_eval_partitioned(params: B.BsdfParams, wo: V3, wi: V3, active):
    """layered_eval computed only on (active) coated tiles."""
    B_ = wo.x.shape[0]
    T = MAT_TILE
    f32 = wo.x.dtype
    order, inv, n_coated = _coated_order(params.kind, active)
    packf = _cols(
        wo, wi, params.albedo, params.eta,
        params.alpha_x, params.alpha_y, params.thickness, params.coat_albedo,
    )[order]
    top_kind = params.top_kind[order]  # int domain: no f32 bitcast on TPU
    packf = _pad_tile(packf, T)
    top_kind = _pad_tile(top_kind, T)
    Bp = packf.shape[0]
    zero_t = V3.zeros((T,), f32)

    def tile_fn(start, out):
        tf = jax.lax.dynamic_slice(packf, (start, 0), (T, packf.shape[1]))
        tk = jax.lax.dynamic_slice(top_kind, (start,), (T,))
        v3 = lambda c: V3(tf[:, c], tf[:, c + 1], tf[:, c + 2])  # noqa: E731
        p = B.BsdfParams(
            kind=jnp.full((T,), MAT_COATED_DIFFUSE, jnp.int32),
            albedo=v3(6), eta=v3(9), kappa=zero_t,
            alpha_x=tf[:, 12], alpha_y=tf[:, 13], top_kind=tk,
            thickness=tf[:, 14], coat_albedo=v3(15),
        )
        f = layered_eval(p, v3(0), v3(3))
        return (jax.lax.dynamic_update_slice(
            out, jnp.stack([f.x, f.y, f.z], axis=1), (start, 0)),)

    (out,) = _tile_loop(
        n_coated, T, (jnp.zeros((Bp, 3), f32),), tile_fn
    )
    out = out[:B_][inv]
    return V3(out[:, 0], out[:, 1], out[:, 2])


def _layered_sample_partitioned(params: B.BsdfParams, wo: V3, draw_base,
                                active):
    """layered_sample computed only on (active) coated tiles."""
    B_ = wo.x.shape[0]
    T = MAT_TILE
    f32 = wo.x.dtype
    order, inv, n_coated = _coated_order(params.kind, active)
    packf = _cols(
        wo, params.albedo, params.eta,
        params.alpha_x, params.alpha_y, params.thickness, params.coat_albedo,
    )[order]
    packi = jnp.stack(
        [
            jax.lax.bitcast_convert_type(draw_base, jnp.int32),
            params.top_kind.astype(jnp.int32),
        ],
        axis=1,
    )[order]
    packf = _pad_tile(packf, T)
    packi = _pad_tile(packi, T)
    Bp = packf.shape[0]
    zero_t = V3.zeros((T,), f32)

    def tile_fn(start, outf, outi):
        tf = jax.lax.dynamic_slice(packf, (start, 0), (T, packf.shape[1]))
        ti = jax.lax.dynamic_slice(packi, (start, 0), (T, 2))
        v3 = lambda c: V3(tf[:, c], tf[:, c + 1], tf[:, c + 2])  # noqa: E731
        p = B.BsdfParams(
            kind=jnp.full((T,), MAT_COATED_DIFFUSE, jnp.int32),
            albedo=v3(3), eta=v3(6), kappa=zero_t,
            alpha_x=tf[:, 9], alpha_y=tf[:, 10], top_kind=ti[:, 1],
            thickness=tf[:, 11], coat_albedo=v3(12),
        )
        db = jax.lax.bitcast_convert_type(ti[:, 0], jnp.uint32)
        s = layered_sample(p, v3(0), db)
        sf = jnp.stack(
            [s.wi.x, s.wi.y, s.wi.z, s.f.x, s.f.y, s.f.z, s.pdf], axis=1
        )
        si = jnp.stack(
            [s.component, s.valid.astype(jnp.int32)], axis=1
        )
        return (
            jax.lax.dynamic_update_slice(outf, sf, (start, 0)),
            jax.lax.dynamic_update_slice(outi, si, (start, 0)),
        )

    outf, outi = _tile_loop(
        n_coated, T,
        (jnp.zeros((Bp, 7), f32), jnp.zeros((Bp, 2), jnp.int32)),
        tile_fn,
    )
    outf = outf[:B_][inv]
    outi = outi[:B_][inv]
    return B.BsdfSample(
        wi=V3(outf[:, 0], outf[:, 1], outf[:, 2]),
        f=V3(outf[:, 3], outf[:, 4], outf[:, 5]),
        pdf=outf[:, 6],
        component=outi[:, 0], valid=outi[:, 1] != 0,
    )


def _rough_kinds(kinds: Tuple[int, ...]):
    """Kinds that can appear at runtime given the compile-time kind set
    (rough kinds can degrade to smooth per-lane)."""
    out = set(kinds)
    if MAT_ROUGH_CONDUCTOR in out:
        out.add(MAT_SMOOTH_CONDUCTOR)
    if MAT_ROUGH_DIELECTRIC in out:
        out.add(MAT_SMOOTH_DIELECTRIC)
    return out


def bsdf_eval(params: B.BsdfParams, wo: V3, wi: V3, kinds: Tuple[int, ...],
              active=None) -> V3:
    """f(wo, wi) per lane; delta BSDFs evaluate to zero.

    active (optional bool mask): lanes whose result is actually consumed —
    the partitioned layered path skips coated lanes outside it. Inactive
    lanes may return garbage; callers must mask (they already do)."""
    kinds = _rough_kinds(kinds)
    k = params.kind
    f = V3.zeros(wo.x.shape, wo.x.dtype)
    if MAT_DIFFUSE in kinds:
        f = V3.where(
            k == MAT_DIFFUSE, B.diffuse_eval(params.albedo, wo, wi), f
        )
    if MAT_ROUGH_CONDUCTOR in kinds:
        f = V3.where(
            k == MAT_ROUGH_CONDUCTOR,
            B.ts_refl_eval(
                wo, wi, params.eta, params.kappa, params.alpha_x, params.alpha_y
            ),
            f,
        )
    if MAT_ROUGH_DIELECTRIC in kinds:
        f = V3.where(
            k == MAT_ROUGH_DIELECTRIC,
            B.ts_eval(wo, wi, params.eta.x, params.alpha_x, params.alpha_y),
            f,
        )
    if MAT_COATED_DIFFUSE in kinds:
        if _mat_partition(wo.x.shape[0]):
            lf = _layered_eval_partitioned(params, wo, wi, active)
        else:
            lf = layered_eval(params, wo, wi)
        f = V3.where(k == MAT_COATED_DIFFUSE, lf, f)
    return f


def bsdf_pdf(params: B.BsdfParams, wo: V3, wi: V3, allowed,
             kinds: Tuple[int, ...]):
    kinds = _rough_kinds(kinds)
    k = params.kind
    pdf = jnp.zeros(wo.x.shape, wo.x.dtype)
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
            wo, wi, params.eta.x, params.alpha_x, params.alpha_y, allowed
        )
        pdf = jnp.where(k == MAT_ROUGH_DIELECTRIC, p, pdf)
    # layered pdf is not defined (reference: todo!()); never needed at top
    # level because the integrator has no BSDF-vs-light MIS.
    return pdf


def bsdf_sample(
    params: B.BsdfParams,
    wo: V3,
    allowed,
    cfg: SamplerConfig,
    stream: SampleStream,
    kinds: Tuple[int, ...],
    active=None,
) -> Tuple[B.BsdfSample, SampleStream]:
    kinds = _rough_kinds(kinds)
    k = params.kind
    u0, u1, stream = sample_uniform2c(cfg, stream)
    uc, stream = sample_uniform(cfg, stream)

    B_ = wo.x.shape[0]
    out = B.BsdfSample(
        wi=V3.zeros(wo.x.shape, wo.x.dtype),
        f=V3.zeros(wo.x.shape, wo.x.dtype),
        pdf=jnp.zeros(B_, wo.x.dtype),
        component=jnp.zeros(B_, jnp.int32),
        valid=jnp.zeros(B_, bool),
    )

    def merge(out, mask, s: B.BsdfSample):
        return B.BsdfSample(
            wi=V3.where(mask, s.wi, out.wi),
            f=V3.where(mask, s.f, out.f),
            pdf=jnp.where(mask, s.pdf, out.pdf),
            component=jnp.where(mask, s.component, out.component),
            valid=jnp.where(mask, s.valid, out.valid),
        )

    if MAT_DIFFUSE in kinds:
        ok = (allowed & B.NONSPECULAR_REFLECTION) != 0
        s = B.diffuse_sample(params.albedo, wo, u0, u1)
        s = s._replace(valid=s.valid & ok)
        out = merge(out, k == MAT_DIFFUSE, s)
    if MAT_SMOOTH_DIELECTRIC in kinds:
        s = B.smooth_dielectric_sample(params.eta.x, wo, uc, allowed)
        out = merge(out, k == MAT_SMOOTH_DIELECTRIC, s)
    if MAT_SMOOTH_CONDUCTOR in kinds:
        ok = (allowed & B.SPECULAR_REFLECTION) != 0
        s = B.smooth_conductor_sample(params.eta, params.kappa, wo)
        s = s._replace(valid=s.valid & ok)
        out = merge(out, k == MAT_SMOOTH_CONDUCTOR, s)
    if MAT_ROUGH_CONDUCTOR in kinds:
        ok = (allowed & B.REFLECTION) != 0
        s = B.ts_refl_sample(
            wo, params.eta, params.kappa, params.alpha_x, params.alpha_y,
            u0, u1,
        )
        s = s._replace(valid=s.valid & ok)
        out = merge(out, k == MAT_ROUGH_CONDUCTOR, s)
    if MAT_ROUGH_DIELECTRIC in kinds:
        s = B.ts_sample(
            wo, params.eta.x, params.alpha_x, params.alpha_y,
            allowed, u0, u1, uc,
        )
        out = merge(out, k == MAT_ROUGH_DIELECTRIC, s)
    if MAT_COATED_DIFFUSE in kinds:
        draw_base = hash_u32(
            stream.px, stream.py, stream.sample, stream.dim,
            jnp.uint32(0xC0A7ED),
        )
        if _mat_partition(wo.x.shape[0]):
            s = _layered_sample_partitioned(params, wo, draw_base, active)
        else:
            s = layered_sample(params, wo, draw_base)
        out = merge(out, k == MAT_COATED_DIFFUSE, s)

    return out, stream
