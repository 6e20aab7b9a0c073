"""Stochastic layered BSDF (CoatedDiffuse) — batched, masked, fixed-trip.

TPU-native restructuring of the reference's LayeredBsdf
(raytracing-cpu/src/materials.rs:171-335 eval, :540-666 sample; PBRT 4ed 14.3):
a dielectric coat (smooth or rough per lane) over a diffuse base with an
optional homogeneous scattering medium between (HG phase, g = 0). The
reference's data-dependent random walk becomes MAX_DEPTH masked iterations of
a lax.fori_loop; per-lane "break"/"continue" are alive/branch masks.

Randomness: evaluation uses a one-off stream derived from hashing the (wo, wi)
bit patterns — the same trick the reference uses for deterministic eval
(materials.rs:207-212) — so eval is a pure function. Sampling draws from hash
of the caller-provided per-lane stream state.

Directions/colors are lane-major V3 component triples (ops/vec.py): the
walk's ~8x8 masked iterations run entirely on dense (B,) arrays instead of
128-lane-padded (B, 3) rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..device.scene_buffers import MAT_SMOOTH_DIELECTRIC
from . import bsdf as B
from .linalg import make_orthonormal_basis
from .rng import hash_u32, power_heuristic, sample_exponential, uniform_from_bits
from .vec import V3

N_SAMPLES = 8
MAX_DEPTH = 8
G_HG = 0.0  # reference hardcodes g = 0 (materials.rs:943)
U32 = jnp.uint32


# ------------------------------------------------------- phase function (HG)

def hg_p(wo: V3, wi: V3, g):
    cos_theta = wo.dot(wi)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (0.25 / jnp.pi) * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def hg_sample(wo: V3, g, u0, u1):
    small_g = abs(g) < 1.0e-3
    if small_g:
        cos_theta = 1.0 - 2.0 * u0
    else:
        term = (1.0 - g * g) / (1.0 + g - 2.0 * g * u0)
        cos_theta = -1.0 / (2.0 * g) * (1.0 + g * g - term * term)
    phi = 2.0 * jnp.pi * u1
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    lx = jnp.cos(phi) * sin_theta
    ly = jnp.sin(phi) * sin_theta
    x, y = make_orthonormal_basis(wo)
    wi = x * lx + y * ly + wo * cos_theta
    p = hg_p_cos(cos_theta, g)
    return wi, p, p  # (wi, p, pdf): exact importance sampling


def hg_p_cos(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return (0.25 / jnp.pi) * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def _tr_layer(dz, w: V3):
    """Beer-Lambert transmittance through slab of optical depth |dz/w.z|."""
    wz = jnp.where(w.z == 0.0, 1.0, w.z)
    return jnp.exp(-jnp.abs(dz / wz))


ZERO3 = V3.const(0.0, 0.0, 0.0)


# ---------------------------------------------------- interface dispatchers

def _top_sample(params: B.BsdfParams, w: V3, allowed, u0, u1, uc) -> B.BsdfSample:
    """Dielectric coat sample; per-lane smooth/rough select."""
    eta = params.eta.x
    smooth = params.top_kind == MAT_SMOOTH_DIELECTRIC
    # smooth path interprets NONSPECULAR flags as their specular twins
    allowed_s = jnp.where((allowed & B.REFLECTION) != 0, B.SPECULAR_REFLECTION, 0) | jnp.where(
        (allowed & B.TRANSMISSION) != 0, B.SPECULAR_TRANSMISSION, 0
    )
    s_smooth = B.smooth_dielectric_sample(eta, w, uc, allowed_s)
    s_rough = B.ts_sample(w, eta, params.alpha_x, params.alpha_y, allowed,
                          u0, u1, uc)
    return B.BsdfSample(
        wi=V3.where(smooth, s_smooth.wi, s_rough.wi),
        f=V3.where(smooth, s_smooth.f, s_rough.f),
        pdf=jnp.where(smooth, s_smooth.pdf, s_rough.pdf),
        component=jnp.where(smooth, s_smooth.component, s_rough.component),
        valid=jnp.where(smooth, s_smooth.valid, s_rough.valid),
    )


def _top_eval(params: B.BsdfParams, wo: V3, wi: V3) -> V3:
    eta = params.eta.x
    smooth = params.top_kind == MAT_SMOOTH_DIELECTRIC
    f = B.ts_eval(wo, wi, eta, params.alpha_x, params.alpha_y)
    return V3.where(smooth, ZERO3, f)


def _top_pdf(params: B.BsdfParams, wo: V3, wi: V3, allowed):
    eta = params.eta.x
    smooth = params.top_kind == MAT_SMOOTH_DIELECTRIC
    pdf = B.ts_pdf(wo, wi, eta, params.alpha_x, params.alpha_y, allowed)
    return jnp.where(smooth, 0.0, pdf)


def _top_is_delta(params: B.BsdfParams):
    return params.top_kind == MAT_SMOOTH_DIELECTRIC


# --------------------------------------------------------------- evaluation

def _eval_base_stream(wo: V3, wi: V3):
    """Per-lane one-off stream seed from the (wo, wi) bit patterns."""
    h = hash_u32(
        *(jax.lax.bitcast_convert_type(c, U32) for c in (wo.x, wo.y, wo.z)),
        *(jax.lax.bitcast_convert_type(c, U32) for c in (wi.x, wi.y, wi.z)),
    )
    return h


def layered_eval(params: B.BsdfParams, wo: V3, wi: V3) -> V3:
    """Stochastic estimate of the layered BSDF value (materials.rs:170-335)."""
    flip = wo.z < 0.0
    wo = V3.where(flip, -wo, wo)
    wi = V3.where(flip, -wi, wi)
    # bottom (diffuse) is opaque: transmission through the stack is zero, so
    # the only reachable configuration after the two-sided flip is wi.z > 0
    # with exit interface = top, exit_z = thickness.
    reachable = wi.z > 0.0

    thickness = params.thickness
    albedo = params.coat_albedo
    g = G_HG
    has_medium = albedo.any_nonzero()

    f = float(N_SAMPLES) * _top_eval(params, wo, wi)

    base = _eval_base_stream(wo, wi)

    def u1(s, d):
        return uniform_from_bits(hash_u32(base, s, d))

    def per_sample(s, f):
        enter = _top_sample(
            params, wo, B.TRANSMISSION, u1(s, U32(0)), u1(s, U32(1)),
            u1(s, U32(2)),
        )
        exit_s = _top_sample(
            params, wi, B.TRANSMISSION, u1(s, U32(3)), u1(s, U32(4)),
            u1(s, U32(5)),
        )
        ok = enter.valid & exit_s.valid
        safe_exit_pdf = jnp.where(exit_s.pdf <= 0.0, 1.0, exit_s.pdf)
        beta = exit_s.f * jnp.abs(exit_s.wi.z) / safe_exit_pdf
        exit_delta = _top_is_delta(params)

        def depth_body(depth, carry):
            w, z, beta, alive, f = carry
            d0 = U32(8) + depth.astype(U32) * U32(8)

            # russian roulette (after depth 3)
            beta_max = beta.max_component()
            rr_on = (depth > 3) & (beta_max < 0.25) & alive
            q = jnp.maximum(0.0, beta_max)
            kill = rr_on & (u1(s, d0) < q)
            alive = alive & ~kill
            beta = V3.where(rr_on & ~kill, beta / (1.0 - q), beta)

            # medium transit
            wz = jnp.where(w.z == 0.0, 1.0, jnp.abs(w.z))
            dz = sample_exponential(
                jnp.minimum(u1(s, d0 + U32(1)), 0.9999995), 1.0 / wz
            )
            zp = jnp.where(w.z > 0.0, z + dz, z - dz)
            scatter = has_medium & (zp > 0.0) & (zp < thickness) & alive

            # -- scattering event between interfaces (NEE toward exit + phase)
            wt = jnp.where(
                exit_delta,
                1.0,
                power_heuristic(
                    1.0, exit_s.pdf, 1.0, hg_p(-w, -exit_s.wi, g)
                ),
            )
            contrib1 = (
                beta * albedo
                * hg_p(-w, -exit_s.wi, g)
                * wt
                * _tr_layer(zp - thickness, exit_s.wi)
                * exit_s.f
                / safe_exit_pdf
            )
            f = f + V3.where(scatter, contrib1, ZERO3)

            ph_wi, ph_p, ph_pdf = hg_sample(
                -w, g, u1(s, d0 + U32(2)), u1(s, d0 + U32(3))
            )
            safe_ph_pdf = jnp.where(ph_pdf == 0.0, 1.0, ph_pdf)
            beta_sc = beta * albedo * (ph_p / safe_ph_pdf)
            # after scattering, if the new direction faces the exit (top),
            # add its contribution through the exit interface
            facing_exit = (zp < thickness) & (ph_wi.z > 0.0)
            exit_f = _top_eval(params, -ph_wi, wi)
            exit_pdf = _top_pdf(params, -ph_wi, wi, B.TRANSMISSION)
            wt2 = power_heuristic(1.0, ph_pdf, 1.0, exit_pdf)
            contrib2 = (
                beta_sc * _tr_layer(zp - thickness, ph_wi) * exit_f * wt2
            )
            add2 = scatter & ~exit_delta & facing_exit & exit_f.any_nonzero()
            f = f + V3.where(add2, contrib2, ZERO3)

            # -- no-scatter transit: advance to an interface
            z_nomedium = jnp.where(z == thickness, 0.0, thickness)
            beta_nomedium = beta * _tr_layer(thickness, w)
            z_medium = jnp.clip(zp, 0.0, thickness)

            new_z_transit = jnp.where(has_medium, z_medium, z_nomedium)
            new_beta_transit = V3.where(has_medium, beta, beta_nomedium)

            at_interface = alive & ~scatter
            at_top = at_interface & (new_z_transit == thickness)
            at_bottom = at_interface & ~at_top

            # top interface: reflect back down
            top_s = _top_sample(
                params, -w, B.REFLECTION, u1(s, d0 + U32(4)),
                u1(s, d0 + U32(5)), u1(s, d0 + U32(6)),
            )
            safe_top_pdf = jnp.where(top_s.pdf <= 0.0, 1.0, top_s.pdf)
            beta_top = (
                new_beta_transit * top_s.f * jnp.abs(top_s.wi.z)
                / safe_top_pdf
            )
            top_dead = at_top & ~top_s.valid

            # bottom interface (diffuse): NEE toward the exit direction via
            # exit_s, then cosine-sample a new upward direction
            bot_f1 = B.diffuse_eval(params.albedo, -w, -exit_s.wi)
            bot_pdf1 = B.diffuse_pdf(-w, -exit_s.wi, B.NONSPECULAR_REFLECTION)
            wt3 = power_heuristic(1.0, exit_s.pdf, 1.0, bot_pdf1)
            contrib3 = (
                new_beta_transit
                * bot_f1
                * jnp.abs(exit_s.wi.z)
                * wt3
                * _tr_layer(thickness, exit_s.wi)
                * exit_s.f
                / safe_exit_pdf
            )
            f = f + V3.where(at_bottom, contrib3, ZERO3)

            bot_s = B.diffuse_sample(
                params.albedo, -w, u1(s, d0 + U32(4)), u1(s, d0 + U32(5))
            )
            # diffuse samples the upper hemisphere of -w; -w has w.z<0 at the
            # bottom so wi points up, back into the medium
            safe_bot_pdf = jnp.where(bot_s.pdf <= 0.0, 1.0, bot_s.pdf)
            beta_bot = (
                new_beta_transit * bot_s.f * jnp.abs(bot_s.wi.z)
                / safe_bot_pdf
            )
            bot_dead = at_bottom & ~bot_s.valid

            # second NEE term after bottom bounce
            exit_f2 = _top_eval(params, -bot_s.wi, wi)
            exit_pdf2 = _top_pdf(params, -bot_s.wi, wi, B.ALL_COMPONENTS)
            wt4 = power_heuristic(1.0, bot_s.pdf, 1.0, exit_pdf2)
            contrib4 = (
                beta_bot * _tr_layer(thickness, bot_s.wi) * exit_f2 * wt4
            )
            add4 = at_bottom & ~bot_dead & ~exit_delta & exit_f2.any_nonzero()
            f = f + V3.where(add4, contrib4, ZERO3)

            new_w = V3.where(
                scatter, ph_wi, V3.where(at_top, top_s.wi, bot_s.wi)
            )
            new_beta = V3.where(
                scatter, beta_sc, V3.where(at_top, beta_top, beta_bot)
            )
            new_z = jnp.where(scatter, zp, new_z_transit)
            alive = alive & ~(top_dead | bot_dead)
            w = V3.where(alive, new_w, w)
            beta = V3.where(alive, new_beta, beta)
            z = jnp.where(alive, new_z, z)
            return w, z, beta, alive, f

        w0 = enter.wi
        z0 = jnp.broadcast_to(thickness, ok.shape)
        alive0 = ok
        _, _, _, _, f = jax.lax.fori_loop(
            0, MAX_DEPTH, depth_body,
            (w0, z0, V3.where(ok, beta, ZERO3), alive0, f),
        )
        return f

    f = jax.lax.fori_loop(0, N_SAMPLES, lambda s, acc: per_sample(s, acc), f)
    f = f / float(N_SAMPLES)
    return V3.where(reachable, f, ZERO3)


# ----------------------------------------------------------------- sampling

def layered_sample(params: B.BsdfParams, wo: V3, draw_base) -> B.BsdfSample:
    """Sample the layered BSDF with a random walk (materials.rs:540-666).

    draw_base: per-lane uint32 stream seed (caller derives it from the pixel
    sample stream so results stay deterministic)."""
    flip = wo.z < 0.0
    wo_f = V3.where(flip, -wo, wo)
    thickness = params.thickness
    albedo = params.coat_albedo
    g = G_HG
    has_medium = albedo.any_nonzero()

    def u1(d):
        return uniform_from_bits(hash_u32(draw_base, d))

    enter = _top_sample(params, wo_f, B.ALL_COMPONENTS, u1(U32(0)),
                        u1(U32(1)), u1(U32(2)))
    enter_reflect = (enter.component & B.REFLECTION) != 0

    # early-out result: reflection off the coat
    refl_sample = B.BsdfSample(
        wi=V3.where(flip, -enter.wi, enter.wi),
        f=enter.f,
        pdf=enter.pdf,
        component=enter.component,
        valid=enter.valid,
    )

    # walk state
    w = enter.wi
    f = enter.f * jnp.abs(enter.wi.z)
    pdf = enter.pdf
    z = jnp.broadcast_to(thickness, pdf.shape)
    specular_path = (enter.component & B.SPECULAR) != 0
    walking = enter.valid & ~enter_reflect

    done = jnp.zeros_like(walking)  # escaped with a transmission event
    out_wi = V3.zeros(pdf.shape, wo.x.dtype)
    out_f = V3.zeros(pdf.shape, wo.x.dtype)
    out_pdf = jnp.zeros_like(pdf)
    out_comp = jnp.zeros(pdf.shape, jnp.int32)

    def body(depth, carry):
        (w, z, f, pdf, specular_path, walking, done,
         out_wi, out_f, out_pdf, out_comp) = carry
        d0 = U32(8) + depth.astype(U32) * U32(8)

        # russian roulette
        fmax = f.max_component()
        safe_pdf = jnp.where(pdf == 0.0, 1.0, pdf)
        rr_beta = fmax / safe_pdf
        rr_on = (depth > 3) & (rr_beta < 0.25) & walking
        q = jnp.maximum(0.0, 1.0 - rr_beta)
        kill = rr_on & (u1(d0) < q)
        walking = walking & ~kill & (w.z != 0.0)
        pdf = jnp.where(rr_on & ~kill, pdf * (1.0 - q), pdf)

        # medium event?
        wz = jnp.where(w.z == 0.0, 1.0, jnp.abs(w.z))
        dz = sample_exponential(jnp.minimum(u1(d0 + U32(1)), 0.9999995), 1.0 / wz)
        zp = jnp.where(w.z > 0.0, z + dz, z - dz)
        scatter = has_medium & (zp > 0.0) & (zp < thickness) & walking

        ph_wi, ph_p, ph_pdf = hg_sample(
            -w, g, u1(d0 + U32(2)), u1(d0 + U32(3))
        )
        f_sc = f * albedo * ph_p
        pdf_sc = pdf * ph_pdf

        z_transit = jnp.where(
            has_medium,
            jnp.clip(zp, 0.0, thickness),
            jnp.where(z == thickness, 0.0, thickness),
        )
        f_transit = V3.where(has_medium, f, f * _tr_layer(thickness, w))

        at_interface = walking & ~scatter
        at_bottom = at_interface & (z_transit == 0.0)

        # interface sample (top dielectric or bottom diffuse)
        top_s = _top_sample(
            params, -w, B.ALL_COMPONENTS, u1(d0 + U32(4)), u1(d0 + U32(5)),
            u1(d0 + U32(6)),
        )
        bot_s = B.diffuse_sample(
            params.albedo, -w, u1(d0 + U32(4)), u1(d0 + U32(5))
        )
        i_wi = V3.where(at_bottom, bot_s.wi, top_s.wi)
        i_f = V3.where(at_bottom, bot_s.f, top_s.f)
        i_pdf = jnp.where(at_bottom, bot_s.pdf, top_s.pdf)
        i_comp = jnp.where(at_bottom, bot_s.component, top_s.component)
        i_valid = jnp.where(at_bottom, bot_s.valid, top_s.valid)

        f_if = f_transit * i_f
        pdf_if = pdf * i_pdf
        spec_if = specular_path & ((i_comp & B.SPECULAR) != 0)
        transmitted = at_interface & i_valid & ((i_comp & B.TRANSMISSION) != 0)

        # record escapes
        same_dir = wo_f.z * i_wi.z > 0.0
        comp_escape = jnp.where(
            same_dir,
            jnp.where(spec_if, B.SPECULAR_REFLECTION, B.NONSPECULAR_REFLECTION),
            jnp.where(spec_if, B.SPECULAR_TRANSMISSION, B.NONSPECULAR_TRANSMISSION),
        ).astype(jnp.int32)
        escape = transmitted & ~done
        out_wi = V3.where(escape, V3.where(flip, -i_wi, i_wi), out_wi)
        out_f = V3.where(escape, f_if, out_f)
        out_pdf = jnp.where(escape, pdf_if, out_pdf)
        out_comp = jnp.where(escape, comp_escape, out_comp)
        done = done | escape

        # update walk state
        interface_dead = at_interface & ~i_valid
        walking = walking & ~escape & ~interface_dead
        new_w = V3.where(scatter, ph_wi, i_wi)
        new_f = V3.where(scatter, f_sc, f_if * jnp.abs(i_wi.z))
        new_pdf = jnp.where(scatter, pdf_sc, pdf_if)
        new_spec = jnp.where(scatter, jnp.zeros_like(spec_if), spec_if)
        new_z = jnp.where(scatter, zp, z_transit)
        w = V3.where(walking, new_w, w)
        f = V3.where(walking, new_f, f)
        pdf = jnp.where(walking, new_pdf, pdf)
        specular_path = jnp.where(walking, new_spec, specular_path)
        z = jnp.where(walking, new_z, z)
        return (
            w, z, f, pdf, specular_path, walking, done,
            out_wi, out_f, out_pdf, out_comp,
        )

    carry = (
        w, z, f, pdf, specular_path, walking, done,
        out_wi, out_f, out_pdf, out_comp,
    )
    carry = jax.lax.fori_loop(0, MAX_DEPTH, body, carry)
    (_, _, _, _, _, _, done, out_wi, out_f, out_pdf, out_comp) = carry

    # combine: coat reflection takes priority; else walk escape; else null
    return B.BsdfSample(
        wi=V3.where(enter_reflect, refl_sample.wi, out_wi),
        f=V3.where(enter_reflect, refl_sample.f, out_f),
        pdf=jnp.where(enter_reflect, refl_sample.pdf, out_pdf),
        component=jnp.where(enter_reflect, refl_sample.component, out_comp),
        valid=jnp.where(enter_reflect, refl_sample.valid, done),
    )
