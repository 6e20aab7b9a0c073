"""Per-bounce intermediate dump for the metal-highlight divergence.

Runs an UNROLLED copy of the integrator bounce loop (same ops as
trace_radiance, python-level depth loop, jitted once) on the current
backend for the 256-pixel highlight block, and saves every bounce's
intermediates to .tpu_logs/specular/dump_<backend>.npz.

    SPECULAR_BACKEND=cpu python scripts/specular_trace_dump.py
    python scripts/specular_trace_dump.py          # TPU
    python scripts/specular_trace_dump.py compare
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

OUT = REPO / ".tpu_logs" / "specular"
DEPTHS = 4


def run():
    import jax

    if os.environ.get("SPECULAR_BACKEND") == "cpu":
        os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("TPU_RT_PALLAS", "0")   # XLA walk reproduces
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import StaticSettings
    from tpu_raytracing.integrator.render import (
        _to_local, _to_world,
    )
    from tpu_raytracing.ops.bsdf import get_bsdf_params, is_delta_bsdf
    from tpu_raytracing.ops import bsdf as B
    from tpu_raytracing.ops.bsdf_dispatch import bsdf_eval, bsdf_sample
    from tpu_raytracing.ops.camera_rays import generate_rays
    from tpu_raytracing.ops.light_sampling import sample_light
    from tpu_raytracing.ops.linalg import make_orthonormal_basis
    from tpu_raytracing.ops.rng import SamplerConfig, make_stream
    from tpu_raytracing.ops.textures import EvalCtx
    from tpu_raytracing.ops.traverse import hit_details, intersect_scene, occluded
    from tpu_raytracing.scene.test_scenes import get_test_scene

    ts = get_test_scene("metal")
    scene, settings = ts.scene_func(), ts.settings_func()
    settings.samples_per_pixel = 3
    settings.light_sample_count = 1
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)

    xs, ys = np.meshgrid(np.arange(235, 251), np.arange(160, 176))
    px = jnp.asarray(xs.reshape(-1).astype(np.uint32))
    py = jnp.asarray(ys.reshape(-1).astype(np.uint32))
    B_ = px.shape[0]

    import jax

    kinds = ds.meta.mat_kinds_present

    @jax.jit
    def init(px, py):
        stream = make_stream(px, py, 0)
        ray_o, ray_d, diff, stream = generate_rays(
            ds, px, py, cfg, stream, st.samples_per_pixel, jitter=True
        )
        return dict(
            ray_o=ray_o, ray_d=ray_d, stream=stream,
            alive=jnp.ones(B_, bool),
            pw=jnp.ones((B_, 3), jnp.float32),
            radiance=jnp.zeros((B_, 3), jnp.float32),
        )

    @jax.jit
    def step(s, t_min, t_max):
        ray_o, ray_d = s["ray_o"], s["ray_d"]
        alive, pw, radiance = s["alive"], s["pw"], s["radiance"]
        stream = s["stream"]
        f32 = ray_o.dtype
        t, prim = intersect_scene(ds, ray_o, ray_d, t_min, t_max,
                                  active=alive)
        alive = alive & (prim >= 0)
        hit = hit_details(ds, ray_o, ray_d, t, prim)
        dump = {}
        dump["t"] = t
        dump["prim"] = prim
        dump["hp"] = hit.point
        dump["n"] = hit.normal
        ctx = EvalCtx.without_antialiasing(hit.uv)
        params = get_bsdf_params(ds, hit.material, ctx)
        bx, by = make_orthonormal_basis(hit.normal)
        wo = _to_local(bx, by, hit.normal, -ray_d)
        dump["woz"] = wo[..., 2]
        delta = is_delta_bsdf(params)
        nee_mask = alive & ~delta
        ls, stream = sample_light(ds, 0, hit.point, cfg, stream)
        occ = occluded(ds, ls.origin, ls.direction,
                       jnp.full(B_, 1.0e-3, f32),
                       ls.distance - 1.0e-3, active=nee_mask)
        wi = _to_local(bx, by, hit.normal, -ls.direction)
        good = nee_mask & ~occ & (ls.pdf > 0.0)
        f = bsdf_eval(params, wo, wi, kinds, active=good)
        cos_theta = jnp.maximum(wi[..., 2], 0.0)
        safe_pdf = jnp.where(ls.pdf == 0.0, 1.0, ls.pdf)
        c = f * ls.radiance * (cos_theta / safe_pdf)[:, None]
        direct = jnp.where(good[:, None], c, 0.0)
        radiance = radiance + pw * direct
        dump["occ"] = occ
        dump["nee"] = nee_mask
        dump["direct"] = direct
        samp, stream = bsdf_sample(
            params, wo, jnp.full(B_, B.ALL_COMPONENTS, jnp.int32),
            cfg, stream, kinds, active=alive,
        )
        ok = samp.valid & (samp.pdf > 0.0) & jnp.any(samp.f != 0.0, -1)
        dump["sok"] = ok
        dump["swi"] = samp.wi
        dump["sf"] = samp.f
        alive = alive & ok
        cos_theta = jnp.abs(samp.wi[..., 2])
        safe_pdf = jnp.where(samp.pdf == 0.0, 1.0, samp.pdf)
        pw = jnp.where(alive[:, None],
                       pw * samp.f * (cos_theta / safe_pdf)[:, None], pw)
        new_d = _to_world(bx, by, hit.normal, samp.wi)
        ray_o = jnp.where(alive[:, None], hit.point, ray_o)
        ray_d = jnp.where(alive[:, None], new_d, ray_d)
        dump["alive"] = alive
        dump["rayo"] = ray_o
        dump["rayd"] = ray_d
        s2 = dict(ray_o=ray_o, ray_d=ray_d, stream=stream, alive=alive,
                  pw=pw, radiance=radiance)
        return s2, dump

    s = init(px, py)
    f32 = np.float32
    dump = {}
    for depth0 in range(DEPTHS):
        primary = depth0 == 0
        t_min = jnp.full(B_, ds.meta.near_clip if primary else 1.0e-4, f32)
        t_max = jnp.full(B_, ds.meta.far_clip if primary else np.inf, f32)
        s, d = step(s, t_min, t_max)
        for k, v in d.items():
            dump[f"d{depth0}_{k}"] = np.asarray(v)
    dump["radiance"] = np.asarray(s["radiance"])
    backend = jax.default_backend()
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / f"dump_{backend}.npz", **dump)
    print(f"{backend}: radiance[center lane] =",
          dump["radiance"][14 * 16 + 14])
    print(f"wrote dump_{backend}.npz ({len(dump)} arrays)")


def compare():
    c = np.load(OUT / "dump_cpu.npz")
    t = np.load(OUT / "dump_tpu.npz")
    for k in c.files:
        a, b = c[k], t[k]
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            n = (a != b).sum()
            if n:
                print(f"{k:<14} {n} lanes differ "
                      f"(first: {np.argwhere(a != b)[0]})")
        else:
            d = np.abs(a.astype(np.float64) - b.astype(np.float64))
            rel = d / np.maximum(np.abs(a), 1e-12)
            if rel.max() > 1e-6:
                i = np.unravel_index(rel.argmax(), rel.shape)
                print(f"{k:<14} max rel {rel.max():.3e} at {i} "
                      f"cpu={a[i]} tpu={b[i]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare()
    else:
        run()
