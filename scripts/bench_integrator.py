"""Integrator-side microbenchmarks on the real TPU (round 2).

Measures, at render batch size B=65536 on cbbunny-like data:
  1. layered_eval / layered_sample / bsdf_eval cost per call
  2. argsort + k gathers (the price of material-partitioned shading)
  3. sub-chunk lax.cond skipping: layered eval over (S, B/S) with a
     per-sub-chunk `any(coated)` cond vs unconditional

Usage: python scripts/bench_integrator.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

B = 1 << 16


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.device.scene_buffers import (
        MAT_COATED_DIFFUSE, MAT_DIFFUSE,
    )
    from tpu_raytracing.ops.bsdf import BsdfParams, get_bsdf_params
    from tpu_raytracing.ops.bsdf_dispatch import bsdf_eval, bsdf_sample
    from tpu_raytracing.ops.layered import layered_eval
    from tpu_raytracing.ops.rng import SamplerConfig, make_stream
    from tpu_raytracing.ops.textures import EvalCtx
    from tpu_raytracing.scene.test_scenes import get_test_scene

    log(f"backend={jax.default_backend()}")
    ts_ = get_test_scene("coated_diffuse_bunny")
    ds = compile_scene(ts_.scene_func())
    kinds = ds.meta.mat_kinds_present
    log(f"kinds present: {kinds}")

    rng = np.random.default_rng(0)

    def unit(n):
        v = rng.normal(size=(n, 3)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    wo = jnp.asarray(np.abs(unit(B)))
    wi = jnp.asarray(np.abs(unit(B)))
    # ~25% coated lanes, sorted and unsorted variants
    frac = 0.25
    kind_np = np.where(rng.random(B) < frac, MAT_COATED_DIFFUSE, MAT_DIFFUSE)
    mat_ids = jnp.asarray(
        np.where(kind_np == MAT_COATED_DIFFUSE, 1, 0).astype(np.int32))
    # bunny scene: material 0 = walls diffuse? just map via ds tables:
    # pick two real material ids present
    mk = np.asarray(ds.mat_kind)
    coated_id = int(np.nonzero(mk == MAT_COATED_DIFFUSE)[0][0])
    diff_id = int(np.nonzero(mk == MAT_DIFFUSE)[0][0])
    mat_ids = jnp.asarray(np.where(kind_np == MAT_COATED_DIFFUSE,
                                   coated_id, diff_id).astype(np.int32))
    ctx = EvalCtx.without_antialiasing(jnp.zeros((B, 2), jnp.float32))

    @jax.jit
    def params_of(ids):
        return get_bsdf_params(ds, ids, ctx)

    params = jax.block_until_ready(params_of(mat_ids))

    @jax.jit
    def f_eval(p, wo, wi):
        return bsdf_eval(p, wo, wi, kinds)

    @jax.jit
    def f_layered(p, wo, wi):
        return layered_eval(p, wo, wi)

    dt = timeit(f_eval, params, wo, wi)
    log(f"bsdf_eval (mixed kinds, B=65536): {dt*1e3:.2f} ms")
    dt = timeit(f_layered, params, wo, wi)
    log(f"layered_eval alone:               {dt*1e3:.2f} ms")

    # ---- 2. sort + gather price
    key = params.kind
    arrs = [wo, wi] + [jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
                       for _ in range(8)]

    @jax.jit
    def sort_gather(key, *arrs):
        order = jnp.argsort(key)
        return [a[order] for a in arrs]

    dt = timeit(sort_gather, key, *arrs)
    log(f"argsort + 10x (B,3) gathers:      {dt*1e3:.2f} ms")

    # ---- 3. sub-chunk cond skipping
    for S in (8, 16, 32):
        sub = B // S

        @partial(jax.jit, static_argnums=())
        def cond_eval(p, wo, wi):
            kindr = p.kind.reshape(S, sub)

            def body(carry, xs):
                k, wo_s, wi_s, pr = xs
                has = jnp.any(k == MAT_COATED_DIFFUSE)
                out = jax.lax.cond(
                    has,
                    lambda: layered_eval(pr, wo_s, wi_s),
                    lambda: jnp.zeros_like(wo_s),
                )
                return carry, out

            pr = jax.tree.map(
                lambda a: a.reshape(S, sub, *a.shape[1:]), p)
            _, out = jax.lax.scan(
                body, 0,
                (kindr, wo.reshape(S, sub, 3), wi.reshape(S, sub, 3), pr))
            return out

        # sorted keys -> most sub-chunks homogeneous
        order = jnp.argsort(key)
        p_sorted = jax.tree.map(lambda a: a[order], params)
        wo_s, wi_s = wo[order], wi[order]
        dt_u = timeit(cond_eval, params, wo, wi)
        dt_s = timeit(cond_eval, p_sorted, wo_s, wi_s)
        log(f"scan-cond layered S={S:3d}: unsorted {dt_u*1e3:.2f} ms, "
            f"sorted {dt_s*1e3:.2f} ms")


if __name__ == "__main__":
    main()
