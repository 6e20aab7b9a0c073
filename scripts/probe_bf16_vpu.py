"""Does bf16 elementwise vector work run ~2x f32 on this TPU's VPU?

Gates the bf16-conservative-slab kernel idea (docs/PERF_LOG.md round 3):
if a bf16 slab body is not materially faster than f32, the dual-format
node layout isn't worth building. Times a Pallas kernel that runs ITERS
iterations of a synthetic 3-axis slab test (2 sub, 2 mul, 4 min/max per
axis) on (16, 128) blocks in each dtype.

Usage: python scripts/probe_bf16_vpu.py
"""
from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 20000
SHAPE = (16, 128)


def make(dtype):
    def kernel(box_ref, ray_ref, out_ref):
        box = box_ref[:]
        o = ray_ref[:]

        def body(i, carry):
            t0, t1, box = carry
            # data-dependence across iterations so nothing folds away
            box = box + t0 * jnp.asarray(1e-7, dtype)
            for ax in range(3):
                a = (box - o) * jnp.asarray(0.5, dtype)
                b = (box + o) * jnp.asarray(0.5, dtype)
                t0 = jnp.maximum(t0, jnp.minimum(a, b))
                t1 = jnp.minimum(t1, jnp.maximum(a, b))
            return t0 * jnp.asarray(0.999, dtype), t1, box

        t0 = jnp.full(SHAPE, -1e3, dtype)
        t1 = jnp.full(SHAPE, 1e3, dtype)
        t0, t1, _ = jax.lax.fori_loop(0, ITERS, body, (t0, t1, box))
        out_ref[:] = (t0 + t1).astype(jnp.float32)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[full, full],
        out_specs=full,
    )


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        box = jnp.asarray(rng.standard_normal(SHAPE), dtype)
        ray = jnp.asarray(rng.standard_normal(SHAPE), dtype)
        f = jax.jit(make(dtype))
        f(box, ray).block_until_ready()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            f(box, ray).block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        # 14 arithmetic ops/iteration on a (16,128) block
        ns_per_op = best / ITERS / 14 * 1e9
        print(f"{jnp.dtype(dtype).name:>9}: {best * 1e3:8.3f} ms "
              f"({ns_per_op:.2f} ns per (16,128) op)", flush=True)


if __name__ == "__main__":
    main()
