"""Permutation-transport microbenchmark on the real TPU.

The per-call coherence sort moves ray state across a lane permutation.
Candidates at B=131072:
  1. argsort key -> one wide (B, 10) gather        (current)
  2. lax.sort_key_val(key, iota) x2 + (B,10) gather (current exact shape)
  3. variadic lax.sort with the 10 columns as payload operands
  4. narrow gathers x10 (the round-1 shape, for reference)

Usage: python scripts/bench_perm.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

B = 1 << 17


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 24, B).astype(np.int32))
    cols = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    ncols = [jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
             for _ in range(10)]
    iota = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def wide_gather(key, cols):
        order = jnp.argsort(key)
        return cols[order]

    @jax.jit
    def two_sorts_gather(key, cols):
        _, order = jax.lax.sort_key_val(key, iota, is_stable=True)
        _, inv = jax.lax.sort_key_val(order, iota, is_stable=True)
        return cols[order], inv

    @jax.jit
    def variadic_sort(key, *cs):
        out = jax.lax.sort((key, *cs), num_keys=1, is_stable=True)
        return out[1:]

    @jax.jit
    def narrow_gathers(key, *cs):
        order = jnp.argsort(key)
        return [c[order] for c in cs]

    log(f"argsort + (B,10) gather:      {timeit(wide_gather, key, cols)*1e3:7.3f} ms")
    log(f"2 stable sorts + wide gather: {timeit(two_sorts_gather, key, cols)*1e3:7.3f} ms")
    log(f"variadic sort, 10 payloads:   {timeit(variadic_sort, key, *ncols)*1e3:7.3f} ms")
    log(f"argsort + 10 narrow gathers:  {timeit(narrow_gathers, key, *ncols)*1e3:7.3f} ms")

    # how much of it is the sort itself?
    @jax.jit
    def just_sort(key):
        return jax.lax.sort_key_val(key, iota, is_stable=True)

    log(f"one stable sort_key_val:      {timeit(just_sort, key)*1e3:7.3f} ms")

    @jax.jit
    def just_gather(order, cols):
        return cols[order]

    order = jnp.argsort(key)
    log(f"one (B,10) gather:            {timeit(just_gather, order, cols)*1e3:7.3f} ms")
    colsw = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    log(f"one (B,2) gather:             {timeit(just_gather, order, colsw)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
