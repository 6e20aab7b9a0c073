"""bvh8t kernel benchmark on the real TPU (round-2 transposed walk).

Times intersect_tris_pallas with TPU_RT_PALLAS_KERNEL=bvh8t on the
cbbunny workloads for each ray-row width R in TPU_RT_T8_RS (comma list),
against the committed quadrow numbers (docs/PERF_LOG.md).

Usage:  TPU_RT_T8_RS=8,4 python scripts/bench_t8.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["TPU_RT_PALLAS_KERNEL"] = "bvh8t"

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from bench_traversal import build_workloads, log, N  # noqa: E402


def main():
    rs = [int(x) for x in os.environ.get("TPU_RT_T8_RS", "8,4").split(",")]
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    ds, work = build_workloads()
    log(
        f"bunny: {ds.meta.n_tris} tris, t8 nodes "
        f"{ds.t8_nodes.size * 4 / 1e6:.2f} MB, tris "
        f"{ds.t8_tris.size * 4 / 1e6:.2f} MB, meta {ds.t8_meta.shape} "
        f"stack {ds.meta.t8_stack}"
    )

    from tpu_raytracing.ops.traverse_pallas import intersect_tris_pallas

    tmin = jnp.full(N, 1e-3, jnp.float32)
    tmax = jnp.full(N, np.inf, jnp.float32)
    act = jnp.ones(N, bool)

    for r in rs:
        os.environ["TPU_RT_T8_R"] = str(r)
        for name, (o, d, early) in work.items():
            o, d = jnp.asarray(o), jnp.asarray(d)
            for attempt in range(2):
                try:
                    t0 = time.perf_counter()
                    t, best = intersect_tris_pallas(
                        ds, o, d, tmin, tmax, act, early_exit=early)
                    jax.block_until_ready((t, best))
                    compile_s = time.perf_counter() - t0
                    times = []
                    for _ in range(5):
                        t0 = time.perf_counter()
                        t, best = intersect_tris_pallas(
                            ds, o, d, tmin, tmax, act, early_exit=early)
                        jax.block_until_ready((t, best))
                        times.append(time.perf_counter() - t0)
                    dt = min(times)
                    _, _, visits = intersect_tris_pallas(
                        ds, o, d, tmin, tmax, act, early_exit=early,
                        with_visits=True)
                    packed = np.asarray(visits)
                    nodev = packed & 0xFFFF
                    leafv = packed >> 16
                    tot = nodev.sum() + leafv.sum()
                    log(
                        f"R={r:2d} {name:9s}: {N / dt / 1e6:8.2f} Mrays/s "
                        f"({dt * 1e3:7.2f} ms, compile {compile_s:.1f}s) "
                        f"node visits total={nodev.sum()} "
                        f"leaf iters total={leafv.sum()} "
                        f"ns/iter={dt * 1e9 / max(1, tot):.0f}"
                    )
                    break
                except Exception as e:
                    log(f"R={r} {name}: attempt {attempt} failed: {e!r}")
                    if attempt:
                        raise


if __name__ == "__main__":
    main()
