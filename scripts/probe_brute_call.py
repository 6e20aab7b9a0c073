"""Time the REAL _t8_brute_tiles kernel call (cb_texture-shaped) and
bisect why it runs ~13x slower per iteration than the isolated probe
body (probe_iter_cost.py: 347 ns/iter; in-render estimate: ~4.5 us).

Pipelines K dispatches and fetches only the last result so the ~27 ms
tunnel RTT amortizes away.

Usage: python scripts/probe_brute_call.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_raytracing.ops.traverse_pallas import _t8_brute_tiles, LANE

R = 4
G = 256            # tiles
NG = 96            # groups (cb_texture shape)
LG = 16
K = 20             # pipelined dispatches


def run(label, tris, cols):
    key = (False, R, LG, NG)
    out = _t8_brute_tiles(key, tris, cols)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(K):
        out = _t8_brute_tiles(key, tris, cols)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / K
    print(f"{label:<28} {dt * 1e3:8.2f} ms/call "
          f"({dt / (G * NG) * 1e9:6.0f} ns/iter)", flush=True)


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    rows = G * R
    tris = jnp.asarray(rng.standard_normal((8 * LG, LANE)), jnp.float32)
    base = [jnp.asarray(rng.standard_normal((rows, LANE)), jnp.float32)
            for _ in range(6)]
    tmn = jnp.full((rows, LANE), 1e-3, jnp.float32)
    tinf = jnp.full((rows, LANE), np.inf, jnp.float32)
    ones = jnp.ones((rows, LANE), jnp.int32)
    run("synthetic", tris, (*base, tmn, tinf, ones))

    # real cb_texture tri blocks + rays inside the box
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.scene.loaders import scene_from_file
    ds = compile_scene(scene_from_file("/root/reference/scenes/cb_texture.glb"))
    rtris = jnp.asarray(ds.t8_tris)
    o = rng.uniform(-0.9, 0.9, (rows, LANE, 3)).astype(np.float32)
    d = rng.normal(size=(rows, LANE, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=2, keepdims=True)
    rcols = [jnp.asarray(o[..., k]) for k in range(3)] +             [jnp.asarray(d[..., k]) for k in range(3)]
    run("real tris + box rays", rtris, (*rcols, tmn, tinf, ones))

    # 60% dead lanes with t_max=-1 fill (in-render padding semantics)
    dead = jnp.asarray(rng.uniform(size=(rows, LANE)) < 0.6)
    act2 = jnp.where(dead, 0, 1).astype(jnp.int32)
    tmx2 = jnp.where(dead, -1.0, jnp.inf).astype(jnp.float32)
    run("real + 60pct dead", rtris, (*rcols, tmn, tmx2, act2))


if __name__ == "__main__":
    main()
