"""Per-step wall scaling of the sharded accumulator step (VERDICT r4 #8).

Round 3's MULTICHIP_r3.md proved the collective STRUCTURE (exactly the
trailing psum pair, nothing in the bounce loop); this adds the missing
TIMING trace: the same `make_sharded_accum_step` executed at mesh sizes
1 / 2 / 4 / 8 virtual CPU devices with the TOTAL batch held fixed, so
the per-device shard shrinks as the mesh grows.

Mesh shape is (tiles=N, spp=1) — the north-star composition's bit-exact
configuration (a 1-wide spp axis keeps the per-pixel fori summation
order identical to the single-device path, parallel/mesh.py:176-183).
An extra 8-device (4x2) row shows the spp-axis psum variant.

Interpretation caveat (stated in the output doc): the host has ONE
physical core, so the 8 "devices" time-slice it — ideal scaling here is
a FLAT wall (same total work + collective overhead), not 1/N. What the
trace demonstrates is that the psum pair's overhead does not grow with
the mesh and nothing in the step serializes on mesh size. On real
ICI-connected chips the same executable structure gives the 1/N wall
(SURVEY S2.7; the reference scales via its tile work queue,
crates/raytracing-cpu/src/lib.rs render_parallel).

Usage: python scripts/multichip_scaling.py   (CPU-only, ~minutes)
Writes docs/MULTICHIP_r5.md.
"""
from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_MAX = 8

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_MAX}"
).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter|collective-broadcast)\b"
)

# total batch fixed across mesh sizes: 512 pixel lanes x 8 accumulated spp
N_PIXELS = 512
N_SAMPLES = 8
REPS = 5


def _time_step(step, mesh, px_h, py_h):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_raytracing.parallel.mesh import TILE_AXIS

    sh = NamedSharding(mesh, P(TILE_AXIS))
    px = jax.device_put(jnp.asarray(px_h), sh)
    py = jax.device_put(jnp.asarray(py_h), sh)
    act = jax.device_put(jnp.ones(N_PIXELS, bool), sh)
    s0 = jnp.uint32(0)  # replicated scalar sample-start (in_specs P())

    t0 = time.perf_counter()
    lowered = step.jitted.lower(step.ds_repl, s0, px, py, act)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    hlo = compiled.as_text()
    census = Counter(m.group(1) for m in COLLECTIVE_RE.finditer(hlo))

    walls = []
    acc = None
    for _ in range(REPS + 1):  # first rep warms any remaining dispatch path
        t0 = time.perf_counter()
        acc, rays = step(s0, px, py, act)
        np.asarray(acc)
        walls.append(time.perf_counter() - t0)
    return np.asarray(acc), walls[1:], compile_s, dict(census)


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import StaticSettings
    from tpu_raytracing.ops.rng import SamplerConfig
    from tpu_raytracing.parallel.mesh import (
        make_render_mesh, make_sharded_accum_step,
    )
    from tpu_raytracing.scene.test_scenes import get_test_scene

    assert len(jax.devices()) >= N_MAX, jax.devices()

    ts = get_test_scene("checkered_plane")
    scene = ts.scene_func()
    settings = ts.settings_func()
    settings.samples_per_pixel = N_SAMPLES
    settings.light_sample_count = 1
    settings.max_ray_depth = 4
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)

    rng = np.random.default_rng(0)
    px_h = rng.integers(0, ds.meta.width, N_PIXELS, dtype=np.uint32)
    py_h = rng.integers(0, ds.meta.height, N_PIXELS, dtype=np.uint32)

    rows = []
    ref_img = None
    configs = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2)]
    for n_tiles, n_spp in configs:
        n_dev = n_tiles * n_spp
        mesh = make_render_mesh(
            n_tiles=n_tiles, n_spp=n_spp, devices=jax.devices()[:n_dev])
        step = make_sharded_accum_step(ds, cfg, st, mesh, N_SAMPLES)
        img, walls, compile_s, census = _time_step(step, mesh, px_h, py_h)
        if ref_img is None:
            ref_img = img
            bitexact = True
        else:
            bitexact = bool(np.array_equal(ref_img, img))
        rows.append((n_dev, n_tiles, n_spp, min(walls),
                     sorted(walls)[len(walls) // 2], compile_s, census,
                     bitexact))
        print(f"{n_tiles}x{n_spp}: min {min(walls)*1e3:.0f} ms, "
              f"census {census}, bitexact {bitexact}", flush=True)

    lines = [
        "# Multi-chip accumulator step: wall scaling trace (round 5)",
        "",
        "`make_sharded_accum_step` (the north-star composition's inner",
        "step: full bounce loop + NEE, accumulated over "
        f"{N_SAMPLES} spp) executed at five mesh shapes with the TOTAL",
        f"batch fixed at {N_PIXELS} lanes (checkered_plane, depth 4).",
        "Regenerate: `python scripts/multichip_scaling.py`.",
        "",
        "## Caveat",
        "",
        "The host has ONE physical core: the virtual devices time-slice",
        "it, so ideal scaling is a FLAT wall (fixed total FLOPs), not",
        "1/N. The trace demonstrates (a) the collective census stays the",
        "trailing all-reduce pair at every mesh size, (b) wall does not",
        "GROW with mesh size — no hidden serialization or resharding",
        "appears as shards shrink 8x, and (c) the accumulated image is",
        "bit-identical across every tiles-only mesh (the north-star",
        "determinism invariant; the 4x2 spp-sharded row changes the",
        "per-pixel summation ORDER, so bit-equality is not claimed",
        "there — parallel/mesh.py:176-183). On ICI-connected real chips",
        "the same executables give ~1/N walls.",
        "",
        "| mesh | min wall | median wall | compile | collectives | bit-exact vs 1-dev |",
        "|---|---|---|---|---|---|",
    ]
    for n_dev, n_tiles, n_spp, lo, med, comp, census, bx in rows:
        cs = ", ".join(f"{k} x{v}" for k, v in sorted(census.items())) or "none"
        note = "yes" if bx else ("n/a (spp order)" if n_spp > 1 else "NO")
        lines.append(
            f"| {n_tiles}x{n_spp} ({n_dev} dev) | {lo*1e3:.0f} ms "
            f"| {med*1e3:.0f} ms | {comp:.1f} s | {cs} | {note} |")
    flat = rows[3][3] / rows[0][3]
    lines += [
        "",
        f"8-dev(8x1) / 1-dev min-wall ratio: {flat:.2f}",
        "(~1.0 = flat = no serialization on this time-sliced host).",
        "",
    ]
    out = REPO / "docs" / "MULTICHIP_r5.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
