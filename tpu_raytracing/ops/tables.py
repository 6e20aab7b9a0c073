"""Tiny-table row fetch: broadcast select-chain instead of a row gather.

Per-lane row gathers on TPU issue one DMA descriptor per ROW; the HEAD
cbbunny profile (docs/PERF_LOG.md round 3) measured the (7,80) material
row gather at ~28 GB/s — 1.5 ms per bounce for 42 MB of output. For a
table with a handful of static rows, a where-chain over broadcast rows
fuses into one elementwise loop and runs at vector-store bandwidth.

Bit-exact by construction: every output row is the original row's bits
moved by selects (no arithmetic), and the index is clamped exactly like
XLA's gather semantics. Works for any dtype and trailing shape.

Counterpart of the reference's SBT-style direct struct indexing
(kernels/pathtracer.cu material/light lookups), which is free on a
scalar machine and a DMA bottleneck on a vector one.

Default ON for TPU only: restructuring the fused shading loops can make
XLA:CPU's FMA contraction chunk-shape-dependent at the last ULP (see
the quad-atlas entry in docs/PERF_LOG.md), and the CPU backend keeps a
strict bit-exact chunk-invariance contract. TPU_RT_SELECT_ROWS forces:
0 disables, N>0 sets the row-count cutoff on any backend.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DEFAULT_LIMIT = 16


def _limit() -> int:
    env = os.environ.get("TPU_RT_SELECT_ROWS")
    if env is not None:
        return int(env)
    try:
        return _DEFAULT_LIMIT if jax.default_backend() == "tpu" else 0
    except Exception:
        return 0


def select_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] (idx: (B,) int) — as a select-chain when the table is
    statically tiny, else the plain gather."""
    n = int(table.shape[0])
    if n == 0 or n > _limit():
        return table[idx]
    idx = jnp.clip(idx, 0, n - 1)  # match XLA gather clamping bit-exactly
    mask_shape = (idx.shape[0],) + (1,) * (table.ndim - 1)
    out = jnp.broadcast_to(table[0], (idx.shape[0],) + tuple(table.shape[1:]))
    for k in range(1, n):
        out = jnp.where((idx == k).reshape(mask_shape), table[k], out)
    return out
