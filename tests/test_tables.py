"""select_rows (ops/tables.py) must reproduce the XLA row gather
bit-exactly for every dtype/shape it is used on, including out-of-range
indices (gather clamps; the select-chain must match)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpu_raytracing.ops.tables import select_rows  # noqa: E402


@pytest.mark.parametrize(
    "shape,dtype",
    [((7, 80), np.float32), ((7, 8), np.int32), ((2, 25), np.float32),
     ((1, 3), np.float32), ((16,), np.int32)],
)
def test_select_rows_matches_gather(monkeypatch, shape, dtype):
    monkeypatch.setenv("TPU_RT_SELECT_ROWS", "16")
    rng = np.random.RandomState(0)
    if np.issubdtype(dtype, np.floating):
        table = jnp.asarray(rng.randn(*shape).astype(dtype))
    else:
        table = jnp.asarray(rng.randint(-5, 100, size=shape).astype(dtype))
    # include out-of-range indices: XLA gather clamps, select must match
    idx = jnp.asarray(
        rng.randint(-2, shape[0] + 2, size=257).astype(np.int32))
    got = np.asarray(jax.jit(select_rows)(table, idx))
    want = np.asarray(table[jnp.clip(idx, 0, shape[0] - 1)])
    np.testing.assert_array_equal(got, want)


def test_select_rows_falls_back_to_gather(monkeypatch):
    monkeypatch.setenv("TPU_RT_SELECT_ROWS", "4")
    table = jnp.arange(40, dtype=jnp.float32).reshape(8, 5)
    idx = jnp.asarray([0, 7, 3], jnp.int32)
    got = np.asarray(select_rows(table, idx))
    np.testing.assert_array_equal(got, np.asarray(table)[[0, 7, 3]])
