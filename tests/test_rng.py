import jax.numpy as jnp
import numpy as np

from tpu_raytracing.ops import rng
from tpu_raytracing.sampling import Independent, Stratified


def _cfg(kind="independent", **kw):
    if kind == "independent":
        return rng.SamplerConfig.from_settings(Independent(), kw.get("seed"))
    return rng.SamplerConfig.from_settings(
        Stratified(
            jitter=kw.get("jitter", True),
            x_strata=kw.get("x", 4),
            y_strata=kw.get("y", 4),
        ),
        kw.get("seed"),
    )


def test_determinism_and_stream_independence():
    cfg = _cfg()
    s = rng.make_stream(jnp.arange(64), jnp.zeros(64), 3)
    u1, s1 = rng.sample_uniform(cfg, s)
    u2, _ = rng.sample_uniform(cfg, s)
    assert np.array_equal(np.asarray(u1), np.asarray(u2))
    # next dimension differs
    u3, _ = rng.sample_uniform(cfg, s1)
    assert not np.array_equal(np.asarray(u1), np.asarray(u3))
    # different pixels differ
    assert len(np.unique(np.asarray(u1))) > 60


def test_uniform_range_and_mean():
    cfg = _cfg()
    s = rng.make_stream(
        jnp.arange(10000) % 100, jnp.arange(10000) // 100, 0
    )
    u, _ = rng.sample_uniform(cfg, s)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_kensler_permute_is_permutation():
    for length in [1, 2, 3, 5, 16, 17, 36, 97]:
        idx = jnp.arange(length)
        out = np.asarray(rng.kensler_permute(idx, length, jnp.uint32(0x12345678)))
        assert sorted(out.tolist()) == list(range(length)), length


def test_stratified_1d_covers_strata():
    cfg = _cfg("stratified", x=4, y=4, jitter=False)
    # all 16 samples of one pixel must land in 16 distinct strata
    s = rng.make_stream(
        jnp.zeros(16, jnp.uint32), jnp.zeros(16, jnp.uint32), jnp.arange(16)
    )
    s = rng.SampleStream(s.px, s.py, jnp.arange(16, dtype=jnp.uint32), s.dim)
    u, _ = rng.sample_uniform(cfg, s)
    strata = np.floor(np.asarray(u) * 16).astype(int)
    assert sorted(strata.tolist()) == list(range(16))


def test_stratified_2d_covers_grid():
    cfg = _cfg("stratified", x=4, y=4, jitter=True)
    s = rng.SampleStream(
        jnp.full(16, 7, jnp.uint32),
        jnp.full(16, 9, jnp.uint32),
        jnp.arange(16, dtype=jnp.uint32),
        jnp.full(16, 2, jnp.uint32),
    )
    u2, _ = rng.sample_uniform2(cfg, s)
    u2 = np.asarray(u2)
    cells = set(
        (int(x * 4), int(y * 4)) for x, y in zip(u2[:, 0], u2[:, 1])
    )
    assert len(cells) == 16


def test_disk_and_hemisphere():
    cfg = _cfg()
    s = rng.make_stream(jnp.arange(4096), jnp.zeros(4096), 0)
    u, s = rng.sample_uniform2(cfg, s)
    d = np.asarray(rng.sample_unit_disk_concentric(u))
    assert (np.linalg.norm(d, axis=-1) <= 1.0 + 1e-6).all()
    # concentric mapping is area-preserving: mean radius^2 = 1/2
    assert abs((d ** 2).sum(-1).mean() - 0.5) < 0.02
    h = np.asarray(rng.sample_cosine_hemisphere(u))
    assert (h[:, 2] >= 0).all()
    assert np.allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-4)
    # cosine-weighted: E[cos theta] = 2/3
    assert abs(h[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_seed_changes_everything():
    c1 = _cfg(seed=1)
    c2 = _cfg(seed=2)
    s = rng.make_stream(jnp.arange(128), jnp.zeros(128), 0)
    u1, _ = rng.sample_uniform(c1, s)
    u2, _ = rng.sample_uniform(c2, s)
    assert not np.array_equal(np.asarray(u1), np.asarray(u2))
