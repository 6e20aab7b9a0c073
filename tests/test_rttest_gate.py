"""rttest statistical-gate behavior (advisor r2 medium finding).

The cross-backend beauty gate must not pass spatially-wrong but
energy-preserving images: the 8x8 block-mean statistic (diff.block_rel)
catches structural misplacement the global tonemapped mean cannot see.
"""
from __future__ import annotations

import numpy as np

from visual_testing.rttest.diff import DiffResult, _block_rel


def _tm(v):
    return v / (1.0 + v)


def _structured(h=600, w=800):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([x / w, y / h, (x + y) / (w + h)], -1) * 2.0 + 0.05


def test_identical_images_zero_block_rel():
    ref = _tm(_structured())
    assert _block_rel(ref, ref, float(ref.mean())) == 0.0


def test_quadrant_swap_fails_block_gate():
    ref = _structured()
    out = ref.copy()
    out[:300, :400], out[300:, 400:] = (
        ref[300:, 400:].copy(), ref[:300, :400].copy(),
    )
    ta, tb = _tm(out), _tm(ref)
    rel_mean = abs(ta.mean() - tb.mean()) / tb.mean()
    block_rel = _block_rel(ta, tb, float(tb.mean()))
    assert rel_mean < 1e-9          # global mean is blind to the swap
    assert block_rel > 0.1          # spatial statistic is not

    d = DiffResult(
        mse=1.0, max_diff=1.0, channel_group="RGB",
        rel_mean=rel_mean, block_rel=block_rel,
    )
    assert not d.stat_passes(0.02)
    # an unbiased-noise-level image at the same tolerances passes
    ok = DiffResult(
        mse=1.0, max_diff=1.0, channel_group="RGB",
        rel_mean=0.01, block_rel=0.04,
    )
    assert ok.stat_passes(0.02)


def test_per_scene_block_override():
    d = DiffResult(
        mse=0.0, max_diff=0.0, channel_group="RGB",
        rel_mean=0.05, block_rel=0.2,
    )
    assert d.stat_passes(0.10)              # default 3x factor: 0.2 <= 0.3
    assert not d.stat_passes(0.10, 0.15)    # explicit tighter block bound
    assert not d.stat_passes(0.02)          # mean bound still binds
