import numpy as np

from tpu_raytracing.utils import exr


def _roundtrip(tmp_path, compression):
    h, w = 37, 53
    rng = np.random.default_rng(42)
    channels = {
        "R": rng.standard_normal((h, w)).astype(np.float32),
        "G": rng.standard_normal((h, w)).astype(np.float32),
        "B": rng.standard_normal((h, w)).astype(np.float32),
        "Mip Level": rng.random((h, w)).astype(np.float32),
    }
    path = tmp_path / f"test_{compression}.exr"
    exr.write_exr(path, channels, compression=compression)
    read, width, height = exr.read_exr(path)
    assert (width, height) == (w, h)
    for k, v in channels.items():
        assert np.array_equal(read[k], v), k


def test_roundtrip_none(tmp_path):
    _roundtrip(tmp_path, exr.COMP_NONE)


def test_roundtrip_zip(tmp_path):
    _roundtrip(tmp_path, exr.COMP_ZIP)


def test_roundtrip_zips(tmp_path):
    _roundtrip(tmp_path, exr.COMP_ZIPS)


def test_uint_channel(tmp_path):
    data = {"ID": np.arange(12, dtype=np.uint32).reshape(3, 4)}
    path = tmp_path / "uint.exr"
    exr.write_exr(path, data)
    read, _, _ = exr.read_exr(path)
    assert read["ID"].dtype == np.uint32
    assert np.array_equal(read["ID"], data["ID"])


def test_roundtrip_rle(tmp_path):
    _roundtrip(tmp_path, exr.COMP_RLE)


def test_rle_runs(tmp_path):
    """Data with long byte runs exercises both RLE branch types."""
    h, w = 33, 64
    a = np.zeros((h, w), np.float32)
    a[10:20, 5:40] = 3.5
    a[0] = np.arange(w)
    path = tmp_path / "runs.exr"
    exr.write_exr(path, {"Y": a}, compression=exr.COMP_RLE)
    read, _, _ = exr.read_exr(path)
    assert np.array_equal(read["Y"], a)


def _b44_roundtrip(tmp_path, compression):
    """B44 is lossy (6-bit block deltas): gate on relative error, and
    exactly on flat blocks (where the codec is exact by construction)."""
    h, w = 37, 53  # non-multiple-of-4 edges exercise block padding
    rng = np.random.default_rng(7)
    smooth = np.cumsum(
        rng.standard_normal((h, w)).astype(np.float32), axis=1) * 0.01 + 2.0
    flat = np.full((h, w), 0.25, np.float32)
    neg = -np.abs(smooth)
    channels = {"A": smooth, "B": flat, "C": neg}
    path = tmp_path / f"b44_{compression}.exr"
    exr.write_exr(path, channels, compression=compression, half=True)
    read, width, height = exr.read_exr(path)
    assert (width, height) == (w, h)
    half = {k: v.astype(np.float16).astype(np.float32)
            for k, v in channels.items()}
    assert np.array_equal(read["B"], half["B"])  # flat: exact
    for k in ("A", "C"):
        err = np.abs(read[k] - half[k])
        scale = np.maximum(np.abs(half[k]), 1e-3)
        assert (err / scale).max() < 0.05, k


def test_roundtrip_b44(tmp_path):
    _b44_roundtrip(tmp_path, exr.COMP_B44)


def test_roundtrip_b44a(tmp_path):
    _b44_roundtrip(tmp_path, exr.COMP_B44A)


def test_b44_mixed_float_channel(tmp_path):
    """FLOAT channels ride raw inside B44 blocks and stay lossless."""
    h, w = 9, 17
    rng = np.random.default_rng(3)
    fl = rng.standard_normal((h, w)).astype(np.float32)
    ids = np.arange(h * w, dtype=np.uint32).reshape(h, w)
    path = tmp_path / "mixed.exr"
    # half=False: no HALF channels -> writer stores raw scanlines
    exr.write_exr(path, {"F": fl, "ID": ids}, compression=exr.COMP_B44)
    read, _, _ = exr.read_exr(path)
    assert np.array_equal(read["F"], fl)
    assert np.array_equal(read["ID"], ids)


def test_b44_block_codec_exact_inverse():
    """pack14 -> unpack14 reconstructs within 2^shift of each value and
    bit-exactly when deltas fit unshifted."""
    rng = np.random.default_rng(11)
    # small deltas around a base: encodable at shift 0 -> bit-exact
    base = np.float16(1.0).view(np.uint16).astype(np.int32)
    vals = (base + rng.integers(-15, 16, (5, 16))).astype(np.uint16)
    t = exr._b44_transform(vals)
    packed = exr._b44_pack_blocks(t, flat_3byte=False)
    b = np.frombuffer(b"".join(packed), np.uint8).reshape(-1, 14)
    dec = exr._b44_unpack14(b)
    assert np.array_equal(dec, vals)


def test_b44_infnan_collapse():
    """inf/NaN halves collapse to +0 (OpenEXR B44 semantics)."""
    vals = np.array(
        [[np.inf, -np.inf, np.nan, 1.0] * 4], np.float16).view(np.uint16)
    t = exr._b44_transform(vals)
    packed = exr._b44_pack_blocks(t, flat_3byte=False)
    b = np.frombuffer(packed[0], np.uint8).reshape(1, 14)
    dec = exr._b44_unpack14(b).view(np.float16)
    assert dec[0, 0] == 0.0 and dec[0, 1] == 0.0 and dec[0, 2] == 0.0
    assert dec[0, 3] == np.float16(1.0)


def _f24_expected(a: np.ndarray) -> np.ndarray:
    """Reference float24 rounding: what PXR24 must reconstruct."""
    return (exr._float_to_f24(a.view(np.uint32)) << np.uint32(8)).astype(
        "<u4").view(np.float32)


def test_roundtrip_pxr24(tmp_path):
    """PXR24 rounds FLOAT to 15 mantissa bits; read-back must equal the
    float24-rounded input exactly, HALF/UINT ride lossless."""
    h, w = 37, 53
    rng = np.random.default_rng(5)
    fl = (rng.standard_normal((h, w)) * 100).astype(np.float32)
    ids = rng.integers(0, 2**32, (h, w), dtype=np.uint32)
    path = tmp_path / "pxr24.exr"
    exr.write_exr(path, {"F": fl, "ID": ids}, compression=exr.COMP_PXR24)
    read, width, height = exr.read_exr(path)
    assert (width, height) == (w, h)
    assert np.array_equal(read["F"], _f24_expected(fl))
    assert np.array_equal(read["ID"], ids)
    # the rounding is within 2^-16 relative of the input
    rel = np.abs(read["F"] - fl) / np.maximum(np.abs(fl), 1e-30)
    assert rel.max() < 2.0**-15


def test_roundtrip_pxr24_half(tmp_path):
    h, w = 20, 31
    rng = np.random.default_rng(9)
    a = rng.standard_normal((h, w)).astype(np.float32)
    path = tmp_path / "pxr24h.exr"
    exr.write_exr(path, {"Y": a}, compression=exr.COMP_PXR24, half=True)
    read, _, _ = exr.read_exr(path)
    assert np.array_equal(
        read["Y"], a.astype(np.float16).astype(np.float32))


def test_pxr24_float24_specials():
    """floatToFloat24 semantics: inf stays inf, NaN stays NaN (never
    collapses to inf), mantissa overflow carries into the exponent."""
    vals = np.array(
        [np.inf, -np.inf, np.nan, 0.0, -0.0, 1.0, 65504.0], np.float32)
    out = _f24_expected(vals)
    assert np.isposinf(out[0]) and np.isneginf(out[1])
    assert np.isnan(out[2])
    assert out[3] == 0.0 and out[4] == 0.0 and np.signbit(out[4])
    assert out[5] == 1.0
    # a mantissa of all-ones rounds up into the next exponent
    allones = np.array([np.float32(2.0) - np.float32(2.0) ** -23])
    assert _f24_expected(allones)[0] == 2.0


def test_pxr24_plane_layout():
    """Hand-check the ImfPxr24Compressor block layout: per (scanline,
    channel) difference byte planes, most-significant plane first."""
    import zlib

    a = np.array([[1.0, 2.0, 4.0]], "<f4")  # one line, three pixels
    blob = exr._pxr24_compress({"F": a}, ["F"], {"F": exr.PIXEL_FLOAT},
                               0, 1)
    planes = np.frombuffer(zlib.decompress(blob), np.uint8)
    f24 = exr._float_to_f24(a[0].view(np.uint32))
    diff = np.array([f24[0], f24[1] - f24[0], f24[2] - f24[1]], np.uint32)
    expect = np.concatenate(
        [(diff >> s) & 0xFF for s in (16, 8, 0)]).astype(np.uint8)
    assert np.array_equal(planes, expect)


def test_unsupported_compression_message(tmp_path):
    """DWAA files produce one actionable error naming the codec."""
    import pytest

    path = tmp_path / "dwa.exr"
    exr.write_exr(path, {"Y": np.zeros((4, 4), np.float32)})
    raw = bytearray(path.read_bytes())
    # patch the compression attribute byte (value follows the
    # 'compression\0compression\0<size>' attribute header)
    idx = raw.index(b"compression\x00compression\x00")
    raw[idx + len(b"compression\x00compression\x00") + 4] = exr.COMP_DWAA
    with pytest.raises(ValueError, match="DWAA.*re-encode"):
        exr.read_exr_bytes(bytes(raw))
