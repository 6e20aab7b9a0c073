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
