"""PIZ EXR codec: wavelet/Huffman/LUT round-trips, native-vs-python
Huffman equivalence, file-level round-trips, and an environment-light
render whose map loads from a PIZ-compressed EXR (the compression
real-world lat-long HDRs typically use; the reference reads them via
the exr crate, crates/raytracing-cpu/src/utils.rs:50-131).
"""
import numpy as np
import pytest

from tpu_raytracing.utils import exr, exr_piz

rng = np.random.default_rng(42)


@pytest.mark.parametrize(
    "data",
    [
        np.array([7], np.uint16),
        np.zeros(300, np.uint16),
        rng.integers(0, 50, 1000).astype(np.uint16),
        np.repeat(rng.integers(0, 65536, 16), 256).astype(np.uint16),
        rng.integers(0, 65536, 65537).astype(np.uint16),
        np.full(1000, 65535, np.uint16),
    ],
    ids=["single", "zeros", "small-alphabet", "runs", "dense", "max-sym"],
)
def test_huffman_roundtrip_python_and_native(data):
    comp = exr_piz.huf_compress(data)
    out_py = exr_piz._huf_uncompress_py(comp, len(data))
    np.testing.assert_array_equal(out_py, data)
    out = exr_piz.huf_uncompress(comp, len(data))  # native when available
    np.testing.assert_array_equal(out, data)


def test_huffman_rejects_malformed():
    data = rng.integers(0, 1000, 512).astype(np.uint16)
    comp = bytearray(exr_piz.huf_compress(data))
    with pytest.raises(ValueError):
        exr_piz.huf_uncompress(bytes(comp[:10]), 512)
    with pytest.raises(ValueError):
        exr_piz.huf_uncompress(bytes(comp), 513)  # wrong expected count


@pytest.mark.parametrize(
    "shape", [(32, 32), (1, 7), (7, 1), (5, 9), (33, 17), (64, 3), (2, 2)]
)
@pytest.mark.parametrize("mx", [100, 40000], ids=["w14", "w16"])
def test_wavelet_roundtrip(shape, mx):
    a = rng.integers(0, mx + 1, shape).astype(np.uint16)
    b = a.copy()
    exr_piz.wav2_encode(b, mx)
    exr_piz.wav2_decode(b, mx)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("w,ny", [(17, 32), (64, 5), (1, 1), (128, 32)])
def test_piz_block_roundtrip_mixed_channels(w, ny):
    sizes = [2, 1, 2]  # FLOAT, HALF, UINT channel widths in u16 units
    raw = rng.integers(0, 65536, ny * w * sum(sizes)).astype("<u2").tobytes()
    blk = exr_piz.piz_compress(raw, sizes, w, ny)
    assert exr_piz.piz_uncompress(blk, sizes, w, ny) == raw


def test_piz_exr_file_roundtrip(tmp_path):
    h, w = 70, 123  # 3 blocks: 32 + 32 + 6 lines
    chans = {
        "R": rng.standard_normal((h, w)).astype(np.float32),
        "G": (rng.standard_normal((h, w)) * 100).astype(np.float32),
        "Id": rng.integers(0, 1000, (h, w)).astype(np.uint32),
    }
    path = tmp_path / "t.exr"
    exr.write_exr(path, chans, compression=exr.COMP_PIZ)
    got, gw, gh = exr.read_exr(path)
    assert (gw, gh) == (w, h)
    for k, v in chans.items():
        np.testing.assert_array_equal(got[k], v)


def test_piz_exr_matches_zip_decode(tmp_path):
    """The same image through PIZ and ZIP decodes identically."""
    h, w = 33, 48
    chans = {"R": rng.standard_normal((h, w)).astype(np.float32)}
    exr.write_exr(tmp_path / "p.exr", chans, compression=exr.COMP_PIZ)
    exr.write_exr(tmp_path / "z.exr", chans, compression=exr.COMP_ZIP)
    gp, _, _ = exr.read_exr(tmp_path / "p.exr")
    gz, _, _ = exr.read_exr(tmp_path / "z.exr")
    np.testing.assert_array_equal(gp["R"], gz["R"])


def test_env_light_renders_from_piz_exr(tmp_path):
    """environment_light miss radiance sourced from a PIZ EXR map."""
    import jax.numpy as jnp

    from tpu_raytracing.device import compile_scene
    from tpu_raytracing.geometry import v3
    from tpu_raytracing.lights import EnvironmentLight, TextureMapping
    from tpu_raytracing.materials import (
        FilterMode, Image, ImageTexture, TextureSampler, WrapMode,
    )
    from tpu_raytracing.ops.light_sampling import environment_radiance
    from tpu_raytracing.scene import SceneBuilder
    from tpu_raytracing.scene.camera import Camera

    W, H = 64, 32
    s = (np.arange(W) + 0.5) / W
    t = (np.arange(H) + 0.5) / H
    img = np.zeros((H, W, 3), np.float32)
    img[:, :, 0] = s[None, :]
    img[:, :, 1] = t[:, None]
    img[:, :, 2] = 0.25
    path = tmp_path / "env_piz.exr"
    exr.write_exr(
        path,
        {"R": img[:, :, 0], "G": img[:, :, 1], "B": img[:, :, 2]},
        compression=exr.COMP_PIZ,
    )

    sb = SceneBuilder()
    env_img = sb.add_image(Image.load_from_bytes(path.read_bytes()))
    env_tex = sb.add_texture(
        ImageTexture(
            image=env_img,
            sampler=TextureSampler(
                filter=FilterMode.NEAREST, wrap=WrapMode.REPEAT
            ),
        )
    )
    sb.add_environment_light(
        EnvironmentLight(radiance=env_tex, mapping=TextureMapping.SPHERICAL)
    )
    sb.add_camera(
        Camera.lookat_camera_perspective(
            v3(0, 0, 0), v3(0, 1, 0), v3(0, 0, 1), False,
            np.deg2rad(45.0), 32, 24,
        )
    )
    ds = compile_scene(sb.build())

    def latlong_dir(ss, tt):
        theta = tt * np.pi
        phi = ss * 2.0 * np.pi - np.pi
        return np.array(
            [np.sin(theta) * np.sin(phi), np.sin(theta) * np.cos(phi),
             np.cos(theta)], np.float32,
        )

    cases = [(4, 7), (31, 16), (60, 30)]
    dirs = np.stack(
        [latlong_dir((x + 0.5) / W, (y + 0.5) / H) for x, y in cases]
    )
    rad = np.asarray(environment_radiance(ds, jnp.asarray(dirs)))
    want = np.stack([img[y, x] for x, y in cases])
    np.testing.assert_allclose(rad, want, atol=1e-3)
