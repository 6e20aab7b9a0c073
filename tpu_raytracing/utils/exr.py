"""Minimal OpenEXR 2.0 scanline codec (pure Python + native Huffman).

Capability parity with the reference's exr paths
(crates/raytracing-cpu/src/utils.rs:50-131 writes; the `exr` crate reads
arbitrary real-world files): float32/uint32 channels with arbitrary
names. Supports writing NONE/ZIP/PIZ scanline files and reading
NONE/ZIPS/ZIP/PIZ files with HALF/FLOAT/UINT channels — enough to
round-trip our own outputs and load lat-long environment maps in the
wild (typically PIZ). PIZ wavelet/Huffman logic lives in exr_piz.py.
"""
from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import numpy as np

MAGIC = 0x01312F76
PIXEL_UINT, PIXEL_HALF, PIXEL_FLOAT = 0, 1, 2
COMP_NONE, COMP_RLE, COMP_ZIPS, COMP_ZIP, COMP_PIZ = 0, 1, 2, 3, 4

_DTYPES = {
    PIXEL_UINT: np.dtype("<u4"),
    PIXEL_HALF: np.dtype("<f2"),
    PIXEL_FLOAT: np.dtype("<f4"),
}


def _attr(name: str, type_name: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\0" + type_name.encode() + b"\0"
        + struct.pack("<i", len(data)) + data
    )


def _chlist(channels: Dict[str, int]) -> bytes:
    out = b""
    for name in sorted(channels):
        out += name.encode() + b"\0"
        out += struct.pack("<iBBBBii", channels[name], 0, 0, 0, 0, 1, 1)
    return out + b"\0"


# EXR zip predictor: delta encode then split bytes into two halves interleaved.
def _zip_reorder_encode(raw: bytes) -> bytes:
    arr = np.frombuffer(raw, np.uint8).astype(np.int16)
    d = arr.copy()
    d[1:] = (arr[1:] - arr[:-1] + 128 + 256) & 0xFF
    d = d.astype(np.uint8)
    half = (len(d) + 1) // 2
    out = np.empty_like(d)
    out[:half] = d[0::2]
    out[half:] = d[1::2]
    return out.tobytes()


def _zip_reorder_decode(data: bytes) -> bytes:
    arr = np.frombuffer(data, np.uint8)
    half = (len(arr) + 1) // 2
    interleaved = np.empty_like(arr)
    interleaved[0::2] = arr[:half]
    interleaved[1::2] = arr[half:]
    # undo delta: d[i] = d[i-1] + raw[i] - 128
    out = np.empty(len(arr), np.uint8)
    prev = int(interleaved[0])
    out[0] = prev
    vals = (np.cumsum(interleaved[1:].astype(np.int64) - 128) + prev) & 0xFF
    out[1:] = vals.astype(np.uint8)
    return out.tobytes()


def write_exr(
    path,
    channels: Dict[str, np.ndarray],
    compression: int = COMP_ZIP,
) -> None:
    """Write named channels (each (H, W) float32 or uint32) to an EXR file."""
    names = sorted(channels)
    arrs = {}
    ch_types = {}
    height = width = None
    for name in names:
        a = np.asarray(channels[name])
        if a.dtype == np.uint32:
            ch_types[name] = PIXEL_UINT
            a = a.astype("<u4")
        else:
            ch_types[name] = PIXEL_FLOAT
            a = a.astype("<f4")
        if height is None:
            height, width = a.shape
        assert a.shape == (height, width)
        arrs[name] = a

    header = b""
    header += _attr("channels", "chlist", _chlist(ch_types))
    header += _attr("compression", "compression", struct.pack("<B", compression))
    box = struct.pack("<iiii", 0, 0, width - 1, height - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", struct.pack("<B", 0))
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    lines_per_block = {
        COMP_NONE: 1, COMP_ZIPS: 1, COMP_ZIP: 16, COMP_PIZ: 32,
    }[compression]
    n_blocks = (height + lines_per_block - 1) // lines_per_block

    blocks = []
    for bi in range(n_blocks):
        y0 = bi * lines_per_block
        ny = min(lines_per_block, height - y0)
        # scanline data: for each line, channels in alphabetical order
        parts = []
        for dy in range(ny):
            for name in names:
                parts.append(arrs[name][y0 + dy].tobytes())
        raw = b"".join(parts)
        if compression == COMP_NONE:
            data = raw
        elif compression == COMP_PIZ:
            from .exr_piz import piz_compress

            sizes = [_DTYPES[ch_types[n]].itemsize // 2 for n in names]
            comp = piz_compress(raw, sizes, width, ny)
            data = comp if len(comp) < len(raw) else raw
        else:
            comp = zlib.compress(_zip_reorder_encode(raw))
            data = comp if len(comp) < len(raw) else raw
        blocks.append((y0, data))

    with open(path, "wb") as f:
        f.write(struct.pack("<Ii", MAGIC, 2))
        f.write(header)
        offset_table_pos = f.tell()
        offset = offset_table_pos + 8 * n_blocks
        offsets = []
        for _, data in blocks:
            offsets.append(offset)
            offset += 8 + len(data)
        f.write(struct.pack(f"<{n_blocks}Q", *offsets))
        for y0, data in blocks:
            f.write(struct.pack("<ii", y0, len(data)))
            f.write(data)


def read_exr_bytes(raw: bytes) -> Tuple[Dict[str, np.ndarray], int, int]:
    """Parse an EXR byte string -> ({channel: (H, W) f32/u32}, width, height)."""
    magic, version = struct.unpack_from("<Ii", raw, 0)
    if magic != MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("tiled EXR not supported")
    pos = 8

    def read_cstr():
        nonlocal pos
        end = raw.index(b"\0", pos)
        s = raw[pos:end].decode("latin-1")
        pos = end + 1
        return s

    channels = []  # (name, pixel_type)
    compression = COMP_NONE
    data_window = None
    while True:
        name = read_cstr()
        if not name:
            break
        _type_name = read_cstr()
        (size,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        payload = raw[pos:pos + size]
        pos += size
        if name == "channels":
            cp = 0
            while payload[cp] != 0:
                ce = payload.index(b"\0", cp)
                cname = payload[cp:ce].decode("latin-1")
                (ptype,) = struct.unpack_from("<i", payload, ce + 1)
                channels.append((cname, ptype))
                cp = ce + 1 + 16
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)

    x_min, y_min, x_max, y_max = data_window
    width = x_max - x_min + 1
    height = y_max - y_min + 1
    if compression not in (COMP_NONE, COMP_ZIPS, COMP_ZIP, COMP_PIZ):
        raise ValueError(f"unsupported EXR compression: {compression}")
    lines_per_block = {
        COMP_NONE: 1, COMP_ZIPS: 1, COMP_ZIP: 16, COMP_PIZ: 32,
    }[compression]
    n_blocks = (height + lines_per_block - 1) // lines_per_block

    offsets = struct.unpack_from(f"<{n_blocks}Q", raw, pos)
    line_bytes = sum(_DTYPES[pt].itemsize for _, pt in channels) * width

    out = {
        cname: np.empty((height, width), _DTYPES[pt])
        for cname, pt in channels
    }
    for off in offsets:
        y0, size = struct.unpack_from("<ii", raw, off)
        data = raw[off + 8:off + 8 + size]
        ny = min(lines_per_block, height - (y0 - y_min))
        expected = line_bytes * ny
        if size != expected:
            if compression == COMP_PIZ:
                from .exr_piz import piz_uncompress

                sizes = [_DTYPES[pt].itemsize // 2 for _, pt in channels]
                data = piz_uncompress(data, sizes, width, ny)
            else:
                data = _zip_reorder_decode(zlib.decompress(data))
        p = 0
        for dy in range(ny):
            y = y0 - y_min + dy
            for cname, pt in channels:
                dt = _DTYPES[pt]
                row = np.frombuffer(data, dt, width, p)
                out[cname][y] = row
                p += dt.itemsize * width

    result = {}
    for cname, pt in channels:
        a = out[cname]
        result[cname] = (
            a.astype(np.uint32) if pt == PIXEL_UINT else a.astype(np.float32)
        )
    return result, width, height


def read_exr(path) -> Tuple[Dict[str, np.ndarray], int, int]:
    with open(path, "rb") as f:
        return read_exr_bytes(f.read())
