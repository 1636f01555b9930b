"""PNG codec on stdlib ``zlib``/``struct`` + numpy — no Pillow.

The reference emits matrix heatmaps through matplotlib
(``komolgorovsmirnov.py:131-149``, ``multicollinearity.py:113-131``);
this engine both WRITES (sources/heatmap.py) and READS PNGs with the
stdlib, which turns the multimodal image path from an import-gated
stub into a real, container-testable codec: a PNG is IHDR + zlib-
compressed filtered scanlines + IEND, and unfiltering (the five
standard per-scanline predictors) is plain byte arithmetic.

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — i.e. everything the engine's own writer and
the common ML-pipeline thumbnails use. Palette/16-bit/interlaced files
raise ``ValueError`` with the unsupported feature named.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_MODES = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) gray or (h, w, c∈{1,2,3,4}) → PNG bytes
    (filter 0 scanlines, one zlib stream — the writer shape
    sources/heatmap.py uses for files, returned as bytes for binary
    columns)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h, w[, c<=4]) uint8 array, got shape {pixels.shape}")
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array (h, w, channels). Supports the
    full filter set (None/Sub/Up/Average/Paeth); rejects palette,
    non-8-bit, and interlaced files by name."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type} (palette?)")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter type {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(height, width, channels)


def png_meta(data: bytes) -> tuple[int, int, str]:
    """(width, height, mode) from the IHDR alone — no pixel decode."""
    if data[:8] != _MAGIC or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    width, height, _depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type not in _MODES:
        raise ValueError(f"unsupported color type {color_type}")
    return width, height, _MODES[color_type]
