"""Baseline JPEG codec on stdlib ``struct`` + numpy — no Pillow.

Closes the multimodal path's last import gate: PNG and WAV already
decode natively (sources/png.py, operators/multimodal.py), but a
crawl-scale corpus is overwhelmingly JPEG, and until now non-PNG
images raised behind the optional ``images`` (Pillow) extra. This
module implements the interchange format's baseline profile from the
public ITU-T T.81 spec: 8-bit sequential DCT, Huffman entropy coding,
grayscale + YCbCr with arbitrary (≤4) sampling factors (4:4:4 and
4:2:0 tested), restart markers, multi-table DQT/DHT segments.
Progressive (SOF2) and arithmetic-coded files still raise a clear
``ValueError`` naming Pillow as the path for them.

Design for the engine: the per-image kernel below is numpy for every
O(pixels) stage (DCT/IDCT as one einsum over all 8×8 blocks, vector
quantization, plane assembly/upsampling); only the Huffman bit walk is
per-symbol Python, which bounds throughput at test/fixture scale.
That is the honest trade — at 100 TB you swap this kernel for
libjpeg-turbo via the ``images`` extra, and NOTHING in the Spark plan
changes: images are opaque binary-column payloads decoded inside
Arrow-batched map partitions, embarrassingly parallel, no shuffle
(operators/multimodal.py). The reference has no image path at all —
this out-covers it as part of the multimodal extension surface.

Encoder and decoder share the Annex K quantization and Huffman tables,
so round-trip tests alone cannot certify table correctness against
the spec; tests/test_jpeg.py therefore also pins a hand-derived
canonical-code scan (uniform 8×8 block → exactly ``0x2B``) and keeps a
Pillow-gated interop check for hosts that have it.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- tables

# Annex K.1/K.2 quantization tables (natural row-major order)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (#codes of length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
for _b, _v in (
    (DC_LUMA_BITS, DC_LUMA_VALS),
    (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS),
):
    assert sum(_b) == len(_v), "Huffman table counts/values out of sync"


def _zigzag() -> np.ndarray:
    """The 64 (row, col) pairs of the spec's zigzag scan, as flat
    row-major indices (coeff_flat[ZIGZAG] is the zigzag sequence)."""
    order = []
    for s in range(15):
        diag = (
            [(s - j, j) for j in range(s + 1)]
            if s % 2 == 0
            else [(j, s - j) for j in range(s + 1)]
        )
        order.extend(r * 8 + c for r, c in diag if r < 8 and c < 8)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II basis: equals the spec's FDCT/IDCT
# normalization exactly (1/4·C(u)C(v) == s_u·s_v)
_D = np.array(
    [
        [
            (np.sqrt(0.125) if k == 0 else 0.5)
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,lk->nil", _D, blocks, _D, optimize=True)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _D, blocks, _D, optimize=True)


def scaled_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the public libjpeg quality convention
    (50 = tables as published; 1 coarsest, 100 near-lossless)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (QUANT_LUMA, QUANT_CHROMA):
        q = (t * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


# ------------------------------------------------------- Huffman codecs


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per the spec's canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value for the bit-walk decoder."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    """MSB-first bit sink with the scan's 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    """MSB-first bit source over the entropy-coded segment: un-stuffs
    FF00, stops (raises) on any real marker so the MCU loop — which
    alone knows where restarts belong — stays in control."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            b = self.d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(self.d):
                    raise ValueError("truncated JPEG entropy data")
                nxt = self.d[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data "
                        "(truncated scan or unsupported feature)"
                    )
                self.pos += 1  # consume the stuffed 0x00 with the 0xFF
            self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in JPEG entropy data")

    def sync_restart(self, m: int) -> None:
        """Drop pad bits, consume the expected RSTm marker."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 >= len(self.d)
            or self.d[self.pos] != 0xFF
            or self.d[self.pos + 1] != 0xD0 + (m & 7)
        ):
            got = self.d[self.pos : self.pos + 2].hex()
            raise ValueError(
                f"expected restart marker RST{m & 7}, got bytes 0x{got}"
            )
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category value extension (spec F.12)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------- encode


def _to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _from_ycbcr(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to (bh, bw) — replication keeps the padded DCT
    blocks low-frequency (zero padding would ring across the crop)."""
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W % 8 == 0 → (H//8 * W//8, 8, 8) row-major MCUs."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantized_zigzag(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """All blocks of a padded plane → (n_blocks, 64) quantized zigzag
    coefficients (the only per-symbol work left after this is Huffman)."""
    blocks = _plane_blocks(plane.astype(np.float64) - 128.0)
    coeff = _fdct_blocks(blocks)
    q = np.round(coeff / qtable[None, :, :]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: 16 zeros
            w.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes.

    ``subsample=False`` writes 4:4:4 (one block per component per MCU);
    ``True`` writes 4:2:0 (Y at 2×2, chroma averaged over 2×2 pixel
    boxes — the common camera/web layout, and the decoder path that
    exercises multi-block MCUs + upsampling). ``restart_interval`` > 0
    emits DRI + RSTn markers every that-many MCUs — at scale restart
    markers are what make a single huge scan splittable, and here they
    exercise the decoder's resync path."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[..., 0]
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"expected (h, w) or (h, w, 3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql, qc = scaled_quant_tables(quality)

    if gray:
        comps = [(1, (1, 1), 0, _to_f64(arr))]  # (id, (h,v), tq, plane)
        hmax = vmax = 1
    else:
        y, cb, cr = _to_ycbcr(arr)
        if subsample:
            cb = _box_down2(cb, h, w)
            cr = _box_down2(cr, h, w)
            comps = [(1, (2, 2), 0, y), (2, (1, 1), 1, cb), (3, (1, 1), 1, cr)]
            hmax = vmax = 2
        else:
            comps = [(1, (1, 1), 0, y), (2, (1, 1), 1, cb), (3, (1, 1), 1, cr)]
            hmax = vmax = 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks, indexed [by, bx]
    comp_zz = []
    for _cid, (ch, cv), tq, plane in comps:
        bw, bh = mcus_x * ch, mcus_y * cv
        padded = _pad_to(plane, bh * 8, bw * 8)
        zz = _quantized_zigzag(padded, ql if tq == 0 else qc).reshape(bh, bw, 64)
        comp_zz.append(zz)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qbytes = bytes([0]) + bytes(ql.reshape(64)[ZIGZAG].astype(np.uint8))
    if not gray:
        qbytes += bytes([1]) + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8))
    out += _seg(0xDB, qbytes)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, (ch, cv), tq, _plane in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC0, sof)
    dht = _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    dht += _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        dht += _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        dht += _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _hv, tq, _plane in comps:
        sos += bytes([cid, (tq << 4) | tq])  # table id == quant id here
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                writer.pad_to_byte()
                writer.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                since_restart = 0
                preds = [0] * len(comps)
            for ci, (_cid, (ch, cv), tq, _plane) in enumerate(comps):
                dc, ac = (dc_l, ac_l) if tq == 0 else (dc_c, ac_c)
                for v in range(cv):
                    for u in range(ch):
                        preds[ci] = _encode_block(
                            writer,
                            comp_zz[ci][my * cv + v, mx * ch + u],
                            preds[ci],
                            dc,
                            ac,
                        )
            since_restart += 1
    writer.pad_to_byte()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _to_f64(a: np.ndarray) -> np.ndarray:
    return a.astype(np.float64)


def _box_down2(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """2×2 box average after edge-padding to even dims (the standard
    chroma downsample for 4:2:0)."""
    p = _pad_to(plane, h + (h & 1), w + (w & 1))
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)


# --------------------------------------------------------------- decode


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_tid", "ac_tid", "zz")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_tid = self.ac_tid = 0
        self.zz: np.ndarray | None = None


def _parse_segments(data: bytes):
    """Walk the marker stream up to SOS; yields parsed header state."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[_Component] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    while True:
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got 0x{data[pos]:02X}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / bare RST
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if pos + seg_len > len(data):
            raise ValueError("truncated JPEG (segment crosses end of data)")
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT, possibly several tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals
                qt[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT, possibly several tables
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if len(bits) < 16 or i + 17 + n > len(body):
                    raise ValueError("truncated JPEG (DHT table cut short)")
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError(f"only 8-bit precision supported, got {precision}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(_Component(cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC2:
            raise ValueError(
                "progressive JPEG (SOF2) is not supported by the stdlib "
                "codec — install the images extra (Pillow) for it"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0xFF{marker:02X}) "
                "— install the images extra (Pillow) for it"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(comps):
                raise ValueError(
                    "non-interleaved / multi-scan JPEG is not supported by "
                    "the stdlib codec — install the images extra (Pillow)"
                )
            by_id = {c.cid: c for c in comps}
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                by_id[cid].dc_tid = tids >> 4
                by_id[cid].ac_tid = tids & 0xF
            return qt, huff, comps, h, w, restart_interval, pos
        # APPn / COM / anything else: skipped


def _decode_scan(
    data: bytes,
    pos: int,
    comps: list[_Component],
    huff: dict,
    mcus_x: int,
    mcus_y: int,
    restart_interval: int,
) -> None:
    """Entropy-decode every MCU into each component's ``zz`` store."""
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst = 0
    since_restart = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_restart == restart_interval:
                reader.sync_restart(rst)
                rst += 1
                since_restart = 0
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff.get((0, c.dc_tid))
                ac_tab = huff.get((1, c.ac_tid))
                if dc_tab is None or ac_tab is None:
                    raise ValueError(
                        f"missing Huffman table for component {c.cid}"
                    )
                for v in range(c.v):
                    for u in range(c.h):
                        zz = c.zz[my * c.v + v, mx * c.h + u]
                        t = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise ValueError(
                                    "AC coefficient index out of range "
                                    "(corrupt entropy data)"
                                )
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
            since_restart += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w) grayscale or (h, w, 3) RGB.

    Pipeline: marker parse → per-MCU Huffman decode into per-component
    zigzag stores (the only per-symbol loop) → vectorized dequantize +
    de-zigzag + IDCT over all blocks at once → plane assembly, nearest
    upsample of subsampled chroma, crop to (h, w), color convert."""
    data = bytes(data)
    qt, huff, comps, h, w, restart_interval, pos = _parse_segments(data)
    if len(comps) not in (1, 3):
        raise ValueError(f"expected 1 or 3 components, got {len(comps)}")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c.zz = np.zeros((mcus_y * c.v, mcus_x * c.h, 64), dtype=np.int64)
    _decode_scan(data, pos, comps, huff, mcus_x, mcus_y, restart_interval)

    planes = []
    for c in comps:
        if c.tq not in qt:
            raise ValueError(f"missing quantization table {c.tq}")
        bh, bw = c.zz.shape[0], c.zz.shape[1]
        flat = c.zz.reshape(-1, 64) * qt[c.tq].reshape(64)[ZIGZAG][None, :]
        coeff = flat[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        spatial = _idct_blocks(coeff) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # nearest upsample to full resolution, then crop
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _from_ycbcr(*planes)


def jpeg_meta(data: bytes) -> tuple[int, int, str]:
    """(width, height, mode) from the JPEG header only — the cheap
    metadata path ``operators/multimodal.decode_image`` uses (no
    entropy decode; progressive files still identify fine here)."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got 0x{data[pos]:02X}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or 0xD0 <= marker <= 0xD8:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if marker in (0xC0, 0xC1, 0xC2):
            _precision, h, w, nc = struct.unpack_from(">BHHB", data, pos + 2)
            return w, h, ("L" if nc == 1 else "RGB" if nc == 3 else "CMYK")
        pos += seg_len
    raise ValueError("no SOF frame header found")
