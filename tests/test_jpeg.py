"""The native baseline JPEG codec (sources/jpeg.py).

Encoder and decoder share the Annex K tables, so round-trip tests
alone cannot certify spec conformance; the suite therefore layers:
hand-derived canonical-Huffman bytes (the uniform-block scan is
exactly 0x2B), exact round trips on the provably-lossless subspace
(block-uniform even values at quality 50), PSNR bounds on smooth
content across quality / subsampling / restart settings, format gates
(progressive, truncation), and a Pillow interop check on hosts that
have it. The driver additionally oracle-certifies the codec every
round via the multimodal_codec_roundtrip ``jpeg`` variant.
"""

from __future__ import annotations

import numpy as np
import pytest

from big_ann_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
    scaled_quant_tables,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_gray(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((np.sin(yy / 9.0) + np.cos(xx / 13.0)) * 40 + 128).astype(np.uint8)


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((np.sin(yy / 11.0) * 0.5 + 0.5) * 200 + 20).astype(np.uint8)
    g = ((np.cos(xx / 7.0) * 0.5 + 0.5) * 180 + 30).astype(np.uint8)
    b = (((xx + yy) % 97) * 2).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_canonical_huffman_hand_derived_scan():
    """Uniform-128 8×8 gray: DC diff 0 (code '00' in the Annex K DC
    luminance table) + EOB ('1010' — the 4th canonical code, lengths
    2,2,3,4) + 1-padding = 0b00101011 = 0x2B, hand-derived from the
    spec. A single wrong entry anywhere in the canonical construction
    changes this byte."""
    data = encode_jpeg(np.full((8, 8), 128, np.uint8), quality=50)
    sos = data.find(bytes([0xFF, 0xDA]))
    seg_len = int.from_bytes(data[sos + 2 : sos + 4], "big")
    scan = data[sos + 2 + seg_len : -2]
    assert scan == bytes([0x2B])


def test_block_uniform_even_values_round_trip_exactly():
    """The lossless subspace the driver oracle uses: per-8×8-block
    uniform images with even values at quality 50 (DC-only blocks;
    quant step 16 divides 8·(v−128)) — decode must reproduce every
    pixel, across multi-block layouts and non-multiple-of-8 crops."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 64, 200, 0, 254
    assert np.array_equal(decode_jpeg(encode_jpeg(img, 50)), img)
    # odd dims: encoder pads by edge replication, so a uniform image
    # stays block-uniform after padding and the crop is still exact
    odd = np.full((13, 11), 202, np.uint8)
    out = decode_jpeg(encode_jpeg(odd, 50))
    assert out.shape == (13, 11) and np.array_equal(out, odd)


@pytest.mark.parametrize("quality,floor", [(95, 40.0), (85, 35.0), (50, 28.0)])
def test_gray_round_trip_psnr(quality, floor):
    img = _smooth_gray(48, 40)
    out = decode_jpeg(encode_jpeg(img, quality))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > floor


def test_rgb_444_round_trip_psnr():
    img = _smooth_rgb(40, 56)
    out = decode_jpeg(encode_jpeg(img, 90))
    assert out.shape == img.shape
    assert _psnr(img, out) > 32.0


def test_rgb_420_subsampled_round_trip():
    """4:2:0 exercises multi-block MCUs (4×Y + Cb + Cr), the chroma box
    downsample, and the decoder's nearest upsample."""
    img = _smooth_rgb(37, 29)  # odd dims: MCU padding + crop both sides
    out = decode_jpeg(encode_jpeg(img, 90, subsample=True))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30.0


def test_restart_markers_change_bytes_not_pixels():
    img = _smooth_rgb(32, 48)
    plain = encode_jpeg(img, 85)
    rst = encode_jpeg(img, 85, restart_interval=2)
    assert plain != rst and b"\xff\xdd" in rst  # DRI present
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_meta_parses_header_only():
    assert jpeg_meta(encode_jpeg(np.zeros((10, 20), np.uint8))) == (20, 10, "L")
    assert jpeg_meta(encode_jpeg(_smooth_rgb(8, 8), subsample=True)) == (8, 8, "RGB")


def test_progressive_rejected_with_clear_gate():
    """A SOF2 frame must name the unsupported profile and the Pillow
    extra — not die in the entropy decoder."""
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = data.find(bytes([0xFF, 0xC0]))
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    # metadata still parses off the frame header
    assert jpeg_meta(bytes(data)) == (8, 8, "L")


def test_truncated_scan_fails_loudly():
    data = encode_jpeg(_smooth_gray(24, 24), 85)
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(data[: len(data) // 2])


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_quality_scaling_monotone():
    """Higher quality → finer quant steps → higher PSNR and (on smooth
    content) more bytes; also pins the libjpeg scaling convention
    (50 == tables as published)."""
    ql50, _ = scaled_quant_tables(50)
    assert ql50[0, 0] == 16  # Annex K unscaled
    img = _smooth_gray(64, 64)
    sizes, errs = [], []
    for q in (30, 60, 90):
        data = encode_jpeg(img, q)
        sizes.append(len(data))
        errs.append(_psnr(img, decode_jpeg(data)))
    assert sizes == sorted(sizes)
    assert errs == sorted(errs)


def test_decode_image_handles_jpeg_natively(spark):
    """decode_image routes JPEG payloads through the native codec —
    no Pillow gate anywhere in the mixed PNG+JPEG batch."""
    from big_ann_spark.operators import multimodal as MM
    from big_ann_spark.sources.png import encode_png

    jpg = encode_jpeg(_smooth_rgb(9, 14), 90)
    png = encode_png(np.zeros((5, 7), np.uint8))
    media = spark.createDataFrame(
        [(1, bytearray(jpg)), (2, bytearray(png))], "doc_id long, media binary"
    )
    rows = {r.doc_id: r for r in MM.decode_image(media).collect()}
    assert (rows[1].width, rows[1].height, rows[1].mode) == (14, 9, "RGB")
    assert (rows[2].width, rows[2].height) == (7, 5)


def test_pillow_interop():
    """On hosts with the images extra: our bytes must decode under
    libjpeg to (nearly) the same pixels — catches any self-consistent
    table error the round-trip tests cannot see. Skip-marked without
    Pillow (this container)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    img = _smooth_rgb(24, 32)
    theirs = np.asarray(
        Image.open(io.BytesIO(encode_jpeg(img, 90))).convert("RGB")
    )
    # libjpeg's integer IDCT vs our float IDCT: tiny per-pixel skew only
    assert _psnr(decode_jpeg(encode_jpeg(img, 90)), theirs) > 45.0
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    ours = decode_jpeg(buf.getvalue())
    assert _psnr(img, ours) > 30.0
