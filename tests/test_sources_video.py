"""AVI/MJPEG container codec (sources/avi.py) and the real
frame-sampling operator built on it."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from big_ann_spark.operators.multimodal import sample_video_frames
from big_ann_spark.sources.avi import AviVideo, demux_avi, encode_avi_mjpeg
from big_ann_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _block_image(vals) -> np.ndarray:
    """16x16 of four uniform 8x8 blocks — the jpeg-lossless subspace
    (even values, quality 50) used throughout the codec tests."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = vals
    return img


def _mjpeg_clip(n: int = 6) -> tuple[list[np.ndarray], list[bytes], bytes]:
    imgs = [_block_image((10 + 2 * k, 50, 100, 200)) for k in range(n)]
    frames = [encode_jpeg(i, quality=50, restart_interval=1) for i in imgs]
    return imgs, frames, encode_avi_mjpeg(frames, 16, 16, fps=10)


def test_mux_demux_roundtrip_exact():
    imgs, frames, avi = _mjpeg_clip()
    v = demux_avi(avi)
    assert (v.width, v.height, v.fps) == (16, 16, 10.0)
    assert [bytes(f) for f in v.frames] == frames
    for img, f in zip(imgs, v.frames):
        np.testing.assert_array_equal(decode_jpeg(f), img)


def test_odd_length_payloads_word_aligned():
    # frame payloads need not be even-length: the pad byte must be
    # emitted by the muxer and skipped (not returned) by the demuxer
    frames = [b"\xab" * 17, b"\xcd" * 4, b"\xef" * 333]
    v = demux_avi(encode_avi_mjpeg(frames, 4, 4, fps=1))
    assert v.frames == frames


def test_idx1_offsets_point_at_chunks():
    _imgs, frames, avi = _mjpeg_clip(3)
    i = avi.find(b"idx1")
    (size,) = struct.unpack_from("<I", avi, i + 4)
    assert size == 16 * 3
    movi = avi.find(b"movi")
    for k in range(3):
        ckid, flags, off, ln = struct.unpack_from("<4sIII", avi, i + 8 + 16 * k)
        assert ckid == b"00dc" and flags == 0x10 and ln == len(frames[k])
        # offset is relative to the 'movi' fourcc; it lands on '00dc'
        assert avi[movi + off : movi + off + 4] == b"00dc"


def test_demux_skips_audio_and_descends_rec_lists():
    _imgs, frames, avi = _mjpeg_clip(2)
    # rebuild the movi list with an interleaved audio chunk and the
    # second frame wrapped in a 'rec ' group
    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    movi_payload = (
        chunk(b"00dc", frames[0])
        + chunk(b"01wb", b"\x01\x02\x03")
        + chunk(b"LIST", b"rec " + chunk(b"00dc", frames[1]))
    )
    hdrl_start = avi.find(b"LIST")
    movi_fourcc = avi.find(b"movi")
    hdrl = avi[hdrl_start : movi_fourcc - 8]
    body = hdrl + chunk(b"LIST", b"movi" + movi_payload)
    rebuilt = chunk(b"RIFF", b"AVI " + body)
    v = demux_avi(rebuilt)
    assert [bytes(f) for f in v.frames] == frames


def test_demux_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="RIFF"):
        demux_avi(b"not an avi at all")
    _imgs, _frames, avi = _mjpeg_clip(2)
    with pytest.raises(ValueError, match="overruns|truncated"):
        demux_avi(avi[: len(avi) // 2])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 4, 4)


def test_sample_video_frames_stride_cap_and_decode(spark):
    imgs, frames, avi = _mjpeg_clip(7)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(avi))], "doc_id long, media binary"
    )
    out = sample_video_frames(df, every_nth=3).orderBy("doc_id", "frame_idx")
    rows = out.collect()
    # frames 0, 3, 6 per doc
    assert [(r.doc_id, r.frame_idx) for r in rows] == [
        (1, 0), (1, 3), (1, 6), (2, 0), (2, 3), (2, 6)
    ]
    assert all((r.width, r.height, r.n_frames) == (16, 16, 7) for r in rows)
    for r in rows:
        np.testing.assert_array_equal(decode_jpeg(bytes(r.frame)), imgs[r.frame_idx])
    capped = sample_video_frames(df, every_nth=3, max_frames=2)
    assert capped.count() == 4
    with pytest.raises(ValueError, match="every_nth"):
        sample_video_frames(df, every_nth=0)


def test_demux_empty_movi_no_vids_stream():
    # a movi list without any 'vids' strh must be a loud error, not
    # silently zero frames
    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    body = chunk(b"LIST", b"movi" + chunk(b"00dc", b"xx"))
    with pytest.raises(ValueError, match="vids"):
        demux_avi(chunk(b"RIFF", b"AVI " + body))
    assert AviVideo(0, 0, 0.0).frames == []
