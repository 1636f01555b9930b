"""Minimal AVI (RIFF) container codec for motion-JPEG video columns.

The reference engine has no video path at all; this is part of the
multimodal extension surface (image/audio/video as opaque binary
columns). Format per the public Microsoft "AVI RIFF File Reference"
(RIFF 'AVI ' → LIST 'hdrl' {avih, LIST 'strl' {strh, strf}} → LIST
'movi' {00dc…} → idx1). Frames are baseline JPEG payloads, so the
whole video chain — container demux + per-frame image decode — runs
on the engine's own codecs (sources/jpeg.py), no OpenCV/ffmpeg.

Scope: one 'vids'/MJPG stream, uncompressed index ('idx1'), no
interleaved audio parsing (non-video chunks are skipped, not
rejected — real MJPEG files often interleave '01wb' audio). That is
exactly what a frame-sampling training pipeline needs: pull every
n-th JPEG out of the container and hand it to the image ops.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


@dataclass
class AviVideo:
    """Demuxed MJPEG video: per-frame JPEG payloads + header metadata."""

    width: int
    height: int
    fps: float
    frames: list[bytes] = field(default_factory=list)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk, padded to word alignment (pad byte is not
    counted in the stored size — the spec's rule readers must honor)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Mux JPEG frame payloads into a spec-shaped AVI: avih/strh/strf
    headers, word-aligned '00dc' chunks, and an 'idx1' index (offsets
    relative to the 'movi' fourcc, the convention every demuxer
    accepts). Frames must be non-empty; dims/fps are header metadata
    and are not validated against the JPEG payloads."""
    if not frames:
        raise ValueError("cannot mux an AVI with zero frames")
    if width < 1 or height < 1 or fps < 1:
        raise ValueError(f"bad AVI geometry: {width}x{height} @ {fps} fps")
    max_size = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        max_size * fps,            # dwMaxBytesPerSec (advisory)
        0,                         # dwPaddingGranularity
        _AVIF_HASINDEX,            # dwFlags
        len(frames),               # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_size,                  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,                # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H",
        b"vids", b"MJPG",
        0, 0, 0,                   # flags, priority, language
        0,                         # dwInitialFrames
        1, fps,                    # dwScale / dwRate = fps
        0, len(frames),            # dwStart, dwLength (frames)
        max_size,                  # dwSuggestedBufferSize
        -1, 0,                     # dwQuality, dwSampleSize
        0, 0, width, height,       # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    idx = bytearray()
    for f in frames:
        # idx1 offsets point at each chunk's fourcc, measured from the
        # 'movi' list-type fourcc itself (so the first chunk is at 4)
        idx += struct.pack(
            "<4sIII", b"00dc", _AVIIF_KEYFRAME, 4 + len(movi_payload), len(f)
        )
        movi_payload += _chunk(b"00dc", bytes(f))
    body = hdrl + _list(b"movi", bytes(movi_payload)) + _chunk(b"idx1", bytes(idx))
    return _chunk(b"RIFF", b"AVI " + body)


def _iter_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking word-aligned
    RIFF chunks in buf[start:end); truncated tails raise."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated RIFF chunk header at offset {pos}")
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        data_start = pos + 8
        if data_start + size > end:
            raise ValueError(
                f"RIFF chunk {fourcc!r} at {pos} overruns its container "
                f"({size} bytes, {end - data_start} available)"
            )
        yield fourcc, data_start, size
        pos = data_start + size + (size % 2)


def demux_avi(data: bytes) -> AviVideo:
    """AVI bytes → AviVideo(width, height, fps, [jpeg payloads…]).

    Walks the RIFF tree: header metadata from 'avih'/'strh', frame
    payloads from the '..dc'/'..db' chunks of the first video stream in
    the 'movi' list (rec-grouped movi entries are descended into; audio
    and index chunks are skipped). The idx1 index is deliberately not
    trusted for extraction — chunk walking is what stays correct on
    files whose index is stale or absent."""
    m = bytes(data)
    if len(m) < 12 or m[:4] != b"RIFF" or m[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/'AVI ' signature)")
    (riff_size,) = struct.unpack_from("<I", m, 4)
    end = min(8 + riff_size, len(m))

    width = height = 0
    fps = 0.0
    vid_stream: int | None = None
    stream_no = 0
    frames: list[bytes] = []

    def scan_hdrl(s: int, e: int) -> None:
        nonlocal width, height, fps, vid_stream, stream_no
        for fourcc, ds, size in _iter_chunks(m, s, e):
            if fourcc == b"LIST":
                scan_hdrl(ds + 4, ds + size)
            elif fourcc == b"avih" and size >= 40:
                hdr = struct.unpack_from("<10I", m, ds)
                width, height = hdr[8], hdr[9]
            elif fourcc == b"strh" and size >= 32:
                fcc_type = m[ds : ds + 4]
                scale, rate = struct.unpack_from("<II", m, ds + 20)
                if fcc_type == b"vids" and vid_stream is None:
                    vid_stream = stream_no
                    fps = rate / scale if scale else 0.0
                stream_no += 1

    def scan_movi(s: int, e: int) -> None:
        want = b"%02d" % (vid_stream or 0)
        for fourcc, ds, size in _iter_chunks(m, s, e):
            if fourcc == b"LIST":  # 'rec ' interleave groups
                scan_movi(ds + 4, ds + size)
            elif fourcc[:2] == want and fourcc[2:4] in (b"dc", b"db"):
                frames.append(m[ds : ds + size])

    for fourcc, ds, size in _iter_chunks(m, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = m[ds : ds + 4]
        if list_type == b"hdrl":
            scan_hdrl(ds + 4, ds + size)
        elif list_type == b"movi":
            if vid_stream is None:
                raise ValueError("AVI has a movi list but no 'vids' stream header")
            scan_movi(ds + 4, ds + size)
    return AviVideo(width=width, height=height, fps=fps, frames=frames)
