"""S12: matrix → heatmap PNG sinks.

Reference behavior: the statistics scripts save d×d matrix heatmaps as
PNGs — the KS matrix (``komolgorovsmirnov.py:131-149``) and the
VIF/multicollinearity matrix (``multicollinearity.py:113-131``), both
via matplotlib. This container ships no plotting libs, so the PNG is
emitted directly with stdlib ``zlib`` + ``struct`` (a PNG is just
IHDR + zlib-compressed filtered scanlines + IEND) — no dependency,
same artifact.

Scale note: the matrix is d×d driver-side output of a distributed
aggregate (operators.stats) — rendering it is inherently a driver
utility, exactly as in the reference.
"""

from __future__ import annotations

import struct
import zlib


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)


def write_png(path: str, rows: list[bytes]) -> None:
    """Write 8-bit RGB scanlines (each ``3*width`` bytes) as a PNG."""
    height = len(rows)
    width = len(rows[0]) // 3
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)  # filter type 0 per scanline
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def _diverging_rgb(t: float) -> tuple[int, int, int]:
    """t ∈ [0, 1] → blue-white-red diverging ramp (the matplotlib
    'coolwarm'-style family the reference's heatmaps use)."""
    t = min(max(t, 0.0), 1.0)
    if t < 0.5:
        u = t * 2.0
        return (int(59 + (255 - 59) * u), int(76 + (255 - 76) * u), 255)
    u = (t - 0.5) * 2.0
    return (255, int(255 - (255 - 76) * u), int(255 - (255 - 59) * u))


def matrix_heatmap_png(
    matrix, path: str, *, cell: int = 16, vmin: float | None = None, vmax: float | None = None
) -> None:
    """Render a 2-D matrix (list-of-lists or numpy array) as a heatmap
    PNG, each matrix cell as a ``cell×cell`` pixel block, values mapped
    onto a blue→white→red ramp over [vmin, vmax] (data range by
    default)."""
    vals = [[float(v) for v in row] for row in matrix]
    flat = [v for row in vals for v in row]
    lo = min(flat) if vmin is None else vmin
    hi = max(flat) if vmax is None else vmax
    span = (hi - lo) or 1.0
    rows: list[bytes] = []
    for row in vals:
        scan = bytearray()
        for v in row:
            r, g, b = _diverging_rgb((v - lo) / span)
            scan += bytes((r, g, b)) * cell
        rows += [bytes(scan)] * cell
    write_png(path, rows)


def save_ks_heatmap(emb, dims: int, path: str) -> None:
    """KS-matrix heatmap (reference ``komolgorovsmirnov.py:131-149``):
    distributed all-pairs KS (operators.stats.ks_matrix) → symmetric
    d×d matrix → PNG."""
    from big_ann_spark.operators.stats import ks_matrix

    m = [[0.0] * dims for _ in range(dims)]
    for r in ks_matrix(emb, dims).collect():
        m[r["pos_i"]][r["pos_j"]] = r["ks_stat"]
        m[r["pos_j"]][r["pos_i"]] = r["ks_stat"]
    matrix_heatmap_png(m, path)


def save_vif_heatmap(emb, dims: int, path: str) -> None:
    """VIF-matrix heatmap (reference ``multicollinearity.py:113-131``):
    correlation matrix → driver inverse → PNG."""
    from big_ann_spark.operators.stats import vif_matrix

    matrix_heatmap_png(vif_matrix(emb, dims), path)
