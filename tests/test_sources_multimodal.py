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


@pytest.mark.parametrize("suf,dtype", [("fbin", np.float32), ("u8bin", np.uint8), ("ibin", np.int32)])
def test_local_roundtrip_and_chunked_offsets(suf, dtype):
    rng = np.random.default_rng(42)
    if dtype == np.float32:
        mat = rng.normal(size=(100, 8)).astype(dtype)
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
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = MM.attach_media(docs)
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.decode_image(media)


def test_frame_sample_shapes(spark):
    docs = spark.createDataFrame([(1, "a" * 130)], "doc_id long, text string")
    frames = MM.frame_sample(MM.attach_media(docs), every_n_bytes=64).collect()
    assert len(frames) == 3
    assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2]
    assert sum(len(r["frame"]) for r in frames) == 130
