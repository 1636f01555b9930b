"""Streaming corpus ingestion: incremental dedup vs landed history +
exactly-once append, including the replay-must-not-see-its-own-
partition trap."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from big_ann_spark.streaming import corpus as SC

_SCHEMA = "doc_id long, text string"


def _write_batches(spark, src, batches):
    for rows in batches:
        (
            spark.createDataFrame(rows, _SCHEMA)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )


def _stream(spark, src):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )


def test_stream_corpus_dedup_across_batches(spark):
    src = tempfile.mkdtemp(prefix="big_ann_corpus_src_")
    # batch files are consumed in write order (one file per trigger)
    _write_batches(
        spark,
        src,
        [
            [(1, "alpha"), (2, "beta"), (3, "alpha")],     # in-batch dup
            [(10, "beta"), (11, "gamma")],                 # dup of history
            [(20, "gamma"), (21, "delta"), (22, "delta")],
        ],
    )
    path = tempfile.mkdtemp(prefix="big_ann_corpus_")
    SC.stream_corpus_ingest(_stream(spark, src), path)
    got = {(r.doc_id, r.text) for r in SC.read_corpus(spark, path).collect()}
    assert got == {(1, "alpha"), (2, "beta"), (11, "gamma"), (21, "delta")}

    # nothing new -> re-run is a no-op
    SC.stream_corpus_ingest(_stream(spark, src), path)
    assert SC.read_corpus(spark, path).count() == 4

    # late batch with one genuinely new text
    _write_batches(spark, src, [[(30, "alpha"), (31, "epsilon")]])
    SC.stream_corpus_ingest(_stream(spark, src), path)
    got = {(r.doc_id, r.text) for r in SC.read_corpus(spark, path).collect()}
    assert got == {
        (1, "alpha"), (2, "beta"), (11, "gamma"), (21, "delta"),
        (31, "epsilon"),
    }


@pytest.mark.parametrize("crash_point", ["pre-marker", "post-marker"])
def test_stream_corpus_crash_restart_exactly_once(spark, crash_point):
    """Crash at both windows on a middle batch; the restart must
    neither duplicate nor lose rows — in particular the replayed batch
    must not anti-join itself away against its own half-landed
    partition (the data-written/marker-missing window)."""
    src = tempfile.mkdtemp(prefix="big_ann_corpus_src_")
    _write_batches(
        spark,
        src,
        [
            [(1, "alpha"), (2, "beta")],
            [(10, "beta"), (11, "gamma"), (12, "delta")],
            [(20, "delta"), (21, "epsilon")],
        ],
    )
    path = tempfile.mkdtemp(prefix="big_ann_corpus_crash_")

    def crash(point, batch_id):
        if point == crash_point and batch_id == 1:
            raise RuntimeError("injected crash")

    with pytest.raises(Exception, match="injected crash|STREAM"):
        SC.stream_corpus_ingest(
            _stream(spark, src), path, _fault_point=crash
        )
    SC.stream_corpus_ingest(_stream(spark, src), path)  # restart
    got = {(r.doc_id, r.text) for r in SC.read_corpus(spark, path).collect()}
    assert got == {
        (1, "alpha"), (2, "beta"), (11, "gamma"), (12, "delta"),
        (21, "epsilon"),
    }


def test_cli_ingest_jsonl(spark, tmp_path, capsys):
    """CLI ingest: jsonl crawl files stream into a deduped corpus
    (the common-crawl-shaped entry path; one file per micro-batch)."""
    import json

    from big_ann_spark.cli import main

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "alpha"},
                {"doc_id": 2, "text": "beta"},
                {"doc_id": 3, "text": "alpha"},
            ]
        )
    )
    (src / "b.jsonl").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 10, "text": "beta"},
                {"doc_id": 11, "text": "gamma"},
            ]
        )
    )
    dst = tmp_path / "corpus"
    assert main(["ingest", str(src), str(dst)]) == 0
    assert "3 unique docs" in capsys.readouterr().out
    got = {r.text: r.doc_id for r in SC.read_corpus(spark, str(dst)).collect()}
    # file-stream batch ORDER is mtime-based, not name-based, so beta's
    # keeper depends on which file streamed first — but uniqueness and
    # the single-file keepers do not
    assert set(got) == {"alpha", "beta", "gamma"}
    assert got["alpha"] == 1 and got["gamma"] == 11 and got["beta"] in (2, 10)


def test_stream_corpus_near_dup_screen(spark):
    """near_dup_threshold: a later batch's truncated near-copy of a
    landed doc is screened out (exact hash alone would keep it); fresh
    docs and exact dups behave as before; short unshingleable docs pass
    through; the landed layout carries _sig/_shs stores and a crashed
    replay still converges."""
    a = ("w" + " x y z a b c d e f g h i j k l m n o p").replace("  ", " ")
    doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta"  # truncated
    src = tempfile.mkdtemp(prefix="big_ann_corpus_src_")
    _write_batches(
        spark,
        src,
        [
            [(1, doc), (2, a), (3, "hi")],          # 'hi': no 3-shingle
            [(10, near), (11, doc), (12, "totally different words here now ok yes")],
        ],
    )
    path = tempfile.mkdtemp(prefix="big_ann_corpus_nd_")
    SC.stream_corpus_ingest(_stream(spark, src), path, near_dup_threshold=0.5)
    got = {r.doc_id for r in SC.read_corpus(spark, path).collect()}
    # 10 (near-dup of 1) and 11 (exact dup of 1) dropped; rest kept
    assert got == {1, 2, 3, 12}
    # landed stores exist for shingleable docs
    landed = spark.read.parquet(f"{path}/data")
    assert {"_sig", "_shs"} <= set(landed.columns)
    by_id = {r.doc_id: r for r in landed.collect()}
    assert by_id[1]._sig is not None and len(by_id[1]._sig) == 32
    assert by_id[3]._sig is None  # unshingleable, kept anyway


@pytest.mark.parametrize("crash_point", ["pre-marker", "post-marker"])
def test_stream_corpus_near_dup_crash_restart(spark, crash_point):
    doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta"
    src = tempfile.mkdtemp(prefix="big_ann_corpus_src_")
    _write_batches(
        spark,
        src,
        [[(1, doc)], [(10, near), (11, "fresh words entirely new stuff here")]],
    )
    path = tempfile.mkdtemp(prefix="big_ann_corpus_ndc_")

    def crash(point, batch_id):
        if point == crash_point and batch_id == 1:
            raise RuntimeError("injected crash")

    with pytest.raises(Exception, match="injected crash|STREAM"):
        SC.stream_corpus_ingest(
            _stream(spark, src), path, near_dup_threshold=0.5, _fault_point=crash
        )
    SC.stream_corpus_ingest(_stream(spark, src), path, near_dup_threshold=0.5)
    got = {r.doc_id for r in SC.read_corpus(spark, path).collect()}
    assert got == {1, 11}


def test_stream_corpus_near_dup_toggle_on_existing_corpus(spark):
    """Enabling --near-dup-threshold over a corpus previously ingested
    WITHOUT it must not crash (no _sig column in history) and must
    still screen against that legacy history by recomputing its
    signatures from text (backfill fallback)."""
    doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta"
    src = tempfile.mkdtemp(prefix="big_ann_corpus_src_")
    _write_batches(spark, src, [[(1, doc)]])
    path = tempfile.mkdtemp(prefix="big_ann_corpus_tgl_")
    SC.stream_corpus_ingest(_stream(spark, src), path)  # exact-only
    assert "_sig" not in spark.read.parquet(f"{path}/data").columns

    _write_batches(
        spark, src, [[(10, near), (11, "fresh words entirely new here")]]
    )
    SC.stream_corpus_ingest(
        _stream(spark, src), path, near_dup_threshold=0.5
    )
    got = {r.doc_id for r in SC.read_corpus(spark, path).collect()}
    assert got == {1, 11}  # 10 screened against the LEGACY history

    # The corpus now mixes legacy (no _sig/_shs) and store-carrying
    # partitions. The production history read merges footers, so future
    # batches must SEE the store columns (otherwise every batch would
    # silently re-shingle the whole history — ADVICE r6): the
    # store-carrying row keeps its landed signature, the legacy row
    # surfaces as NULL _sig (backfill path).
    hist = spark.read.option("mergeSchema", "true").parquet(f"{path}/data")
    assert {"_sig", "_shs"} <= set(hist.columns)
    by_id = {r.doc_id: r for r in hist.collect()}
    assert by_id[11]._sig is not None and len(by_id[11]._sig) == 32
    assert by_id[1]._sig is None
