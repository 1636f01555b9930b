"""foreachBatch landing sink: stream → date-partitioned parquet with a
checkpoint; restart with the same checkpoint must not duplicate."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.streaming import events as EV


def test_foreach_batch_sink_exactly_once(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="big_ann_landing_")
    EV.stream_to_partitioned_parquet(EV.read_event_stream(spark, sf_dir), path)
    out = spark.read.parquet(f"{path}/data")
    n_src = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_src
    assert "event_date" in out.columns

    # re-run with the same checkpoint: no new input → no new rows
    EV.stream_to_partitioned_parquet(EV.read_event_stream(spark, sf_dir), path)
    assert spark.read.parquet(f"{path}/data").count() == n_src


def test_crash_and_restart_no_dupes_no_gaps(spark):
    """VERDICT r5 #6: kill the query at BOTH crash windows (after the
    data write / after the commit marker, each before the checkpoint
    commit) and restart — the landing zone must end exactly-once."""
    src = tempfile.mkdtemp(prefix="big_ann_stream_src_")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    base = spark.range(400).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 600).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") * 1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    for i in range(4):  # four files -> four micro-batches
        base.filter((F.col("event_id") % 4) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(src)
        )

    path = tempfile.mkdtemp(prefix="big_ann_landing_crash_")

    def crash_pre_marker(point, batch_id):
        if point == "pre-marker" and batch_id == 1:
            raise RuntimeError("injected crash before commit marker")

    with pytest.raises(Exception, match="injected crash|STREAM"):
        EV.stream_to_partitioned_parquet(
            stream(), path, _fault_point=crash_pre_marker
        )

    def crash_post_marker(point, batch_id):
        if point == "post-marker" and batch_id == 2:
            raise RuntimeError("injected crash after commit marker")

    with pytest.raises(Exception, match="injected crash|STREAM"):
        EV.stream_to_partitioned_parquet(
            stream(), path, _fault_point=crash_post_marker
        )

    # final restart: batch 1 was replayed by overwrite, batch 2 must be
    # skipped via its marker; everything lands exactly once
    seen = []
    EV.stream_to_partitioned_parquet(
        stream(), path, _fault_point=lambda pt, bid: seen.append((pt, bid))
    )
    assert ("skip", 2) in seen
    out = EV.read_partitioned_sink(spark, path)
    got = sorted(r.event_id for r in out.select("event_id").collect())
    assert got == list(range(400))  # no dupes, no gaps
