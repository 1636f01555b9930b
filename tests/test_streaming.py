"""Real Structured Streaming runs (availableNow) must agree with the
batch forms of the same plans."""

from __future__ import annotations

from big_ann_spark.catalog import load_table
from big_ann_spark.streaming import events as EV


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = EV.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = EV.run_to_memory(
        EV.tumbling_counts(EV.read_event_stream(spark, sf_dir)), "t_tumbling"
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_sessions_equal_batch(spark, sf_dir):
    batch = EV.session_windows(load_table(spark, sf_dir, "events"))
    stream = EV.run_to_memory(
        EV.session_windows(EV.read_event_stream(spark, sf_dir)), "t_sessions"
    )
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_dedup(spark, sf_dir):
    """dropDuplicatesWithinWatermark under availableNow must converge
    to the batch dropDuplicates VALUES, not just the count (each
    event_id is unique in the fixture, so the kept row is
    deterministic)."""
    stream = EV.dedup_events(EV.read_event_stream(spark, sf_dir))
    out = EV.run_to_memory(stream, "t_dedup", output_mode="append")
    batch = EV.dedup_events(load_table(spark, sf_dir, "events"))
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_streaming_sliding_equals_batch(spark, sf_dir):
    batch = EV.sliding_counts(load_table(spark, sf_dir, "events"))
    stream = EV.run_to_memory(
        EV.sliding_counts(EV.read_event_stream(spark, sf_dir)), "t_sliding"
    )
    cols = ["window_start", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Watermarked stream-stream click->purchase join converges to the
    batch join on finite input (append mode)."""
    batch = EV.click_purchase_stream_join(load_table(spark, sf_dir, "events"))
    stream = EV.run_to_memory(
        EV.click_purchase_stream_join(EV.read_event_stream(spark, sf_dir)),
        "t_ss_join",
        output_mode="append",
    )
    cols = ["user_id", "purchase_id", "click_id", "purchase_value"]
    assert _rows(stream, cols) == _rows(batch, cols)
    assert batch.count() > 0  # fixture actually exercises the join


def test_stream_survives_ts_dtype_drift(spark, tmp_path):
    """The driver has shipped events.ts as timestamp[ns] (r1-r3) and as
    timestamp[us] (r4). Stage a small fixture BOTH ways and assert the
    stream equals the batch read on each — read_event_stream must sniff
    the footer, not assume a unit (the r4 red row was exactly this)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [1700000000_000000, 1700000000_000000 + 3600_000000,
                 1700000000_000000 + 2 * 3600_000000, 1700000000_000000 + 3 * 3600_000000],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([10, 10, 11, 11], pa.int64()),
            "event_type": pa.array(["click", "view", "click", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}", "{}"]),
        }
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    for unit, name in [("us", "drift_us"), ("ns", "drift_ns")]:
        d = tmp_path / name
        d.mkdir()
        tbl = base.set_column(1, "ts", base.column("ts").cast(pa.timestamp(unit)))
        pq.write_table(tbl, str(d / "events.parquet"))
        batch = EV.tumbling_counts(load_table(spark, str(d), "events"))
        stream = EV.run_to_memory(
            EV.tumbling_counts(EV.read_event_stream(spark, str(d))), f"t_{name}"
        )
        assert _rows(stream, cols) == _rows(batch, cols), f"unit={unit}"
        # 4 events an hour apart → 4 distinct hourly windows; a unit bug
        # would collapse them into one or two 1970-era windows
        assert stream.count() == 4
