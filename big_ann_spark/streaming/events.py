"""Structured Streaming operators over the events table.

The reference has no streaming (SURVEY §2.8 — its BATCH_SIZE loops are
paging); this is the north-star extension surface (§7.6). Every
transformation here is written against an *unbounded* DataFrame and
works identically in batch — the registry queries run the batch form
for the DuckDB oracle, tests run the real streaming form
(``readStream`` + ``availableNow`` trigger) and assert both agree.

Scale posture: tumbling/sliding windows and stream dedup are keyed
state; watermarks bound that state. Session windows use Spark's native
``session_window`` (state merges on gap overlap). The parquet file
source is used for tests; a production deployment swaps in Kafka with
the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_SCHEMA_TS = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)
# fixtures have shipped ts as timestamp[ns] (delivered as long nanos
# under session.nanosAsLong) and later as timestamp[us]; keep both
# stream schemas and pick per-file, exactly like catalog.load_table
# branches on the delivered batch dtype.
_EVENTS_SCHEMA_NANOS = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)
EVENTS_SCHEMA = _EVENTS_SCHEMA_TS


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded read of the events table (parquet file source).

    The stream schema must be declared up front, so the ``ts`` physical
    type is sniffed from the parquet footer (one driver-side metadata
    read): s/ms/us timestamps map straight onto Spark's TimestampType;
    timestamp[ns] (which nanosAsLong delivers as long) and plain int64
    are read as long nanos and truncated to microseconds — the same
    contract as the batch catalog's dtype branch (catalog.py:32).

    The file source requires a *directory*; the driver ships a single
    file, so it is staged (symlinked) into a scratch directory — the
    link is refreshed on every call so a regenerated fixture (possibly
    with a different dtype) is never shadowed by a stale link. In
    production this is simply the Kafka/landing directory."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    ts_type = pq.read_schema(src).field("ts").type
    native_ts = pa.types.is_timestamp(ts_type) and ts_type.unit != "ns"

    stage = os.path.join(
        tempfile.gettempdir(), "big_ann_spark_stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.lexists(link):
        os.remove(link)
    os.symlink(src, link)

    if native_ts:
        return spark.readStream.schema(_EVENTS_SCHEMA_TS).format("parquet").load(stage)
    raw = spark.readStream.schema(_EVENTS_SCHEMA_NANOS).format("parquet").load(stage)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type counts + value sum. Batch and streaming
    share this plan; streaming adds a watermark for state expiry."""
    if events.isStreaming:
        events = events.withWatermark("ts", "2 hours")
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide
    overlapping windows)."""
    if events.isStreaming:
        events = events.withWatermark("ts", "2 hours")
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows: events within ``gap`` of each other
    merge into one session (native ``session_window`` state merging;
    the batch equivalent is the gaps-and-islands pattern)."""
    if events.isStreaming:
        events = events.withWatermark("ts", "2 hours")
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events(events: DataFrame, within: str = "1 hour") -> DataFrame:
    """Stream dedup on event_id: streaming uses
    ``dropDuplicatesWithinWatermark`` (bounded state); batch falls back
    to plain dropDuplicates (same result on finite input)."""
    if events.isStreaming:
        return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def user_running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value sum, with an event-time timeout that
    finalizes a user's state one hour after their last activity
    (GroupStateTimeout.EventTimeTimeout keyed state — the shape every
    bespoke streaming aggregator takes when the built-in windows can't
    express it). Emits one row per user per micro-batch with the
    running totals."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [count], "total_value": [round(total, 2)]}
        )

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def click_purchase_stream_join(
    events: DataFrame, *, window: str = "30 minutes"
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase joined to
    the same user's clicks in the preceding ``window`` — the streaming
    form of the attribution as-of shape (relational asof query is the
    batch analog). Both sides carry watermarks and the join has an
    explicit event-time range condition, so Spark can bound the
    buffered state on both sides (the canonical stream-stream join
    requirement); state for a click expires once the watermark passes
    click_ts + window. Works identically on a batch DataFrame (same
    plan minus state), which is what the equality test pins."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "2 hours")
        purchases = purchases.withWatermark("purchase_ts", "2 hours")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}")),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    path: str,
    *,
    _fault_point=None,
) -> None:
    """foreachBatch landing sink with EXACTLY-ONCE file output under
    crash-and-restart (VERDICT r5 #6). Two mechanisms compose:

    - **batch-scoped dynamic overwrite**: rows land partitioned by
      ``(event_date, _batch_id)`` with
      ``partitionOverwriteMode=dynamic`` + ``mode("overwrite")`` — a
      REPLAYED batch (crash after the write, before the checkpoint
      commit) overwrites exactly its own partitions, touching no other
      batch's data. Plain ``append`` here is the classic
      duplicate-on-replay bug.
    - **batch-id commit markers**: an empty ``checkpoint/_committed/<batch_id>``
      file lands after the write; a replay that finds its marker skips
      the write entirely (the cheap path when the crash hit between
      marker and checkpoint commit).

    Either mechanism alone is already exactly-once for file sinks; the
    marker just avoids rewriting a fully-landed batch. Readers use
    ``read_partitioned_sink`` (drops the bookkeeping column). In
    production the same pattern lands on object storage; ``_fault_point``
    is the crash-injection hook the restart test uses. The protocol
    itself lives ONCE in streaming/sink.py (shared with the corpus
    ingest sink)."""
    from big_ann_spark.streaming.sink import run_exactly_once_sink

    def prepare(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return batch_df.withColumn("event_date", F.to_date("ts")).withColumn(
            "_batch_id", F.lit(batch_id)
        )

    run_exactly_once_sink(
        stream_df,
        path,
        prepare,
        ["event_date", "_batch_id"],
        _fault_point=_fault_point,
    )


def read_partitioned_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read back a ``stream_to_partitioned_parquet`` landing zone,
    hiding the ``_batch_id`` bookkeeping partition column."""
    return spark.read.parquet(f"{path}/data").drop("_batch_id")


def run_to_memory(
    stream_df: DataFrame, name: str, *, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan to completion over the currently
    available input (``availableNow`` trigger) into a memory sink and
    return the materialized result as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
