"""Event-stream queries (SURVEY §7.6 extension surface). Registry
entries run the batch form of each streaming plan (driver collects a
DataFrame); ``streaming_tumbling_live`` runs the REAL Structured
Streaming pipeline (readStream → availableNow → memory sink) and is
oracle-checked against the same SQL — streaming and batch must agree
exactly on finite input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.queries import register
from big_ann_spark.streaming import events as EV

_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY window_start, event_type
"""


@register("tumbling_window_counts", sql=_TUMBLING_SQL)
def tumbling_window_counts(spark, sf_dir):
    """Tumbling 1-hour windows per event type (batch form of the
    streaming plan — identical groupBy(window(...)))."""
    return EV.tumbling_counts(load_table(spark, sf_dir, "events"))


@register("streaming_tumbling_live", sql=_TUMBLING_SQL)
def streaming_tumbling_live(spark, sf_dir):
    """The SAME tumbling aggregation executed as a real Structured
    Streaming job: parquet file-stream source → watermark → windowed
    agg → availableNow trigger → memory sink. Oracle-checked against
    the identical SQL: streaming must converge to the batch answer."""
    stream = EV.read_event_stream(spark, sf_dir)
    return EV.run_to_memory(
        EV.tumbling_counts(stream), "streaming_tumbling_live_sink"
    )


@register(
    "sliding_window_counts",
    sql="""
WITH s AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - (j * INTERVAL '30 minutes') AS window_start,
         ts
  FROM events, range(0, 2) t(j)
)
SELECT window_start, COUNT(*) AS n_events
FROM s
WHERE ts < window_start + INTERVAL '1 hour' AND ts >= window_start
GROUP BY window_start
""",
)
def sliding_window_counts(spark, sf_dir):
    """Sliding windows (1 hour wide, 30-minute slide): every event
    belongs to 2 windows."""
    return EV.sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "session_windows_per_user",
    sql="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '5 minutes'
              THEN 0 ELSE 1 END AS new_sess
  FROM events
),
g AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM o
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL '5 minutes' AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM g GROUP BY user_id, sess
""",
)
def session_windows_per_user(spark, sf_dir):
    """Per-user 5-minute-gap session windows: native session_window in
    Spark ≡ gaps-and-islands in SQL (session_end = last event + gap)."""
    return EV.session_windows(load_table(spark, sf_dir, "events"))


@register(
    "streaming_stateful_user_totals",
    sql="""
SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY user_id
""",
)
def streaming_stateful_user_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState,
    keyed state + event-time timeout) run to completion with
    availableNow — with a single input batch the final per-user state
    equals the batch aggregate, so even the bespoke stateful path is
    DuckDB-oracle-checked."""
    stream = EV.read_event_stream(spark, sf_dir)
    out = EV.run_to_memory(
        EV.user_running_totals_stateful(stream),
        "streaming_stateful_sink",
        output_mode="update",
    )
    # update-mode emits one row per user per micro-batch; keep the last
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "json_props_stats",
    sql="""
SELECT event_type,
       COUNT(*) AS n,
       ROUND(AVG(json_extract(props, '$.k')::BIGINT), 4) AS avg_k,
       MAX(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type
""",
)
def json_props_stats(spark, sf_dir):
    """Semi-structured surface: JSON property extraction from the
    events props column (get_json_object → typed aggregation)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "monthly_revenue",
    sql="""
SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders GROUP BY month
""",
)
def monthly_revenue(spark, sf_dir):
    """Date-function surface: month truncation + revenue rollup."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "event_type_funnel",
    sql="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def event_type_funnel(spark, sf_dir):
    """Event-transition funnel (lead window per user) — the sequential
    pattern layer on the same stream."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
