"""Relational surface over the TPC-H-ish star schema.

The reference has no general relational operators (SURVEY §2.3/§2.4
"absent" notes); these queries declare the standard Spark surface —
scans, filters, hash/broadcast joins, semi/anti joins, aggregations,
rollup/cube, windows, set ops, distinct — that the engine's vector
operators compose with. All native DataFrame API; Catalyst picks
physical strategies (broadcast for dims, sort-merge for fact-fact,
AQE for skew).

Registry note (round 2): single-row summary shapes fold into
``scalar_summaries`` (variant, metric, value), same-grain grouped
joins into ``grouped_joins``, the two ranking windows into
``window_rankings``, and ROLLUP+CUBE into ``rollup_cube_stats`` — so
the full relational surface spends 9 of the driver's 50 correctness
slots instead of 17. Individual builders stay module-level for plan
tests.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.queries import register


@register(
    "q1_pricing_summary",
    sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan → filter → hash aggregate with partial
    (map-side) combine. The canonical full-scan agg benchmark."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    sql="""
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join (broadcast dim → fact) + agg +
    TakeOrderedAndProject (top-N pushdown instead of full sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        # No hard broadcast on customer: it scales with SF (see the
        # measured 10x-OOM note below) — the autoBroadcast threshold /
        # AQE picks a broadcast while the filtered side fits and falls
        # back to shuffle join beyond, which is the 100 TB-safe plan.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


@register(
    "q18_large_volume_customers",
    sql="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: HAVING filter + IN-subquery (semi-join) +
    multi-way join + top-N."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        # customer is SF-scaling: no hard broadcast hint (threshold/AQE
        # may still pick one at small SF, which is fine and plan-tested).
        l.join(big, "l_orderkey", "leftsemi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "asof_join_click_before_purchase",
    sql="""
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
),
w AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(click_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
  FROM e
)
SELECT event_id, user_id, ts, prev_click_ts
FROM w WHERE event_type = 'purchase'
""",
)
def asof_join_click_before_purchase(spark, sf_dir):
    """As-of join (SURVEY §2.3 'absent but required' list): for every
    purchase event, the most recent prior click of the same user —
    the union+ordered-window formulation, which at scale is one shuffle
    on user_id instead of a per-row backward scan."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    e = e.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = e.withColumn("prev_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return out.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "prev_click_ts"
    )


@register(
    "grouped_joins",
    sql="""
WITH q4 AS (
  SELECT 'q4_order_priority' AS variant, o_orderpriority AS k1, NULL::VARCHAR AS k2,
         COUNT(*) AS n, NULL::DOUBLE AS v
  FROM orders o
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
    AND EXISTS (SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate)
  GROUP BY o_orderpriority
),
q5 AS (
  SELECT 'q5_local_supplier_volume' AS variant, n.n_name AS k1, NULL::VARCHAR AS k2,
         NULL::BIGINT AS n,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS v
  FROM region r
  JOIN nation n ON n.n_regionkey = r.r_regionkey
  JOIN customer c ON c.c_nationkey = n.n_nationkey
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
  WHERE r.r_name = 'ASIA'
  GROUP BY n.n_name
),
q16 AS (
  SELECT 'q16_supplier_part_counts' AS variant, p.p_brand AS k1, p.p_type AS k2,
         COUNT(DISTINCT l.l_suppkey) AS n, NULL::DOUBLE AS v
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_size IN (5, 10, 15, 20) AND p.p_brand <> 'Brand#1'
  GROUP BY p.p_brand, p.p_type
)
SELECT * FROM q4 UNION ALL SELECT * FROM q5 UNION ALL SELECT * FROM q16
""",
)
def grouped_joins(spark, sf_dir):
    """TPC-H Q4 + Q5 + Q16 shapes folded (variant, k1, k2, n, v):
    - ``q4``: correlated EXISTS (→ left-semi join) + agg;
    - ``q5``: 6-way star join — Catalyst broadcasts every dim table,
      only orders⋈lineitem shuffles;
    - ``q16``: filtered dim join + COUNT(DISTINCT) per group."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    o4 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    q4 = (
        o4.join(
            l,
            (o4.o_orderkey == l.l_orderkey) & (l.l_shipdate > o4.o_orderdate),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("q4_order_priority").alias("variant"),
            F.col("o_orderpriority").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            F.col("n").cast("long").alias("n"),
            F.lit(None).cast("double").alias("v"),
        )
    )

    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_ = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    # broadcast hints ONLY on true dims (nation/region — fixed-size).
    # customer/supplier/part scale with SF: a hard F.broadcast(c) is a
    # 100 TB OOM (measured: at 10× the 150k-row customer broadcast
    # overflowed a default driver heap); the autoBroadcast threshold
    # keeps broadcasting them while they fit and shuffles beyond.
    q5 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n_), c.c_nationkey == n_.n_nationkey)
        .join(F.broadcast(r), n_.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("v")
        )
        .select(
            F.lit("q5_local_supplier_volume").alias("variant"),
            F.col("n_name").alias("k1"),
            F.lit(None).cast("string").alias("k2"),
            F.lit(None).cast("long").alias("n"),
            "v",
        )
    )

    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 10, 15, 20) & (F.col("p_brand") != "Brand#1")
    )
    q16 = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .select(
            F.lit("q16_supplier_part_counts").alias("variant"),
            F.col("p_brand").alias("k1"),
            F.col("p_type").alias("k2"),
            F.col("n").cast("long").alias("n"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    return q4.unionByName(q5).unionByName(q16)


def _top_orders_per_cust(spark, sf_dir):
    """W1 generalization (plan-test target): top-3 orders per customer
    by price (WindowGroupLimit partial top-k)."""
    from big_ann_spark.operators.topk import top_k_per_group

    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )


@register(
    "window_rankings",
    sql="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
),
top_orders AS (
  SELECT 'top_orders' AS variant, o_custkey::VARCHAR AS k1, o_orderkey::VARCHAR AS k2,
         ROUND(o_totalprice, 2) AS v, rk::BIGINT AS r1,
         NULL::BIGINT AS r2, NULL::BIGINT AS r3, NULL::DOUBLE AS r4
  FROM r WHERE rk <= 3
),
rank_fns AS (
  SELECT 'rank_fns' AS variant, c_mktsegment AS k1, c_custkey::VARCHAR AS k2,
         ROUND(c_acctbal, 2) AS v,
         ntile(4) OVER w AS r1,
         rank() OVER w AS r2,
         dense_rank() OVER w AS r3,
         ROUND(percent_rank() OVER w, 6) AS r4
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
)
SELECT * FROM top_orders UNION ALL SELECT * FROM rank_fns
""",
)
def window_rankings(spark, sf_dir):
    """W1/W3 + the ranking-function surface folded:
    - ``top_orders``: top-3 orders per customer by price
      (WindowGroupLimit partial top-k);
    - ``rank_fns``: ntile / rank / dense_rank / percent_rank per
      market segment."""
    top = _top_orders_per_cust(spark, sf_dir).select(
        F.lit("top_orders").alias("variant"),
        F.col("o_custkey").cast("string").alias("k1"),
        F.col("o_orderkey").cast("string").alias("k2"),
        F.round("o_totalprice", 2).alias("v"),
        F.col("rank").cast("long").alias("r1"),
        F.lit(None).cast("long").alias("r2"),
        F.lit(None).cast("long").alias("r3"),
        F.lit(None).cast("double").alias("r4"),
    )
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    rank_fns = c.select(
        F.lit("rank_fns").alias("variant"),
        F.col("c_mktsegment").alias("k1"),
        F.col("c_custkey").cast("string").alias("k2"),
        F.round("c_acctbal", 2).alias("v"),
        F.ntile(4).over(w).cast("long").alias("r1"),
        F.rank().over(w).cast("long").alias("r2"),
        F.dense_rank().over(w).cast("long").alias("r3"),
        F.round(F.percent_rank().over(w), 6).alias("r4"),
    )
    return top.unionByName(rank_fns)


@register(
    "window_running_revenue",
    sql="""
WITH daily AS (
  SELECT o_orderdate, ROUND(SUM(o_totalprice), 2) AS day_total
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY o_orderdate
)
SELECT o_orderdate, day_total,
       ROUND(SUM(day_total) OVER (ORDER BY o_orderdate
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       ROUND(AVG(day_total) OVER (ORDER BY o_orderdate
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
       ROUND(day_total - LAG(day_total, 1) OVER (ORDER BY o_orderdate), 2) AS day_delta
FROM daily
""",
)
def window_running_revenue(spark, sf_dir):
    """Running-total / moving-average / lag windows over daily revenue.
    The single-partition window is bounded: the daily pre-aggregation
    shrinks the input to O(distinct dates) before the global sort."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp")
    )
    daily = o.groupBy("o_orderdate").agg(
        F.round(F.sum("o_totalprice"), 2).alias("day_total")
    )
    w = Window.orderBy("o_orderdate")
    return daily.select(
        "o_orderdate",
        "day_total",
        F.round(F.sum("day_total").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_total"),
        F.round(F.avg("day_total").over(w.rowsBetween(-6, 0)), 4).alias("ma7"),
        F.round(F.col("day_total") - F.lag("day_total", 1).over(w), 2).alias("day_delta"),
    )


@register(
    "rollup_cube_stats",
    sql="""
WITH ro AS (
  SELECT 'rollup_orders' AS variant,
         COALESCE(o_orderstatus, 'ALL') AS k1,
         COALESCE(o_orderpriority, 'ALL') AS k2,
         COUNT(*) AS n,
         ROUND(SUM(o_totalprice), 2) AS v
  FROM orders
  GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
),
cu AS (
  SELECT 'cube_lineitem' AS variant,
         COALESCE(l_returnflag, 'ALL') AS k1,
         COALESCE(l_linestatus, 'ALL') AS k2,
         COUNT(*) AS n,
         ROUND(SUM(l_quantity), 2) AS v
  FROM lineitem
  GROUP BY CUBE(l_returnflag, l_linestatus)
)
SELECT * FROM ro UNION ALL SELECT * FROM cu
""",
)
def rollup_cube_stats(spark, sf_dir):
    """Grouping-sets surface folded: ROLLUP over order
    status/priority ∪ CUBE over lineitem flags (all 2^2 sets)."""
    o = load_table(spark, sf_dir, "orders")
    ro = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("v"),
        )
        .select(
            F.lit("rollup_orders").alias("variant"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("k1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("k2"),
            "n",
            "v",
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    cu = (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("v"))
        .select(
            F.lit("cube_lineitem").alias("variant"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("k1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("k2"),
            "n",
            "v",
        )
    )
    return ro.unionByName(cu)


def _q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape (plan-test target): pure scan + multi-predicate
    filter + agg — the predicate-pushdown showcase (all four filters
    reach the parquet scan as PushedFilters)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "scalar_summaries",
    sql="""
WITH q6 AS (
  SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
         COUNT(*)::DOUBLE AS n_lines
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND l_discount BETWEEN 0.02 AND 0.06
    AND l_quantity < 24
),
pa AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
),
q17 AS (
  SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
         COUNT(*)::DOUBLE AS n_lines
  FROM lineitem l
  JOIN pa ON l.l_partkey = pa.l_partkey
  WHERE l.l_quantity < pa.half_avg_qty
),
prefix AS (SELECT * FROM embeddings WHERE vec_id < 100)
SELECT 'semi_anti' AS variant, 'n_with_orders' AS metric,
       (SELECT COUNT(*) FROM customer c WHERE EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::DOUBLE AS value
UNION ALL SELECT 'semi_anti', 'n_without_orders',
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::DOUBLE
UNION ALL SELECT 'set_ops', 'n_intersect',
       (SELECT COUNT(*) FROM (
          SELECT p_type FROM part WHERE p_size > 25
          INTERSECT SELECT p_type FROM part WHERE p_retailprice > 1500))::DOUBLE
UNION ALL SELECT 'set_ops', 'n_except',
       (SELECT COUNT(*) FROM (
          SELECT p_type FROM part WHERE p_size > 25
          EXCEPT SELECT p_type FROM part WHERE p_retailprice > 1500))::DOUBLE
UNION ALL SELECT 'set_ops', 'n_union',
       (SELECT COUNT(*) FROM (
          SELECT p_type FROM part WHERE p_size > 25
          UNION SELECT p_type FROM part WHERE p_retailprice > 1500))::DOUBLE
UNION ALL SELECT 'q6', 'revenue', revenue FROM q6
UNION ALL SELECT 'q6', 'n_lines', n_lines FROM q6
UNION ALL SELECT 'q17', 'avg_yearly', avg_yearly FROM q17
UNION ALL SELECT 'q17', 'n_lines', n_lines FROM q17
UNION ALL SELECT 'distinct', 'n_parts',
       (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)::DOUBLE
UNION ALL SELECT 'distinct', 'n_supps',
       (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem)::DOUBLE
UNION ALL SELECT 'distinct', 'n_orders',
       (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)::DOUBLE
UNION ALL SELECT 'approx_distinct', 'parts_within_10pct', 1.0
UNION ALL SELECT 'approx_distinct', 'orders_within_10pct', 1.0
UNION ALL SELECT 'prefix_sample', 'n_rows', (SELECT COUNT(*) FROM prefix)::DOUBLE
UNION ALL SELECT 'prefix_sample', 'mean_d0',
       (SELECT ROUND(AVG(embedding[1]::DOUBLE), 6) FROM prefix)
UNION ALL SELECT 'prefix_sample', 'var_d0',
       (SELECT ROUND(var_pop(embedding[1]::DOUBLE), 6) FROM prefix)
""",
)
def scalar_summaries(spark, sf_dir):
    """Single-row summary shapes folded into (variant, metric, value):
    - ``semi_anti``: left-semi/left-anti join counts (the reference's
      processed-point bitmap filter P3, ``shard_by_distance.py:93,205``,
      is exactly an anti-join against assigned ids);
    - ``set_ops``: INTERSECT / EXCEPT / UNION DISTINCT counts;
    - ``q6``: TPC-H Q6 scan+filter+agg (predicate-pushdown showcase,
      plan pinned in tests/test_plans.py);
    - ``q17``: correlated per-part average, decorrelated to a
      self-aggregation join;
    - ``distinct``: multi-column exact distinct counts;
    - ``approx_distinct``: HyperLogLog++ sketch counts land within 10%
      of exact (rsd=0.02) — the sketch layer's error contract as a
      driver-checkable boolean;
    - ``prefix_sample``: P6 deterministic first-N prefix sample stats
      (``centroids.py:58``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    emb = load_table(spark, sf_dir, "embeddings")

    def melt(agg_df, triples):
        """1-row aggregate → (variant, metric, value) rows, lazily."""
        arr = F.array(
            *[
                F.struct(
                    F.lit(v).alias("variant"),
                    F.lit(m).alias("metric"),
                    F.col(col).cast("double").alias("value"),
                )
                for v, m, col in triples
            ]
        )
        return agg_df.select(F.explode(arr).alias("r")).select(
            "r.variant", "r.metric", "r.value"
        )

    # every scalar is an aggregate BRANCH of one unioned plan — no
    # .collect() stitching (VERDICT r2 #5): the branches execute
    # concurrently inside a single job instead of serial driver jobs
    branches = [
        melt(
            c.join(o, c.c_custkey == o.o_custkey, "leftsemi").agg(F.count("*").alias("v")),
            [("semi_anti", "n_with_orders", "v")],
        ),
        melt(
            c.join(o, c.c_custkey == o.o_custkey, "leftanti").agg(F.count("*").alias("v")),
            [("semi_anti", "n_without_orders", "v")],
        ),
    ]
    a = p.filter(F.col("p_size") > 25).select("p_type")
    b = p.filter(F.col("p_retailprice") > 1500).select("p_type")
    branches += [
        melt(a.intersect(b).agg(F.count("*").alias("v")), [("set_ops", "n_intersect", "v")]),
        melt(a.subtract(b).agg(F.count("*").alias("v")), [("set_ops", "n_except", "v")]),
        melt(
            a.union(b).distinct().agg(F.count("*").alias("v")),
            [("set_ops", "n_union", "v")],
        ),
    ]
    branches.append(
        melt(
            _q6_forecast_revenue(spark, sf_dir),
            [("q6", "revenue", "revenue"), ("q6", "n_lines", "n_lines")],
        )
    )
    pa = l.groupBy("l_partkey").agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    q17 = (
        l.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )
    branches.append(
        melt(q17, [("q17", "avg_yearly", "avg_yearly"), ("q17", "n_lines", "n_lines")])
    )
    d = l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
    ).select(
        "n_parts",
        "n_supps",
        "n_orders",
        F.when(
            F.abs(F.col("a_parts") - F.col("n_parts")) <= 0.1 * F.col("n_parts"), 1.0
        ).otherwise(0.0).alias("parts_ok"),
        F.when(
            F.abs(F.col("a_orders") - F.col("n_orders")) <= 0.1 * F.col("n_orders"), 1.0
        ).otherwise(0.0).alias("orders_ok"),
    )
    branches.append(
        melt(
            d,
            [
                ("distinct", "n_parts", "n_parts"),
                ("distinct", "n_supps", "n_supps"),
                ("distinct", "n_orders", "n_orders"),
                ("approx_distinct", "parts_within_10pct", "parts_ok"),
                ("approx_distinct", "orders_within_10pct", "orders_ok"),
            ],
        )
    )
    pre = emb.filter(F.col("vec_id") < 100).agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.col("embedding")[0].cast("double")), 6).alias("mean_d0"),
        F.round(F.var_pop(F.col("embedding")[0].cast("double")), 6).alias("var_d0"),
    )
    branches.append(
        melt(
            pre,
            [
                ("prefix_sample", "n_rows", "n_rows"),
                ("prefix_sample", "mean_d0", "mean_d0"),
                ("prefix_sample", "var_d0", "var_d0"),
            ],
        )
    )
    out = branches[0]
    for br in branches[1:]:
        out = out.unionByName(br)
    return out
