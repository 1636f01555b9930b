"""Relational surface over the TPC-H-ish star schema.

The reference has no general relational operators (SURVEY §2.3/§2.4
"absent" notes); these queries declare the standard Spark surface —
scans, filters, hash/broadcast joins, semi/anti joins, aggregations,
rollup/cube, windows, set ops, distinct — that the engine's vector
operators compose with. All native DataFrame API; Catalyst picks
physical strategies (broadcast for dims, sort-merge for fact-fact,
AQE for skew).
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
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


@register(
    "q5_local_supplier_volume",
    sql="""
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join — Catalyst broadcasts every dim
    table; only orders⋈lineitem shuffles."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


@register(
    "semi_anti_join_customers",
    sql="""
SELECT
  (SELECT COUNT(*) FROM customer c WHERE EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
""",
)
def semi_anti_join_customers(spark, sf_dir):
    """Left-semi + left-anti joins (the reference's processed-point
    bitmap filter P3, ``shard_by_distance.py:93,205``, is exactly an
    anti-join against assigned ids)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "leftsemi").count()
    without = c.join(o, c.c_custkey == o.o_custkey, "leftanti").count()
    return spark.createDataFrame(
        [(with_orders, without)], "n_with_orders long, n_without_orders long"
    )


@register(
    "rollup_order_stats",
    sql="""
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
)
def rollup_order_stats(spark, sf_dir):
    """Grouping-sets surface: ROLLUP over order status/priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "cube_lineitem_flags",
    sql="""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)
def cube_lineitem_flags(spark, sf_dir):
    """Grouping-sets surface, CUBE variant (all 2^2 grouping sets)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "window_top_orders_per_cust",
    sql="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rk::INTEGER AS rank
FROM r WHERE rk <= 3
""",
)
def window_top_orders_per_cust(spark, sf_dir):
    """W1 generalization: top-3 orders per customer by price
    (WindowGroupLimit partial top-k)."""
    from big_ann_spark.operators.topk import top_k_per_group

    o = load_table(spark, sf_dir, "orders")
    out = top_k_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rank"
    )


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
    "set_ops_part_types",
    sql="""
SELECT
  (SELECT COUNT(*) FROM (
     SELECT p_type FROM part WHERE p_size > 25
     INTERSECT SELECT p_type FROM part WHERE p_retailprice > 1500)) AS n_intersect,
  (SELECT COUNT(*) FROM (
     SELECT p_type FROM part WHERE p_size > 25
     EXCEPT SELECT p_type FROM part WHERE p_retailprice > 1500)) AS n_except,
  (SELECT COUNT(*) FROM (
     SELECT p_type FROM part WHERE p_size > 25
     UNION SELECT p_type FROM part WHERE p_retailprice > 1500)) AS n_union
""",
)
def set_ops_part_types(spark, sf_dir):
    """Relational set ops (SURVEY §2.6 note): INTERSECT / EXCEPT /
    UNION DISTINCT on projected columns."""
    p = load_table(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") > 25).select("p_type")
    b = p.filter(F.col("p_retailprice") > 1500).select("p_type")
    n_i = a.intersect(b).count()
    n_e = a.subtract(b).count()
    n_u = a.union(b).distinct().count()
    return spark.createDataFrame(
        [(n_i, n_e, n_u)], "n_intersect long, n_except long, n_union long"
    )


@register(
    "q6_forecast_revenue",
    sql="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + multi-predicate filter + agg — the
    predicate-pushdown showcase (all four filters reach the parquet
    scan as PushedFilters)."""
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
    from pyspark.sql import Window

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
    "q17_small_quantity_revenue",
    sql="""
WITH pa AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.half_avg_qty
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average (decorrelated to a
    self-aggregation join — exactly what Catalyst does to the scalar
    subquery form)."""
    l = load_table(spark, sf_dir, "lineitem")
    pa = l.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        l.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
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
        l.join(big, "l_orderkey", "leftsemi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
    "q4_order_priority",
    sql="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS (→ left-semi join) + agg."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "leftsemi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q16_supplier_part_counts",
    sql="""
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (5, 10, 15, 20) AND p.p_brand <> 'Brand#1'
GROUP BY p.p_brand, p.p_type
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: filtered dim join + COUNT(DISTINCT) per group."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 10, 15, 20) & (F.col("p_brand") != "Brand#1")
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "window_rank_functions",
    sql="""
SELECT c_mktsegment, c_custkey,
       ROUND(c_acctbal, 2) AS c_acctbal,
       ntile(4) OVER w AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS dense_rnk
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def window_rank_functions(spark, sf_dir):
    """Ranking-function window surface: ntile / percent_rank / rank /
    dense_rank per market segment."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
    )


@register(
    "distinct_counts",
    sql="""
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
)
def distinct_counts(spark, sf_dir):
    """Multi-column distinct aggregation (expand + two-phase agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
