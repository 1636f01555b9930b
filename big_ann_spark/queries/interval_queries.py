"""Interval-algebra queries (SURVEY E1-E11, J7/J8, W6, F4).

The driver testdata has no interval table, so both engines derive an
identical deterministic interval set from ``orders`` key arithmetic:
``begin = (o_orderkey*7) % 1000``, ``end = begin + 1 + o_orderkey % 40``
— pure integer ops, bit-identical across engines. Half-open [begin,
end) semantics throughout (reference ``interval.py:36-54``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import intervals as iv
from big_ann_spark.queries import register

_IV_SQL = """
SELECT (o_orderkey * 7) % 1000 AS begin,
       (o_orderkey * 7) % 1000 + 1 + o_orderkey % 40 AS "end",
       o_orderkey AS data
FROM orders WHERE o_orderkey < 300
"""


def _intervals(spark, sf_dir, limit: int = 300):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < limit)
    return o.select(
        ((F.col("o_orderkey") * 7) % 1000).alias("begin"),
        ((F.col("o_orderkey") * 7) % 1000 + 1 + F.col("o_orderkey") % 40).alias("end"),
        F.col("o_orderkey").alias("data"),
    )


@register(
    "interval_merge_overlaps",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
m AS (SELECT begin, "end",
        max("end") OVER (ORDER BY begin, "end"
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM ivs),
f AS (SELECT begin, "end",
        CASE WHEN prev_max IS NULL OR begin >= prev_max THEN 1 ELSE 0 END AS ni
      FROM m),
g AS (SELECT begin, "end",
        SUM(ni) OVER (ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM f)
SELECT min(begin) AS begin, max("end") AS "end", count(*) AS n_merged
FROM g GROUP BY island
""",
)
def interval_merge_overlaps(spark, sf_dir):
    """E5: merge transitively-overlapping intervals
    (``intervaltree.py:645-709``) via gaps-and-islands."""
    return iv.merge_overlaps(
        _intervals(spark, sf_dir).select("begin", "end"),
        strict=True,
        data_agg=F.count("*").alias("n_merged"),
    )


@register(
    "interval_merge_neighbors",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
m AS (SELECT begin, "end",
        max("end") OVER (ORDER BY begin, "end"
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM ivs),
f AS (SELECT begin, "end",
        CASE WHEN prev_max IS NULL OR begin > prev_max + 3 THEN 1 ELSE 0 END AS ni
      FROM m),
g AS (SELECT begin, "end",
        SUM(ni) OVER (ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM f)
SELECT min(begin) AS begin, max("end") AS "end", count(*) AS n_merged
FROM g GROUP BY island
""",
)
def interval_merge_neighbors(spark, sf_dir):
    """E6: merge intervals within distance 3 (``intervaltree.py:770-845``)."""
    return iv.merge_neighbors(
        _intervals(spark, sf_dir).select("begin", "end"),
        distance=3,
        data_agg=F.count("*").alias("n_merged"),
    )


@register(
    "interval_merge_equals",
    sql=f"""
WITH ivs AS ({_IV_SQL})
SELECT begin, "end", count(*) AS n, min(data) AS min_data
FROM ivs GROUP BY begin, "end"
""",
)
def interval_merge_equals(spark, sf_dir):
    """E7: merge identical ranges, reducing data (``intervaltree.py:710-769``)."""
    return (
        _intervals(spark, sf_dir)
        .groupBy("begin", "end")
        .agg(F.count("*").alias("n"), F.min("data").alias("min_data"))
    )


@register(
    "interval_point_query",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
pts AS (SELECT p::BIGINT AS p FROM (VALUES (5), (123), (500), (777), (999)) t(p))
SELECT p, begin, "end", data
FROM ivs JOIN pts ON begin <= p AND p < "end"
""",
)
def interval_point_query(spark, sf_dir):
    """J7: batched ``tree.at(p)`` point-stab query
    (``intervaltree.py:864-883``) as a broadcast range join."""
    pts = spark.createDataFrame([(5,), (123,), (500,), (777,), (999,)], "p long")
    return iv.point_query(_intervals(spark, sf_dir), pts).select("p", "begin", "end", "data")


@register(
    "interval_point_query_binned",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
pts AS (SELECT DISTINCT o_custkey AS p FROM orders)
SELECT p, begin, "end", data
FROM ivs JOIN pts ON begin <= p AND p < "end"
""",
)
def interval_point_query_binned(spark, sf_dir):
    """J7 at scale: the same point-stab join computed via the binned
    equi-join rewrite (bin width 64) — shuffle hash join on bin +
    residual predicate instead of a nested loop. Oracle SQL is the
    plain range join: results must be identical."""
    pts = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("p")
    ).distinct()
    out = iv.binned_point_join(_intervals(spark, sf_dir), pts, bin_width=64)
    return out.select("p", "begin", "end", "data")


@register(
    "interval_overlap_envelop",
    sql=f"""
WITH ivs AS ({_IV_SQL})
SELECT
  (SELECT count(*) FROM ivs WHERE begin < 200 AND "end" > 100) AS n_overlap,
  (SELECT count(*) FROM ivs WHERE begin >= 100 AND "end" <= 200) AS n_envelop,
  (SELECT count(*) FROM ivs WHERE NOT (begin < 200 AND "end" > 100)) AS n_after_remove_overlap,
  (SELECT count(*) FROM ivs WHERE NOT (begin >= 100 AND "end" <= 200)) AS n_after_remove_envelop
""",
)
def interval_overlap_envelop(spark, sf_dir):
    """J7/E11: ``overlap``/``envelop`` range queries
    (``intervaltree.py:885-939``) and their removal forms
    (``intervaltree.py:470-494``) over [100, 200)."""
    ivs = _intervals(spark, sf_dir)
    n_o = iv.overlap_query(ivs, 100, 200).count()
    n_e = iv.envelop_query(ivs, 100, 200).count()
    n_ro = iv.remove_overlap(ivs, 100, 200).count()
    n_re = iv.remove_envelop(ivs, 100, 200).count()
    return spark.createDataFrame(
        [(n_o, n_e, n_ro, n_re)],
        "n_overlap long, n_envelop long, n_after_remove_overlap long, n_after_remove_envelop long",
    )


@register(
    "interval_covered_points",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
pts AS (SELECT DISTINCT o_custkey AS p FROM orders)
SELECT p FROM pts WHERE EXISTS (SELECT 1 FROM ivs WHERE begin <= p AND p < "end")
""",
)
def interval_covered_points(spark, sf_dir):
    """J8: ``is_number_in_interval_tree`` membership semi-join
    (``src/util/utils.py:387-393``)."""
    pts = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("p")
    ).distinct()
    return iv.is_point_covered(pts, _intervals(spark, sf_dir))


@register(
    "interval_split_overlaps",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
bounds AS (SELECT DISTINCT b FROM (SELECT begin AS b FROM ivs UNION ALL SELECT "end" FROM ivs)),
segs_raw AS (SELECT b AS s_begin, lead(b) OVER (ORDER BY b) AS s_end FROM bounds),
segs AS (SELECT * FROM segs_raw WHERE s_end IS NOT NULL)
SELECT s_begin AS begin, s_end AS "end", data
FROM ivs JOIN segs ON s_begin >= ivs.begin AND s_end <= ivs."end"
""",
)
def interval_split_overlaps(spark, sf_dir):
    """E8: split all intervals at all boundaries (``intervaltree.py:622-643``)."""
    return iv.split_overlaps(_intervals(spark, sf_dir))


@register(
    "interval_chop",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
l AS (SELECT begin, least("end", 100) AS "end", data FROM ivs WHERE begin < 100),
r AS (SELECT greatest(begin, 300) AS begin, "end", data FROM ivs WHERE "end" > 300)
SELECT * FROM (SELECT * FROM l UNION ALL SELECT * FROM r) WHERE begin < "end"
""",
)
def interval_chop(spark, sf_dir):
    """E9: subtract [100, 300) from every interval, trimming partial
    overlaps (``intervaltree.py:496-517``)."""
    return iv.chop(_intervals(spark, sf_dir), 100, 300)


@register(
    "interval_slice",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
hit AS (SELECT * FROM ivs WHERE begin < 500 AND 500 < "end"),
miss AS (SELECT * FROM ivs WHERE NOT (begin < 500 AND 500 < "end"))
SELECT begin, "end", data FROM miss
UNION ALL SELECT begin, 500 AS "end", data FROM hit
UNION ALL SELECT 500 AS begin, "end", data FROM hit
""",
)
def interval_slice(spark, sf_dir):
    """E9b: ``slice(point)`` — split intervals straddling point 500
    (``intervaltree.py:519-541``)."""
    return iv.slice_at(_intervals(spark, sf_dir), 500)


@register(
    "interval_find_nested",
    sql=f"""
WITH ivs AS ({_IV_SQL})
SELECT a.begin AS p_begin, a."end" AS p_end, a.data AS p_data,
       b.begin AS c_begin, b."end" AS c_end, b.data AS c_data
FROM ivs a JOIN ivs b
  ON a.begin <= b.begin AND b."end" <= a."end"
 AND (a.begin != b.begin OR a."end" != b."end")
""",
)
def interval_find_nested(spark, sf_dir):
    """E10: parent → strictly-contained child pairs
    (``intervaltree.py:551-571``) as a self range-join."""
    return iv.find_nested(_intervals(spark, sf_dir))


@register(
    "interval_set_ops",
    sql=f"""
WITH a AS (SELECT begin, "end", data FROM ({_IV_SQL}) WHERE data < 200),
b AS (SELECT begin, "end", data FROM ({_IV_SQL}) WHERE data >= 100)
SELECT
  (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_intersect,
  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_difference,
  (SELECT count(*) FROM (
     SELECT * FROM (SELECT * FROM a UNION SELECT * FROM b)
     EXCEPT SELECT * FROM (SELECT * FROM a INTERSECT SELECT * FROM b))) AS n_symmetric_difference
""",
)
def interval_set_ops(spark, sf_dir):
    """E1-E4: interval set algebra (``intervaltree.py:346-468``) on two
    overlapping interval sets."""
    ivs = _intervals(spark, sf_dir)
    a = ivs.filter(F.col("data") < 200)
    b = ivs.filter(F.col("data") >= 100)
    n_u = iv.interval_union(a, b).count()
    n_i = iv.interval_intersection(a, b).count()
    n_d = iv.interval_difference(a, b).count()
    n_s = iv.interval_symmetric_difference(a, b).count()
    return spark.createDataFrame(
        [(n_u, n_i, n_d, n_s)],
        "n_union long, n_intersect long, n_difference long, n_symmetric_difference long",
    )


@register(
    "ids_to_intervals",
    sql="""
WITH ids AS (SELECT DISTINCT event_id AS id FROM events WHERE user_id < 25),
g AS (SELECT id, id - row_number() OVER (ORDER BY id) AS grp FROM ids)
SELECT min(id) AS begin, max(id) AS "end" FROM g GROUP BY grp
""",
)
def ids_to_intervals_q(spark, sf_dir):
    """W6: consecutive-id runs → intervals — the reference's
    gaps-and-islands ``get_intervals`` (``src/util/utils.py:343-360``)."""
    ids = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 25)
        .select(F.col("event_id").alias("id"))
        .distinct()
    )
    return iv.ids_to_intervals(ids)
