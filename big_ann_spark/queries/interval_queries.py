"""Interval-algebra queries (SURVEY E1-E11, J7/J8, W6, F4).

The driver testdata has no interval table, so both engines derive an
identical deterministic interval set from ``orders`` key arithmetic:
``begin = (o_orderkey*7) % 1000``, ``end = begin + 1 + o_orderkey % 40``
— pure integer ops, bit-identical across engines. Half-open [begin,
end) semantics throughout (reference ``interval.py:36-54``).

Registry note (round 2): the eleven E1-E11 shapes fold into five
tagged-union registry entries so the whole interval surface fits the
driver's 50-query correctness window; each sub-shape keeps its own
operator and unit tests.
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


_ISLANDS_SQL = """
m AS (SELECT begin, "end",
        max("end") OVER (ORDER BY begin, "end"
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM ivs),
f AS (SELECT begin, "end",
        CASE WHEN prev_max IS NULL OR begin {gap_op} THEN 1 ELSE 0 END AS ni
      FROM m),
g AS (SELECT begin, "end",
        SUM(ni) OVER (ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM f)
"""


@register(
    "interval_merges",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
{_ISLANDS_SQL.format(gap_op='>= prev_max')}
, ov AS (SELECT 'merge_overlaps' AS variant, min(begin) AS begin, max("end") AS "end",
                count(*) AS n
         FROM g GROUP BY island),
ivs2 AS ({_IV_SQL}),
m2 AS (SELECT begin, "end",
        max("end") OVER (ORDER BY begin, "end"
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       FROM ivs2),
f2 AS (SELECT begin, "end",
        CASE WHEN prev_max IS NULL OR begin > prev_max + 3 THEN 1 ELSE 0 END AS ni
       FROM m2),
g2 AS (SELECT begin, "end",
        SUM(ni) OVER (ORDER BY begin, "end"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       FROM f2),
nb AS (SELECT 'merge_neighbors' AS variant, min(begin), max("end"), count(*)
       FROM g2 GROUP BY island),
eq AS (SELECT 'merge_equals' AS variant, begin, "end", count(*) AS n
       FROM ivs GROUP BY begin, "end")
SELECT * FROM ov UNION ALL SELECT * FROM nb UNION ALL SELECT * FROM eq
""",
)
def interval_merges(spark, sf_dir):
    """E5+E6+E7 folded: merge transitively-overlapping intervals
    (``intervaltree.py:645-709``), merge intervals within distance 3
    (``:770-845``), and merge identical ranges (``:710-769``) — each
    via the gaps-and-islands window, tagged (variant, begin, end, n)."""
    ivs = _intervals(spark, sf_dir).select("begin", "end")
    merged = iv.merge_islands_multi(
        ivs,
        {
            "merge_overlaps": lambda b, m: b >= m,  # strict=True gap rule
            "merge_neighbors": lambda b, m: b > m + 3,
        },
    )
    eq = (
        _intervals(spark, sf_dir)
        .groupBy("begin", "end")
        .agg(F.count("*").alias("n"))
        .select(F.lit("merge_equals").alias("variant"), "begin", "end", "n")
    )
    return merged.unionByName(eq)


@register(
    "interval_stabs",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
fixed AS (SELECT p::BIGINT AS p FROM (VALUES (5), (123), (500), (777), (999)) t(p)),
pts AS (SELECT DISTINCT o_custkey AS p FROM orders),
pq AS (SELECT 'point' AS variant, f.p, begin, "end", data
       FROM ivs JOIN fixed f ON begin <= f.p AND f.p < "end"),
binned AS (SELECT 'binned' AS variant, pts.p, begin, "end", data
           FROM ivs JOIN pts ON begin <= pts.p AND pts.p < "end"),
covered AS (SELECT 'covered' AS variant, p, NULL::BIGINT AS begin,
                   NULL::BIGINT AS "end", NULL::BIGINT AS data
            FROM pts WHERE EXISTS (SELECT 1 FROM ivs WHERE begin <= p AND p < "end"))
SELECT * FROM pq UNION ALL SELECT * FROM binned UNION ALL SELECT * FROM covered
""",
)
def interval_stabs(spark, sf_dir):
    """J7+J8 folded — the three point-stab join strategies:
    - ``point``: batched ``tree.at(p)`` (``intervaltree.py:864-883``)
      as a broadcast range join over 5 fixed probes;
    - ``binned``: the same join over ALL distinct customer keys via the
      binned equi-join rewrite (bin width 64) — shuffle hash join on
      bin + residual predicate, the big×big plan; oracle is the plain
      range join, results must be identical;
    - ``covered``: ``is_number_in_interval_tree`` membership semi-join
      (``src/util/utils.py:387-393``)."""
    ivs = _intervals(spark, sf_dir)
    fixed = spark.createDataFrame([(5,), (123,), (500,), (777,), (999,)], "p long")
    pts = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("p")
    ).distinct()
    pq = iv.point_query(ivs, fixed).select(
        F.lit("point").alias("variant"), "p", "begin", "end", "data"
    )
    binned = iv.binned_point_join(ivs, pts, bin_width=64).select(
        F.lit("binned").alias("variant"), "p", "begin", "end", "data"
    )
    covered = iv.is_point_covered(pts, ivs).select(
        F.lit("covered").alias("variant"),
        "p",
        F.lit(None).cast("long").alias("begin"),
        F.lit(None).cast("long").alias("end"),
        F.lit(None).cast("long").alias("data"),
    )
    return pq.unionByName(binned).unionByName(covered)


@register(
    "interval_algebra_counts",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
a AS (SELECT begin, "end", data FROM ivs WHERE data < 200),
b AS (SELECT begin, "end", data FROM ivs WHERE data >= 100)
SELECT
  (SELECT count(*) FROM ivs WHERE begin < 200 AND "end" > 100) AS n_overlap,
  (SELECT count(*) FROM ivs WHERE begin >= 100 AND "end" <= 200) AS n_envelop,
  (SELECT count(*) FROM ivs WHERE NOT (begin < 200 AND "end" > 100)) AS n_after_remove_overlap,
  (SELECT count(*) FROM ivs WHERE NOT (begin >= 100 AND "end" <= 200)) AS n_after_remove_envelop,
  (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_intersect,
  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_difference,
  (SELECT count(*) FROM (
     SELECT * FROM (SELECT * FROM a UNION SELECT * FROM b)
     EXCEPT SELECT * FROM (SELECT * FROM a INTERSECT SELECT * FROM b))) AS n_symmetric_difference
""",
)
def interval_algebra_counts(spark, sf_dir):
    """E1-E4 + E11 + J7 range forms folded into one summary row:
    ``overlap``/``envelop`` queries over [100, 200) and their removal
    forms (``intervaltree.py:885-939``, ``:470-494``), plus the
    interval set algebra (union/intersection/difference/symmetric
    difference, ``:346-468``) on two overlapping interval sets."""
    ivs = _intervals(spark, sf_dir)
    a = ivs.filter(F.col("data") < 200)
    b = ivs.filter(F.col("data") >= 100)
    vals = (
        iv.overlap_query(ivs, 100, 200).count(),
        iv.envelop_query(ivs, 100, 200).count(),
        iv.remove_overlap(ivs, 100, 200).count(),
        iv.remove_envelop(ivs, 100, 200).count(),
        iv.interval_union(a, b).count(),
        iv.interval_intersection(a, b).count(),
        iv.interval_difference(a, b).count(),
        iv.interval_symmetric_difference(a, b).count(),
    )
    return spark.createDataFrame(
        [vals],
        "n_overlap long, n_envelop long, n_after_remove_overlap long, "
        "n_after_remove_envelop long, n_union long, n_intersect long, "
        "n_difference long, n_symmetric_difference long",
    )


@register(
    "interval_reshape",
    sql=f"""
WITH ivs AS ({_IV_SQL}),
bounds AS (SELECT DISTINCT b FROM (SELECT begin AS b FROM ivs UNION ALL SELECT "end" FROM ivs)),
segs_raw AS (SELECT b AS s_begin, lead(b) OVER (ORDER BY b) AS s_end FROM bounds),
segs AS (SELECT * FROM segs_raw WHERE s_end IS NOT NULL),
split AS (
  SELECT 'split' AS variant, s_begin AS begin, s_end AS "end", data,
         NULL::BIGINT AS c_begin, NULL::BIGINT AS c_end, NULL::BIGINT AS c_data
  FROM ivs JOIN segs ON s_begin >= ivs.begin AND s_end <= ivs."end"
),
chop_l AS (SELECT begin, least("end", 100) AS "end", data FROM ivs WHERE begin < 100),
chop_r AS (SELECT greatest(begin, 300) AS begin, "end", data FROM ivs WHERE "end" > 300),
chop AS (
  SELECT 'chop' AS variant, begin, "end", data,
         NULL::BIGINT AS c_begin, NULL::BIGINT AS c_end, NULL::BIGINT AS c_data
  FROM (SELECT * FROM chop_l UNION ALL SELECT * FROM chop_r) WHERE begin < "end"
),
hit AS (SELECT * FROM ivs WHERE begin < 500 AND 500 < "end"),
miss AS (SELECT * FROM ivs WHERE NOT (begin < 500 AND 500 < "end")),
sl AS (
  SELECT 'slice' AS variant, begin, "end", data,
         NULL::BIGINT AS c_begin, NULL::BIGINT AS c_end, NULL::BIGINT AS c_data
  FROM (SELECT begin, "end", data FROM miss
        UNION ALL SELECT begin, 500 AS "end", data FROM hit
        UNION ALL SELECT 500 AS begin, "end", data FROM hit)
),
nested AS (
  SELECT 'nested' AS variant, p.begin, p."end", p.data,
         c.begin AS c_begin, c."end" AS c_end, c.data AS c_data
  FROM ivs p JOIN ivs c
    ON p.begin <= c.begin AND c."end" <= p."end"
   AND (p.begin != c.begin OR p."end" != c."end")
)
SELECT * FROM split UNION ALL SELECT * FROM chop
UNION ALL SELECT * FROM sl UNION ALL SELECT * FROM nested
""",
)
def interval_reshape(spark, sf_dir):
    """E8+E9+E10 folded — the interval rewriting shapes:
    - ``split``: split all intervals at all boundaries
      (``intervaltree.py:622-643``);
    - ``chop``: subtract [100, 300) from every interval, trimming
      partial overlaps (``:496-517``);
    - ``slice``: split intervals straddling point 500 (``:519-541``);
    - ``nested``: parent → strictly-contained child pairs (``:551-571``)
      as a self range-join, child in the c_* columns."""
    ivs = _intervals(spark, sf_dir)
    nulls = [
        F.lit(None).cast("long").alias(c) for c in ("c_begin", "c_end", "c_data")
    ]
    split = iv.split_overlaps(ivs, ranged=True).select(
        F.lit("split").alias("variant"), "begin", "end", "data", *nulls
    )
    chop = iv.chop(ivs, 100, 300).select(
        F.lit("chop").alias("variant"), "begin", "end", "data", *nulls
    )
    sl = iv.slice_at(ivs, 500).select(
        F.lit("slice").alias("variant"), "begin", "end", "data", *nulls
    )
    nested = iv.find_nested(ivs).select(
        F.lit("nested").alias("variant"),
        F.col("p_begin").alias("begin"),
        F.col("p_end").alias("end"),
        F.col("p_data").alias("data"),
        F.col("c_begin"),
        F.col("c_end"),
        F.col("c_data"),
    )
    return split.unionByName(chop).unionByName(sl).unionByName(nested)


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
    return iv.ids_to_intervals(ids, ranged=True)
