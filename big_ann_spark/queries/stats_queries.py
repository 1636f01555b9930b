"""Dataset-statistics queries over the embeddings table.

Reference surface (SURVEY §2.4): per-dimension variance (A5,
``variance.py:90,102-107``), per-dimension entropy (A6,
``utils.py:238-245``), variance-of-union pair stats (A7,
``variance.py:112-135``), correlation matrix + VIF (A8/A9,
``multicollinearity.py:92-131``), two-sample Kolmogorov-Smirnov —
single pair and all-pairs matrix (A10, ``komolgorovsmirnov.py:84-113``),
Anderson-Darling (A11, ``variance.py:109``), log-histogram (A13,
``distributions.py:4-8``), stat-threshold predicates (P5) and the
greedy buddy ordering (W4, ``network_blended.py:83-106``).

Spark-first: every statistic is a two-level hash aggregate over
``posexplode(vec)`` — map-side partial aggregation makes these a single
scan + tiny shuffle (64 groups), which is exactly the plan that holds
at 100 TB. The reference computes them dimension-at-a-time over an
in-memory matrix with an ``assert sample_size <= 100000`` cost guard
(``variance.py:84``); here there is no sample-size ceiling.

Registry note (round 2): per-dim metrics fold into tagged unions so
every statistic keeps a row inside the driver's 50-query correctness
window, and the formerly rows-only checks (VIF, Anderson-Darling, KS
matrix) now carry real oracles: VIF on 3 dims against the closed-form
3×3 inverse, A-D with the logistic CDF (elementary terms — SQL can
reproduce them; the normal variant stays numpy-verified in tests), KS
matrix against a per-pair ECDF window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.queries import register

DIM = 64


def _dims(spark, sf_dir):
    """(vec_id, pos, val) exploded view of embeddings, val as double."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )


@register(
    "per_dim_profile",
    sql=f"""
WITH base AS (
  SELECT i::INTEGER AS pos, embedding[i+1]::DOUBLE AS val
  FROM embeddings, range(0, {DIM}) t(i)
),
v AS (SELECT pos, var_pop(val) AS variance, avg(val) AS mean,
             min(val) AS min_val, max(val) AS max_val
      FROM base GROUP BY pos),
buck AS (SELECT pos, ROUND(val, 1) AS bucket FROM base),
counts AS (SELECT pos, bucket, COUNT(*)::DOUBLE AS c FROM buck GROUP BY pos, bucket),
tot AS (SELECT pos, SUM(c) AS n FROM counts GROUP BY pos),
ent AS (SELECT counts.pos, -SUM((c/n) * ln(c/n)) AS entropy
        FROM counts JOIN tot ON counts.pos = tot.pos GROUP BY counts.pos),
thr AS (SELECT quantile_cont(variance, 0.75)::DOUBLE AS p75 FROM v)
SELECT pos, 'variance' AS metric, ROUND(variance, 6) AS value FROM v
UNION ALL SELECT pos, 'mean', ROUND(mean, 6) FROM v
UNION ALL SELECT pos, 'min', ROUND(min_val, 6) FROM v
UNION ALL SELECT pos, 'max', ROUND(max_val, 6) FROM v
UNION ALL SELECT pos, 'entropy', ROUND(entropy, 6) FROM ent
UNION ALL SELECT pos, 'high_variance', ROUND(variance, 6) FROM v, thr WHERE variance > p75
""",
)
def per_dim_profile(spark, sf_dir):
    """A5 + A6 + P5 + P1 folded: per-dimension variance/mean/min/max
    (reference ``variance.py:102-107``), Shannon entropy of the
    1-decimal-bucketed value distribution (``utils.py:238-245``), and
    the stat-threshold predicate — dims whose variance exceeds the 75th
    percentile (the ``A[i,j] > p75`` edge filter,
    ``network_blended.py:86-92``) — as (pos, metric, value) rows."""
    d = _dims(spark, sf_dir)
    v = d.groupBy("pos").agg(
        F.var_pop("val").alias("variance"),
        F.avg("val").alias("mean"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )

    def tag(col, name):
        return v.select("pos", F.lit(name).alias("metric"), F.round(col, 6).alias("value"))

    vals = d.select("pos", F.round("val", 1).alias("bucket"))
    counts = vals.groupBy("pos", "bucket").agg(F.count("*").cast("double").alias("c"))
    tot = counts.groupBy("pos").agg(F.sum("c").alias("n"))
    p = counts.join(tot, "pos").select("pos", (F.col("c") / F.col("n")).alias("p"))
    ent = (
        p.groupBy("pos")
        .agg((-F.sum(F.col("p") * F.log("p"))).alias("entropy"))
        .select("pos", F.lit("entropy").alias("metric"), F.round("entropy", 6).alias("value"))
    )
    thr = v.agg(F.percentile("variance", F.lit(0.75)).alias("p75"))
    high = (
        v.crossJoin(thr)
        .filter(F.col("variance") > F.col("p75"))
        .select("pos", F.lit("high_variance").alias("metric"), F.round("variance", 6).alias("value"))
    )
    return (
        tag(F.col("variance"), "variance")
        .unionByName(tag(F.col("mean"), "mean"))
        .unionByName(tag(F.col("min_val"), "min"))
        .unionByName(tag(F.col("max_val"), "max"))
        .unionByName(ent)
        .unionByName(high)
    )


@register(
    "dim_pair_stats",
    sql="""
WITH pairs AS (SELECT a.i::INTEGER AS pos_i, b.j::INTEGER AS pos_j
               FROM range(0, 8) a(i), range(0, 8) b(j) WHERE a.i < b.j),
v AS (
  SELECT p.pos_i, p.pos_j, embedding[p.pos_i+1]::DOUBLE AS x, 0 AS grp
  FROM embeddings, pairs p
  UNION ALL
  SELECT p.pos_i, p.pos_j, embedding[p.pos_j+1]::DOUBLE, 1
  FROM embeddings, pairs p
),
cnt AS (SELECT pos_i, pos_j,
               COUNT(*) FILTER (WHERE grp = 0)::DOUBLE AS n0,
               COUNT(*) FILTER (WHERE grp = 1)::DOUBLE AS n1
        FROM v GROUP BY 1, 2),
e AS (
  SELECT pos_i, pos_j, x,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY pos_i, pos_j ORDER BY x
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY pos_i, pos_j ORDER BY x
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1
  FROM v
),
ksm AS (
  SELECT e.pos_i, e.pos_j, ROUND(MAX(ABS(c0 / cnt.n0 - c1 / cnt.n1)), 6) AS ks
  FROM e JOIN cnt ON e.pos_i = cnt.pos_i AND e.pos_j = cnt.pos_j
  GROUP BY e.pos_i, e.pos_j
),
s AS (
  SELECT i::INTEGER AS pos,
         SUM(embedding[i+1]::DOUBLE) AS sm,
         SUM((embedding[i+1]::DOUBLE) * (embedding[i+1]::DOUBLE)) AS ssq,
         COUNT(*)::DOUBLE AS n
  FROM embeddings, range(0, 8) t(i)
  GROUP BY pos
)
SELECT 'ks_window' AS variant, pos_i, pos_j, ks AS stat FROM ksm
UNION ALL
SELECT 'ks_ranged', pos_i, pos_j, ks FROM ksm WHERE pos_i = 0 AND pos_j = 1
UNION ALL
SELECT 'union_var', a.pos, b.pos,
       ROUND((a.ssq + b.ssq) / (a.n + b.n)
             - ((a.sm + b.sm) / (a.n + b.n)) * ((a.sm + b.sm) / (a.n + b.n)), 6)
FROM s a JOIN s b ON a.pos < b.pos
""",
)
def dim_pair_stats(spark, sf_dir):
    """A7+A10 tagged union over dimension pairs (one registry slot —
    the driver checks the first 50 entries, so same-shaped pair stats
    consolidate; schema (variant, pos_i, pos_j, stat)):
    - ``ks_window``: all-pairs two-sample KS over the first 8 dims — 28
      independent Arrow group tasks (reference sequential double loop,
      ``komolgorovsmirnov.py:84-113``); exact count/n ECDF ratios
      hash-match the SQL window form bit-for-bit.
    - ``ks_ranged``: the SAME (0,1) statistic via the range-binned
      two-pass ECDF (operators.stats.ks_two_sample, ranged=True — no
      global sort anywhere); equality with the window value in one
      hash is exactly the equivalence the 100 TB path needs.
    - ``union_var``: the reference's "covariance" (``variance.py:
      112-135``: np.var of two concatenated dim columns) via combined
      sufficient statistics, 28 pairs."""
    from big_ann_spark.operators.stats import ks_matrix, ks_two_sample

    emb = load_table(spark, sf_dir, "embeddings")
    # ranged=False = the documented 28-Arrow-task small-d fast path
    # (bit-identical to the ranged form — integer count ECDFs); the
    # ranged two-pass stays certified by the ks_ranged variant below.
    # r14 re-measured the choice: warm A/B at sf0.1 gives arrow 1.03 s
    # vs ranged 2.27 s (the ranged form pays a 1.1M-row per-(pair,bin)
    # RANGE window; the Arrow tasks amortize worker startup when warm),
    # so the Arrow form stays.
    ks_w = ks_matrix(emb, dims=8, ranged=False).select(
        F.lit("ks_window").alias("variant"),
        "pos_i",
        "pos_j",
        F.round("ks_stat", 6).alias("stat"),
    )
    v = emb.select(F.col("embedding")[0].cast("double").alias("x"), F.lit(0).alias("grp")).union(
        emb.select(F.col("embedding")[1].cast("double").alias("x"), F.lit(1).alias("grp"))
    )
    # lazy_counts (r14): both groups are embedding dims of a non-empty
    # table, so the eager empty-group guard buys nothing here and its
    # collect was a serial driver job per build
    ks_r = ks_two_sample(v, ranged=True, lazy_counts=True).select(
        F.lit("ks_ranged").alias("variant"),
        F.lit(0).alias("pos_i"),
        F.lit(1).alias("pos_j"),
        F.round("ks_stat", 6).alias("stat"),
    )
    d = _dims(spark, sf_dir).filter(F.col("pos") < 8)
    s = d.groupBy("pos").agg(
        F.sum("val").alias("sm"),
        F.sum(F.col("val") * F.col("val")).alias("ssq"),
        F.count("*").cast("double").alias("n"),
    )
    a, b = s.alias("a"), s.alias("b")
    n = F.col("a.n") + F.col("b.n")
    mean = (F.col("a.sm") + F.col("b.sm")) / n
    puv = (
        a.join(b, F.col("a.pos") < F.col("b.pos"))
        .select(
            F.lit("union_var").alias("variant"),
            F.col("a.pos").alias("pos_i"),
            F.col("b.pos").alias("pos_j"),
            F.round((F.col("a.ssq") + F.col("b.ssq")) / n - mean * mean, 6).alias("stat"),
        )
    )
    return ks_w.unionByName(ks_r).unionByName(puv)


@register(
    "value_histograms",
    sql="""
WITH sizes AS (SELECT label AS shard_id, COUNT(*)::DOUBLE AS points
               FROM embeddings GROUP BY label),
b AS (SELECT shard_id, points, FLOOR(ln(points) / 0.5)::BIGINT AS bucket FROM sizes),
log_hist AS (
  SELECT 'shard_log_hist' AS variant, bucket AS k1, NULL::BIGINT AS k2,
         COUNT(*)::BIGINT AS n, ROUND(SUM(points), 1) AS v
  FROM b GROUP BY bucket
),
dim_hist AS (
  SELECT 'per_dim_values' AS variant, i AS k1,
         LEAST(GREATEST(FLOOR((embedding[i+1]::DOUBLE + 0.4) / 0.1), 0), 7)::BIGINT AS k2,
         COUNT(*)::BIGINT AS n, NULL::DOUBLE AS v
  FROM embeddings, range(0, 8) t(i)
  GROUP BY k1, k2
)
SELECT * FROM log_hist UNION ALL SELECT * FROM dim_hist
""",
)
def value_histograms(spark, sf_dir):
    """A13 + A4 + the per-dimension value histogram folded:
    - ``shard_log_hist``: bucket-size histogram on a log scale
      (reference ``distributions.py:4-8``: ``np.log(df['points'])`` →
      histogram; shard sizes via the embeddings ``label`` column);
    - ``per_dim_values``: 8 fixed-width buckets over [-0.4, 0.4) per
      dim (clamped), first 8 dims — one two-key hash aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    sizes = emb.groupBy(F.col("label").alias("shard_id")).agg(
        F.count("*").cast("double").alias("points")
    )
    log_hist = (
        sizes.withColumn("bucket", F.floor(F.log("points") / 0.5))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("points"), 1).alias("v"))
        .select(
            F.lit("shard_log_hist").alias("variant"),
            F.col("bucket").cast("long").alias("k1"),
            F.lit(None).cast("long").alias("k2"),
            F.col("n").cast("long").alias("n"),
            "v",
        )
    )
    d = _dims(spark, sf_dir).filter(F.col("pos") < 8)
    bucket = F.least(
        F.greatest(F.floor((F.col("val") + 0.4) / 0.1), F.lit(0)), F.lit(7)
    )
    dim_hist = (
        d.groupBy(F.col("pos").alias("k1"), bucket.alias("k2"))
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("per_dim_values").alias("variant"),
            F.col("k1").cast("long"),
            F.col("k2").cast("long"),
            F.col("n").cast("long"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    return log_hist.unionByName(dim_hist)


@register(
    "vif_matrix",
    sql="""
WITH c AS (
  SELECT corr(embedding[1]::DOUBLE, embedding[2]::DOUBLE) AS r01,
         corr(embedding[1]::DOUBLE, embedding[3]::DOUBLE) AS r02,
         corr(embedding[2]::DOUBLE, embedding[3]::DOUBLE) AS r12
  FROM embeddings
),
d AS (SELECT r01, r02, r12,
             1 - r01*r01 - r02*r02 - r12*r12 + 2*r01*r02*r12 AS det
      FROM c)
SELECT 'vif' AS variant, pos_i, pos_j, ROUND(v, 6) AS v FROM (
  SELECT 0 AS pos_i, 0 AS pos_j, (1 - r12*r12)/det AS v FROM d
  UNION ALL SELECT 1, 1, (1 - r02*r02)/det FROM d
  UNION ALL SELECT 2, 2, (1 - r01*r01)/det FROM d
  UNION ALL SELECT 0, 1, (r02*r12 - r01)/det FROM d
  UNION ALL SELECT 1, 0, (r02*r12 - r01)/det FROM d
  UNION ALL SELECT 0, 2, (r01*r12 - r02)/det FROM d
  UNION ALL SELECT 2, 0, (r01*r12 - r02)/det FROM d
  UNION ALL SELECT 1, 2, (r01*r02 - r12)/det FROM d
  UNION ALL SELECT 2, 1, (r01*r02 - r12)/det FROM d
)
UNION ALL
SELECT 'corr', 0, 1, ROUND(r01, 6) FROM c
UNION ALL SELECT 'corr', 0, 2, ROUND(r02, 6) FROM c
UNION ALL SELECT 'corr', 1, 2, ROUND(r12, 6) FROM c
""",
)
def vif_matrix_q(spark, sf_dir):
    """A8+A9 tagged union (one registry slot; schema (variant, pos_i,
    pos_j, v)):
    - ``corr``: Pearson correlation between dimension columns
      (reference ``multicollinearity.py:95`` df.corr(); the full d×d
      matrix is assembled driver-side from these distributed pairwise
      aggregates — operators.stats.correlation_matrix);
    - ``vif``: that matrix's driver-side inverse = VIF/
      multicollinearity matrix (``multicollinearity.py:92-131``),
      checked on the first 3 dims where the inverse has a closed form
      the SQL oracle computes from ``corr()`` aggregates — a real
      end-to-end check of the inversion path; the 8-dim variant's
      VIF·corr ≈ I contract stays pinned in tests/test_stats.py."""
    from big_ann_spark.operators.stats import correlation_matrix, vif_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    m = vif_matrix(emb, dims=3)
    rows = [
        ("vif", i, j, round(float(m[i, j]), 6))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
    ]
    c = correlation_matrix(emb, dims=3)
    rows += [
        ("corr", i, j, round(float(c[i, j]), 6))
        for i in range(3)
        for j in range(3)
        if i < j
    ]
    return spark.createDataFrame(rows, "variant string, pos_i int, pos_j int, v double")


@register(
    "anderson_darling_per_dim",
    sql="""
WITH base AS (
  SELECT i::INTEGER AS pos, embedding[i+1]::DOUBLE AS x
  FROM embeddings, range(0, 8) t(i)
),
st AS (SELECT pos, avg(x) AS mu, stddev_samp(x) AS sigma, COUNT(*) AS n
       FROM base GROUP BY pos),
z AS (SELECT b.pos, (x - mu) / sigma AS z, n,
             row_number() OVER (PARTITION BY b.pos ORDER BY x) AS i
      FROM base b JOIN st ON b.pos = st.pos),
terms AS (
  SELECT a.pos, a.n,
         (2*a.i - 1)::DOUBLE * ((-ln(1 + exp(-a.z))) + (-b.z - ln(1 + exp(-b.z)))) AS term
  FROM z a JOIN z b ON a.pos = b.pos AND b.i = a.n + 1 - a.i
),
a2 AS (SELECT pos, -any_value(n)::DOUBLE - SUM(term) / any_value(n) AS a2,
              any_value(n)::DOUBLE AS n
       FROM terms GROUP BY pos)
SELECT pos, ROUND(a2, 4) AS a2,
       ROUND(a2 * (1 + 0.75/n + 2.25/(n*n)), 4) AS a2_corrected
FROM a2
""",
)
def anderson_darling_q(spark, sf_dir):
    """A11: Anderson-Darling statistic per dimension (first 8 dims) in
    an Arrow group task per dim (reference ``variance.py:109``). The
    driver-checked variant uses the logistic CDF — every term is
    elementary, so DuckDB reproduces the sorted-weight machinery
    end-to-end (rounded to 4 decimals: the two engines sum the n
    weighted terms in different orders). The reference's normal-CDF
    variant is the same operator with ``dist="normal"``, verified
    against numpy in tests/test_stats.py."""
    from big_ann_spark.operators.stats import anderson_darling_per_dim, dim_table

    emb = load_table(spark, sf_dir, "embeddings")
    d = dim_table(emb).filter(F.col("pos") < 8)
    out = anderson_darling_per_dim(d, dist="logistic")
    return out.select(
        "pos", F.round("a2", 4).alias("a2"), F.round("a2_corrected", 4).alias("a2_corrected")
    )


@register("buddy_dimension_ordering", sql=None)
def buddy_ordering_q(spark, sf_dir):
    """W4+P2: greedy "buddy" dimension reordering from the |corr|
    weight matrix (reference ``network_blended.py:83-106``), applied
    back to the vectors as a permutation — the BuddyPQ preprocessing
    step as one pipeline. Emits (rank, dim). Rows-only: the greedy
    emission order is inherently sequential (driver-side over the tiny
    d×d matrix) and has no SQL form; determinism is tested in
    tests/test_stats.py."""
    from big_ann_spark.operators.stats import buddy_order, correlation_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    cor = correlation_matrix(emb, dims=8)
    order = buddy_order(cor)
    return spark.createDataFrame(
        [(r, d) for r, d in enumerate(order)], "rank int, dim int"
    )
