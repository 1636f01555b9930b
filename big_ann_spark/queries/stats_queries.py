"""Dataset-statistics queries over the embeddings table.

Reference surface (SURVEY §2.4): per-dimension variance (A5,
``variance.py:90,102-107``), per-dimension entropy (A6,
``utils.py:238-245``), variance-of-union pair stats (A7,
``variance.py:112-135``), correlation matrix (A8,
``multicollinearity.py:95``), two-sample Kolmogorov-Smirnov (A10,
``komolgorovsmirnov.py:90-113``), log-histogram (A13,
``distributions.py:4-8``), column-slice projection (P1) and dimension
permutation (P2, ``utils.py:195-202``).

Spark-first: every statistic is a two-level hash aggregate over
``posexplode(vec)`` — map-side partial aggregation makes these a single
scan + tiny shuffle (64 groups), which is exactly the plan that holds
at 100 TB. The reference computes them dimension-at-a-time over an
in-memory matrix with an ``assert sample_size <= 100000`` cost guard
(``variance.py:84``); here there is no sample-size ceiling.
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
    "per_dim_variance",
    sql=f"""
SELECT i::INTEGER AS pos,
       ROUND(var_pop(embedding[i+1]::DOUBLE), 6) AS variance,
       ROUND(avg(embedding[i+1]::DOUBLE), 6) AS mean,
       ROUND(min(embedding[i+1]::DOUBLE), 6) AS min_val,
       ROUND(max(embedding[i+1]::DOUBLE), 6) AS max_val
FROM embeddings, range(0, {DIM}) t(i)
GROUP BY pos
""",
)
def per_dim_variance(spark, sf_dir):
    """A5 + P1: per-dimension variance/mean/min/max (reference
    ``variance.py:102-107``: ``np.var(points[:, dim])`` per dim)."""
    return (
        _dims(spark, sf_dir)
        .groupBy("pos")
        .agg(
            F.round(F.var_pop("val"), 6).alias("variance"),
            F.round(F.avg("val"), 6).alias("mean"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
    )


@register(
    "per_dim_entropy",
    sql=f"""
WITH vals AS (
  SELECT i::INTEGER AS pos, ROUND(embedding[i+1]::DOUBLE, 1) AS bucket
  FROM embeddings, range(0, {DIM}) t(i)
),
counts AS (SELECT pos, bucket, COUNT(*)::DOUBLE AS c FROM vals GROUP BY pos, bucket),
tot AS (SELECT pos, SUM(c) AS n FROM counts GROUP BY pos)
SELECT counts.pos, ROUND(-SUM((c/n) * ln(c/n)), 6) AS entropy
FROM counts JOIN tot ON counts.pos = tot.pos
GROUP BY counts.pos
""",
)
def per_dim_entropy(spark, sf_dir):
    """A6: Shannon entropy of the per-dimension value distribution
    (reference ``utils.py:238-245`` over discrete uint8 values; float
    dims are bucketed to 1 decimal to make the distribution discrete).
    Two-level aggregate: (pos,bucket) counts → per-pos entropy."""
    vals = _dims(spark, sf_dir).select("pos", F.round("val", 1).alias("bucket"))
    counts = vals.groupBy("pos", "bucket").agg(F.count("*").cast("double").alias("c"))
    tot = counts.groupBy("pos").agg(F.sum("c").alias("n"))
    p = counts.join(tot, "pos").select("pos", (F.col("c") / F.col("n")).alias("p"))
    return p.groupBy("pos").agg(F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy"))


@register(
    "pair_union_variance",
    sql=f"""
WITH s AS (
  SELECT i::INTEGER AS pos,
         SUM(embedding[i+1]::DOUBLE) AS sm,
         SUM((embedding[i+1]::DOUBLE) * (embedding[i+1]::DOUBLE)) AS ssq,
         COUNT(*)::DOUBLE AS n
  FROM embeddings, range(0, 8) t(i)
  GROUP BY pos
)
SELECT a.pos AS pos_i, b.pos AS pos_j,
       ROUND((a.ssq + b.ssq) / (a.n + b.n)
             - ((a.sm + b.sm) / (a.n + b.n)) * ((a.sm + b.sm) / (a.n + b.n)), 6) AS union_variance
FROM s a JOIN s b ON a.pos < b.pos
""",
)
def pair_union_variance(spark, sf_dir):
    """A7: the reference's "covariance" — variance of the *union* of two
    dimension columns (``variance.py:112-135``: ``np.var(concat(dim_i,
    dim_j))``), replicated exactly via sufficient statistics
    (sum/sumsq/count per dim → combined). First 8 dims, 28 pairs."""
    d = _dims(spark, sf_dir).filter(F.col("pos") < 8)
    s = d.groupBy("pos").agg(
        F.sum("val").alias("sm"),
        F.sum(F.col("val") * F.col("val")).alias("ssq"),
        F.count("*").cast("double").alias("n"),
    )
    a, b = s.alias("a"), s.alias("b")
    n = F.col("a.n") + F.col("b.n")
    mean = (F.col("a.sm") + F.col("b.sm")) / n
    return (
        a.join(b, F.col("a.pos") < F.col("b.pos"))
        .select(
            F.col("a.pos").alias("pos_i"),
            F.col("b.pos").alias("pos_j"),
            F.round((F.col("a.ssq") + F.col("b.ssq")) / n - mean * mean, 6).alias("union_variance"),
        )
    )


@register(
    "dim_correlation_pairs",
    sql="""
SELECT ROUND(corr(embedding[1]::DOUBLE, embedding[2]::DOUBLE), 6) AS corr_0_1,
       ROUND(corr(embedding[1]::DOUBLE, embedding[3]::DOUBLE), 6) AS corr_0_2,
       ROUND(corr(embedding[2]::DOUBLE, embedding[3]::DOUBLE), 6) AS corr_1_2
FROM embeddings
""",
)
def dim_correlation_pairs(spark, sf_dir):
    """A8: Pearson correlation between dimension columns (reference
    ``multicollinearity.py:95`` ``df.corr()``; full d×d matrix is
    assembled driver-side from these pairwise aggregates — see
    operators.stats.correlation_matrix)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding")[0].cast("double").alias("d0"),
        F.col("embedding")[1].cast("double").alias("d1"),
        F.col("embedding")[2].cast("double").alias("d2"),
    )
    return emb.agg(
        F.round(F.corr("d0", "d1"), 6).alias("corr_0_1"),
        F.round(F.corr("d0", "d2"), 6).alias("corr_0_2"),
        F.round(F.corr("d1", "d2"), 6).alias("corr_1_2"),
    )


@register(
    "ks_statistic_dims",
    sql="""
WITH v AS (
  SELECT embedding[1]::DOUBLE AS x, 0 AS grp FROM embeddings
  UNION ALL
  SELECT embedding[2]::DOUBLE AS x, 1 AS grp FROM embeddings
),
n AS (SELECT COUNT(*) FILTER (WHERE grp = 0)::DOUBLE AS n0,
             COUNT(*) FILTER (WHERE grp = 1)::DOUBLE AS n1 FROM v),
e AS (
  SELECT x,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
           OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
           OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1
  FROM v
)
SELECT ROUND(MAX(ABS(c0 / n.n0 - c1 / n.n1)), 6) AS ks_stat
FROM e, n
""",
)
def ks_statistic_dims(spark, sf_dir):
    """A10: two-sample Kolmogorov-Smirnov statistic between dim 0 and
    dim 1 (reference ``komolgorovsmirnov.py:90-113`` via scipy).
    D = sup_x |ECDF_0(x) - ECDF_1(x)|, ECDFs via a RANGE window so tied
    values count correctly. All-pairs version: operators.stats.ks_matrix
    runs the d²/2 pairs as independent tasks (the reference is a
    sequential double loop with a 100k-row assert guard)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(F.col("embedding")[0].cast("double").alias("x"), F.lit(0).alias("grp")).union(
        emb.select(F.col("embedding")[1].cast("double").alias("x"), F.lit(1).alias("grp"))
    )
    from pyspark.sql import Window

    counts = v.agg(
        F.count(F.when(F.col("grp") == 0, 1)).cast("double").alias("n0"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("double").alias("n1"),
    ).collect()[0]
    w = Window.orderBy("x").rangeBetween(Window.unboundedPreceding, 0)
    e = v.select(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).over(w).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).over(w).alias("c1"),
    )
    return e.agg(
        F.round(
            F.max(F.abs(F.col("c0") / F.lit(counts["n0"]) - F.col("c1") / F.lit(counts["n1"]))), 6
        ).alias("ks_stat")
    )


@register(
    "log_histogram_shard_sizes",
    sql="""
WITH sizes AS (SELECT label AS shard_id, COUNT(*)::DOUBLE AS points
               FROM embeddings GROUP BY label),
b AS (SELECT shard_id, points, FLOOR(ln(points) / 0.5)::INTEGER AS bucket FROM sizes)
SELECT bucket, COUNT(*) AS n_shards, ROUND(SUM(points), 1) AS total_points
FROM b GROUP BY bucket
""",
)
def log_histogram_shard_sizes(spark, sf_dir):
    """A4 + A13: bucket-size histogram on a log scale (reference
    ``distributions.py:4-8``: ``np.log(df['points'])`` → histogram;
    shard sizes stand in via the embeddings ``label`` column)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sizes = emb.groupBy(F.col("label").alias("shard_id")).agg(
        F.count("*").cast("double").alias("points")
    )
    b = sizes.withColumn("bucket", F.floor(F.log("points") / 0.5).cast("int"))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_shards"), F.round(F.sum("points"), 1).alias("total_points")
    )


@register(
    "high_variance_dims",
    sql=f"""
WITH v AS (
  SELECT i::INTEGER AS pos, var_pop(embedding[i+1]::DOUBLE) AS variance
  FROM embeddings, range(0, {DIM}) t(i) GROUP BY pos
),
thr AS (SELECT quantile_cont(variance, 0.75)::DOUBLE AS p75 FROM v)
SELECT pos, ROUND(variance, 6) AS variance
FROM v, thr WHERE variance > p75
""",
)
def high_variance_dims(spark, sf_dir):
    """P5: threshold predicate on computed statistics — dims whose
    variance exceeds the 75th percentile (the reference's
    ``A[i,j] > p75`` edge filter, ``network_blended.py:86-92``, and
    ``val > 1.3`` print filter, ``komolgorovsmirnov.py:127``)."""
    v = (
        _dims(spark, sf_dir)
        .groupBy("pos")
        .agg(F.var_pop("val").alias("variance"))
    )
    thr = v.agg(F.percentile("variance", F.lit(0.75)).alias("p75"))
    return (
        v.crossJoin(thr)
        .filter(F.col("variance") > F.col("p75"))
        .select("pos", F.round("variance", 6).alias("variance"))
    )


@register(
    "per_dim_value_histogram",
    sql="""
SELECT i::INTEGER AS pos,
       LEAST(GREATEST(FLOOR((embedding[i+1]::DOUBLE + 0.4) / 0.1), 0), 7)::INTEGER AS bucket,
       COUNT(*) AS n
FROM embeddings, range(0, 8) t(i)
GROUP BY pos, bucket
""",
)
def per_dim_value_histogram(spark, sf_dir):
    """Per-dimension value histogram (the reference's dataset-statistics
    histogram surface): 8 fixed-width buckets over [-0.4, 0.4) per dim,
    clamped at the edges; first 8 dims. One two-key hash aggregate."""
    d = _dims(spark, sf_dir).filter(F.col("pos") < 8)
    bucket = F.least(
        F.greatest(F.floor((F.col("val") + 0.4) / 0.1), F.lit(0)), F.lit(7)
    ).cast("int")
    return d.groupBy("pos", bucket.alias("bucket")).agg(F.count("*").alias("n"))


@register("vif_matrix", sql=None)
def vif_matrix_q(spark, sf_dir):
    """A8+A9: correlation matrix of the first 8 dims (distributed
    sufficient stats) → driver-side inverse = VIF/multicollinearity
    matrix (reference ``multicollinearity.py:92-131``). Rows-only check
    (matrix inverse isn't SQL); tests assert VIF·corr ≈ I."""
    from big_ann_spark.operators.stats import vif_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    m = vif_matrix(emb, dims=8)
    rows = [
        (i, j, round(float(m[i, j]), 6))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
    ]
    return spark.createDataFrame(rows, "pos_i int, pos_j int, vif double")


@register("anderson_darling_per_dim", sql=None)
def anderson_darling_q(spark, sf_dir):
    """A11: Anderson-Darling normality per dimension (first 8 dims) —
    scipy-free direct formula in an Arrow group task per dim (reference
    ``variance.py:109``). Rows-only; tests compare against a direct
    numpy evaluation."""
    from big_ann_spark.operators.stats import anderson_darling_per_dim, dim_table

    emb = load_table(spark, sf_dir, "embeddings")
    d = dim_table(emb).filter(F.col("pos") < 8)
    out = anderson_darling_per_dim(d)
    return out.select(
        "pos", F.round("a2", 6).alias("a2"), F.round("a2_corrected", 6).alias("a2_corrected")
    )


@register("ks_matrix_pairs", sql=None)
def ks_matrix_q(spark, sf_dir):
    """A10 all-pairs: KS statistic for every pair of the first 8 dims —
    28 independent Arrow group tasks (the reference is a sequential
    double loop with a 100k-row assert guard,
    ``komolgorovsmirnov.py:84-113``). Rows-only; tests check pair (0,1)
    equals the oracle-checked single-pair query."""
    from big_ann_spark.operators.stats import ks_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    return ks_matrix(emb, dims=8).select(
        "pos_i", "pos_j", F.round("ks_stat", 6).alias("ks_stat")
    )


@register("buddy_dimension_ordering", sql=None)
def buddy_ordering_q(spark, sf_dir):
    """W4+P2: greedy "buddy" dimension reordering from the |corr|
    weight matrix (reference ``network_blended.py:83-106``), applied
    back to the vectors as a permutation — the BuddyPQ preprocessing
    step as one pipeline. Emits (rank, dim)."""
    from big_ann_spark.operators.stats import buddy_order, correlation_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    cor = correlation_matrix(emb, dims=8)
    order = buddy_order(cor)
    return spark.createDataFrame(
        [(r, d) for r, d in enumerate(order)], "rank int, dim int"
    )


@register("approx_distinct_sketch", sql=None)
def approx_distinct_sketch(spark, sf_dir):
    """HyperLogLog++ approximate distinct counts (the sketch layer the
    relational surface gets for free; rows-only — approx values have no
    exact oracle, tests bound the error vs exact)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


@register(
    "dimension_permutation",
    sql="""
SELECT vec_id,
       list_transform([3, 1, 2], i -> embedding[i + 1]) AS permuted_head
FROM embeddings WHERE vec_id < 10
""",
)
def dimension_permutation(spark, sf_dir):
    """P2: buddy dimension reorder ``points[:, friends]`` (reference
    ``utils.py:195-202``); head of permutation [3, 1, 2] for the check."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    perm = [3, 1, 2]
    return emb.select(
        "vec_id",
        F.array(*[F.col("embedding")[i] for i in perm]).alias("permuted_head"),
    )
