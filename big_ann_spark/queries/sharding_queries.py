"""Sharding + batch ANN search queries (SURVEY §7.3-§7.5; J2/J3, A2/A4,
A12, W1/W2).

Oracle-checked variants use *label centroids* (per-label mean vectors)
— the k-means update step as a deterministic aggregate — so routing,
assignment, histogram, search, and recall are all exactly reproducible
in DuckDB. The MLlib-KMeans and KANNDI pipelines (iterative /
seed-dependent) register as rows-only checks with invariant tests in
tests/test_sharding.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import ann as ANN
from big_ann_spark.operators import sharding as SH
from big_ann_spark.queries import register

_CENTROID_CTE = """
cdim AS (SELECT label AS shard_id, i AS pos, avg(embedding[i+1]::DOUBLE) AS v
         FROM embeddings, range(0, 64) t(i) GROUP BY label, i),
cent AS (SELECT shard_id, list(v ORDER BY pos) AS centroid FROM cdim GROUP BY shard_id),
assign AS (
  SELECT vec_id, shard_id, dist FROM (
    SELECT e.vec_id, cent.shard_id,
           sqrt(list_sum(list_transform(range(1, 65),
             i -> (e.embedding[i]::DOUBLE - centroid[i]) * (e.embedding[i]::DOUBLE - centroid[i])))) AS dist,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY sqrt(list_sum(list_transform(range(1, 65),
                                i -> (e.embedding[i]::DOUBLE - centroid[i]) * (e.embedding[i]::DOUBLE - centroid[i])))),
                              cent.shard_id) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
)
"""


@register(
    "centroid_assignment_histogram",
    sql=f"""
WITH {_CENTROID_CTE}
SELECT shard_id, count(*) AS n_points,
       ROUND(quantile_cont(dist, 0.5)::DOUBLE, 6) AS median_dist
FROM assign GROUP BY shard_id
""",
)
def centroid_assignment_histogram(spark, sf_dir):
    """J2+A2+A4: nearest-centroid assignment (broadcast argmin join)
    → per-shard size + median centroid-distance — the reference's
    ``shard.py:117-147`` bucket histogram + drift stats in one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    return SH.shard_histogram(assign)


@register(
    "assignment_routing_recall",
    sql=f"""
WITH {_CENTROID_CTE}
SELECT ROUND(avg(CASE WHEN a.shard_id = e.label THEN 1.0 ELSE 0.0 END), 6) AS recall
FROM assign a JOIN embeddings e ON a.vec_id = e.vec_id
""",
)
def assignment_routing_recall(spark, sf_dir):
    """A12/J6: routing recall — fraction of points whose nearest label
    centroid IS their label (the reference's ``recall.py:73-83``
    positional metric, with labels as ground truth)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    hits = assign.join(emb.select("vec_id", "label"), "vec_id").select(
        F.when(F.col("shard_id") == F.col("label"), 1.0).otherwise(0.0).alias("hit")
    )
    return hits.agg(F.round(F.avg("hit"), 6).alias("recall"))


@register(
    "ivf_search_top5",
    sql=f"""
WITH {_CENTROID_CTE},
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
routed AS (
  SELECT qid, qv, shard_id FROM (
    SELECT q.qid, q.qv, cent.shard_id,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY sqrt(list_sum(list_transform(range(1, 65),
               i -> (q.qv[i] - centroid[i]) * (q.qv[i] - centroid[i])))), cent.shard_id) AS pr
    FROM q CROSS JOIN cent
  ) WHERE pr <= 2
),
cands AS (
  SELECT r.qid, a.vec_id AS neighbor_id,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> (r.qv[i] - e.embedding[i]::DOUBLE) * (r.qv[i] - e.embedding[i]::DOUBLE)))) AS dist
  FROM routed r
  JOIN assign a ON a.shard_id = r.shard_id
  JOIN embeddings e ON e.vec_id = a.vec_id
)
SELECT qid, neighbor_id, ROUND(dist, 6) AS dist, rk::INTEGER AS rank
FROM (SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rk
      FROM cands)
WHERE rk <= 5
""",
)
def ivf_search_top5(spark, sf_dir):
    """§7.4 flagship: IVF batch ANN — route each query to its top-2
    label-centroid shards (J3), scan only those shards' vectors,
    per-query top-5 with global re-rank (W1/W2). The KANNDI search
    semantics (``kanndi_search.py:28-66``) with nprobe configurable
    instead of hardwired top-1."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    sharded = assign.select("vec_id", "shard_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ANN.ivf_search(queries, sharded, cents, k=5, nprobe=2)
    return out.select("qid", "neighbor_id", F.round("dist", 6).alias("dist"), "rank")


@register(
    "ann_recall_at_10",
    sql=f"""
WITH {_CENTROID_CTE},
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
exact AS (
  SELECT qid, neighbor_id FROM (
    SELECT q.qid, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY sqrt(list_sum(list_transform(range(1, 65),
               i -> (q.qv[i] - e.embedding[i]::DOUBLE) * (q.qv[i] - e.embedding[i]::DOUBLE)))), e.vec_id) AS rk
    FROM q CROSS JOIN embeddings e
  ) WHERE rk <= 10
),
routed AS (
  SELECT qid, qv, shard_id FROM (
    SELECT q.qid, q.qv, cent.shard_id,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY sqrt(list_sum(list_transform(range(1, 65),
               i -> (q.qv[i] - centroid[i]) * (q.qv[i] - centroid[i])))), cent.shard_id) AS pr
    FROM q CROSS JOIN cent
  ) WHERE pr <= 2
),
approx AS (
  SELECT qid, neighbor_id FROM (
    SELECT r.qid, a.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY r.qid
             ORDER BY sqrt(list_sum(list_transform(range(1, 65),
               i -> (r.qv[i] - e.embedding[i]::DOUBLE) * (r.qv[i] - e.embedding[i]::DOUBLE)))), a.vec_id) AS rk
    FROM routed r JOIN assign a ON a.shard_id = r.shard_id
    JOIN embeddings e ON e.vec_id = a.vec_id
  ) WHERE rk <= 10
)
SELECT ROUND(count(*)::DOUBLE / (SELECT count(*) FROM exact), 6) AS recall_at_10
FROM exact JOIN approx USING (qid, neighbor_id)
""",
)
def ann_recall_at_10(spark, sf_dir):
    """A12 for the full ANN pipeline: recall@10 of IVF(nprobe=2) vs the
    exact kNN operator — the engine checks its own approximation the
    way ``recall.py`` does, entirely in-engine."""
    from big_ann_spark.operators.knn import exact_knn

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = exact_knn(
        queries, emb, k=10, query_id="vec_id", query_vec="embedding",
        base_id="vec_id", base_vec="embedding", impl="sql",
    ).select("qid", "neighbor_id")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    sharded = assign.select("vec_id", "shard_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    q2 = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    approx = ANN.ivf_search(q2, sharded, cents, k=10, nprobe=2).select("qid", "neighbor_id")
    n_exact = exact.count()
    hits = exact.join(approx, ["qid", "neighbor_id"]).count()
    return spark.createDataFrame(
        [(round(hits / n_exact, 6),)], "recall_at_10 double"
    )


@register(
    "kanndi_search_top1",
    sql=f"""
WITH {_CENTROID_CTE},
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
routed AS (
  SELECT qid, qv, shard_id FROM (
    SELECT q.qid, q.qv, cent.shard_id,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY sqrt(list_sum(list_transform(range(1, 65),
               i -> (q.qv[i] - centroid[i]) * (q.qv[i] - centroid[i])))), cent.shard_id) AS pr
    FROM q CROSS JOIN cent
  ) WHERE pr <= 1
),
cands AS (
  SELECT r.qid, a.vec_id AS neighbor_id,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> (r.qv[i] - e.embedding[i]::DOUBLE) * (r.qv[i] - e.embedding[i]::DOUBLE)))) AS dist
  FROM routed r
  JOIN assign a ON a.shard_id = r.shard_id
  JOIN embeddings e ON e.vec_id = a.vec_id
)
SELECT qid, neighbor_id, ROUND(dist, 6) AS dist, rk::INTEGER AS rank
FROM (SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rk
      FROM cands)
WHERE rk <= 10
""",
)
def kanndi_search_top1(spark, sf_dir):
    """The reference's EXACT search semantics (``kanndi_search.py:
    46-52``): route via top-MAX_CENTROIDS centroids but search only the
    top-1 shard, k=10 — i.e. IVF with nprobe=1. The recall loss vs
    exact kNN is a property of the reference's design, reproduced and
    measurable against ann_recall_at_10's nprobe=2 variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    sharded = assign.select("vec_id", "shard_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ANN.ivf_search(queries, sharded, cents, k=10, nprobe=1)
    return out.select("qid", "neighbor_id", F.round("dist", 6).alias("dist"), "rank")


@register("kmeans_shard_histogram", sql=None)
def kmeans_shard_histogram(spark, sf_dir):
    """§7.3: MLlib KMeans (k=10, seed=505 — reference RANDOM_SEED,
    ``config_bigann_small.py:11``) sharding → per-shard histogram.
    Rows-only check (centroid values depend on MLlib's k-means|| init,
    not SQL-reproducible); invariants tested in tests/test_sharding.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    assign, cents, _model = SH.kmeans_shard(emb, m=10)
    return SH.shard_histogram(assign)


@register("kanndi_shard_invariants", sql=None)
def kanndi_shard_invariants(spark, sf_dir):
    """§7.5: KANNDI distance-based sharding (iterative reformulation).
    Emits per-shard size + max admission distance + the run's threshold
    and capacity so the driver records the invariant surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = SH.kanndi_shard(emb, m=5)
    return (
        res.assignments.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
        .withColumn("capacity", F.lit(res.capacity))
        .withColumn("threshold", F.round(F.lit(res.threshold), 6))
    )


@register("lsh_bucket_search_top5", sql=None)
def lsh_bucket_search_top5(spark, sf_dir):
    """Random-hyperplane LSH bucketed search (scale path for cosine
    ANN): 8-bit sign signatures → bucket equi-join → exact re-rank.
    Rows-only check; recall vs exact tested in tests/test_sharding.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ANN.lsh_bucket_search(queries, emb, k=5)
