"""Vector-surface queries: exact kNN, pairwise/median distance, cosine,
vector encoders. SURVEY §2 ids: J1, J4, J5, W1, W2, A1, A3, F1-F3, S13.

Query vectors: the driver testdata has no separate query table, so by
convention ``vec_id < N_QUERIES`` rows of ``embeddings`` serve as the
query set (deterministic, mirrors the reference's first-N "sampling",
``centroids.py:58``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.functions.vector import cosine_similarity
from big_ann_spark.operators.knn import (
    exact_knn,
    median_pairwise_distance,
    pairwise_distances,
)
from big_ann_spark.queries import register

N_QUERIES = 20
DIM = 64  # driver embeddings are fixed d=64 at every sf

_L2_SQL = (
    "sqrt(list_sum(list_transform(range(1, len({b})+1), "
    "i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i]))))"
)


@register(
    "knn_exact_top10",
    sql=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < {N_QUERIES}),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {_L2_SQL.format(a="q.qv", b="e.v")} AS dist
  FROM emb e CROSS JOIN q
),
r AS (SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rk
      FROM d)
SELECT qid, neighbor_id, ROUND(dist, 6) AS dist, rk::INTEGER AS rank
FROM r WHERE rk <= 10
""",
)
def knn_exact_top10(spark, sf_dir):
    """J1+W1: exact top-10 L2 neighbors per query (reference
    ``recall.py:34-46`` + k=10 of ``utils.py:311``), declarative impl."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = exact_knn(
        queries,
        emb,
        k=10,
        metric="l2",
        query_id="vec_id",
        query_vec="embedding",
        base_id="vec_id",
        base_vec="embedding",
        impl="sql",
    )
    return out.select("qid", "neighbor_id", F.round("dist", 6).alias("dist"), "rank")


@register(
    "elasticsearch_vector_encoding",
    sql="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e)
SELECT vec_id,
       list_transform(v, x -> round(x / nrm, 10)) AS es_vec
FROM n
""",
)
def elasticsearch_vector_encoding(spark, sf_dir):
    """S13b: L2-normalized, 10-decimal-rounded vector — the reference's
    Elasticsearch dense-vector encoder ``get_elasticsearch_vector``
    (``src/util/utils.py:56-69``)."""
    from big_ann_spark.functions.vector import to_elasticsearch_vector

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return emb.select("vec_id", to_elasticsearch_vector("embedding").alias("es_vec"))


@register(
    "prefix_sample_stats",
    sql="""
WITH s AS (SELECT * FROM embeddings WHERE vec_id < 100)
SELECT COUNT(*) AS n_rows,
       ROUND(AVG(embedding[1]::DOUBLE), 6) AS mean_d0,
       ROUND(var_pop(embedding[1]::DOUBLE), 6) AS var_d0
FROM s
""",
)
def prefix_sample_stats(spark, sf_dir):
    """P6: the reference's "sampling" is a deterministic first-N prefix
    (``centroids.py:58``, ``shard_by_distance.py:496-499`` — SURVEY
    appendix); stats over the first 100 rows by id. At scale an honest
    ``df.sample`` replaces this; the prefix form is kept for parity."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return emb.agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.col("embedding")[0].cast("double")), 6).alias("mean_d0"),
        F.round(F.var_pop(F.col("embedding")[0].cast("double")), 6).alias("var_d0"),
    )


@register(
    "doc_retrieval_top3",
    sql=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 5),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {_L2_SQL.format(a="q.qv", b="e.v")} AS dist
  FROM emb e CROSS JOIN q WHERE e.vec_id <> q.qid
),
r AS (SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rk
      FROM d)
SELECT r.qid, r.neighbor_id, ROUND(r.dist, 6) AS dist, rk::INTEGER AS rank,
       doc.lang, doc.source, doc.n_chars
FROM r JOIN documents doc ON doc.doc_id = r.neighbor_id
WHERE rk <= 3
""",
)
def doc_retrieval_top3(spark, sf_dir):
    """Cross-modal retrieval shape: vector top-k over embeddings joined
    back to the documents table (vec_id ≡ doc_id in the fixture) — the
    query a RAG-style pipeline runs: ANN ids → hydrate metadata. The
    hydration join is id-equi (broadcast of the tiny top-k side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("_qv")
    )
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_bv"))
    from big_ann_spark.functions.vector import l2_distance
    from big_ann_spark.operators.topk import top_k_per_group

    scored = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", l2_distance("_qv", "_bv").alias("dist"))
    )
    topk = top_k_per_group(
        scored, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], 3
    )
    return (
        topk.join(docs, topk.neighbor_id == docs.doc_id)
        .select(
            "qid", "neighbor_id", F.round("dist", 6).alias("dist"), "rank",
            "lang", "source", "n_chars",
        )
    )


@register("knn_exact_arrow", sql=None)
def knn_exact_arrow(spark, sf_dir):
    """J1+W1 scale path: mapInPandas partial top-k — each partition
    emits only Q×k rows after a numpy BLAS distance block against the
    broadcast query matrix (fixes the reference's O(Q×S) Python loop,
    ``recall.py:36-46``). Rows-only driver check: distances match the
    sql impl to ~1e-12 but are not bit-identical, so no value-hash
    oracle; tests/test_knn.py asserts rank-for-rank agreement with the
    declarative impl instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = exact_knn(
        queries, emb, k=10, metric="l2",
        query_id="vec_id", query_vec="embedding",
        base_id="vec_id", base_vec="embedding", impl="arrow",
    )
    return out.select("qid", "neighbor_id", F.round("dist", 6).alias("dist"), "rank")


@register(
    "median_pairwise_distance",
    sql=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200),
d AS (
  SELECT {_L2_SQL.format(a="a.v", b="b.v")} AS dist
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT ROUND(quantile_cont(dist, 0.5)::DOUBLE, 6) AS median_dist FROM d
""",
)
def median_pairwise_distance_q(spark, sf_dir):
    """A1: KANNDI threshold d = median(pdist(sample)) (reference
    ``shard_by_distance.py:39-78``); sample = first 200 vectors, the
    reference's first-N sampling convention."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    out = median_pairwise_distance(emb, id_col="vec_id", vec_col="embedding")
    return out.select(F.round("median_dist", 6).alias("median_dist"))


@register(
    "pairwise_cosine_stats",
    sql="""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 100),
n AS (SELECT vec_id, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm, v FROM emb),
s AS (
  SELECT list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
           / (a.nrm * b.nrm) AS sim
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT ROUND(min(sim), 6) AS min_sim,
       ROUND(quantile_cont(sim, 0.5)::DOUBLE, 6) AS median_sim,
       ROUND(max(sim), 6) AS max_sim
FROM s
""",
)
def pairwise_cosine_stats(spark, sf_dir):
    """J5+A3: min/median/max pairwise cosine similarity — the reference's
    centroid-drift statistics (``utils.py:216-235``, ``shard.py:48-55``,
    ``centroids.py:38-50``: sorted cos-sims → farthest/median/closest)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pairs = pairwise_distances(emb, id_col="vec_id", vec_col="embedding", metric="cosine")
    sims = pairs.select((1.0 - F.col("dist")).alias("sim"))
    return sims.agg(
        F.round(F.min("sim"), 6).alias("min_sim"),
        F.round(F.percentile("sim", F.lit(0.5)), 6).alias("median_sim"),
        F.round(F.max("sim"), 6).alias("max_sim"),
    )


@register(
    "distance_threshold_join",
    sql=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (SELECT vec_id AS rid, v AS sv FROM emb WHERE vec_id < 5)
SELECT e.vec_id AS lid, s.rid,
       ROUND({_L2_SQL.format(a="s.sv", b="e.v")}, 6) AS dist
FROM emb e CROSS JOIN seeds s
WHERE {_L2_SQL.format(a="s.sv", b="e.v")} <= 1.2
""",
)
def distance_threshold_join_q(spark, sf_dir):
    """P4/J4: admit points within distance d of a seed — the KANNDI
    admission predicate (``shard_by_distance.py:228-241``)."""
    from big_ann_spark.operators.knn import distance_threshold_join

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 5)
    out = distance_threshold_join(
        emb, seeds, 1.2,
        left_id="vec_id", left_vec="embedding",
        right_id="vec_id", right_vec="embedding",
    )
    return out.select("lid", "rid", F.round("dist", 6).alias("dist"))


@register(
    "solr_vector_encoding",
    sql="""
SELECT vec_id,
       array_to_string(list_transform(range(1, len(embedding)+1),
                       i -> i::VARCHAR || '|' || embedding[i]::DECIMAL(12,4)::VARCHAR), ' ') AS solr_vec
FROM embeddings WHERE vec_id < 10
""",
)
def solr_vector_encoding(spark, sf_dir):
    """S13/F6: ``"1|v1 2|v2 ..."`` Solr indexed-vector string encoder
    (reference ``to_solr_vector``, ``src/util/utils.py:37-49``).

    Values rendered via DECIMAL(12,4) so Spark's Java float→string and
    DuckDB's float→varchar shortest-roundtrip formats cannot diverge."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    indexed = F.transform(
        F.col("embedding"),
        lambda x, i: F.concat_ws(
            "|", (i + 1).cast("string"), x.cast("decimal(12,4)").cast("string")
        ),
    )
    return emb.select("vec_id", F.array_join(indexed, " ").alias("solr_vec"))


@register(
    "knn_cosine_top5",
    sql="""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM emb),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         1.0 - list_sum(list_transform(range(1, len(e.v)+1), i -> q.qv[i]*e.v[i]))
               / (q.qn * e.nrm) AS dist
  FROM n e CROSS JOIN q WHERE e.vec_id <> q.qid
),
r AS (SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rk
      FROM d)
SELECT qid, neighbor_id, ROUND(dist, 6) AS cos_dist, rk::INTEGER AS rank
FROM r WHERE rk <= 5
""",
)
def knn_cosine_top5(spark, sf_dir):
    """J5 as a top-k query: cosine-distance kNN (self excluded)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    base = emb
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("_qv"))
    b = base.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_bv"))
    scored = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", (1.0 - cosine_similarity("_qv", "_bv")).alias("dist"))
    )
    from big_ann_spark.operators.topk import top_k_per_group

    out = top_k_per_group(scored, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], 5)
    return out.select("qid", "neighbor_id", F.round("dist", 6).alias("cos_dist"), "rank")
