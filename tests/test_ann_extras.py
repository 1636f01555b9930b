"""Multi-probe LSH recall lift and frequency-capped Jaccard bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import ann as ANN
from big_ann_spark.operators import dedup as D
from big_ann_spark.operators.knn import exact_knn


def test_multiprobe_lifts_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = exact_knn(
        emb.filter(F.col("vec_id") < 20), emb, k=10,
        query_id="vec_id", query_vec="embedding",
        base_id="vec_id", base_vec="embedding", impl="arrow",
    ).select("qid", "neighbor_id")
    n_exact = exact.count()

    def recall(multiprobe):
        got = ANN.lsh_bucket_search(
            queries, emb, k=10, multiprobe=multiprobe
        ).select("qid", "neighbor_id")
        return exact.join(got, ["qid", "neighbor_id"]).count() / n_exact

    r1, r9 = recall(False), recall(True)
    # 8-bit sign buckets over a few hundred near-orthogonal gaussians
    # are inherently coarse (single-probe ≈ 0.13); the contract is the
    # lift from probing the 8 Hamming-1 buckets (≈ 2x, measured 0.24)
    assert r9 > r1, (r1, r9)
    assert r9 >= r1 * 1.5, (r1, r9)


def test_capped_jaccard_is_lower_bound_subset(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g z"),
        (3, "a b c q r s t u"),
        (4, "v w x y zz q r s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_similarity_pairs(docs).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_similarity_pairs(docs, max_doc_freq=2).collect()
    }
    assert set(capped) <= set(full)
    for pair, j in capped.items():
        assert j <= full[pair] + 1e-12
