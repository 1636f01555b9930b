"""kNN operator unit tests: Spark results vs a numpy brute-force
oracle, and the arrow impl vs the declarative impl."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators.knn import (
    exact_knn,
    median_pairwise_distance,
    recall_at_k,
    routing_recall,
)


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


@pytest.mark.parametrize("impl", ["sql", "arrow"])
def test_exact_knn_matches_numpy(spark, sf_dir, emb_np, impl):
    ids, mat = emb_np
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = exact_knn(
        queries, emb, k=10, query_id="vec_id", query_vec="embedding",
        base_id="vec_id", base_vec="embedding", impl=impl,
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rank"], r["neighbor_id"], r["dist"]))
    for qid in range(5):
        q = mat[qid]
        d = np.sqrt(((mat - q) ** 2).sum(axis=1))
        order = np.lexsort((ids, d))[:10]
        want = list(ids[order])
        have = [nid for _, nid, _ in sorted(got[qid])]
        assert have == want, f"qid={qid} impl={impl}"
        # arrow impl uses the |q|^2+|b|^2-2qb expansion whose cancellation
        # error near zero distance is ~1e-8 absolute — acceptable for ANN
        for (_, _, dist), i in zip(sorted(got[qid]), order):
            assert abs(dist - d[i]) < 1e-6


def test_impls_agree(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    kw = dict(query_id="vec_id", query_vec="embedding", base_id="vec_id",
              base_vec="embedding", k=7)
    a = exact_knn(queries, emb, impl="sql", **kw).select("qid", "neighbor_id", "rank")
    b = exact_knn(queries, emb, impl="arrow", **kw).select("qid", "neighbor_id", "rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_arrow_knn_broadcasts_query_matrix(spark, sf_dir, monkeypatch):
    """The arrow impl must ship the query matrix as ONE sc.broadcast
    variable (torrent-distributed per executor), not a per-task closure
    pickle (VERDICT r2 #4). Pins: exactly one broadcast() call carrying
    the (qids, qmat) tuple, and unchanged results."""
    import pyspark

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    calls = []
    orig = pyspark.SparkContext.broadcast

    def counting(self, value):
        calls.append(value)
        return orig(self, value)

    monkeypatch.setattr(pyspark.SparkContext, "broadcast", counting)
    out = exact_knn(
        queries, emb, k=5, query_id="vec_id", query_vec="embedding",
        base_id="vec_id", base_vec="embedding", impl="arrow",
    ).collect()
    assert len(out) == 15
    mats = [v for v in calls if isinstance(v, tuple) and isinstance(v[1], np.ndarray)]
    assert len(mats) == 1 and mats[0][1].shape == (3, 64)


def test_median_pairwise_matches_numpy(spark, sf_dir, emb_np):
    ids, mat = emb_np
    sub = mat[:60]
    dists = [
        float(np.sqrt(((sub[i] - sub[j]) ** 2).sum()))
        for i in range(len(sub))
        for j in range(i + 1, len(sub))
    ]
    want = float(np.median(dists))
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    got = median_pairwise_distance(emb, id_col="vec_id", vec_col="embedding").collect()[0][0]
    assert abs(got - want) < 1e-9


def test_recall_metrics(spark):
    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4)], "qid long, neighbor_id long"
    )
    pred = spark.createDataFrame(
        [(0, 1), (0, 9), (1, 3), (1, 4)], "qid long, neighbor_id long"
    )
    r = recall_at_k(pred, exact, k=2).collect()[0][0]
    assert abs(r - 0.75) < 1e-12
    exact1 = spark.createDataFrame([(0, 1), (1, 3)], "qid long, neighbor_id long")
    pred1 = spark.createDataFrame([(0, 1), (1, 5)], "qid long, neighbor_id long")
    rr = routing_recall(pred1, exact1).collect()[0][0]
    assert abs(rr - 0.5) < 1e-12
