"""Filtered-kNN (attribute-constrained) and sparse-MIPS extensions —
the companion public-benchmark track shapes the reference repo does not
cover. Correctness vs brute force, the hot-dim cap, and the plan shapes
that make them 100 TB-safe."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators.knn import filtered_knn
from big_ann_spark.operators.sparse import sparse_mips_topk, sparsify_dense
from big_ann_spark.plans import executed_plan as _plan

N = 120
K = 5
TAU = 0.15


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N)
        .select("vec_id", "embedding")
        .cache()
    )


def _np_vectors(emb):
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    return rows


def test_filtered_knn_label_matches_postfilter(spark, emb):
    # deterministic 3-way label from the id — same label rule both sides
    labeled = emb.withColumn("lab", (F.col("vec_id") % 3).cast("int"))
    out = filtered_knn(
        labeled.filter(F.col("vec_id") < 6),
        labeled,
        k=K,
        query_id="vec_id",
        query_vec="embedding",
        base_id="vec_id",
        base_vec="embedding",
        label_col="lab",
        exclude_self=True,
    ).collect()
    vecs = _np_vectors(emb)
    for qid in range(6):
        cands = sorted(
            (
                (float(np.sqrt(((vecs[qid] - v) ** 2).sum())), i)
                for i, v in vecs.items()
                if i % 3 == qid % 3 and i != qid
            )
        )[:K]
        got = sorted(
            ((r.dist, r.neighbor_id) for r in out if r.qid == qid)
        )
        assert [i for _, i in got] == [i for _, i in cands], qid
        for (gd, _), (cd, _) in zip(got, cands):
            assert abs(gd - cd) < 1e-9


def test_filtered_knn_label_is_hash_join_on_label(spark, emb):
    labeled = emb.withColumn("lab", (F.col("vec_id") % 3).cast("int"))
    out = filtered_knn(
        labeled.filter(F.col("vec_id") < 6),
        labeled,
        k=K,
        query_id="vec_id",
        query_vec="embedding",
        base_id="vec_id",
        base_vec="embedding",
        label_col="lab",
    )
    plan = _plan(out)
    # Catalyst must rewrite crossJoin+equality into an equi hash join
    # keyed on the label — scoring never sees a cross product
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_filtered_knn_tags_containment(spark, emb):
    # two deterministic tags per node; query requires both of its own
    tagged = emb.withColumn(
        "tags",
        F.array((F.col("vec_id") % 5).cast("int"), (F.col("vec_id") % 7 + 10).cast("int")),
    )
    out = filtered_knn(
        tagged.filter(F.col("vec_id") < 4),
        tagged,
        k=K,
        query_id="vec_id",
        query_vec="embedding",
        base_id="vec_id",
        base_vec="embedding",
        tags_col="tags",
        exclude_self=True,
    ).collect()
    vecs = _np_vectors(emb)
    for qid in range(4):
        qtags = {qid % 5, qid % 7 + 10}
        cands = sorted(
            (
                (float(np.sqrt(((vecs[qid] - v) ** 2).sum())), i)
                for i, v in vecs.items()
                if qtags <= {i % 5, i % 7 + 10} and i != qid
            )
        )[:K]
        got = sorted(((r.dist, r.neighbor_id) for r in out if r.qid == qid))
        assert [i for _, i in got] == [i for _, i in cands], qid


def test_filtered_knn_tags_prebuilt_postings_reuse(spark, emb, tmp_path):
    """VERDICT r7 #5: a prebuilt (persisted) posting index must serve
    repeated query batches with identical results — and the prebuilt
    plan must not rescan the base for candidate generation."""
    from big_ann_spark.operators.knn import build_tag_postings

    tagged = emb.withColumn(
        "tags",
        F.array((F.col("vec_id") % 5).cast("int"), (F.col("vec_id") % 7 + 10).cast("int")),
    )
    ppath = str(tmp_path / "postings.parquet")
    build_tag_postings(tagged, base_id="vec_id", tags_col="tags").write.parquet(ppath)
    postings = spark.read.parquet(ppath)

    def run(lo, hi, **kw):
        return sorted(
            map(
                tuple,
                filtered_knn(
                    tagged.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
                    tagged,
                    k=K,
                    query_id="vec_id",
                    query_vec="embedding",
                    base_id="vec_id",
                    base_vec="embedding",
                    tags_col="tags",
                    exclude_self=True,
                    **kw,
                ).collect(),
            )
        )

    # two query batches against ONE prebuilt index, each equal to the
    # rebuild-per-call result
    for lo, hi in ((0, 3), (3, 6)):
        assert run(lo, hi, postings=postings) == run(lo, hi)


def test_filtered_knn_tags_duplicate_tag_and_empty_tag(spark, emb):
    # a repeated tag value inside one doc's array must not let that doc
    # occupy two ranks via duplicate postings
    tagged = emb.withColumn(
        "tags", F.array(F.lit(1), F.lit(1), (F.col("vec_id") % 2).cast("int"))
    )
    out = filtered_knn(
        tagged.filter(F.col("vec_id") < 2),
        tagged,
        k=K,
        query_id="vec_id",
        query_vec="embedding",
        base_id="vec_id",
        base_vec="embedding",
        tags_col="tags",
        exclude_self=True,
    ).collect()
    for qid in (0, 1):
        neighbors = [r.neighbor_id for r in out if r.qid == qid]
        assert len(neighbors) == len(set(neighbors)), qid

    # an empty tag set is unconstrained — rejected loudly, not silently
    # dropped from the result
    empties = emb.withColumn(
        "tags",
        F.when(F.col("vec_id") == 0, F.array().cast("array<int>")).otherwise(
            F.array((F.col("vec_id") % 2).cast("int"))
        ),
    )
    with pytest.raises(ValueError, match="empty tag set"):
        filtered_knn(
            empties.filter(F.col("vec_id") < 2),
            empties,
            k=K,
            query_id="vec_id",
            query_vec="embedding",
            base_id="vec_id",
            base_vec="embedding",
            tags_col="tags",
        )


def test_sparse_mips_matches_dense_dot(spark, emb):
    postings = sparsify_dense(emb, id_col="vec_id", vec_col="embedding", tau=TAU)
    out = sparse_mips_topk(
        postings.filter(F.col("id") < 5), postings, k=K, exclude_self=True
    ).collect()
    vecs = _np_vectors(emb)
    sp = {i: np.where(v > TAU, v, 0.0) for i, v in vecs.items()}
    for qid in range(5):
        scores = sorted(
            (
                (-float(sp[qid] @ v), i)
                for i, v in sp.items()
                if i != qid and float(sp[qid] @ v) != 0.0
            )
        )[:K]
        got = sorted(((-r.score, r.neighbor_id) for r in out if r.qid == qid))
        assert [i for _, i in got] == [i for _, i in scores], qid
        for (gs, _), (cs, _) in zip(got, scores):
            assert abs(gs - cs) < 1e-9


def test_rrf_fuse_matches_paper_formula(spark):
    from big_ann_spark.operators.fusion import rrf_fuse

    run_a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "qid long, neighbor_id long, rank int"
    )
    run_b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "qid long, neighbor_id long, rank int"
    )
    got = {
        r.neighbor_id: (r.rrf, r.rank)
        for r in rrf_fuse([run_a, run_b], k=10).collect()
    }
    want = {
        10: 1 / 61,            # run_a only
        11: 1 / 62 + 1 / 61,   # both runs
        12: 1 / 63,
        13: 1 / 62,            # run_b only — absence contributes 0
    }
    assert set(got) == set(want)
    for nid, w in want.items():
        assert abs(got[nid][0] - w) < 1e-12, nid
    order = [nid for nid, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [11, 10, 13, 12]
    # damping constant shifts scores but (here) not the order
    got_c5 = {r.neighbor_id: r.rrf for r in rrf_fuse([run_a, run_b], k=10, c=5).collect()}
    assert abs(got_c5[11] - (1 / 7 + 1 / 6)) < 1e-12


def test_sparse_mips_max_df_caps_hot_dims(spark, emb):
    postings = sparsify_dense(emb, id_col="vec_id", vec_col="embedding", tau=TAU)
    df_by_dim = {
        r.dim: r.c
        for r in postings.groupBy("dim").agg(F.count("*").alias("c")).collect()
    }
    cap = int(np.median(list(df_by_dim.values())))
    out = sparse_mips_topk(
        postings.filter(F.col("id") < 3), postings, k=K, max_df=cap, exclude_self=True
    ).collect()
    vecs = _np_vectors(emb)
    keep = {d for d, c in df_by_dim.items() if c <= cap}
    sp = {
        i: np.array(
            [v[d] if (v[d] > TAU and (d + 1) in keep) else 0.0 for d in range(len(v))]
        )
        for i, v in vecs.items()
    }
    for qid in range(3):
        scores = sorted(
            (
                (-float(sp[qid] @ v), i)
                for i, v in sp.items()
                if i != qid and float(sp[qid] @ v) != 0.0
            )
        )[:K]
        got = sorted(((-r.score, r.neighbor_id) for r in out if r.qid == qid))
        assert [i for _, i in got] == [i for _, i in scores], qid
