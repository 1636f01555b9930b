"""Hypothesis property tests for the retrieval extensions (sparse MIPS,
filtered kNN, RRF fusion) against independent pure-Python models. Few
examples — every example runs Spark jobs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_ann_spark.operators.fusion import rrf_fuse
from big_ann_spark.operators.knn import filtered_knn
from big_ann_spark.operators.sparse import sparse_mips_topk

# tiny integer-valued sparse vectors: exact float arithmetic, real
# overlap structure, and ties (equal scores) to exercise tie-breaks
postings_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),    # doc id
        st.integers(min_value=1, max_value=5),    # dim
        st.integers(min_value=1, max_value=4),    # value
    ),
    min_size=1,
    max_size=24,
).map(lambda rows: {(i, d): v for i, d, v in rows})  # last value wins per (id, dim)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(postings_strategy, st.integers(min_value=1, max_value=5))
def test_sparse_mips_matches_model_on_random_postings(spark, coo, k):
    """sparse_mips_topk == brute-force dot-product ranking for arbitrary
    COO postings (ties broken by neighbor id, zero-overlap docs absent),
    with integer values so float summation order cannot matter."""
    rows = [(i, d, float(v)) for (i, d), v in coo.items()]
    df = spark.createDataFrame(rows, "id long, dim int, val double")
    qids = sorted({i for i, _ in coo})[:2]
    q = df.filter(F.col("id").isin(qids))
    got = {}
    for r in sparse_mips_topk(q, df, k=k).collect():
        got.setdefault(r.qid, []).append((r.rank, r.neighbor_id, r.score))
    # model
    ids = sorted({i for i, _ in coo})
    for qid in qids:
        scores = {}
        for nid in ids:
            s = sum(
                coo[(qid, d)] * coo[(nid, d)]
                for d in range(1, 6)
                if (qid, d) in coo and (nid, d) in coo
            )
            if s:
                scores[nid] = float(s)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        have = sorted(got.get(qid, []))
        assert [(nid, s) for _, nid, s in have] == want, (qid, have, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=3), min_size=4, max_size=10),
    st.integers(min_value=1, max_value=4),
)
def test_filtered_knn_label_equals_postfilter_model(spark, labels, k):
    """Label-mode filtered kNN == post-filtering an exact kNN, for
    arbitrary label assignments over a fixed deterministic point set."""
    pts = [(i, [float(i % 5), float(i * i % 7)], int(lab)) for i, lab in enumerate(labels)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>, lab int")
    out = filtered_knn(
        df.filter(F.col("vec_id") < 2),
        df,
        k=k,
        query_id="vec_id",
        query_vec="embedding",
        base_id="vec_id",
        base_vec="embedding",
        label_col="lab",
        exclude_self=True,
    ).collect()
    for qid in (0, 1):
        if qid >= len(pts):
            continue
        qv, qlab = pts[qid][1], pts[qid][2]
        cands = sorted(
            (
                (math.dist(qv, v), i)
                for i, v, lab in pts
                if lab == qlab and i != qid
            )
        )[:k]
        got = sorted((r.dist, r.neighbor_id) for r in out if r.qid == qid)
        assert [i for _, i in got] == [i for _, i in cands], qid


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=9), min_size=1, max_size=5, unique=True
        ),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=1, max_value=100),
)
def test_rrf_fuse_matches_model_for_arbitrary_runs(spark, runs_ids, c):
    """RRF == the paper formula for arbitrary run sets and damping
    constants; rank ordering breaks ties on neighbor id."""
    runs = []
    model: dict[int, float] = {}
    for ids in runs_ids:
        rows = [(0, nid, r + 1) for r, nid in enumerate(ids)]
        runs.append(spark.createDataFrame(rows, "qid long, neighbor_id long, rank int"))
        for r, nid in enumerate(ids):
            model[nid] = model.get(nid, 0.0) + 1.0 / (c + r + 1)
    got = [
        (r.rank, r.neighbor_id, r.rrf)
        for r in sorted(rrf_fuse(runs, k=100, c=c).collect(), key=lambda r: r.rank)
    ]
    # scores must match the formula exactly-ish; ordering is compared on
    # ROUNDED scores because two ids can have mathematically equal sums
    # computed in different addition orders (1-ulp divergence would make
    # a strict order comparison flaky without being a real defect)
    assert {nid for _, nid, _ in got} == set(model)
    for _, nid, s in got:
        assert abs(s - model[nid]) < 1e-12, nid
    got_order = [nid for _, nid, _ in sorted(
        got, key=lambda t: (-round(t[2], 9), t[1])
    )]
    want_order = [nid for nid, _ in sorted(
        model.items(), key=lambda kv: (-round(kv[1], 9), kv[0])
    )]
    assert got_order == want_order
