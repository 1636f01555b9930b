"""Binary (sign-bit) quantization: packed-code parity vs a pure-Python
model, Hamming-distance exactness, and the two-tier rerank contract.

The registered ``knn_cosine_top5`` variants certify the full pipeline
against DuckDB; these tests pin the operator contracts directly so a
refactor that breaks bit packing fails here at sf0.001 first."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import pq as PQ


def _py_pack(vec, thresholds, word_bits=32):
    """Reference model: the packing contract in plain Python."""
    d = len(thresholds)
    n_words = (d + word_bits - 1) // word_bits
    words = []
    for w in range(n_words):
        acc = 0
        for j in range(word_bits):
            pos = w * word_bits + j
            if pos < d and vec[pos] > thresholds[pos]:
                acc += 1 << j
        words.append(acc)
    return words


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    thr = PQ.train_binary(emb)
    codes = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding"),
        PQ.binarize_col("embedding", thr).alias("codes"),
    ).cache()
    return emb, thr, codes


def test_midrange_thresholds(trained):
    emb, thr, _ = trained
    rows = emb.select(F.col("embedding").cast("array<double>")).collect()
    X = np.array([r[0] for r in rows])
    exp = (X.min(axis=0) + X.max(axis=0)) / 2
    assert np.array_equal(np.array(thr), exp)  # bit-exact, no tolerance


def test_codes_match_python_model(trained):
    _, thr, codes = trained
    rows = codes.select("embedding", "codes").collect()
    for r in rows:
        vec = [float(x) for x in r["embedding"]]
        assert list(r["codes"]) == _py_pack(vec, thr)


def test_codes_are_projection_no_python(spark, trained):
    """Packing must be a pure column expression: no Exchange, no
    Python evaluation node."""
    from big_ann_spark.plans import executed_plan

    emb, thr, _ = trained
    plan = executed_plan(
        emb.select(PQ.binarize_col("embedding", thr).alias("codes"))
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=5,
        max_size=70,
    ),
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=5,
        max_size=70,
    ),
)
def test_hamming_matches_python_model(vec_a, vec_b):
    """Property (no Spark in the loop — pure-model check of the pack +
    popcount algebra): hamming(pack(a), pack(b)) == # of dims whose
    bits differ, for random vectors and a zero threshold."""
    d = min(len(vec_a), len(vec_b))
    vec_a, vec_b = vec_a[:d], vec_b[:d]
    thr = [0.0] * d
    pa, pb = _py_pack(vec_a, thr), _py_pack(vec_b, thr)
    ham = sum(bin(x ^ y).count("1") for x, y in zip(pa, pb))
    expected = sum((a > 0.0) != (b > 0.0) for a, b in zip(vec_a, vec_b))
    assert ham == expected


def test_hamming_knn_spark_vs_numpy(spark, trained):
    """End-to-end operator parity: Spark Hamming top-k equals the
    numpy brute-force ranking on the same codes."""
    _, thr, codes = trained
    rows = sorted(codes.select("id", "codes").collect(), key=lambda r: r["id"])
    ids = np.array([r["id"] for r in rows])
    C = np.array([list(r["codes"]) for r in rows], dtype=np.uint64)
    q = codes.filter(F.col("id") < 5).select(
        F.col("id").alias("qid"), F.col("codes").alias("qcodes")
    )
    got = (
        PQ.hamming_knn(q, codes, k=3, query_codes="qcodes")
        .orderBy("qid", "rank")
        .collect()
    )
    for qid in range(5):
        qc = C[ids == qid][0]
        hd = np.zeros(len(ids), dtype=np.int64)
        for w in range(C.shape[1]):
            hd += np.vectorize(lambda x: bin(int(x)).count("1"))(
                C[:, w] ^ qc[w]
            ).astype(np.int64)
        order = np.lexsort((ids, hd))[:3]
        mine = [(r["neighbor_id"], r["dist"]) for r in got if r["qid"] == qid]
        assert [m[0] for m in mine] == [int(ids[i]) for i in order]
        assert [m[1] for m in mine] == [float(hd[i]) for i in order]


def test_hamming_rerank_contract(spark, trained):
    """Rerank output must be a subset of the Hamming candidate pool,
    ordered by exact L2."""
    emb, thr, codes = trained
    q = (
        emb.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("qid"),
            PQ.binarize_col("embedding", thr).alias("qcodes"),
            F.col("embedding").alias("qvec"),
        )
    )
    pool = PQ.hamming_knn(q, codes, k=12, query_codes="qcodes").collect()
    pool_ids = {(r["qid"], r["neighbor_id"]) for r in pool}
    rr = PQ.hamming_knn(
        q,
        codes,
        k=3,
        query_codes="qcodes",
        rerank_with=emb.select(F.col("vec_id").alias("id"), "embedding"),
        rerank_factor=4,
    ).collect()
    assert all((r["qid"], r["neighbor_id"]) in pool_ids for r in rr)
    by_q = {}
    for r in sorted(rr, key=lambda r: (r["qid"], r["rank"])):
        by_q.setdefault(r["qid"], []).append(r["dist"])
    for dists in by_q.values():
        assert dists == sorted(dists) and len(dists) == 3
