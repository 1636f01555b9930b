"""BM25: parity against a pure-Python reference, cap/tie semantics."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from big_ann_spark.operators.bm25 import B, K1, bm25_index, bm25_topk

DOCS = [
    (0, "spark query engine for big data"),
    (1, "spark query engine for big data"),          # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "big data needs a fast query engine"),
    (4, "fox and dog and fox"),
    (5, "completely unrelated words entirely"),
    (6, "spark spark spark spark spark spark spark"),
]


def _py_bm25(query_text, k1=K1, b=B, max_df=None, exclude_self=None):
    tfs = {i: Counter(t.split(" ")) for i, t in DOCS}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    dfc = Counter(t for c in tfs.values() for t in c)
    out = {}
    for i, c in tfs.items():
        if i == exclude_self:
            continue
        s = 0.0
        for t, qtf in Counter(query_text.split(" ")).items():
            if t not in c or (max_df is not None and dfc[t] > max_df):
                continue
            idf = math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
            s += qtf * idf * c[t] * (k1 + 1) / (
                c[t] + k1 * (1 - b + b * dls[i] / avgdl)
            )
        if s > 0:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_python_reference(spark, corpus):
    idx = bm25_index(corpus)
    got = bm25_topk(
        corpus.filter(F.col("doc_id") == 0), idx, k=10, exclude_self=True
    ).collect()
    want = _py_bm25(DOCS[0][1], exclude_self=0)
    got_scores = {r.neighbor_id: r.score for r in got}
    assert set(got_scores) == set(want)
    for i, s in want.items():
        assert got_scores[i] == pytest.approx(s, rel=1e-12)
    # the exact duplicate must rank first
    assert got[0].neighbor_id == 1 and got[0].rank == 1


def test_max_df_drops_stopword_terms(spark, corpus):
    idx = bm25_index(corpus)
    got = {
        r.neighbor_id: r.score
        for r in bm25_topk(
            corpus.filter(F.col("doc_id") == 0), idx, k=10, max_df=2
        ).collect()
    }
    want = _py_bm25(DOCS[0][1], max_df=2)
    assert set(got) == set(want)
    for i, s in want.items():
        assert got[i] == pytest.approx(s, rel=1e-12)


def test_rounded_ties_break_by_doc_id(spark, corpus):
    """Docs 0 and 1 are identical → identical BM25 scores from any
    query that hits them; with score_round the tie must break by id."""
    idx = bm25_index(corpus)
    q = spark.createDataFrame([(99, "big data query")], "doc_id long, text string")
    got = bm25_topk(q, idx, k=10, score_round=6).collect()
    r01 = [r for r in got if r.neighbor_id in (0, 1)]
    assert r01[0].score == r01[1].score
    assert r01[0].neighbor_id == 0 and r01[0].rank + 1 == r01[1].rank


def test_index_stats(spark, corpus):
    idx = bm25_index(corpus)
    st = idx.stats.collect()[0]
    dls = [len(t.split(" ")) for _, t in DOCS]
    assert st.n_docs == len(DOCS)
    assert st.avgdl == pytest.approx(sum(dls) / len(dls))
    dfc = {r.term: r.df for r in idx.dfs.collect()}
    assert dfc["spark"] == 3 and dfc["fox"] == 2


def test_no_overlap_doc_absent(spark, corpus):
    idx = bm25_index(corpus)
    q = spark.createDataFrame([(7, "quick fox")], "doc_id long, text string")
    got = {r.neighbor_id for r in bm25_topk(q, idx, k=10).collect()}
    assert 5 not in got and got == {2, 4}
