"""Stupid-Backoff n-gram LM: parity against a pure-Python reference
model, plus bucket semantics."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from big_ann_spark.operators.ngram_lm import (
    ALPHA,
    BOS,
    NgramLM,
    ccnet_buckets,
    score_stupid_backoff,
    train_ngram_lm,
)

DOCS = [
    (0, "the cat sat on the mat", "train"),
    (1, "the cat sat on the hat", "train"),
    (2, "a dog ran in the park", "train"),
    (3, "the cat ran in the park", "train"),
    (4, "the cat sat on the mat", "score"),   # exact dup of 0
    (5, "zebra quark sat on nothing", "score"),  # mostly OOV
    (6, "the the the the", "score"),
    (7, "park the in ran dog a", "score"),    # seen words, unseen order
]


def _py_model(texts, order):
    counts = [Counter() for _ in range(order + 1)]  # counts[k]
    for t in texts:
        toks = [BOS] * (order - 1) + t.split(" ")
        for i in range(order - 1, len(toks)):
            for k in range(1, order + 1):
                counts[k][tuple(toks[i - k + 1 : i + 1])] += 1
    return counts


def _py_score(text, counts, order, alpha=ALPHA):
    ctx = [Counter() for _ in range(order + 1)]
    for k in range(2, order + 1):
        for g, c in counts[k].items():
            ctx[k][g[:-1]] += c
    T = sum(counts[1].values())
    V = len(counts[1])
    toks = [BOS] * (order - 1) + text.split(" ")
    lps = []
    for i in range(order - 1, len(toks)):
        s = (counts[1].get((toks[i],), 0) + 1) / (T + V)
        for k in range(2, order + 1):
            g = tuple(toks[i - k + 1 : i + 1])
            if counts[k].get(g, 0) > 0:
                s = counts[k][g] / ctx[k][g[:-1]]
            else:
                s = alpha * s
        lps.append(math.log(s))
    return sum(lps) / len(lps) if lps else None


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, split string")


@pytest.mark.parametrize("order", [1, 2, 3])
def test_scores_match_python_reference(spark, corpus, order):
    train = corpus.filter(F.col("split") == "train")
    lm = train_ngram_lm(train, order=order)
    got = {
        r.doc_id: r.lp_sb
        for r in score_stupid_backoff(corpus, lm).collect()
    }
    pymodel = _py_model([d[1] for d in DOCS if d[2] == "train"], order)
    for doc_id, text, _ in DOCS:
        want = _py_score(text, pymodel, order)
        assert got[doc_id] == pytest.approx(want, rel=1e-12), (order, doc_id)


def test_count_tables_match_python(spark, corpus):
    lm = train_ngram_lm(corpus.filter(F.col("split") == "train"), order=3)
    pymodel = _py_model([d[1] for d in DOCS if d[2] == "train"], 3)
    got = {
        (r.k, r.gram): r.c for r in lm.counts.collect()
    }
    want = {
        (k, " ".join(g)): c
        for k in (1, 2, 3)
        for g, c in pymodel[k].items()
    }
    assert got == want
    t = lm.totals.collect()[0]
    assert t.t_tokens == sum(pymodel[1].values())
    assert t.v_vocab == len(pymodel[1])


def test_shuffle_join_path_matches_broadcast(spark, corpus):
    lm = train_ngram_lm(corpus.filter(F.col("split") == "train"), order=2)
    a = {r.doc_id: r.lp_sb for r in score_stupid_backoff(corpus, lm).collect()}
    b = {
        r.doc_id: r.lp_sb
        for r in score_stupid_backoff(corpus, lm, broadcast_model=False).collect()
    }
    # ULP-tolerant: the per-doc AVG sums per-position log scores in a
    # partition-dependent order, and the shuffle-join path partitions
    # positions differently from the broadcast path (AQE layout varies
    # with cluster load) — the engines' oracle contract rounds scores
    # for exactly this reason
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12, abs=1e-12)


def test_duplicate_docs_score_identically(spark, corpus):
    lm = train_ngram_lm(corpus.filter(F.col("split") == "train"), order=3)
    got = {r.doc_id: r.lp_sb for r in score_stupid_backoff(corpus, lm).collect()}
    assert got[0] == got[4]


def test_ccnet_buckets(spark, corpus):
    lm = train_ngram_lm(corpus.filter(F.col("split") == "train"), order=3)
    scored = score_stupid_backoff(corpus, lm).withColumn(
        "lp_sb", F.round("lp_sb", 6)
    )
    out = ccnet_buckets(scored, head_frac=0.25, tail_frac=0.25)
    rows = {r.doc_id: r.ppl_bucket for r in out.collect()}
    vals = sorted(
        (r.lp_sb, r.doc_id) for r in scored.collect()
    )
    # worst 25% -> tail, best 25% -> head (8 docs: thresholds at exact
    # percentiles; the OOV doc must be tail, a training dup must be head)
    assert rows[5] == "tail"
    assert rows[0] == "head" or rows[4] == "head"
    assert set(rows.values()) == {"head", "middle", "tail"}
    # boundary determinism: bucket assignment keys off rounded values
    hi = [d for (v, d) in vals[-2:]]
    assert all(rows[d] == "head" for d in hi) or rows[vals[-2][1]] == "middle"


def test_empty_text_scores_null(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, None)], "doc_id long, text string"
    )
    lm = train_ngram_lm(docs.filter(F.col("text").isNotNull()), order=2)
    got = {r.doc_id: r.lp_sb for r in score_stupid_backoff(docs, lm).collect()}
    assert got[0] is not None and got[1] is None


def test_model_persistence_roundtrip(spark, corpus, tmp_path):
    lm = train_ngram_lm(corpus.filter(F.col("split") == "train"), order=3)
    lm.counts.write.parquet(str(tmp_path / "counts"))
    lm.contexts.write.parquet(str(tmp_path / "contexts"))
    lm.totals.write.parquet(str(tmp_path / "totals"))
    lm2 = NgramLM(
        counts=spark.read.parquet(str(tmp_path / "counts")),
        contexts=spark.read.parquet(str(tmp_path / "contexts")),
        totals=spark.read.parquet(str(tmp_path / "totals")),
        order=3,
    )
    a = {r.doc_id: r.lp_sb for r in score_stupid_backoff(corpus, lm).collect()}
    b = {r.doc_id: r.lp_sb for r in score_stupid_backoff(corpus, lm2).collect()}
    assert a == b


def test_save_load_ngram_lm(spark, corpus, tmp_path):
    """save_ngram_lm/load_ngram_lm round-trip: identical scores, order
    restored from meta, and the per-k scoring filters prune the
    k-partitioned counts layout."""
    from big_ann_spark.operators.ngram_lm import load_ngram_lm, save_ngram_lm

    lm = train_ngram_lm(corpus.filter(F.col("split") == "train"), order=3)
    path = str(tmp_path / "lm")
    save_ngram_lm(lm, path)
    lm2 = load_ngram_lm(spark, path)
    assert lm2.order == 3
    a = {r.doc_id: r.lp_sb for r in score_stupid_backoff(corpus, lm).collect()}
    b = {r.doc_id: r.lp_sb for r in score_stupid_backoff(corpus, lm2).collect()}
    assert a == b
    # the k filter lands as partition pruning on the bucketed layout
    sel = lm2.counts.filter(F.col("k") == 2)
    plan = sel._sc._jvm.PythonSQLUtils.explainString(
        sel._jdf.queryExecution(), "formatted"
    )
    after = plan.split("PartitionFilters", 1)[1][:120]
    assert "k" in after, plan[:2000]


def test_cli_lm_train_then_prep(spark, tmp_path):
    from big_ann_spark.cli import main

    prose = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank while the sun sets slowly behind the tall green hills "
    )
    wiki = str(tmp_path / "wiki")
    spark.createDataFrame(
        [(100 + i, prose, "wiki") for i in range(3)],
        "doc_id long, text string, source string",
    ).write.parquet(wiki)
    lm_dir = str(tmp_path / "lm")
    assert main(["lm-train", wiki, lm_dir, "--order", "2"]) == 0

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, prose + f"tail {i}", "s") for i in range(5)]
        + [(9, "zxq vplk wfjd qqrm xxzz kpwl jjdf mmvv", "s")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    dst = str(tmp_path / "out")
    assert (
        main(
            ["prep", src, dst, "--steps", "lmfilter", "--lm-model", lm_dir]
        )
        == 0
    )
    docs = spark.read.parquet(f"{dst}/docs.parquet")
    assert {r.doc_id for r in docs.collect()} == set(range(5))
