"""DSIR importance resampling (operators/importance.py) and the
deterministic training-shard layout (operators/packing.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_ann_spark.operators.dedup import MINHASH_P
from big_ann_spark.operators.importance import (
    dsir_lambda_table,
    dsir_log_weights,
    dsir_resample,
)
from big_ann_spark.operators.packing import (
    assign_training_shards,
    write_training_shards,
)


def _corpus(spark):
    # two clearly separated vocabularies: "code"-flavored docs and
    # "prose"-flavored docs; the target is prose
    rows = []
    for i in range(40):
        rows.append((i, "def func return import class lambda yield", "code"))
    for i in range(40, 80):
        rows.append((i, "the quick brown fox jumps over lazy dogs", "prose"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_log_weights_separate_target_lookalikes(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    w = dsir_log_weights(docs, target, n_buckets=128).toPandas()
    prose = w[w.kind == "prose"].log_weight
    code = w[w.kind == "code"].log_weight
    # every prose doc outweighs every code doc under a prose target
    assert prose.min() > code.max()
    assert all(math.isfinite(v) for v in w.log_weight)


def test_resample_prefers_target_lookalikes(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    sel = dsir_resample(docs, target, 30, n_buckets=128).toPandas()
    assert len(sel) == 30
    # weights here are far apart (one shared-vocab doc vs the other
    # class), so Gumbel noise (stddev ~1.3) cannot flip the classes
    assert (sel.kind == "prose").all()
    assert set(sel.columns) >= {"doc_id", "log_weight", "gumbel_key"}


def test_resample_deterministic_across_partitionings(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    a = dsir_resample(docs, target, 10, n_buckets=64, salt=7).toPandas()
    b = dsir_resample(
        docs.repartition(13), target.repartition(5), 10, n_buckets=64, salt=7
    ).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    assert list(a.doc_id) == list(b.doc_id)  # selection ORDER too


def test_resample_salt_changes_gumbel_not_weights(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    a = dsir_log_weights(docs, target, n_buckets=64).toPandas()
    s1 = dsir_resample(docs, target, 79, n_buckets=64, salt=1).toPandas()
    s2 = dsir_resample(docs, target, 79, n_buckets=64, salt=2).toPandas()
    # same weights regardless of salt
    m1 = dict(zip(s1.doc_id, s1.log_weight))
    m2 = dict(zip(s2.doc_id, s2.log_weight))
    base = dict(zip(a.doc_id, a.log_weight))
    for d in set(m1) & set(m2):
        assert m1[d] == m2[d] == base[d]
    # but different selection order (the Gumbel keys moved)
    assert list(s1.doc_id) != list(s2.doc_id)


def test_n_out_exceeding_corpus_returns_all(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    sel = dsir_resample(docs, target, 1000, n_buckets=64)
    assert sel.count() == docs.count()


def test_lambda_table_is_one_bounded_row(spark):
    docs = _corpus(spark)
    lam = dsir_lambda_table(
        docs, docs.filter(F.col("kind") == "prose"), n_buckets=32
    ).toPandas()
    assert len(lam) == 1
    assert len(lam.lam.iloc[0]) == 32
    # totals match the raw token counts (split on ' ', empties included)
    n_words = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    assert lam.r_total.iloc[0] == n_words


def test_resample_plan_has_no_corpus_wide_sort(spark):
    """Selection must run as TakeOrdered (per-partition top-k heads),
    not a global Sort+Limit over the corpus."""
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    plan = dsir_resample(docs, target, 5, n_buckets=32)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_shard_assignment_matches_hash_and_balances(spark):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("w x y z").alias("text")
    )
    out = assign_training_shards(docs, 16, salt=5).toPandas()
    a, p = 2654435761, MINHASH_P
    a5 = pow(a, 6, p)  # _stable_hash's per-salt multiplier, salt=5
    for did, shard, order in zip(out.doc_id, out.shard, out.shard_order):
        h = ((did % p + 5) % p) * a5 % p
        assert shard == h % 16 and order == h
    counts = out.groupby("shard").size()
    assert len(counts) == 16
    # multiplicative-hash balance: no shard more than 2x the mean
    assert counts.max() <= 2 * counts.mean()


def test_write_training_shards_layout_and_order(spark, tmp_path):
    docs = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, 8, salt=3).toPandas()
    assert sorted(manifest.shard) == list(range(8))
    assert manifest.n_docs.sum() == 500
    assert (manifest.n_tokens == manifest.n_docs * 2).all()  # "tok <id>"
    back = spark.read.parquet(path)
    assert back.count() == 500
    # partition column round-trips and matches the hash assignment
    expect = assign_training_shards(docs, 8, salt=3).select("doc_id", "shard")
    got = back.select("doc_id", F.col("shard").cast("int").alias("shard"))
    assert expect.exceptAll(got).count() == 0 and got.exceptAll(expect).count() == 0
    # in-file order: each shard file is sorted by (shard_order, doc_id)
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(f"{path}/shard=*/*.parquet")
    assert len(files) == 8
    for f in files:
        t = pq.read_table(f, columns=["shard_order", "doc_id"]).to_pandas()
        key = list(zip(t.shard_order, t.doc_id))
        assert key == sorted(key)


def test_target_pred_and_bucket_col_match_default_path(spark):
    """The two plan-level levers (single-scan dual-model aggregate,
    precomputed bucket array) must be value-identical to the plain
    two-DataFrame path."""
    from big_ann_spark.operators.importance import doc_buckets

    docs = _corpus(spark)
    base = dsir_log_weights(
        docs, docs.filter(F.col("kind") == "prose"), n_buckets=64
    ).toPandas()
    fast = (
        dsir_log_weights(
            docs.withColumn("_bs", doc_buckets("text", 64)),
            None,
            n_buckets=64,
            bucket_col="_bs",
            target_pred=F.col("kind") == "prose",
        )
        .drop("_bs")
        .toPandas()
    )
    a = dict(zip(base.doc_id, base.log_weight))
    b = dict(zip(fast.doc_id, fast.log_weight))
    assert a == b


def test_lambda_table_requires_exactly_one_target_form(spark):
    import pytest

    docs = _corpus(spark)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_lambda_table(docs, None)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_lambda_table(docs, docs, target_pred=F.lit(True))


def _phrase_corpus(spark):
    """Unigram-identical, order-distinct: every doc has the SAME bag of
    words; only adjacent-pair structure separates target-like docs
    ("new york city") from shuffled decoys ("york city new")."""
    rows = []
    for i in range(30):
        rows.append((i, "visit new york city today people", "phrase"))
    for i in range(30, 60):
        rows.append((i, "visit york new today city people", "decoy"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_bigram_features_see_word_order_unigrams_cannot(spark):
    """VERDICT r8 #5 A/B: with identical unigram bags, ngram=1 weights
    are EQUAL across classes (bag-of-words is order-blind) while
    ngram=2 strictly separates them."""
    docs = _phrase_corpus(spark)
    target = docs.filter(F.col("kind") == "phrase")

    w1 = dsir_log_weights(docs, target, n_buckets=128, ngram=1).toPandas()
    assert w1[w1.kind == "phrase"].log_weight.max() == (
        w1[w1.kind == "decoy"].log_weight.max()
    )
    assert w1.log_weight.nunique() == 1

    w2 = dsir_log_weights(docs, target, n_buckets=128, ngram=2).toPandas()
    assert (
        w2[w2.kind == "phrase"].log_weight.min()
        > w2[w2.kind == "decoy"].log_weight.max()
    )

    sel = dsir_resample(docs, target, 20, n_buckets=128, ngram=2).toPandas()
    assert (sel.kind == "phrase").all()


def test_bigram_bucket_array_is_unigrams_then_pairs(spark):
    from big_ann_spark.operators.importance import doc_buckets, word_bucket

    df = spark.createDataFrame([("a b c",), ("solo",)], "text string")
    got = df.select(doc_buckets("text", 64, ngram=2).alias("bs")).collect()
    uni = {
        r.w: r.b
        for r in spark.createDataFrame(
            [("a",), ("b",), ("c",), ("solo",), ("a b",), ("b c",)], "w string"
        ).select("w", word_bucket(F.col("w"), 64).alias("b")).collect()
    }
    assert got[0].bs == [uni["a"], uni["b"], uni["c"], uni["a b"], uni["b c"]]
    assert got[1].bs == [uni["solo"]]  # single word: no pairs


def test_distributed_selection_equals_takeordered(spark):
    """ADVICE r8: past materialize_limit the selection is a slim-cutoff
    + distributed filter — exact same SET as the TakeOrdered path, and
    the returned plan carries no TakeOrdered over the full rows."""
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    small = dsir_resample(docs, target, 45, n_buckets=64, salt=3).toPandas()
    big = dsir_resample(
        docs, target, 45, n_buckets=64, salt=3, materialize_limit=10
    )
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan  # full rows never funnel
    bigp = big.toPandas()
    assert sorted(bigp.doc_id) == sorted(small.doc_id)
    m1 = dict(zip(small.doc_id, small.gumbel_key))
    m2 = dict(zip(bigp.doc_id, bigp.gumbel_key))
    assert m1 == m2


def test_distributed_selection_n_out_exceeding_corpus(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("kind") == "prose")
    sel = dsir_resample(docs, target, 1000, n_buckets=64, materialize_limit=10)
    assert sel.count() == docs.count()
