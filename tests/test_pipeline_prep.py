"""The one-call prep pipeline: canonical step ordering, step semantics
composing the oracle-checked operators, and the CLI wrapper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_ann_spark.pipeline import STEP_ORDER, prep_corpus

_SCHEMA = "doc_id long, text string, source string"


@pytest.fixture()
def corpus(spark):
    good = (
        "this is a perfectly reasonable sentence about the data and "
        "the system works fine today. " * 8
    )
    rows = [
        (1, good + "unique tail one.", "a"),
        (2, good + "unique tail one.", "a"),          # exact dup of 1
        (3, good + "unique tail two.", "a"),          # near-dup of 1
        (4, "entirely different and much shorter text that is about "
            "nothing in particular but still has the stopwords it "
            "needs to pass the quality floor today. " * 8, "b"),
        (5, "short junk", "b"),                        # fails quality
        (6, "write to bob@example.com for help. " + good + "tail six.", "b"),
        (7, good + "tail seven.", "b"),
        (8, good + "tail eight.", "b"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_unknown_step_and_missing_params_rejected(spark, corpus):
    with pytest.raises(ValueError, match="unknown steps"):
        prep_corpus(corpus, ["dedup", "frobnicate"])
    with pytest.raises(ValueError, match="max_per_source"):
        prep_corpus(corpus, ["cap"])
    with pytest.raises(ValueError, match="sample_fraction"):
        prep_corpus(corpus, ["sample"])
    with pytest.raises(ValueError, match="pack_ctx"):
        prep_corpus(corpus, ["pack"])
    # string ids would hash to null and silently drop everything
    s = corpus.withColumn("doc_id", F.col("doc_id").cast("string"))
    with pytest.raises(ValueError, match="integer type"):
        prep_corpus(s, ["sample"], sample_fraction=0.5)


def test_steps_apply_in_canonical_order_regardless_of_input_order(spark, corpus):
    a, _, _ = prep_corpus(corpus, ["neardup", "quality", "dedup"])
    b, _, _ = prep_corpus(corpus, ["dedup", "neardup", "quality"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_semantics_compose(spark, corpus):
    out, placements, tally = prep_corpus(
        corpus,
        ["quality", "dedup", "neardup", "pack"],
        neardup_threshold=0.5,
        pack_ctx=16,
        counts=True,
    )
    ids = {r.doc_id for r in out.collect()}
    assert 5 not in ids          # quality floor
    assert 2 not in ids          # exact dup loses to min-id 1
    assert 3 not in ids          # near-dup cluster rep is 1
    assert 1 in ids and 4 in ids
    # tally is monotone non-increasing along the canonical order
    seq = [tally[s] for s in STEP_ORDER if s in tally]
    assert seq == sorted(seq, reverse=True)
    # packing covers exactly the surviving docs
    assert {r.doc_id for r in placements.collect()} == ids


def test_pii_redacts_before_quality(spark, corpus):
    out, _, _ = prep_corpus(corpus, ["pii"])
    t6 = out.filter(F.col("doc_id") == 6).collect()[0].text
    assert "bob@example.com" not in t6
    assert "<EMAIL>" in t6


def test_cap_and_sample(spark, corpus):
    out, _, _ = prep_corpus(corpus, ["quality", "cap"], max_per_source=2)
    by_src = {
        r.source: r.c
        for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert all(c <= 2 for c in by_src.values())

    full, _, _ = prep_corpus(corpus, ["sample"], sample_fraction=1.0)
    assert full.count() == corpus.count()


def test_cli_prep(spark, tmp_path):
    from big_ann_spark.cli import main

    src = str(tmp_path / "src")
    good = (
        "this is a perfectly reasonable sentence about the data and "
        "the system works fine today. " * 8
    )
    spark.createDataFrame(
        [(i, good + f"tail {i}.", "s") for i in range(6)]
        + [(99, good + "tail 0.", "s")],  # dup of doc 0 (same text)
        _SCHEMA,
    ).write.parquet(src)
    dst = str(tmp_path / "out")
    assert (
        main(
            [
                "prep", src, dst,
                "--steps", "quality,dedup,pack",
                "--pack-ctx", "32",
                "--counts",
            ]
        )
        == 0
    )
    docs = spark.read.parquet(f"{dst}/docs.parquet")
    assert docs.count() == 6  # 99 deduped against 0... (same text, min id 0 kept)
    assert spark.read.parquet(f"{dst}/pack.parquet").count() == 6


def test_dsir_step_selects_target_lookalikes(spark, corpus):
    # target: docs resembling source-a prose (use the 'a' slice itself)
    target = corpus.filter(F.col("source") == "a")
    with pytest.raises(ValueError, match="dsir_target"):
        prep_corpus(corpus, ["dsir"])
    out, _, _ = prep_corpus(
        corpus, ["quality", "dedup", "dsir"],
        dsir_target=target, dsir_n=3, dsir_buckets=64,
    )
    assert out.count() == 3
    # selection columns are internal — the cleaned schema is unchanged
    assert out.columns == corpus.columns


def test_cli_prep_with_shards(spark, tmp_path):
    from big_ann_spark.cli import main

    src = str(tmp_path / "src")
    good = (
        "this is a perfectly reasonable sentence about the data and "
        "the system works fine today. " * 8
    )
    spark.createDataFrame(
        [(i, good + f"tail {i}.", "s") for i in range(20)], _SCHEMA
    ).write.parquet(src)
    dst = str(tmp_path / "out")
    assert (
        main(["prep", src, dst, "--steps", "quality,dedup", "--shards", "4"])
        == 0
    )
    shards = spark.read.parquet(f"{dst}/shards")
    assert shards.count() == 20
    assert shards.select("shard").distinct().count() == 4
