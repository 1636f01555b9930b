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
    # bigram feature space threads through the stage (VERDICT r8 #5)
    out2, _, _ = prep_corpus(
        corpus, ["quality", "dedup", "dsir"],
        dsir_target=target, dsir_n=3, dsir_buckets=64, dsir_ngram=2,
    )
    assert out2.count() == 3 and out2.columns == corpus.columns


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


def test_linededup_step_strips_boilerplate(spark):
    # a cookie-banner line shared by every doc plus a unique body line:
    # linededup (max_count=3 default, 5 occurrences) must strip the
    # banner from ALL docs but keep each unique body line.
    banner = "accept all cookies to continue"
    rows = [(i, banner + "\n" + f"unique body line number {i}", "s")
            for i in range(5)]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out, _, _ = prep_corpus(docs, ["linededup"])
    texts = {r.doc_id: r.text for r in out.collect()}
    assert len(texts) == 5
    for i, t in texts.items():
        assert banner not in t
        assert f"unique body line number {i}" == t
    # schema unchanged — the stage rebuilds text in place
    assert out.columns == docs.columns


def test_linededup_windowed_mode_for_single_line_corpora(spark):
    # no newlines at all: --line-words-per-line treats fixed token
    # windows as lines; a 4-token boilerplate phrase repeated across
    # docs is stripped when windows align on it.
    bp = "subscribe to our newsletter"
    rows = [(i, bp + f" article text piece {i}", "s") for i in range(6)]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out, _, _ = prep_corpus(docs, ["linededup"], line_words_per_line=4)
    for r in out.collect():
        assert bp not in r.text
        assert f"article text piece {r.doc_id}" == r.text


def test_lmfilter_step_drops_perplexity_tail(spark):
    # LM trained on clean prose (lm_docs); gibberish docs land in the
    # tail bucket and are dropped by the default head+middle keep.
    prose = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank while the sun sets slowly behind the tall green hills "
    )
    lm_docs = spark.createDataFrame(
        [(100 + i, prose, "wiki") for i in range(4)], _SCHEMA
    )
    rows = [(i, prose, "s") for i in range(7)] + [
        (7, "zxq vplk wfjd qqrm xxzz kpwl jjdf mmvv", "s"),
        (8, "qpzm wvxk dlfj rrqm zzxx lwpk fdjj vvmm", "s"),
        (9, "mzpq kxvw jfld mqrr xzzx klwp jfdj mvvm", "s"),
    ]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out, _, _ = prep_corpus(
        docs, ["lmfilter"], lm_docs=lm_docs, lm_order=2, lm_tail_frac=0.3,
    )
    ids = {r.doc_id for r in out.collect()}
    assert ids == set(range(7))  # the 3 gibberish docs are the tail
    assert out.columns == docs.columns


def test_linededup_and_lmfilter_run_before_page_level_stages(spark):
    # canonical order: linededup < c4/quality < lmfilter < dedup.
    # Two docs identical except for a boilerplate line: after
    # linededup their texts converge, so exact dedup collapses them —
    # proof the line stage ran first regardless of requested order.
    body = (
        "this is a perfectly reasonable sentence about the data and "
        "the system works fine today and tomorrow as well for sure."
    )
    rows = [
        (1, "accept cookies now please\n" + body, "a"),
        (2, "accept cookies now please\n" + body, "a"),
        (3, "accept cookies now please\n" + body, "a"),
        (4, "accept cookies now please\n" + body, "a"),
        (5, body, "a"),
    ]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out, _, tally = prep_corpus(
        docs, ["dedup", "linededup"], line_max_count=3, counts=True
    )
    assert {r.doc_id for r in out.collect()} == {1}
    assert list(tally) == ["linededup", "dedup"]  # canonical order
    assert tally["linededup"] == 5 and tally["dedup"] == 1


def test_cli_prep_line_and_lm_flags(spark, tmp_path):
    from big_ann_spark.cli import main

    prose = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank while the sun sets slowly behind the tall green hills "
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "accept all cookies\n" + prose + f"tail {i}", "s")
         for i in range(5)]
        + [(9, "zxq vplk wfjd qqrm xxzz kpwl jjdf mmvv", "s")],
        _SCHEMA,
    ).write.parquet(src)
    lm_src = str(tmp_path / "wiki")
    spark.createDataFrame(
        [(100 + i, prose, "wiki") for i in range(3)], _SCHEMA
    ).write.parquet(lm_src)
    dst = str(tmp_path / "out")
    assert (
        main(
            [
                "prep", src, dst,
                "--steps", "linededup,lmfilter",
                "--line-max-count", "3",
                "--lm-docs", lm_src, "--lm-order", "2",
                "--lm-keep", "head,middle",
            ]
        )
        == 0
    )
    docs = spark.read.parquet(f"{dst}/docs.parquet")
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(texts) == set(range(5))        # gibberish doc 9 dropped
    assert all("accept all cookies" not in t for t in texts.values())


def test_tmix_step_rebalances_sources(spark):
    rows = [(i, "w " * 9 + "w", "web") for i in range(900)]
    rows += [(900 + i, "b " * 9 + "b", "books") for i in range(100)]
    docs = spark.createDataFrame(rows, _SCHEMA)
    with pytest.raises(ValueError, match="tmix_total_tokens"):
        prep_corpus(docs, ["tmix"])
    out, _, tally = prep_corpus(
        docs, ["tmix", "dedup"], tmix_total_tokens=2000, tmix_alpha=0.5,
        counts=True,
    )
    # canonical order: dedup (collapses each source to 1 doc) runs
    # BEFORE tmix, so tmix budgets see the deduped corpus
    assert list(tally) == ["dedup", "tmix"]
    assert out.columns == docs.columns  # target_tokens is internal
    # on the 2-doc deduped corpus both sources fit any budget
    assert tally["dedup"] == 2 and tally["tmix"] == 2
    # without dedup, alpha=0.5 gives books ~25% of the budget (500 of
    # 2000 tokens) vs its natural 10% share: both sources sample down,
    # books far less aggressively
    out2, _, _ = prep_corpus(docs, ["tmix"], tmix_total_tokens=2000)
    by = {r.source: r.c for r in
          out2.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert 30 <= by["books"] <= 70     # ~50% of its 100 docs survive
    assert 0 < by["web"] < 300         # web sampled to ~17% of 900
    # output share of the small source beats its natural 1/9 share
    assert by["books"] / by["web"] > 1 / 9


def test_linededup_keeps_null_text_docs(spark):
    """NULL-text docs produce no line rows; the stage must keep them
    (NULL text intact) rather than dropping them via an inner join."""
    rows = [(1, "keep this line\nand this", "a"), (2, None, "a")]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out, _, _ = prep_corpus(docs, ["linededup"])
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[2] is None and "keep this line" in got[1]


def test_chunk_step_reunits_the_corpus(spark, corpus):
    """chunk: the corpus unit becomes the overlapping token-window
    chunk — chunk_id takes over doc_id, the parent doc id and source
    carry onto chunks, and pack placements reference CHUNK ids."""
    import math

    out, placements, _ = prep_corpus(
        corpus,
        ["dedup", "chunk", "pack"],
        chunk_tokens=24,
        chunk_overlap=8,
        pack_ctx=32,
    )
    rows = out.collect()
    # every surviving doc (exact dedup keeps one of 1/2) chunked:
    survivors = {r["parent_doc_id"] for r in rows}
    assert 5 in survivors and len(survivors) == 7  # 8 docs - 1 exact dup
    # chunk counts match the operator formula per doc
    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for pid in survivors:
        n = len(docs[pid].split(" "))
        want = max(1, math.ceil((n - 8) / 16))
        got = sum(1 for r in rows if r["parent_doc_id"] == pid)
        assert got == want, (pid, got, want)
    # source carried; chunk ids unique; placements reference chunk ids
    assert all(r["source"] in ("a", "b") for r in rows)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    placed = {r["doc_id"] for r in placements.collect()}
    assert placed == set(ids)


def test_cli_prep_chunk(spark, tmp_path, corpus):
    from big_ann_spark.cli import main

    src = str(tmp_path / "docs.parquet")
    corpus.write.parquet(src)
    dst = str(tmp_path / "out")
    assert main([
        "prep", src, dst, "--steps", "dedup,chunk",
        "--chunk-tokens", "24", "--chunk-overlap", "8",
    ]) == 0
    got = spark.read.parquet(f"{dst}/docs.parquet")
    assert {"doc_id", "parent_doc_id", "chunk_index", "text"} <= set(got.columns)
    assert got.count() > corpus.count()  # long docs yield several chunks


def test_chunk_step_tolerates_pretokenized_columns(spark, corpus):
    """A corpus that already ships an n_tokens column must not produce
    ambiguous duplicate columns after the chunk join."""
    pre = corpus.withColumn("n_tokens", F.size(F.split("text", " ")))
    out, _, _ = prep_corpus(pre, ["chunk"], chunk_tokens=24, chunk_overlap=8)
    assert out.columns.count("n_tokens") == 1
    assert out.count() > corpus.count()
