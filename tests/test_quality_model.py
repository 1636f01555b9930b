"""Model-based quality classifier: learns to separate clean prose from
junk, round-trips through MLlib persistence, and composes as a filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_ann_spark.operators.quality_model import (
    heuristic_labels,
    score_quality,
    train_quality_classifier,
)

_SCHEMA = "doc_id long, text string"


def _corpus(spark, n=40):
    goods = [
        (
            i,
            "this is a perfectly reasonable sentence about the data and "
            f"the pipeline works well today item {i}. " * 6,
        )
        for i in range(n)
    ]
    junks = [
        (
            1000 + i,
            f"$$$ CLICK@@ {i} ###### zzz {'#' * (i % 7 + 3)} !!! buy now {i} %%%",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(goods + junks, _SCHEMA)


def test_classifier_separates_clean_from_junk(spark):
    docs = _corpus(spark)
    labeled = heuristic_labels(docs)
    # the heuristic must actually split the fixture, else the test is vacuous
    by_label = {r.label: r.c for r in labeled.groupBy("label").agg(F.count("*").alias("c")).collect()}
    assert by_label.get(1.0, 0) > 0 and by_label.get(0.0, 0) > 0

    model = train_quality_classifier(labeled, num_features=1 << 12, max_iter=25)
    # score HELD-OUT surface forms the training set never saw
    test = spark.createDataFrame(
        [
            (1, "this is a reasonable and well formed sentence about the "
                "system and the data that reads like real prose. " * 5),
            (2, "@@@@ $$$$ #### zzzz !!!! 0101010 buy buy buy %%%% ^^^^"),
        ],
        _SCHEMA,
    )
    probs = {r.doc_id: r.q_prob for r in score_quality(test, model).collect()}
    assert probs[1] > 0.5 > probs[2], probs
    assert probs[1] - probs[2] > 0.3, probs


def test_score_preserves_columns_and_composes_as_filter(spark):
    docs = _corpus(spark, n=20).withColumn("source", F.lit("s"))
    model = train_quality_classifier(
        heuristic_labels(docs), num_features=1 << 12, max_iter=15
    )
    scored = score_quality(docs, model)
    assert set(scored.columns) == {"doc_id", "text", "source", "q_prob"}
    kept = scored.filter(F.col("q_prob") >= 0.5)
    ids = {r.doc_id for r in kept.collect()}
    assert ids and all(i < 1000 for i in ids), sorted(ids)[:5]


def test_prep_mlquality_step(spark):
    from big_ann_spark.pipeline import prep_corpus

    docs = _corpus(spark, n=20).withColumn("source", F.lit("s"))
    model = train_quality_classifier(
        heuristic_labels(docs), num_features=1 << 12, max_iter=15
    )
    with pytest.raises(ValueError, match="quality_model"):
        prep_corpus(docs, ["mlquality"])
    out, _, _ = prep_corpus(
        docs, ["mlquality", "dedup"], quality_model=model, mlquality_min=0.5
    )
    ids = {r.doc_id for r in out.collect()}
    assert ids and all(i < 1000 for i in ids)
    assert set(out.columns) == {"doc_id", "text", "source"}  # q_prob dropped


def test_score_quality_rebinds_text_col(spark):
    docs = _corpus(spark, n=15)
    model = train_quality_classifier(
        heuristic_labels(docs), num_features=1 << 12, max_iter=10
    )
    renamed = docs.withColumnRenamed("text", "body")
    scored = score_quality(renamed, model, text_col="body")
    assert set(scored.columns) == {"doc_id", "body", "q_prob"}
    base = {r.doc_id: round(r.q_prob, 9) for r in score_quality(docs, model).collect()}
    got = {r.doc_id: round(r.q_prob, 9) for r in scored.collect()}
    assert got == base


def test_score_quality_rejects_wrong_pipeline_shape(spark):
    """A PipelineModel whose first stage is not an input-col transformer
    must fail with the contract, not an AttributeError (ADVICE r7)."""
    import pytest

    docs = _corpus(spark, n=5)

    class NotAPipeline:
        stages = [object()]

    with pytest.raises(ValueError, match="train_quality_classifier"):
        score_quality(docs, NotAPipeline())


def test_model_persistence_round_trip(spark, tmp_path):
    from pyspark.ml import PipelineModel

    docs = _corpus(spark, n=15)
    model = train_quality_classifier(
        heuristic_labels(docs), num_features=1 << 12, max_iter=10
    )
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = {(r.doc_id, round(r.q_prob, 9)) for r in score_quality(docs, model).collect()}
    b = {(r.doc_id, round(r.q_prob, 9)) for r in score_quality(docs, reloaded).collect()}
    assert a == b

    # the saved model is reachable from the prep CLI (--quality-model)
    import tempfile

    from big_ann_spark.cli import main

    src = tempfile.mkdtemp(prefix="qm_src_")
    docs.withColumn("source", __import__("pyspark").sql.functions.lit("s")) \
        .write.mode("overwrite").parquet(src)
    dst = str(tmp_path / "prep_out")
    assert main([
        "prep", src, dst, "--steps", "mlquality",
        "--quality-model", path, "--mlquality-min", "0.5",
    ]) == 0
    out = spark.read.parquet(f"{dst}/docs.parquet")
    assert out.count() > 0
    assert all(r.doc_id < 1000 for r in out.collect())
