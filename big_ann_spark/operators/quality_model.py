"""Model-based document-quality filtering — the modern counterpart of
the heuristic `functions/text.quality_score` floor: train a linear
classifier on labeled examples (human labels, LLM judgments, or
bootstrapped heuristic labels) and filter the corpus by predicted
probability. This is the FineWeb-Edu / fastText-classifier pattern
every current pretraining pipeline ships, expressed on MLlib so both
training and inference are JVM-side and scale with the cluster.

Spark-first shape:
- featurization is ``Tokenizer → HashingTF`` — per-row projections, no
  vocabulary build, no shuffle, dimensionality fixed by the hash width
  (the fastText bag-of-words analog);
- training is MLlib ``LogisticRegression`` (treeAggregate per
  iteration — the standard distributed convex fit);
- inference is ``model.transform`` — coefficients broadcast, one
  projection per row; composes with the rest of a pipeline as a plain
  filter on the probability column.

The classifier is deliberately linear: at 100 TB the inference cost of
scoring every crawl page dominates, and a hashed linear model scores in
one fused projection. Anything heavier (cross-encoders) belongs on a
sampled subset, not the full corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PROB_OF_POSITIVE = "q_prob"


def train_quality_classifier(
    labeled: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the tokenize→hash→logistic pipeline on ``labeled``
    (``label_col``: 1.0 = keep-worthy, 0.0 = junk). Returns a
    ``PipelineModel``; persist with ``model.write().save(path)`` /
    reload with ``PipelineModel.load`` (same MLlib persistence contract
    the KMeans sharder uses, S10)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    tf = HashingTF(inputCol="_words", outputCol="features", numFeatures=num_features)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[tok, tf, lr]).fit(
        labeled.withColumn(label_col, F.col(label_col).cast("double"))
    )


def score_quality(
    docs: DataFrame,
    model,
    *,
    text_col: str = "text",
    prob_col: str = _PROB_OF_POSITIVE,
) -> DataFrame:
    """Append ``prob_col`` = P(keep) to ``docs``; all original columns
    pass through, model bookkeeping columns are dropped. Filtering is
    then ``.filter(F.col(prob_col) >= t)`` — t trades corpus size for
    quality exactly like the FineWeb-Edu threshold."""
    from pyspark.ml.functions import vector_to_array

    try:
        inp = model.stages[0].getInputCol()
    except (AttributeError, IndexError) as e:
        # an arbitrary PipelineModel whose first stage is not an
        # input-col transformer must fail with the CONTRACT, not an
        # AttributeError deep in a transform (ADVICE r7)
        raise ValueError(
            "score_quality expects a train_quality_classifier-shaped "
            "PipelineModel: stage 0 must be the text-input transformer "
            "(RegexTokenizer) exposing getInputCol(); got "
            f"{type(model.stages[0]).__name__ if getattr(model, 'stages', None) else model!r}"
        ) from e
    feed = docs
    if text_col != inp:
        # rebind the scoring column to the model's trained input name —
        # without this the parameter would silently score a stale
        # column (or fail) whenever the caller's text column differs
        # from the training-time name
        feed = docs.withColumn(inp, F.col(text_col))
    scored = model.transform(feed)
    return scored.select(
        *docs.columns,
        vector_to_array("probability").getItem(1).alias(prob_col),
    )


def heuristic_labels(
    docs: DataFrame,
    *,
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Bootstrap labels from the heuristic quality score — the
    weak-supervision seed when no human/LLM labels exist yet (label
    noise is the accepted trade; the classifier generalizes the
    heuristic across surface forms the rules never mention)."""
    from big_ann_spark.functions.text import quality_score

    return docs.withColumn(
        "label", (quality_score(text_col) >= threshold).cast("double")
    )
