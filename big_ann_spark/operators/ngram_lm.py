"""Distributed n-gram language model with Stupid Backoff scoring and
CCNet-style perplexity bucketing.

The real CCNet pipeline (Wenzek et al. 2020) scores every crawled
document with a KenLM 5-gram model and keeps the low-perplexity
head/middle buckets; this module is that filter re-expressed as Spark
aggregates and joins (the reference repo has no LM surface — this is a
training-data-pipeline extension, like the quality classifier):

- **Training** is ONE corpus-sized shuffle: explode each padded
  document into its order-n gram per position and count. Every
  lower-order count table derives from the n-gram table by SUFFIX
  grouping (the k-gram ending at position i IS the k-token suffix of
  the n-gram ending at i), and every context table by PREFIX grouping
  — all vocabulary-sized shuffles, independent of corpus size.
- **Scoring** (Brants et al. 2007 "Large Language Models in Machine
  Translation", the Stupid Backoff paper — built FOR distributed
  count tables) is per-position count-table joins plus a fixed-penalty
  backoff cascade: S_k = c_k/ctx_k when the k-gram was seen, else
  alpha * S_{k-1}; the base case is add-one smoothed,
  S_1 = (c_1+1)/(T+V), so out-of-vocabulary tokens score the floor
  1/(T+V) instead of zero. Everything is exact integer-count
  arithmetic + ln, so a DuckDB oracle reproduces scores bit-for-bit
  (mod the usual ROUND-6 sum-order tolerance).

Scale shape at 100 TB: the model is a DataFrame keyed by gram string —
broadcast it when the vocabulary is language-bounded (the common
case), or pass ``broadcast_model=False`` to shuffle-join scoring
positions against a model too large to broadcast (web-scale 5-gram
models are tens of GB; Brants et al. sharded them exactly this way).
The per-position feature arrays are built inside ONE bound lambda
(``bind_once``) so the padded token array is materialized once per row,
not once per position.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_ann_spark.functions.text import bind_once, tokens

BOS = "<s>"
ALPHA = 0.4  # the Stupid Backoff paper's fixed backoff penalty


class NgramLM(NamedTuple):
    """A trained model: three lazy DataFrames + the order.

    counts:   (k, gram, c)  — k-gram occurrence counts, k = 1..order
    contexts: (k, ctx, cc)  — context counts for order-k scoring
                              (cc = sum of c over k-grams sharing the
                              k-1-token prefix), k = 2..order
    totals:   one row (t_tokens, v_vocab) — unigram total + vocab size
    """

    counts: DataFrame
    contexts: DataFrame
    totals: DataFrame
    order: int


def _position_features(text_col: Column | str, order: int) -> Column:
    """Array of one struct per REAL token position: the k-gram ending
    there for k=1..order (``gk``) and its k-1-token context (``xk``),
    as space-joined strings over the BOS-padded token array. Built
    inside bind_once — HOF lambdas have no CSE, so without the binding
    the padded array would be rebuilt per position (O(len^2))."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    padded = F.concat(F.array_repeat(F.lit(BOS), order - 1), tokens(c))

    def feats(p: Column) -> Column:
        def per_pos(i: Column) -> Column:
            cols = []
            for k in range(1, order + 1):
                start = i - F.lit(k - 1)
                cols.append(F.array_join(F.slice(p, start, k), " ").alias(f"g{k}"))
                if k >= 2:
                    cols.append(
                        F.array_join(F.slice(p, start, k - 1), " ").alias(f"x{k}")
                    )
            return F.struct(*cols)

        return F.when(
            F.size(p) >= order,
            F.transform(F.sequence(F.lit(order), F.size(p)), per_pos),
        ).otherwise(F.array().cast(
            # typed empty array so the no-token branch unions cleanly
            _feats_type(order)
        ))

    return bind_once(padded, feats)


def _feats_type(order: int) -> str:
    fields = []
    for k in range(1, order + 1):
        fields.append(f"g{k}: string")
        if k >= 2:
            fields.append(f"x{k}: string")
    return f"array<struct<{', '.join(fields)}>>"


def train_ngram_lm(
    docs: DataFrame, *, order: int = 3, text_col: str = "text"
) -> NgramLM:
    """Count-table training. One corpus-sized shuffle (the order-n
    gram aggregate); all lower orders and all context tables derive
    from it by suffix/prefix grouping (vocabulary-sized inputs):
    the k-gram ending at position i is the k-token suffix of the
    n-gram ending at i, and the order-k context is its k-1-token
    prefix. Counts stay lazy DataFrames — broadcast or shuffle-join
    them at scoring time; persist with plain ``.write.parquet``."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    padded = F.concat(F.array_repeat(F.lit(BOS), order - 1), tokens(c))
    # train needs only the order-n gram per position — a plain string
    # array, not the full 2n-1-field scoring struct
    grams = bind_once(
        padded,
        lambda p: F.when(
            F.size(p) >= order,
            F.transform(
                F.sequence(F.lit(order), F.size(p)),
                lambda i: F.array_join(
                    F.slice(p, i - F.lit(order - 1), order), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    pos = docs.select(F.explode(grams).alias("gram"))
    top = pos.groupBy("gram").agg(F.count("*").alias("c"))
    # suffix_k(gram): last k space-delimited tokens; prefix via the
    # positive count. substring_index is a JVM scalar — no UDF.
    counts = top.select(F.lit(order).alias("k"), "gram", "c")
    lower = top
    for k in range(order - 1, 0, -1):
        lower = (
            lower.groupBy(
                F.substring_index("gram", " ", -k).alias("gram")
            ).agg(F.sum("c").alias("c"))
        )
        counts = counts.unionByName(
            lower.select(F.lit(k).alias("k"), "gram", "c")
        )
    contexts = None
    for k in range(2, order + 1):
        ctx_k = (
            counts.filter(F.col("k") == k)
            .groupBy(F.substring_index("gram", " ", k - 1).alias("ctx"))
            .agg(F.sum("c").alias("cc"))
            .select(F.lit(k).alias("k"), "ctx", "cc")
        )
        contexts = ctx_k if contexts is None else contexts.unionByName(ctx_k)
    if contexts is None:  # order == 1: no contexts
        contexts = counts.sparkSession.createDataFrame(
            [], "k int, ctx string, cc long"
        )
    totals = (
        counts.filter(F.col("k") == 1)
        .agg(F.sum("c").alias("t_tokens"), F.count("*").alias("v_vocab"))
    )
    return NgramLM(counts=counts, contexts=contexts, totals=totals, order=order)


def score_stupid_backoff(
    docs: DataFrame,
    lm: NgramLM,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    out_col: str = "lp_sb",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, lp) — the mean natural-log Stupid Backoff score per token
    of each document under ``lm``. Documents that produce no tokens
    get a NULL score (there is no principled score for an absent
    body).

    Per position the score is the backoff cascade
    ``S_k = c_k/ctx_k if the k-gram was seen else alpha * S_{k-1}``
    with the add-one unigram base ``(c_1+1)/(T+V)``; a seen k-gram
    implies a seen context, so the division is never 0/0. The plan is
    one explode of the scored corpus + 2*order-1 equi-joins against
    the (vocabulary-sized) count tables — broadcast by default, plain
    shuffle joins with ``broadcast_model=False`` for models too large
    to broadcast (the Brants-et-al. sharded regime)."""
    order = lm.order
    maybe_b = F.broadcast if broadcast_model else (lambda df: df)
    pos = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(_position_features(text_col, order)).alias("_f"),
    ).select("_id", "_f.*")
    joined = pos
    for k in range(1, order + 1):
        ck = lm.counts.filter(F.col("k") == k).select(
            F.col("gram").alias(f"g{k}"), F.col("c").alias(f"_c{k}")
        )
        joined = joined.join(maybe_b(ck), f"g{k}", "left")
        if k >= 2:
            xk = lm.contexts.filter(F.col("k") == k).select(
                F.col("ctx").alias(f"x{k}"), F.col("cc").alias(f"_cc{k}")
            )
            joined = joined.join(maybe_b(xk), f"x{k}", "left")
    joined = joined.crossJoin(F.broadcast(lm.totals))
    score = (
        (F.coalesce(F.col("_c1"), F.lit(0)) + 1).cast("double")
        / (F.col("t_tokens") + F.col("v_vocab")).cast("double")
    )
    for k in range(2, order + 1):
        score = F.when(
            F.col(f"_c{k}").isNotNull(),
            F.col(f"_c{k}").cast("double") / F.col(f"_cc{k}").cast("double"),
        ).otherwise(F.lit(alpha) * score)
    per_doc = (
        joined.select("_id", F.log(score).alias("_lp"))
        .groupBy("_id")
        .agg(F.avg("_lp").alias(out_col))
    )
    ids = docs.select(F.col(id_col).alias("_id"))
    return ids.join(per_doc, "_id", "left").withColumnRenamed("_id", id_col)


def ccnet_buckets(
    scored: DataFrame,
    *,
    lp_col: str = "lp_sb",
    head_frac: float = 0.3,
    tail_frac: float = 0.3,
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split by LM score: head = the
    ``head_frac`` best-scoring documents (highest mean log-prob =
    lowest perplexity), tail = the ``tail_frac`` worst, middle the
    rest; NULL-score docs bucket NULL. Thresholds are exact
    percentiles folded in as a broadcast one-row aggregate — the plan
    stays lazy, no driver collect.

    Determinism contract for oracle parity: bucket on a ROUNDED score
    column (the caller rounds lp to 6 first) so the percentile
    thresholds — interpolated from the same rounded doubles in both
    engines — compare identically at the boundaries."""
    lp = F.col(lp_col)
    thr = scored.agg(
        F.percentile(lp, F.lit(1.0 - head_frac)).alias("_hi"),
        F.percentile(lp, F.lit(tail_frac)).alias("_lo"),
    )
    return scored.crossJoin(F.broadcast(thr)).withColumn(
        out_col,
        F.when(lp.isNull(), F.lit(None).cast("string"))
        .when(lp >= F.col("_hi"), F.lit("head"))
        .when(lp < F.col("_lo"), F.lit("tail"))
        .otherwise(F.lit("middle")),
    ).drop("_hi", "_lo")


def save_ngram_lm(lm: NgramLM, path: str) -> None:
    """Persist the model (train once, filter every crawl batch after):
    the three count tables as parquet — counts bucket-partitioned by k
    so a scoring join of one order reads one directory set — plus a
    one-row meta carrying the order. Vocabulary-sized at any corpus
    size (language-bounded), so the write is cheap and the read side
    can keep broadcasting."""
    lm.counts.write.mode("overwrite").partitionBy("k").parquet(
        f"{path}/counts.parquet"
    )
    lm.contexts.write.mode("overwrite").partitionBy("k").parquet(
        f"{path}/contexts.parquet"
    )
    lm.totals.write.mode("overwrite").parquet(f"{path}/totals.parquet")
    lm.totals.sparkSession.createDataFrame(
        [(lm.order,)], "n_order int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.parquet")


def load_ngram_lm(spark, path: str) -> NgramLM:
    """Lazy scans over a :func:`save_ngram_lm` layout. The per-k
    scoring filters (`k == i`) land as partition pruning on the
    bucketed counts/contexts dirs."""
    order = spark.read.parquet(f"{path}/meta.parquet").collect()[0][0]
    return NgramLM(
        counts=spark.read.parquet(f"{path}/counts.parquet"),
        contexts=spark.read.parquet(f"{path}/contexts.parquet"),
        totals=spark.read.parquet(f"{path}/totals.parquet"),
        order=order,
    )
