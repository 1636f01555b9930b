"""DSIR-style importance resampling: select raw-corpus documents that
look like a small target corpus, by importance weights under hashed
unigram bag-of-words models (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — public method; the
reference engine has no counterpart, this is training-data-pipeline
surface like operators/dedup.py's mixing family).

Three pieces, all column expressions:

- a hashed feature space: word -> ``poly_hash(word) % n_buckets`` (the
  same portable polynomial hash every fingerprint op uses, so a DuckDB
  oracle reproduces bucket ids bit-exactly);
- per-doc log importance weight ``log p_target(doc) - log p_raw(doc)``
  under add-one-smoothed bucket unigram models — a left fold over the
  doc's words of a broadcast lambda-table lookup (deterministic
  summation order, so the oracle matches to float-fold tolerance);
- deterministic Gumbel top-k selection: sampling-without-replacement
  proportional to the softmax of the weights, derandomized by driving
  the Gumbel noise from the content-stable multiplicative hash that
  ``hash_sample`` uses — reruns, repartitions, and the SQL oracle all
  pick the identical document set.

Scale shape: the two bucket-count aggregates output ``n_buckets`` rows
(a constant, default 1024) regardless of corpus size and fold into one
broadcast row; scoring is a zero-shuffle per-row fold; selection is a
global top-k (TakeOrdered — per-partition heads, no full sort). One
scan of raw + one of target, no shuffle keyed on anything
corpus-sized: at 100 TB the cost is the two scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_ann_spark.functions.text import FINGERPRINT_BASE, FINGERPRINT_MOD, poly_hash
from big_ann_spark.operators.dedup import MINHASH_P, _stable_hash

DSIR_BUCKETS = 1024


def word_bucket(
    word: Column,
    n_buckets: int = DSIR_BUCKETS,
    *,
    base: int = FINGERPRINT_BASE,
    mod: int = FINGERPRINT_MOD,
) -> Column:
    """Hash a word to a feature bucket: ``poly_hash(word) % n_buckets``.
    poly_hash is non-negative, so ``%`` and ``pmod`` agree."""
    return poly_hash(word, base, mod) % n_buckets


def _words(text_col: Column | str) -> Column:
    # plain split, empties included — matches the oracle's string_split
    # (the '' word hashes to bucket 0 identically on both engines)
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def _bucket_counts(docs: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    return (
        docs.select(F.explode(_words(text_col)).alias("_w"))
        .select(word_bucket(F.col("_w"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
    )


def dsir_lambda_table(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """ONE-row DataFrame holding the per-bucket log-likelihood-ratio
    array ``lam`` (position b = ``ln p_t(b) - ln p_r(b)``, add-one
    smoothed) plus the totals it was built from. Kept lazy — the
    bucket counts stay aggregates (n_buckets rows) folded into a map,
    never a driver collect — so callers broadcast-join it and the
    whole weight computation is a single plan."""
    tc = _bucket_counts(target, text_col, n_buckets)
    rc = _bucket_counts(raw, text_col, n_buckets)
    joined = (
        tc.withColumnRenamed("c", "ct")
        .join(rc.withColumnRenamed("c", "cr"), "b", "full_outer")
        .select(
            F.col("b").cast("long").alias("b"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    one = joined.agg(
        F.sum("ct").alias("t_total"),
        F.sum("cr").alias("r_total"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b"), F.struct("ct", "cr")))
        ).alias("_m"),
    )
    denom_t = (F.col("t_total") + F.lit(n_buckets)).cast("double")
    denom_r = (F.col("r_total") + F.lit(n_buckets)).cast("double")

    def lam_at(b):
        e = F.element_at(F.col("_m"), b)
        ct = (F.coalesce(e["ct"], F.lit(0)) + 1).cast("double")
        cr = (F.coalesce(e["cr"], F.lit(0)) + 1).cast("double")
        return F.log(ct / denom_t) - F.log(cr / denom_r)

    return one.select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_buckets - 1).cast("long")),
            lam_at,
        ).alias("lam"),
        "t_total",
        "r_total",
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    weight_col: str = "log_weight",
) -> DataFrame:
    """``docs`` plus a ``log_weight`` column: the DSIR log importance
    weight of each document under hashed-unigram models of ``target``
    (numerator) vs ``docs`` itself (denominator). Positive = looks
    more like the target than like the raw corpus.

    The per-doc sum is a LEFT FOLD over the doc's words in document
    order (F.aggregate over the broadcast lambda array) — zero
    shuffle, deterministic summation, oracle-reproducible via DuckDB's
    list_reduce."""
    lam_row = dsir_lambda_table(docs, target, text_col=text_col, n_buckets=n_buckets)
    with_lam = docs.crossJoin(F.broadcast(lam_row.select("lam")))
    logw = F.aggregate(
        F.transform(
            _words(text_col),
            lambda w: F.element_at(
                F.col("lam"), (word_bucket(w, n_buckets) + 1).cast("int")
            ),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return with_lam.select(*docs.columns, logw.alias(weight_col))


def gumbel_key(
    logw: Column,
    id_col: str,
    *,
    salt: int = 0,
    mod: int = MINHASH_P,
) -> Column:
    """Deterministic Gumbel-top-k key: ``log_weight + Gumbel(0,1)``
    where the Gumbel variate is ``-ln(-ln u)`` for
    ``u = (stable_hash(id)+0.5)/p`` — the exact multiplicative hash
    hash_sample uses, so u is uniform on (0,1), never 0 or 1, and
    identical across engines. Taking the global top-k of this key
    samples k documents without replacement with probability
    proportional to ``exp(log_weight)`` (the Gumbel-max trick)."""
    u = (_stable_hash(id_col, salt, 2654435761, mod) + F.lit(0.5)) / F.lit(
        float(mod)
    )
    return logw + (-F.log(-F.log(u)))


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    n_out: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: int = 0,
) -> DataFrame:
    """Select ``n_out`` documents from ``docs`` by DSIR importance
    resampling toward ``target``: Gumbel top-k over the log importance
    weights. Returns the selected docs with ``log_weight`` and the
    selection ``gumbel_key`` (descending = selection order).

    Ties in the key are broken by id for full determinism; the
    selection is reproducible across runs, partitionings, and the SQL
    oracle. The limit executes as TakeOrdered (per-partition top-k,
    then a driver merge of k-sized heads), not a global sort."""
    weighted = dsir_log_weights(
        docs, target, text_col=text_col, n_buckets=n_buckets
    )
    keyed = weighted.withColumn(
        "gumbel_key", gumbel_key(F.col("log_weight"), id_col, salt=salt)
    )
    return keyed.orderBy(
        F.col("gumbel_key").desc(), F.col(id_col).asc()
    ).limit(n_out)
