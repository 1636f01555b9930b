"""DSIR-style importance resampling: select raw-corpus documents that
look like a small target corpus, by importance weights under hashed
unigram bag-of-words models (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling" — public method; the
reference engine has no counterpart, this is training-data-pipeline
surface like operators/dedup.py's mixing family).

Three pieces, all column expressions:

- a hashed feature space: word -> ``poly_hash(word) % n_buckets`` (the
  same portable polynomial hash every fingerprint op uses, so a DuckDB
  oracle reproduces bucket ids bit-exactly); ``ngram=2`` appends
  hashed adjacent-word pairs (the paper's n-gram features — word
  order becomes signal);
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


def doc_buckets(
    text_col: Column | str, n_buckets: int = DSIR_BUCKETS, *, ngram: int = 1
) -> Column:
    """The per-doc feature array: every word mapped to its bucket; with
    ``ngram=2`` (the paper's hashed n-gram feature space, Xie et al.
    2023 §3) the unigram buckets are followed by the buckets of every
    adjacent word PAIR hashed as the space-joined string — word order
    becomes signal, which pure bag-of-words can't see. Still one
    column expression over the words array (the pair list is a
    zip_with of two slices — no explode, no shuffle).

    Precompute this ONCE into a column (ideally on an already-
    materialized table) and pass it as ``bucket_col`` — the character-
    level polynomial hash is the dominant cost of the whole DSIR
    computation, and without the precompute it runs once per consumer
    (raw counts, target counts, scoring = 3 full hash passes)."""
    if ngram not in (1, 2):
        raise ValueError(f"ngram must be 1 or 2, got {ngram}")
    ws = _words(text_col)
    uni = F.transform(ws, lambda w: word_bucket(w, n_buckets))
    if ngram == 1:
        return uni
    n_pairs = F.greatest(F.size(ws) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(ws, 1, n_pairs),
        F.slice(ws, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(uni, F.transform(pairs, lambda w: word_bucket(w, n_buckets)))


def _bucket_arr(
    docs: DataFrame, text_col: str, n_buckets: int, bucket_col: str | None,
    ngram: int = 1,
) -> Column:
    return (
        F.col(bucket_col)
        if bucket_col is not None
        else doc_buckets(text_col, n_buckets, ngram=ngram)
    )


def dsir_lambda_table(
    raw: DataFrame,
    target: DataFrame | None = None,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    bucket_col: str | None = None,
    target_pred: Column | None = None,
    ngram: int = 1,
) -> DataFrame:
    """ONE-row DataFrame holding the per-bucket log-likelihood-ratio
    array ``lam`` (position b = ``ln p_t(b) - ln p_r(b)``, add-one
    smoothed) plus the totals it was built from. Kept lazy — the
    bucket counts stay aggregates (n_buckets rows) folded into a map,
    never a driver collect — so callers broadcast-join it and the
    whole weight computation is a single plan.

    Pass EITHER ``target`` (a separate DataFrame — two count scans) or
    ``target_pred`` (a boolean Column over ``raw`` marking the target
    slice — ONE scan computes both models: per bucket, count(*) is the
    raw count and the predicate-conditional count is the target
    count). ``bucket_col`` names a precomputed ``doc_buckets`` array
    column to skip re-hashing."""
    bs = _bucket_arr(raw, text_col, n_buckets, bucket_col, ngram)
    if (target is None) == (target_pred is None):
        raise ValueError("pass exactly one of target / target_pred")
    if target_pred is not None:
        joined = (
            raw.select(F.explode(bs).alias("b"), target_pred.alias("_t"))
            .groupBy("b")
            .agg(
                F.count(F.when(F.col("_t"), 1)).alias("ct"),
                F.count("*").alias("cr"),
            )
            .select(F.col("b").cast("long").alias("b"), "ct", "cr")
        )
    else:
        tbs = _bucket_arr(target, text_col, n_buckets, bucket_col, ngram)
        tc = (
            target.select(F.explode(tbs).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("ct"))
        )
        rc = (
            raw.select(F.explode(bs).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("cr"))
        )
        joined = tc.join(rc, "b", "full_outer").select(
            F.col("b").cast("long").alias("b"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
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
    target: DataFrame | None = None,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    weight_col: str = "log_weight",
    bucket_col: str | None = None,
    target_pred: Column | None = None,
    ngram: int = 1,
) -> DataFrame:
    """``docs`` plus a ``log_weight`` column: the DSIR log importance
    weight of each document under hashed-unigram models of ``target``
    (numerator) vs ``docs`` itself (denominator). Positive = looks
    more like the target than like the raw corpus.

    The per-doc sum is a LEFT FOLD over the doc's words in document
    order (F.aggregate over the broadcast lambda array) — zero
    shuffle, deterministic summation, oracle-reproducible via DuckDB's
    list_reduce. ``bucket_col``/``target_pred`` are the two plan-level
    levers (see dsir_lambda_table): with both, the whole computation
    is ONE count scan + ONE scoring scan with the word hashing done
    once, wherever ``bucket_col`` was materialized."""
    lam_row = dsir_lambda_table(
        docs,
        target,
        text_col=text_col,
        n_buckets=n_buckets,
        bucket_col=bucket_col,
        target_pred=target_pred,
        ngram=ngram,
    )
    with_lam = docs.crossJoin(F.broadcast(lam_row.select("lam")))
    bs = _bucket_arr(docs, text_col, n_buckets, bucket_col, ngram)
    logw = F.aggregate(
        F.transform(
            bs, lambda b: F.element_at(F.col("lam"), (b + 1).cast("int"))
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


MATERIALIZE_LIMIT = 100_000


def dsir_resample(
    docs: DataFrame,
    target: DataFrame | None,
    n_out: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: int = 0,
    bucket_col: str | None = None,
    target_pred: Column | None = None,
    ngram: int = 1,
    materialize_limit: int = MATERIALIZE_LIMIT,
) -> DataFrame:
    """Select ``n_out`` documents from ``docs`` by DSIR importance
    resampling toward ``target``: Gumbel top-k over the log importance
    weights. Returns the selected docs with ``log_weight`` and the
    selection ``gumbel_key`` (descending = selection order).

    Ties in the key are broken by id for full determinism; the
    selection is reproducible across runs, partitionings, and the SQL
    oracle.

    Selection shape (ADVICE r8): up to ``materialize_limit`` the limit
    executes as TakeOrdered over the FULL rows (per-partition top-k,
    then one merge of k-sized heads) — fine while n_out × row width
    fits one task. A training-scale ``n_out`` (the README example is
    1M docs) must never funnel every selected document's text through
    one merge, so past the threshold the cutoff is found on a SLIM
    (key, id) projection — two 16-byte columns — and the full rows are
    then selected by a distributed FILTER against the broadcast cutoff:
    exact same set, selection stays on the executors, result order is
    unspecified (sort by ``gumbel_key`` desc if order matters)."""
    weighted = dsir_log_weights(
        docs,
        target,
        text_col=text_col,
        n_buckets=n_buckets,
        bucket_col=bucket_col,
        target_pred=target_pred,
        ngram=ngram,
    )
    keyed = weighted.withColumn(
        "gumbel_key", gumbel_key(F.col("log_weight"), id_col, salt=salt)
    )
    if n_out <= materialize_limit:
        return keyed.orderBy(
            F.col("gumbel_key").desc(), F.col(id_col).asc()
        ).limit(n_out)
    # the scoring lineage would otherwise run twice (cutoff pass +
    # final filter pass); at this n_out the corpus is big — keep the
    # recompute, but only of the slim projection
    slim = keyed.select(
        F.col("gumbel_key").alias("_k"), F.col(id_col).alias("_i")
    )
    cut = (
        slim.orderBy(F.col("_k").desc(), F.col("_i").asc())
        .limit(n_out)
        .orderBy(F.col("_k").asc(), F.col("_i").desc())
        .limit(1)
        .collect()
    )
    if not cut:
        return keyed.limit(0)
    kth_key, kth_id = cut[0]._k, cut[0]._i
    return keyed.filter(
        (F.col("gumbel_key") > kth_key)
        | ((F.col("gumbel_key") == kth_key) & (F.col(id_col) <= kth_id))
    )
