"""One-call pretraining-prep pipeline — the cleaning lifecycle the
query registry certifies piecewise (pipeline_clean_corpus variants),
packaged as a composable batch job a corpus owner actually runs:

    line dedup (CCNet boilerplate cap) → C4 heuristics → PII
    redaction → quality floor → model-based quality (optional
    classifier) → LM perplexity filter (optional Stupid-Backoff
    head/middle keep) → exact dedup → near-dup (MinHash cluster
    reps) → per-source cap → hash sample → temperature mix (optional
    n^alpha source rebalance) → DSIR selection (optional, toward a
    target corpus) → token-window chunking (optional; the unit becomes
    the chunk) → sequence packing

Every stage is one of the engine's oracle-checked operators applied in
a FIXED canonical order (the order the public pipelines use: cheap
page-local filters first so the expensive dedup joins see the smallest
corpus; near-dup after exact so clusters are not inflated by byte
clones; capping/sampling after dedup so caps count unique docs; packing
last because it assigns offsets in final corpus order). ``steps``
selects a subset; order is never caller-defined, so two runs with the
same step set are always the same pipeline.

100 TB posture is inherited from the pieces: page-local stages are pure
column expressions in one scan; exact dedup shuffles 8-byte hashes;
near-dup is the banded LSH family (hot-key caps available); cap/sample
are content-stable hashes (WindowGroupLimit / filter); packing is the
ranged two-pass prefix sum. Nothing here adds a driver-side loop."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STEP_ORDER = [
    "linededup", "c4", "pii", "quality", "mlquality", "lmfilter", "dedup",
    "neardup", "cap", "sample", "tmix", "dsir", "chunk", "pack",
]


def prep_corpus(
    docs: DataFrame,
    steps: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    quality_min: float = 0.5,
    quality_model=None,
    mlquality_min: float = 0.5,
    neardup_threshold: float = 0.8,
    shingle_n: int = 3,
    max_per_source: int | None = None,
    sample_fraction: float | None = None,
    dsir_target: DataFrame | None = None,
    dsir_n: int | None = None,
    dsir_buckets: int = 1024,
    dsir_ngram: int = 1,
    pack_ctx: int | None = None,
    line_max_count: int = 3,
    line_sep: str = "\n",
    line_words_per_line: int | None = None,
    lm_docs: DataFrame | None = None,
    lm_model=None,
    lm_order: int = 3,
    lm_keep: tuple[str, ...] = ("head", "middle"),
    lm_head_frac: float = 0.3,
    lm_tail_frac: float = 0.3,
    tmix_total_tokens: int | None = None,
    tmix_alpha: float = 0.5,
    chunk_tokens: int | None = None,
    chunk_overlap: int = 32,
    counts: bool = False,
) -> tuple[DataFrame, DataFrame | None, dict[str, int]]:
    """Run the selected ``steps`` (any subset of ``STEP_ORDER``; applied
    in canonical order regardless of the order given) over ``docs``.

    Returns ``(cleaned_docs, pack_placements_or_None, step_counts)``.
    ``step_counts`` maps step → surviving row count and is only
    populated when ``counts=True`` (each count is an extra job — a
    debugging aid, not the production path)."""
    unknown = set(steps) - set(STEP_ORDER)
    if unknown:
        raise ValueError(f"unknown steps {sorted(unknown)}; choose from {STEP_ORDER}")
    todo = [s for s in STEP_ORDER if s in set(steps)]
    if "cap" in todo and max_per_source is None:
        raise ValueError("step 'cap' needs max_per_source")
    if "sample" in todo and sample_fraction is None:
        raise ValueError("step 'sample' needs sample_fraction")
    if "pack" in todo and pack_ctx is None:
        raise ValueError("step 'pack' needs pack_ctx")
    if "tmix" in todo and tmix_total_tokens is None:
        raise ValueError("step 'tmix' needs tmix_total_tokens")
    if "mlquality" in todo and quality_model is None:
        raise ValueError(
            "step 'mlquality' needs quality_model (a PipelineModel from "
            "operators.quality_model.train_quality_classifier)"
        )
    if "dsir" in todo and (dsir_target is None or dsir_n is None):
        raise ValueError(
            "step 'dsir' needs dsir_target (a DataFrame of target-domain "
            "docs) and dsir_n (how many docs to select)"
        )
    if {"cap", "sample", "tmix", "dsir"} & set(todo):
        from pyspark.sql.types import IntegralType

        if not isinstance(docs.schema[id_col].dataType, IntegralType):
            # the content-stable hash is arithmetic mod p: a string id
            # would cast to null and silently drop EVERY row
            raise ValueError(
                f"steps cap/sample hash the id column; {id_col!r} is "
                f"{docs.schema[id_col].dataType.simpleString()}, need an "
                "integer type (hash string ids to int64 first, e.g. "
                "xxhash64)"
            )

    from big_ann_spark.functions import text as T
    from big_ann_spark.operators import dedup as D

    out = docs
    placements = None
    tally: dict[str, int] = {}
    for step in todo:
        if step == "linededup":
            # CCNet stage 1: strip corpus-frequent (boilerplate) lines
            # and rebuild the text; runs FIRST so boilerplate never
            # distorts the page-local quality signals or dedup keys.
            # One line-keyed count shuffle + broadcast anti-join + one
            # doc-keyed rebuild shuffle (operators/lines.py).
            from big_ann_spark.operators.lines import (
                docs_to_lines,
                strip_boilerplate_lines,
                windowed_lines,
            )

            lines = (
                windowed_lines(
                    out,
                    id_col=id_col,
                    text_col=text_col,
                    words_per_line=line_words_per_line,
                )
                if line_words_per_line is not None
                else docs_to_lines(
                    out, id_col=id_col, text_col=text_col, sep=line_sep
                )
            )
            sep = " " if line_words_per_line is not None else line_sep
            reb = strip_boilerplate_lines(
                lines, max_count=line_max_count, sep=sep
            ).select(F.col("id").alias(id_col), F.col("text").alias("_lt"))
            # LEFT join: NULL-text docs produce no line rows so never
            # reach the rebuild — they keep their NULL text here and
            # fall to the later stages' null handling, instead of
            # being silently deleted by an inner join
            out = (
                out.join(reb, id_col, "left")
                .withColumn(text_col, F.coalesce(F.col("_lt"), F.col(text_col)))
                .drop("_lt")
            )
        elif step == "lmfilter":
            # CCNet's LM filter: score under a Stupid-Backoff n-gram
            # model (trained on lm_docs — the Wikipedia role — or
            # self-trained) and keep the lm_keep perplexity buckets.
            from big_ann_spark.operators.ngram_lm import (
                ccnet_buckets,
                score_stupid_backoff,
                train_ngram_lm,
            )

            # precedence: a pre-trained model (train once with
            # lm-train, reuse per batch) > a training corpus (the
            # Wikipedia role) > self-training on the corpus itself
            lm = (
                lm_model
                if lm_model is not None
                else train_ngram_lm(
                    lm_docs if lm_docs is not None else out,
                    order=lm_order,
                    text_col=text_col,
                )
            )
            scored = score_stupid_backoff(
                out, lm, id_col=id_col, text_col=text_col
            ).withColumn("lp_sb", F.round("lp_sb", 6))
            keep_ids = (
                ccnet_buckets(
                    scored, head_frac=lm_head_frac, tail_frac=lm_tail_frac
                )
                .filter(F.col("ppl_bucket").isin(list(lm_keep)))
                .select(id_col)
            )
            out = out.join(keep_ids, id_col, "leftsemi")
        elif step == "c4":
            c4 = T.c4_clean(text_col)
            out = (
                out.withColumn("_kept", c4["kept_text"])
                .withColumn("_drop", c4["drop_page"])
                .filter(~F.col("_drop"))
                .withColumn(text_col, F.col("_kept"))
                .drop("_kept", "_drop")
            )
        elif step == "pii":
            out = out.withColumn(text_col, T.redact_pii(text_col))
        elif step == "quality":
            out = out.filter(T.quality_score(text_col) >= quality_min)
        elif step == "mlquality":
            from big_ann_spark.operators.quality_model import score_quality

            out = (
                score_quality(out, quality_model, text_col=text_col)
                .filter(F.col("q_prob") >= mlquality_min)
                .drop("q_prob")
            )
        elif step == "dedup":
            kept = D.exact_dedup(out, id_col=id_col, text_col=text_col).select(
                F.col("kept_doc_id").alias(id_col)
            )
            out = out.join(kept, id_col, "leftsemi")
        elif step == "neardup":
            reps = D.minhash_dedup_clusters(
                out,
                id_col=id_col,
                text_col=text_col,
                n=shingle_n,
                threshold=neardup_threshold,
            )
            out = out.join(
                reps.filter(F.col("doc_id") == F.col("cluster_rep")).select(
                    F.col("doc_id").alias(id_col)
                ),
                id_col,
                "leftsemi",
            )
        elif step == "cap":
            out = D.cap_per_source(
                out, max_per_source, id_col=id_col, source_col=source_col
            )
        elif step == "sample":
            out = D.hash_sample(out, sample_fraction, id_col=id_col)
        elif step == "tmix":
            # temperature mixing (T5/UNIMAX): per-source token budgets
            # proportional to token_count^alpha — rebalances toward the
            # tail sources AFTER the mechanical caps, BEFORE dsir/pack
            # spend the remaining budget (salt 7: unused by the other
            # salted stages)
            out = D.temperature_mix(
                out,
                tmix_total_tokens,
                alpha=tmix_alpha,
                id_col=id_col,
                text_col=text_col,
                source_col=source_col,
                salt=7,
            ).drop("target_tokens")
        elif step == "dsir":
            from big_ann_spark.operators.importance import dsir_resample

            # selection toward the target domain runs AFTER the
            # mechanical caps/samples (those bound volume; DSIR then
            # spends its budget on the best-matching survivors)
            out = dsir_resample(
                out,
                dsir_target,
                dsir_n,
                id_col=id_col,
                text_col=text_col,
                n_buckets=dsir_buckets,
                ngram=dsir_ngram,
            ).drop("log_weight", "gumbel_key")
        elif step == "chunk":
            from big_ann_spark.operators.packing import chunk_documents

            if chunk_tokens is None:
                raise ValueError("chunk step needs chunk_tokens")
            # the chunk becomes the corpus unit from here on: chunk_id
            # takes over id_col (pack placements reference chunks),
            # the parent doc id is kept, and every non-text doc column
            # (source, …) is carried onto the doc's chunks. Drop any
            # carried column the chunker also emits (n_tokens etc.) —
            # a pre-tokenized corpus must not produce ambiguous
            # duplicate columns after the join
            carried = out.drop(
                text_col, "chunk_index", "chunk_id", "n_tokens"
            )
            out = (
                chunk_documents(
                    out, chunk_tokens=chunk_tokens, overlap=chunk_overlap,
                    id_col=id_col, text_col=text_col,
                )
                .join(carried, id_col)
                .withColumnRenamed(id_col, f"parent_{id_col}")
                .withColumnRenamed("chunk_id", id_col)
                .withColumnRenamed("chunk_text", text_col)
            )
        elif step == "pack":
            from big_ann_spark.operators.packing import pack_sequences

            # pack_sequences runs eager bin/carry jobs and the caller
            # writes BOTH outputs — checkpoint so the (possibly
            # dedup-join-heavy) cleaning lineage executes once, not 3x
            out = out.localCheckpoint()
            placements = pack_sequences(
                out, pack_ctx, id_col=id_col, text_col=text_col
            )
        if counts and step != "pack":
            # checkpoint each counted stage so the tally does not
            # re-execute the whole prefix per step
            out = out.localCheckpoint()
            tally[step] = out.count()
    return out, placements, tally
