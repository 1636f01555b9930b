"""Continuous corpus ingestion: a document stream deduplicated against
the already-kept history and appended EXACTLY-ONCE — the streaming form
of the crawl-ingest loop every continuously-trained corpus runs. Each
micro-batch applies the incremental_exact_dedup PLAN SHAPE (8-byte hash
projections, anti-join vs history — inlined here because the batch must
keep its text payload and exclude its own partition on replay) driven
through the shared exactly-once landing protocol (streaming/sink.py).

Semantics per micro-batch, in order:
1. within-batch exact dedup (min-id winner per distinct text);
2. drop texts already present in the landed history;
3. append survivors to the history partition-scoped by batch id.

Because batches commit serially, every batch sees all earlier batches'
survivors as history — the final corpus holds exactly one copy of each
distinct text, owned by the smallest id that ever carried it (within
the batch that first introduced it).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_ann_spark.streaming.sink import (
    committed_batch_ids,
    run_exactly_once_sink,
)


def stream_corpus_ingest(
    stream_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float | None = None,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
    _fault_point=None,
) -> None:
    """foreachBatch ingest with incremental dedup + exactly-once append
    (the shared protocol of streaming/sink.py), plus ONE extra rule
    this pipeline needs: the history read EXCLUDES the current batch's
    own partition. A replayed batch (crash after its data write,
    before the checkpoint commit) would otherwise see its own
    half-landed rows as "history" and anti-join ALL its survivors
    away — silent data loss on exactly the path the replay machinery
    exists for. Pinned by the restart test.

    Scale: the dedup is incremental_exact_dedup's shape — 8-byte hash
    projections, history never collected; the per-batch cost is one
    scan of history's hash column (at real scale: a hash-only
    side table or Bloom/index layer, same plan).

    ``near_dup_threshold``: also screen each batch for NEAR-duplicates
    of the landed history (MinHash-LSH + exact-Jaccard verification,
    operators.dedup.incremental_minhash_dedup). The landed layout then
    carries each survivor's signature (``_sig``) and shingle array
    (``_shs``) — the persisted stores the incremental screen's scale
    contract asks for, so future batches band-join against stored
    8-byte buckets and verify against stored arrays without ever
    re-shingling history text. Per-batch cost stays
    O(|batch| + |candidates|). ``max_bucket_size`` passes through to
    the screen's hot-bucket cap (see ``incremental_minhash_dedup``)."""
    if near_dup_threshold is not None:
        from big_ann_spark.operators import dedup as D

    def prepare(batch_df: DataFrame, batch_id: int) -> DataFrame:
        spark = batch_df.sparkSession
        batch = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).withColumn("_h", F.xxhash64("text"))
        # within-batch: min-id winner per distinct text — one
        # aggregation (min_by), no self-join, no tie-break caveat
        # (rows sharing a hash share the text, so any min-id row is
        # the same value)
        batch = (
            batch.groupBy("_h")
            .agg(F.min_by(F.struct("doc_id", "text"), "doc_id").alias("_w"))
            .select("_h", "_w.doc_id", "_w.text")
        )
        hist = None
        try:
            # mergeSchema: on a corpus mixing legacy (no _sig/_shs) and
            # store-carrying partitions, default schema inference can
            # resolve to a legacy footer — '_sig' in hist.columns would
            # then be False and every batch would silently re-shingle
            # the ENTIRE history (correct but O(history) per batch,
            # defeating the persisted-store contract). Merging footers
            # keeps the store columns visible whenever any partition
            # carries them; true legacy rows still hit the backfill
            # path via their NULL _sig.
            hist = spark.read.option("mergeSchema", "true").parquet(f"{path}/data")
            # CRITICAL: a replay must not treat its own half-landed
            # partition as history (see docstring)
            hist = hist.filter(F.col("_batch_id") != batch_id)
            batch = batch.join(hist.select("_h"), "_h", "left_anti")
        except AnalysisException:
            pass  # first batch: no history yet
        if near_dup_threshold is not None:
            # attach signature + shingle array to every surviving row
            # (landed alongside the text = the persisted stores)
            arrs = D.doc_shingle_arrays(
                shingles=D.doc_shingles(batch, n=shingle_n)
            ).localCheckpoint()
            sigs = D.minhash_signatures(
                batch,
                n=shingle_n,
                shingles=arrs.select("doc_id", F.explode("shs").alias("shingle")),
            )
            batch = (
                batch.join(arrs, "doc_id", "left")
                .join(sigs, "doc_id", "left")
                .withColumnRenamed("shs", "_shs")
                .withColumnRenamed("sig", "_sig")
            )
            # docs too short to shingle have NULL _sig/_shs: an empty
            # shingle set can never reach a positive Jaccard — keep
            if hist is not None:
                # History rows without landed stores — the whole corpus
                # when near-dup screening is enabled over an older
                # exact-only ingest, or nothing but short docs on a
                # store-carrying one — fall back to recomputing their
                # signatures/arrays from text (backfill mode), so
                # toggling the flag on an existing corpus neither
                # crashes (no _sig column at all) nor silently skips
                # the legacy partitions.
                if "_sig" in hist.columns:
                    stored = hist.filter(F.col("_sig").isNotNull())
                    hb = D.band_table(
                        stored.select("doc_id", F.col("_sig").alias("sig"))
                    )
                    hsa = stored.select("doc_id", F.col("_shs").alias("shs"))
                    legacy = hist.filter(F.col("_sig").isNull()).select(
                        "doc_id", "text"
                    )
                else:
                    hb = hsa = None
                    legacy = hist.select("doc_id", "text")
                l_arrs = D.doc_shingle_arrays(
                    shingles=D.doc_shingles(legacy, n=shingle_n)
                )
                l_sigs = D.minhash_signatures(
                    legacy,
                    n=shingle_n,
                    shingles=l_arrs.select(
                        "doc_id", F.explode("shs").alias("shingle")
                    ),
                )
                lb = D.band_table(l_sigs)
                hb = lb if hb is None else hb.union(lb)
                hsa = l_arrs if hsa is None else hsa.union(
                    l_arrs.select("doc_id", "shs")
                )
                flagged = D.incremental_minhash_dedup(
                    batch.filter(F.col("_sig").isNotNull()),
                    new_shingle_arrays=arrs,
                    new_sigs=sigs,
                    history_bands=hb,
                    history_shingle_arrays=hsa,
                    threshold=near_dup_threshold,
                    n=shingle_n,
                    mode="duplicates",
                    max_bucket_size=max_bucket_size,
                )
                batch = batch.join(
                    flagged.select("doc_id").distinct(), "doc_id", "left_anti"
                )
        # keep _h in the landed layout so future history reads scan one
        # 8-byte column instead of rehashing text
        return batch.withColumn("_batch_id", F.lit(batch_id))

    run_exactly_once_sink(
        stream_docs, path, prepare, ["_batch_id"], _fault_point=_fault_point
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read back the kept corpus — COMMITTED batches only (a batch
    whose data landed but whose checkpoint-scoped commit marker did not is,
    by the sink's own protocol, un-landed: it will be rewritten on
    restart, and a read racing that window must not see it). The
    marker listing is driver-side and O(batches); the filter is a
    partition-column predicate, so uncommitted directories are never
    scanned. Bookkeeping columns are dropped."""
    committed = committed_batch_ids(path)
    df = spark.read.parquet(f"{path}/data")
    return df.filter(F.col("_batch_id").isin(committed)).select(
        "doc_id", "text"
    )
