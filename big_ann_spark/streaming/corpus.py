"""Continuous corpus ingestion: a document stream deduplicated against
the already-kept history and appended EXACTLY-ONCE — the streaming form
of the crawl-ingest loop every continuously-trained corpus runs
(operators.dedup.incremental_exact_dedup per micro-batch, composed with
the crash-safe landing sink of streaming/events.py).

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

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_corpus_ingest(
    stream_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    _fault_point=None,
) -> None:
    """foreachBatch ingest with incremental dedup + exactly-once append.

    Crash-safety composes the landing sink's two mechanisms (batch-id
    partitions with ``partitionOverwriteMode=dynamic`` + commit
    markers) with ONE extra rule this pipeline needs: the history read
    EXCLUDES the current batch's own partition. A replayed batch
    (crash after its data write, before the checkpoint commit) would
    otherwise see its own half-landed rows as "history" and
    anti-join ALL its survivors away — silent data loss on exactly the
    path the replay machinery exists for. Pinned by the restart test.

    Scale: the dedup is incremental_exact_dedup's shape — 8-byte hash
    projections, history never collected; the per-batch cost is one
    scan of history's hash column (at real scale: a hash-only
    side table or Bloom/index layer, same plan)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker_dir = f"{path}/_committed"
        os.makedirs(marker_dir, exist_ok=True)
        marker = f"{marker_dir}/{batch_id}"
        if os.path.exists(marker):
            if _fault_point is not None:
                _fault_point("skip", batch_id)
            return

        batch = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).withColumn("_h", F.xxhash64("text"))
        # within-batch: min-id winner per distinct text; the trailing
        # dropDuplicates is deterministic (post-semi rows sharing a
        # hash share doc_id AND text) and guards malformed batches
        # that repeat a doc_id
        winners = batch.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
        batch = batch.join(winners, ["_h", "doc_id"], "left_semi").dropDuplicates(
            ["_h"]
        )

        data_dir = f"{path}/data"
        try:
            hist = spark.read.parquet(data_dir)
            # CRITICAL: a replay must not treat its own half-landed
            # partition as history (see docstring)
            hist_h = hist.filter(F.col("_batch_id") != batch_id).select("_h")
            batch = batch.join(hist_h, "_h", "left_anti")
        except AnalysisException:
            pass  # first batch: no history yet

        # keep _h in the landed layout so future history reads scan one
        # 8-byte column instead of rehashing text
        out = batch.withColumn("_batch_id", F.lit(batch_id))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.partitionBy("_batch_id").mode("overwrite").parquet(data_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if _fault_point is not None:
            _fault_point("pre-marker", batch_id)
        open(marker, "w").close()
        if _fault_point is not None:
            _fault_point("post-marker", batch_id)

    q = (
        stream_docs.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{path}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read back the kept corpus (bookkeeping columns dropped)."""
    return spark.read.parquet(f"{path}/data").select("doc_id", "text")
