"""The exactly-once foreachBatch landing protocol, shared by every file
sink in the engine (events landing zone, corpus ingest). ONE
implementation of the crash-safety mechanics so a protocol fix can
never diverge between sinks:

- **batch-scoped dynamic overwrite**: each batch's rows land under
  partitions that include ``_batch_id`` with
  ``partitionOverwriteMode=dynamic`` + ``mode("overwrite")`` — a
  REPLAYED batch (crash after the data write, before the checkpoint
  commit) overwrites exactly its own partitions, touching no other
  batch's data. Plain ``append`` is the classic duplicate-on-replay
  bug.
- **batch-id commit markers**: an empty ``<checkpoint>/_committed/
  <batch_id>`` file lands after the write; a replay that finds its
  marker skips the write entirely (the cheap path when the crash hit
  between marker and checkpoint commit). Readers that must not observe
  un-landed batches filter partitions to marked ids
  (``committed_batch_ids``). Markers live INSIDE the checkpoint
  directory so their lifecycle is the checkpoint's: deleting the
  checkpoint to reprocess (batch ids restart at 0) deletes the markers
  with it — bare-id markers that outlived the checkpoint would make
  every restarted batch silently skip its write.

``_fault_point`` is the crash-injection hook the restart tests use
(called at "skip" / "pre-marker" / "post-marker").
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame


def run_exactly_once_sink(
    stream_df: DataFrame,
    path: str,
    prepare: Callable[[DataFrame, int], DataFrame],
    partition_cols: list[str],
    *,
    _fault_point=None,
) -> None:
    """Drive ``stream_df`` to completion (availableNow) through the
    exactly-once protocol. ``prepare(batch_df, batch_id)`` returns the
    rows to land — it must include every ``partition_cols`` column
    (``_batch_id`` among them) and MAY consult ``path`` (e.g. the
    corpus sink's dedup-vs-history anti-join; any such read must
    exclude the current batch's own partition — replay safety is the
    caller's contract there)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker_dir = f"{path}/checkpoint/_committed"
        os.makedirs(marker_dir, exist_ok=True)
        marker = f"{marker_dir}/{batch_id}"
        if os.path.exists(marker):
            if _fault_point is not None:
                _fault_point("skip", batch_id)
            return
        out = prepare(batch_df, batch_id)
        # per-WRITER option, not the session conf: mutating the global
        # conf races concurrent writers in the same session (a restore
        # to 'static' mid-flight turns another sink's dynamic overwrite
        # into a delete-everything static overwrite)
        (
            out.write.partitionBy(*partition_cols)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{path}/data")
        )
        if _fault_point is not None:
            _fault_point("pre-marker", batch_id)
        open(marker, "w").close()
        if _fault_point is not None:
            _fault_point("post-marker", batch_id)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", f"{path}/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def committed_batch_ids(path: str) -> list[int]:
    """Batch ids whose commit marker landed — the set a
    protocol-honoring reader restricts its partitions to."""
    marker_dir = f"{path}/checkpoint/_committed"
    if not os.path.isdir(marker_dir):
        return []
    return [int(b) for b in os.listdir(marker_dir)]
