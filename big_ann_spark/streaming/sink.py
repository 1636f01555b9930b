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


def uncommitted_batch_ids(path: str, partition_col: str = "_batch_id") -> list[int]:
    """Batch ids with data partitions on disk but NO commit marker —
    exactly the crashed/in-flight writes a reader must exclude. Pure
    directory listing (partition dirs are ``{col}=value``), no Spark
    job. This set is O(in-flight batches) — tiny by the protocol
    (markers land right after each write) — so a reader can exclude it
    with one small NOT-IN predicate instead of an ``isin(committed)``
    whose literal list grows one entry per batch forever (VERDICT r7
    #6: thousands of ids make an unwieldy expression tree and defeat
    partition-range pruning)."""
    data_dir = f"{path}/data"
    if not os.path.isdir(data_dir):
        return []
    landed: set[int] = set()
    prefix = f"{partition_col}="

    def walk(d: str) -> None:
        for name in os.listdir(d):
            p = os.path.join(d, name)
            if not os.path.isdir(p):
                continue
            if name.startswith(prefix):
                landed.add(int(name[len(prefix):]))
            elif "=" in name:  # another partition level above _batch_id
                walk(p)

    walk(data_dir)
    return sorted(landed - set(committed_batch_ids(path)))
