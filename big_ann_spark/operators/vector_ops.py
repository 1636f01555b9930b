"""Exactly-once mutations for the persisted sharded vector layout
(``sharding.write_sharded``) — tombstone deletes, upserts, snapshot
(as-of) reads, and compaction, under the same op-ledger protocol as
the persisted BM25 index (``operators.oplayout``).

Reference context: the reference engine's shard layout
(``shard_by_distance.py``) is build-once — removing or replacing a
vector means rebuilding the shard. An LLM-serving index needs
retraction (takedowns, dedup-after-index, corpus refreshes) without a
full rebuild, so the engine treats the batch layout exactly like its
streaming sibling (``streaming/vector_index.py``): every mutation is
an op, readers resolve latest-op-wins.

Layout extension (backward compatible — a pristine layout has no
``ops/`` directory and every reader short-circuits to the base):

- ``{path}/shards/shard_id=S/…``  — the base build (epoch −1);
- ``{path}/ops/_mb=<op>/shard_id=S/…`` — one dir per committed
  mutation: upserts land rows ``(vec_id, dist, embedding[, codes],
  op='insert')`` under their assigned shard; deletes land tombstones
  ``op='delete'`` under the RESERVED shard −1 (query routing can never
  probe it, so a bare tombstone can never surface as a candidate —
  the streaming index's trick);
- ``{path}/_ops/<op>`` — commit markers (oplayout protocol: dynamic
  partition overwrite + marker = idempotent replay, crash-invisible
  half-writes, O(in-flight) NOT-IN for readers).

Read-side resolution mirrors ``streaming/vector_index.prepare_search``:
the CONTESTED set (ids touched by any committed op — small between
compactions by construction) broadcasts into an anti-join against the
probed base partitions, and the ops table — op-count-sized, not
corpus-sized — resolves per-id winners with one ``max_by``. The base
scan stays partition-pruned; uncontested vectors never shuffle.

At 100 TB: ops cost O(batch) writes; search cost gains one broadcast
anti-join over the probed partitions plus an O(ops-size) side scan —
independent of corpus size — and compaction folds everything back to
a pristine base when the contested set grows past taste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_ann_spark.operators import oplayout

OP_INSERT = "insert"
OP_DELETE = "delete"
TOMBSTONE_SHARD = -1


def _ops_on_disk(spark, path: str) -> set[int]:
    """Every op id with ANY bytes on disk (committed or in-flight) —
    O(ops) directory globs, no Spark job. The ledger is SHARED with
    the tag-index ops (operators/tag_ops.py): a tag-only op's presence
    is its tags_delta partition, and both families allocate from one
    id sequence so ``as_of`` is a single time axis."""
    return oplayout.glob_op_ids(spark, f"{path}/ops/_mb=*") | oplayout.glob_op_ids(
        spark, f"{path}/tags_delta.parquet/_mb=*"
    )


def _all_op_dirs(path: str, op_id: int) -> list[str]:
    """Every partition glob ANY op family may have written at this id
    — the purge list. A writer reclaiming a crashed id must clear ALL
    families: the crashed attempt may have been a vector op while the
    reclaimer is a tag op (or vice versa) — leaving the other family's
    partitions behind would make them VISIBLE when the reclaimer's
    commit marker lands."""
    from big_ann_spark.operators import tag_ops

    return [f"{path}/ops/_mb={op_id}"] + tag_ops.tag_op_dirs(path, op_id)


def uncommitted_vector_ops(spark, path: str) -> list[int]:
    """Op ids with bytes on disk but no commit marker — crashed or
    in-flight writes, invisible to every reader."""
    return sorted(_ops_on_disk(spark, path) - oplayout.committed_ops(spark, path))


def has_vector_ops(spark, path: str) -> bool:
    return oplayout.path_exists(spark, f"{path}/ops")


def _has_sq8(spark, path: str) -> bool:
    return oplayout.path_exists(spark, f"{path}/sq8_ranges.parquet")


def _sq8_ranges(spark, path: str) -> tuple[list[float], list[float]]:
    row = spark.read.parquet(f"{path}/sq8_ranges.parquet").collect()[0]
    return list(row["mins"]), list(row["maxs"])


def _land_vector_op(
    spark,
    path: str,
    rows: DataFrame,
    op_id: int | None,
    tag_batch: DataFrame | None = None,
) -> int:
    """Purge-first landing of one op's rows under ``_mb=<id>`` +
    commit marker. ``rows`` must carry (vec_id, dist, embedding
    [, codes], op, shard_id). ``tag_batch``: optional
    (neighbor_id, _btags) landed as the SAME op (one marker — the
    vectors and their tags become visible atomically).

    SINGLE-WRITER: one mutator per layout at a time (see
    oplayout's module docstring) — id allocation + purge + write +
    commit run under the layout's best-effort ``writer_lock``, so a
    concurrent upsert/delete against the same path raises
    ``ConcurrentWriterError`` instead of purging this op's in-flight
    partitions."""
    with oplayout.writer_lock(spark, path, owner="vector_ops"):
        # create-marker-first: the id claim is atomic and happens
        # BEFORE any purge — a same-id allocation race loses here,
        # having touched nothing (oplayout.claim_op_id)
        op_id = oplayout.claim_op_id(
            spark, path,
            _ops_on_disk(spark, path), oplayout.committed_ops(spark, path),
            op_id=op_id,
        )
        if int(op_id) not in oplayout.committed_ops(spark, path):
            oplayout.purge_op_dirs(spark, _all_op_dirs(path, int(op_id)))
        oplayout.write_op_partitions(
            rows.withColumn("_mb", F.lit(int(op_id))),
            f"{path}/ops",
            ["_mb", "shard_id"],
        )
        if tag_batch is not None:
            from big_ann_spark.operators import tag_ops

            cols = [F.col("vec_id").alias("neighbor_id"), F.col("shard_id")]
            if tag_ops.tag_meta(spark, path)[1]:
                # payload layout: the op's postings carry the NEW vector
                cols.append(F.col("embedding").alias("_bvec"))
            shard_of = rows.select(*cols)
            tag_ops.land_tag_partitions(
                spark, path, tag_batch, int(op_id), shard_of
            )
        oplayout.mark_committed(spark, path, op_id)
    return int(op_id)


def upsert_vectors(
    spark,
    path: str,
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    op_id: int | None = None,
    assign_impl: str = "fold",
    tags_col: str | None = None,
) -> int:
    """Insert-or-replace ``vectors`` (``(id_col, vec_col)``) into the
    layout as ONE exactly-once op. Each vector is assigned to its
    nearest centroid under the layout's FROZEN routing (the
    ``centroids.parquet`` written at build — upserts never move the
    centroids, exactly like adding to a trained IVF index; recall for
    upserted points is a property of that frozen routing). If the
    layout carries SQ8 codes, the new vectors are encoded with the
    frozen quantization ranges for the same reason. Duplicate ids
    WITHIN one batch collapse to a single arbitrary row
    (``dropDuplicates``) — between batches, the higher op id wins.

    ``tags_col``: when the layout carries filtered-track tag artifacts
    (``write_tag_postings_layout``), the batch's tag arrays land as
    the SAME op under the same commit marker — the vectors and their
    tags become visible atomically (operators/tag_ops.py).
    Returns the committed op id."""
    from big_ann_spark.operators.sharding import assign_to_centroids

    vectors = vectors.dropDuplicates([id_col])
    tag_batch = None
    if tags_col is not None:
        from big_ann_spark.operators import tag_ops

        if not tag_ops.has_tag_artifacts(spark, path):
            raise ValueError(
                f"{path} has no tag artifacts — run write_tag_postings_layout "
                "(CLI: index-tags) before upserting tagged vectors"
            )
        tag_batch = vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(tags_col).alias("_btags")
        ).localCheckpoint()
    else:
        from big_ann_spark.operators import tag_ops

        if tag_ops.has_tag_artifacts(spark, path) and tag_ops.tag_meta(
            spark, path
        )[1]:
            raise ValueError(
                "this layout's tag postings CARRY payload vectors — a "
                "vector upsert must land its tags in the same op "
                "(tags_col=...), or the id's postings would serve a "
                "stale embedding"
            )
    cents = spark.read.parquet(f"{path}/centroids.parquet")
    rows = assign_to_centroids(
        vectors,
        cents,
        id_col=id_col,
        vec_col=vec_col,
        extra_cols=[vec_col],
        impl=assign_impl,
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col("dist").cast("double").alias("dist"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
        F.col("shard_id").cast("int").alias("shard_id"),
    )
    if _has_sq8(spark, path):
        from big_ann_spark.operators.pq import sq8_encode_col

        mins, maxs = _sq8_ranges(spark, path)
        rows = rows.withColumn(
            "codes", sq8_encode_col("embedding", mins, maxs).cast("array<smallint>")
        )
    if oplayout.path_exists(spark, f"{path}/pq_codebooks.parquet"):
        from big_ann_spark.operators.pq import (
            load_pq_codebooks,
            load_rotation,
            pq_encode_col,
            with_pq_codes_arrow,
        )

        books = load_pq_codebooks(spark, f"{path}/pq_codebooks.parquet")
        if oplayout.path_exists(spark, f"{path}/opq_rotation.parquet"):
            # OPQ: codes live in the rotated space — arrow kernel only
            rows = with_pq_codes_arrow(
                rows, books, vec_col="embedding",
                rotation=load_rotation(spark, f"{path}/opq_rotation.parquet"),
            )
        else:
            rows = rows.withColumn(
                "pq_codes",
                pq_encode_col("embedding", books).cast("array<smallint>"),
            )
    if oplayout.path_exists(spark, f"{path}/binary_thresholds.parquet"):
        from big_ann_spark.operators.pq import binarize_col

        thr = list(
            spark.read.parquet(f"{path}/binary_thresholds.parquet").collect()[0][
                "thresholds"
            ]
        )
        rows = rows.withColumn("bcodes", binarize_col("embedding", thr))
    rows = rows.withColumn("op", F.lit(OP_INSERT))
    if tag_batch is not None:
        # the tag landing derives shard_of + df deltas from the rows
        # lineage twice — pin it once
        rows = rows.localCheckpoint()
    return _land_vector_op(spark, path, rows, op_id, tag_batch=tag_batch)


def delete_vectors(
    spark,
    path: str,
    ids,
    *,
    op_id: int | None = None,
) -> int:
    """Tombstone the given vector ids (a DataFrame whose first column
    is the id, or any iterable of ints) as ONE exactly-once op.
    Tombstones are 8-byte rows in the reserved shard −1 — routing
    never probes it, so a tombstone can never surface as a candidate;
    it only KILLS base/earlier-op rows via latest-op-wins resolution.
    Deleting an id that was never inserted is a legal no-op row.
    Returns the committed op id."""
    if isinstance(ids, DataFrame):
        id_df = ids.select(F.col(ids.columns[0]).cast("long").alias("vec_id"))
    else:
        id_df = spark.createDataFrame(
            [(int(i),) for i in ids], "vec_id long"
        )
    rows = id_df.distinct().select(
        "vec_id",
        F.lit(None).cast("double").alias("dist"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit(TOMBSTONE_SHARD).cast("int").alias("shard_id"),
    )
    if _has_sq8(spark, path):
        rows = rows.withColumn("codes", F.lit(None).cast("array<smallint>"))
    if oplayout.path_exists(spark, f"{path}/pq_codebooks.parquet"):
        rows = rows.withColumn("pq_codes", F.lit(None).cast("array<smallint>"))
    if oplayout.path_exists(spark, f"{path}/binary_thresholds.parquet"):
        rows = rows.withColumn("bcodes", F.lit(None).cast("array<bigint>"))
    rows = rows.withColumn("op", F.lit(OP_DELETE))
    return _land_vector_op(spark, path, rows, op_id)


def committed_op_scan(
    spark, path: str, as_of: int | None = None
) -> DataFrame | None:
    """Scan of every committed op row, or None when the layout has no
    ``ops/`` directory at all (pristine layout — readers short-circuit
    with ZERO Spark jobs). ``as_of``: a RANGE predicate on the ``_mb``
    partition column (snapshots cost the same as the head); in-flight
    ids excluded by a NOT-IN over the tiny uncommitted set."""
    if not has_vector_ops(spark, path):
        return None
    if not oplayout.glob_op_ids(spark, f"{path}/ops/_mb=*"):
        # ops/ exists but holds no completed _mb partition — the very
        # FIRST op crashed mid-write (only _temporary inside), or a
        # reclaiming TAG op purged the crashed vector partitions
        # (_ops_on_disk unions the tag-delta ledger, so it must NOT be
        # the emptiness probe here). There is nothing readable and
        # nothing visible; reading the dir would throw schema-inference
        # errors instead of ignoring the crashed op like every other
        # crash window does.
        return None
    raw = spark.read.parquet(f"{path}/ops")
    uncommitted = uncommitted_vector_ops(spark, path)
    if as_of is not None:
        raw = raw.filter(F.col("_mb") <= int(as_of))
        uncommitted = [b for b in uncommitted if b <= as_of]
    if uncommitted:
        raw = raw.filter(~F.col("_mb").isin([int(b) for b in uncommitted]))
    return raw


def mutation_state(
    spark, path: str, as_of: int | None = None
) -> tuple[DataFrame, DataFrame] | None:
    """Per-epoch search state ``(contested, resolved)``, or None for a
    pristine layout (or an ``as_of`` behind every op).

    ``contested``: the ids touched by any visible op — one per
    delete/upsert since the last compaction, SMALL by construction;
    materialized (localCheckpoint) for broadcast into anti-joins.
    ``resolved``: the LIVE row of each contested id that survives
    latest-op-wins (one ``max_by`` keyed on (op id, delete-beats-
    insert) — the streaming index's resolution, over the op-count-
    sized ops table, never the corpus). Columns: (vec_id, dist,
    embedding[, codes], shard_id)."""
    raw = committed_op_scan(spark, path, as_of)
    if raw is None:
        return None
    data_cols = [c for c in raw.columns if c not in ("op", "_mb")]
    rank = F.when(F.col("op") == OP_DELETE, F.lit(1)).otherwise(F.lit(0))
    # ONE materialization of the per-id winners; contested and
    # resolved are projections of it (no second pass over the ops)
    latest = raw.groupBy("vec_id").agg(
        F.max_by(
            F.struct("op", *[c for c in data_cols if c != "vec_id"]),
            F.struct(F.col("_mb"), rank.alias("_r")),
        ).alias("_w")
    ).localCheckpoint()
    # head(1) emptiness + memoized size telemetry (one full count per
    # ledger state per session, never a per-search job — ADVICE r12)
    if oplayout.check_contested(spark, path, latest, "mutation_state", as_of=as_of):
        return None
    resolved = latest.filter(F.col("_w.op") == OP_INSERT).select(
        "vec_id",
        *[F.col(f"_w.{c}").alias(c) for c in data_cols if c != "vec_id"],
    )
    contested = latest.select("vec_id")
    return contested, resolved


def live_probed_view(
    spark,
    path: str,
    base: DataFrame,
    probe_ids: list[int] | None = None,
    *,
    as_of: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The live view of the probed partitions: base rows minus the
    broadcast contested set, plus the resolved op winners whose shard
    is probed. The base scan's partition pruning and column pruning
    are untouched (the anti-join adds no exchange on the big side);
    the ops side is O(mutations). A pristine layout returns ``base``
    unchanged. ``probe_ids=None`` = all shards (compaction/export).

    ``id_col``/``vec_col``: the BASE layout's column names. The ops
    table always stores the canonical (vec_id, embedding[, codes…])
    names (upsert_vectors canonicalizes on write), so the resolved
    side is renamed to match a layout built with custom names."""
    state = mutation_state(spark, path, as_of)
    if state is None:
        return base
    contested, resolved = state
    rename = {"vec_id": id_col, "embedding": vec_col}
    for old, new in rename.items():
        if old != new and old in resolved.columns:
            resolved = resolved.withColumnRenamed(old, new)
    contested = contested.withColumnRenamed("vec_id", id_col)
    cols = base.columns
    base_live = base.join(F.broadcast(contested), id_col, "left_anti")
    alive = resolved
    if probe_ids is not None:
        alive = alive.filter(
            F.col("shard_id").isin([int(s) for s in probe_ids])
        )
    else:
        alive = alive.filter(F.col("shard_id") != TOMBSTONE_SHARD)
    # cast ops columns to the base scan's exact types (an upsert batch
    # may have arrived as array<double>; the union must stay typed)
    typed = [F.col(c).cast(base.schema[c].dataType).alias(c) for c in cols]
    return base_live.select(cols).unionByName(alive.select(typed))


def compact_vector_layout(
    spark,
    src_path: str,
    dst_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Fold every committed op into a fresh pristine base at
    ``dst_path`` (write-new-then-swap orchestration, like
    ``compact_bm25_index``): resolved live rows are re-written as a
    ``write_sharded`` layout with the SAME frozen centroids and
    quantization sidecars — search results are identical before and
    after, and the contested set resets to empty. Returns the number
    of ops folded. A crash mid-compact leaves ``src_path`` untouched
    and ``dst_path`` an obviously incomplete re-runnable write.

    Works on refine layouts (raw vectors present → code columns are
    re-encoded under the frozen sidecars) AND codes-only ``--sq8``
    layouts (no raw column → the stored codes are carried as the
    payload and the ranges sidecar is copied verbatim)."""
    from big_ann_spark.operators.sharding import write_sharded

    base = spark.read.option("basePath", f"{src_path}/shards").parquet(
        f"{src_path}/shards"
    )
    live = live_probed_view(
        spark, src_path, base, None, id_col=id_col, vec_col=vec_col
    )
    n_ops = len(
        oplayout.committed_ops(spark, src_path) & _ops_on_disk(spark, src_path)
    )
    has_raw = vec_col in base.columns
    payload = vec_col if has_raw else "codes"
    assignments = live.select(id_col, "shard_id", "dist", payload)
    ranges = None
    books = None
    thr = None
    if has_raw:
        # refine layouts: re-encode code columns from the raw vectors
        # under the frozen sidecars (deterministic — codes identical)
        if _has_sq8(spark, src_path):
            ranges = _sq8_ranges(spark, src_path)
        if oplayout.path_exists(spark, f"{src_path}/pq_codebooks.parquet"):
            from big_ann_spark.operators.pq import load_pq_codebooks

            books = load_pq_codebooks(spark, f"{src_path}/pq_codebooks.parquet")
        if oplayout.path_exists(spark, f"{src_path}/binary_thresholds.parquet"):
            thr = list(
                spark.read.parquet(
                    f"{src_path}/binary_thresholds.parquet"
                ).collect()[0]["thresholds"]
            )
    rot = None
    if has_raw and oplayout.path_exists(spark, f"{src_path}/opq_rotation.parquet"):
        from big_ann_spark.operators.pq import load_rotation

        rot = load_rotation(spark, f"{src_path}/opq_rotation.parquet")
    write_sharded(
        assignments, assignments, dst_path,
        id_col=id_col, vec_col=payload,
        sq8_ranges=ranges, pq_codebooks=books, binary_thresholds=thr,
        opq_rotation=rot,
        pq_encode_impl="arrow" if rot is not None else "fold",
    )
    if not has_raw and _has_sq8(spark, src_path):
        # codes-only layout: the codes ARE the payload; carry the
        # ranges sidecar so decode keeps working on the new base
        (
            spark.read.parquet(f"{src_path}/sq8_ranges.parquet")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{dst_path}/sq8_ranges.parquet")
        )
    (
        spark.read.parquet(f"{src_path}/centroids.parquet")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{dst_path}/centroids.parquet")
    )
    if oplayout.path_exists(spark, f"{src_path}/tag_postings.parquet"):
        # filtered-track artifacts: resolve the live tag sets (base ∪
        # latest deltas), drop ids the compacted base no longer holds
        # (vector tombstones), and rebuild a pristine tag layout at
        # dst — dead postings and per-op delta tables disappear
        from big_ann_spark.operators import tag_ops
        from big_ann_spark.operators.ann import write_tag_postings_layout

        live_tagged = tag_ops.resolve_live_tags(spark, src_path).join(
            live.select(F.col(id_col).alias("vec_id")), "vec_id", "left_semi"
        )
        n_buckets, carry = tag_ops.tag_meta(spark, src_path)
        if carry and not has_raw:
            # payload postings carry the vectors the filtered verify
            # computes L2 against — on a codes-only base that would
            # silently store quantized codes as _bvec and every
            # filtered ranking would be garbage (arrays zip fine, no
            # type error). Refuse loudly instead.
            raise ValueError(
                "compact: carry_payload tag artifacts need raw vectors, "
                "but the source layout is codes-only — rebuild the tag "
                "index without carry_payload or use a refine layout"
            )
        write_tag_postings_layout(
            live_tagged, dst_path,
            vec_col=vec_col,
            n_tag_buckets=n_buckets,
            carry_payload=carry,
        )
    return n_ops


def contested_count(spark, path: str) -> int:
    """Number of DISTINCT ids carrying uncompacted mutation state
    across BOTH op families (vector ops ∪ tag deltas) — exactly the
    row count of the per-search resolution broadcast, i.e. the number
    the contested-set warning (oplayout.warn_contested_size) and the
    CLI ``--compact-above`` policy act on. 0 for a pristine layout."""
    from big_ann_spark.operators import tag_ops

    if not (has_vector_ops(spark, path) or tag_ops.has_tag_ops(spark, path)):
        return 0
    unc = sorted(_ops_on_disk(spark, path) - oplayout.committed_ops(spark, path))
    latest = tag_ops.latest_op_of_contested(spark, path, uncommitted=unc)
    return 0 if latest is None else latest.count()


def compact_if_needed(
    spark,
    path: str,
    *,
    max_contested: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[int, int | None]:
    """Library-level auto-compaction policy (the CLI ``--compact-above``
    delegates here): fold the layout in place when its contested-id
    count — the per-search resolution broadcast's row count, measured
    +6.5 s/search at 1.58M uncompacted ids (SCALE.md) — exceeds
    ``max_contested``. Returns ``(n_contested, ops_folded | None)`` —
    the count is the signal an operator tunes the threshold WITH, so
    it is always reported (the check is one op-table aggregate, cheap
    to call after every mutation)."""
    n = contested_count(spark, path)
    if n <= int(max_contested):
        return n, None
    return n, compact_in_place(spark, path, id_col=id_col, vec_col=vec_col)


def compact_in_place(
    spark,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_fn=None,
) -> int:
    """Write-new-then-swap compaction at the SAME path — the
    ``--compact-above`` auto-policy's executor. Folds every committed
    op into a pristine base at ``{path}.compacting`` (the plain
    copy-on-write :func:`compact_vector_layout`, crash-safe: the live
    layout is untouched while it runs), then swaps:
    ``{path}`` → ``{path}.precompact``, ``{path}.compacting`` →
    ``{path}``, delete ``{path}.precompact``. Returns ops folded.

    CRASH RECOVERY (the swap is two renames, not atomic together): if
    ``{path}`` is missing and ``{path}.compacting`` exists, rename the
    latter into place (it is complete — the rename-out only happens
    after the compaction finished); if both ``{path}.precompact`` and
    ``{path}`` exist, the swap finished — delete the leftover (and any
    stale ``{path}.compact.lock``). A fresh run refuses to start while
    either sibling exists, naming this recipe.

    SINGLE-WRITER enforced by TWO locks (ADVICE r12): the in-tree
    ``writer_lock`` detects a mutation already in flight, but it
    cannot guard the swap — the first rename moves ``{path}/_ops``
    (lock included) out with the tree, leaving ``{path}`` unguarded
    and the final delete eating the lock file. So the whole
    compact+swap ALSO holds the sibling ``{path}.compact.lock`` marker
    (created no-overwrite, outside the renamed tree); ``writer_lock``
    refuses while the marker exists — before AND after its own atomic
    create, so a mutator racing the rename window aborts and unwinds
    the phantom ``_ops`` dir its mkdirs made instead of breaking the
    swap-in."""
    base = path.rstrip("/")
    tmp, old = base + ".compacting", base + ".precompact"
    for p in (tmp, old):
        if oplayout.path_exists(spark, p):
            raise ValueError(
                f"{p} exists — a previous in-place compaction crashed "
                "mid-swap; recover first (see compact_in_place docstring: "
                "a complete .compacting renames into place, a leftover "
                ".precompact next to a live layout is safe to delete)"
            )
    cfs, cjp = oplayout.compact_lock_jpath(spark, base)
    try:
        cfs.create(cjp, False).close()
    except Exception:
        if cfs.exists(cjp):
            raise oplayout.ConcurrentWriterError(
                f"another compaction holds {base}"
                f"{oplayout.COMPACT_LOCK_SUFFIX}; wait for it to finish "
                "(or remove the marker if that compactor crashed hard)"
            ) from None
        raise
    try:
        with oplayout.writer_lock(
            spark, base, owner="compact_in_place", in_compaction=True
        ):
            # compact_fn: other op-ledger tiers (the graph layout)
            # reuse this whole lock+swap+recovery shell with their own
            # fold — (spark, src, tmp) -> ops folded
            if compact_fn is not None:
                n_ops = compact_fn(spark, base, tmp)
            else:
                n_ops = compact_vector_layout(
                    spark, base, tmp, id_col=id_col, vec_col=vec_col
                )
            fs, jbase = oplayout.fs_path(spark, base)
            _, jold = oplayout.fs_path(spark, old)
            _, jtmp = oplayout.fs_path(spark, tmp)
            if not fs.rename(jbase, jold):
                raise IOError(f"compact_in_place: rename {base} -> {old} failed")
            if not fs.rename(jtmp, jbase):
                raise IOError(
                    f"compact_in_place: swap-in failed — restore by renaming "
                    f"{tmp} to {base} (the compacted layout is complete)"
                )
            fs.delete(jold, True)
            oplayout.invalidate_contested_memo(base)
    finally:
        cfs.delete(cjp, False)
    return n_ops
