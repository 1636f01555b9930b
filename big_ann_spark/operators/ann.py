"""Batch ANN search — the Spark-shaped replacement for per-shard HNSW
(BASELINE.json ``spark_approach``: "DataFrame batch index build +
broadcast join for search").

Reference search lifecycle (SURVEY §3.3, ``kanndi_search.py:28-66``):
centroid index → top-MAX_CENTROIDS=3 routing → search top-1 shard's
HNSW → top-10 by distance. Its cliffs: sequential queries, and the
shard index re-loaded from disk per query (``utils.py:308-310``).

Spark-first replacement (§7.4): IVF-style —
1. routing join J3: queries × broadcast centroids → top-``nprobe``
   shard ids per query (WindowGroupLimit, no shuffle of the big side);
2. candidate join: probe list joined to the sharded vector table on
   ``shard_id`` — with a ``partitionBy(shard_id)`` layout this is
   partition-pruned IO (only probed shards are read);
3. W1/W2: per-query top-k over candidates, globally re-ranked by true
   distance.

Recall loss vs exact is a *property of the routing* (the reference
searches only the top-1 shard); ``nprobe`` trades IO for recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_ann_spark.functions.vector import l2_distance
from big_ann_spark.operators.topk import top_k_per_group


def _isin_ids(col: str, ids: list) -> F.Column:
    """``col IN (ids)`` for an integer id list, built as ONE parsed SQL
    expression. ``Column.isin`` constructs one literal Column — one py4j
    round trip — per element (~400 trips, 0.4-0.5 s of pure driver wall
    for a 400-id rerank pool; r14 profiling), while the string parses in
    a single call to the identical ``In(col, literals)`` predicate.
    Non-integer or empty lists fall back to ``isin`` unchanged."""
    if ids and all(type(i) is int for i in ids):
        id_list = ",".join(str(i) for i in ids)
        return F.expr(f"`{col}` IN ({id_list})")
    return F.col(col).isin(ids)


# (base path, base-dir mtime) -> shards StructType; see
# open_probed_shards. Schema only — never data.
_SHARDS_SCHEMA_MEMO: dict[tuple[str, int], object] = {}


def open_probed_shards(
    spark,
    path: str,
    shard_ids: list[int],
) -> DataFrame:
    """Open ONLY the probed shard directories of a
    ``write_sharded``-produced layout, by explicit path — skipping the
    full-layout file listing.

    ``spark.read.parquet(f"{path}/shards")`` walks every partition
    directory before the first byte of data is read: measured ~60 s for
    an m = 10⁴ layout at 20M vectors (a 10,000-task listing job), and
    at real scale (m ~ 10⁵ shards on object storage) the listing walk
    dwarfs the query itself. The probed set is min(Q·nprobe, m) —
    contractually tiny — so reading those directories by name is O(T)
    listing work instead of O(m). ``basePath`` keeps ``shard_id`` a
    (partition) column.

    Shards with zero points never got a directory (dynamic-partition
    writes create dirs only for non-empty groups), so existence-check
    through the Hadoop FS API — which also works on object stores, not
    just local paths."""
    base = f"{path}/shards"
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = jpath.getFileSystem(hconf)
    dirs = [
        d
        for s in shard_ids
        if fs.exists(jvm.org.apache.hadoop.fs.Path(d := f"{base}/shard_id={s}"))
    ]
    # schema memo (r14, guide §6): a bare parquet read runs a footer-
    # inference job on the driver before the first data byte — on the
    # serving path that is one serial job per search. Shard schema is
    # fixed at build time (mutations append files, never columns), so
    # memoize it per (base, base-dir mtime): a NEW shard directory
    # bumps the base mtime and invalidates; file appends inside
    # existing shard dirs keep the identical schema. SCHEMA only,
    # never rows.
    memo_key = None
    memo_schema = None
    try:
        memo_key = (base, int(fs.getFileStatus(jpath).getModificationTime()))
        memo_schema = _SHARDS_SCHEMA_MEMO.get(memo_key)
    except Exception:
        pass
    if not dirs:
        # preserve an empty-but-typed result. An ALL-DELETED compacted
        # layout has zero shard dirs (a partitioned write of no rows
        # lands no files), so prefer the schema sidecar write_sharded
        # leaves for exactly this case; fall back to inferring from
        # the (non-empty) shards dir for layouts predating it.
        sidecar = jvm.org.apache.hadoop.fs.Path(f"{path}/schema.parquet")
        if fs.exists(sidecar):
            sc = spark.read.parquet(f"{path}/schema.parquet").schema
            return spark.createDataFrame([], sc)
        return spark.read.option("basePath", base).parquet(base).limit(0)
    reader = spark.read.option("basePath", base)
    if memo_schema is not None:
        return reader.schema(memo_schema).parquet(*dirs)
    df = reader.parquet(*dirs)
    if memo_key is not None:
        if len(_SHARDS_SCHEMA_MEMO) >= 256:  # bound growth across layouts
            _SHARDS_SCHEMA_MEMO.clear()
        _SHARDS_SCHEMA_MEMO[memo_key] = df.schema
    return df


def detect_refine_codec(spark, path: str, vec_col: str = "embedding") -> str:
    """SCHEMA-ONLY refine-tier detection for a ``write_sharded``
    layout (zero jobs): code columns can only come from the build, so
    presence of codes/pq_codes/bcodes NEXT TO the raw column selects
    the sq8/pq/binary candidate scan; anything else serves raw. Reads
    the schema sidecar when present (works on empty layouts), else one
    footer of the shards dir."""
    from big_ann_spark.operators import oplayout

    if oplayout.path_exists(spark, f"{path}/schema.parquet"):
        cols = set(spark.read.parquet(f"{path}/schema.parquet").columns)
    else:
        cols = set(spark.read.parquet(f"{path}/shards").columns)
    if vec_col in cols:
        if "codes" in cols:
            return "sq8"
        if "pq_codes" in cols:
            # OPQ layouts are PQ layouts whose codes live in a learned
            # rotated space — one sidecar existence check (metadata)
            # distinguishes them so serving reports the real tier
            if oplayout.path_exists(spark, f"{path}/opq_rotation.parquet"):
                return "opq"
            return "pq"
        if "bcodes" in cols:
            return "binary"
        return "raw"
    if "codes" in cols:
        # --sq8 codes-only layout: no raw column exists — callers that
        # need exact distances must refuse rather than scan a column
        # that is not there
        return "codes_only"
    return "raw"


def ivf_search_from_disk(
    queries: DataFrame,
    path: str,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    *,
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    codec: str = "raw",
    rerank_factor: int = 4,
    max_id_pushdown: int = 100_000,
    pool_impl: str = "fold",
    as_of: int | None = None,
    _routed: DataFrame | None = None,
    _sq8_ranges: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """``ivf_search`` straight off a ``write_sharded`` layout path:
    route first, open only the probed shard directories
    (``open_probed_shards``), then join/score/top-k. First-search cost
    on a cold session drops from the full-layout listing walk to the
    probed-set read — the rest of the plan is identical to
    ``ivf_search(static_prune=True)`` (the explicit paths subsume the
    ``isin`` partition filter).

    ``codec="sq8"`` (layout written with ``sq8_ranges``): the candidate
    pass scans ONLY the ``codes`` column of the probed shards — parquet
    column pruning drops the raw float32 vectors, ~4× less IO on the
    dominant phase — scoring decoded bucket midpoints in whole-stage
    codegen. The top-``k·rerank_factor`` quantized candidates are then
    re-ranked exactly: their ids (bounded by Q·k·rerank_factor, and
    In-pushed only while ≤ ``max_id_pushdown`` — the BM25
    MAX_PUSHDOWN_TERMS lesson) fetch raw vectors from the id-sorted
    shard files with row-group/page skipping, so the raw column is read
    at candidate granularity, not probed-shard granularity.

    ``as_of``: SNAPSHOT search — the layout exactly as of committed
    mutation op ``as_of`` (``operators.vector_ops``; −1 = the pristine
    base build, ``None`` = head). A layout with no ``ops/`` directory
    short-circuits: mutation resolution costs NOTHING until the first
    upsert/delete lands.

    ``_routed``: a caller-provided routing table (same contract as
    ``ivf_search``), already MATERIALIZED or checkpointed — a caller
    serving several tiers of the same layout routes once and shares
    the table, instead of paying one routing checkpoint per tier."""
    from big_ann_spark.operators.vector_ops import live_probed_view

    spark = queries.sparkSession
    # lazy checkpoint (r14, guide §2.6/§5): the distinct-id collect below
    # is the first action and materializes it — one job where the eager
    # form ran a serial checkpoint job first and the collect second
    routed = (
        _routed
        if _routed is not None
        else route_queries(
            queries, centroids, nprobe, query_id=query_id, query_vec=query_vec, dim=dim
        ).localCheckpoint(eager=False)
    )
    # one routing materialization (r14): the arrow pools and the pq
    # fold LUT build need the routed ROWS on the driver anyway — when a
    # pool will collect them, collect once here and derive probe_ids
    # from the same rows instead of running a second serial job over
    # the same contractually-tiny table
    # sidecar prefetch (r15, VERDICT r14 #4, guide §2.6): the codebooks
    # (+ optional OPQ rotation) live in layout sidecars with NO data
    # dependency on routing, yet their read jobs ran serially AFTER the
    # routing collect — the two from-disk search hops that CAN overlap.
    # Load them on a background thread while the routing job runs; the
    # values are identical, only the wall-clock interleaving changes.
    sidecar_fut = None
    if codec in ("pq", "opq"):
        from concurrent.futures import ThreadPoolExecutor

        from big_ann_spark.operators import oplayout as _ol2
        from big_ann_spark.operators.pq import load_pq_codebooks, load_rotation

        def _load_pq_sidecars():
            cb = load_pq_codebooks(spark, f"{path}/pq_codebooks.parquet")
            rot = None
            if _ol2.path_exists(spark, f"{path}/opq_rotation.parquet"):
                rot = load_rotation(spark, f"{path}/opq_rotation.parquet")
            return cb, rot

        _ex = ThreadPoolExecutor(1)
        sidecar_fut = _ex.submit(_load_pq_sidecars)
        _ex.shutdown(wait=False)
    routed_rows = None
    pool_needs_rows = (codec == "sq8" and pool_impl == "arrow") or codec in (
        "pq",
        "opq",
    )
    if pool_needs_rows:
        routed_rows = routed.select("qid", "qvec", "shard_id").collect()
        probe_ids = sorted({int(r["shard_id"]) for r in routed_rows})
    else:
        # plain collect + driver-side set: the table is contractually
        # tiny (<= Q*nprobe rows), so a distinct() only added an
        # exchange and its AQE stage micro-job to the serial chain (r15)
        probe_ids = sorted(
            {int(r["shard_id"]) for r in routed.select("shard_id").collect()}
        )
    shards = live_probed_view(
        spark, path, open_probed_shards(spark, path, probe_ids),
        probe_ids, as_of=as_of, id_col=id_col, vec_col=vec_col,
    )
    if codec == "raw":
        return ivf_search(
            queries,
            shards,
            centroids,
            k,
            nprobe,
            query_id=query_id,
            query_vec=query_vec,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            _routed=routed,
        )
    if codec == "sq8":
        pool = sq8_pool(
            routed, shards, path, k * rerank_factor,
            id_col=id_col, dim=dim, impl=pool_impl, ranges=_sq8_ranges,
            routed_rows=routed_rows,
        )
    elif codec in ("pq", "opq"):
        # OPQ is the PQ tier with codes in a LEARNED ROTATED space:
        # pq_pool builds the per-query ADC LUTs from the rotated
        # queries whenever the rotation sidecar is present (codec="pq"
        # on an OPQ layout therefore serves correctly too); the exact
        # rerank compares raw vectors — an orthogonal R preserves L2,
        # so rotation never touches the rerank. codec="opq" makes the
        # tier explicit and REFUSES a layout without the rotation
        # (a plain-PQ layout served as "opq" would silently be plain PQ).
        if codec == "opq" and sidecar_fut.result()[1] is None:
            raise ValueError(
                f"codec='opq' but {path} has no opq_rotation.parquet — "
                "build with --opq-refine (write_sharded(opq_rotation=…)), "
                "or serve as codec='pq'"
            )
        pool = pq_pool(
            routed, shards, path, k * rerank_factor,
            id_col=id_col, impl=pool_impl, routed_rows=routed_rows,
            _sidecars=sidecar_fut.result() if sidecar_fut is not None else None,
        )
    elif codec == "binary":
        pool = binary_pool(routed, shards, path, k * rerank_factor, id_col=id_col)
    else:
        raise ValueError(
            f"unknown codec {codec!r}; use 'raw', 'sq8', 'pq', 'opq' or "
            "'binary'"
        )
    # ONE pool materialization (r15): the pool is contractually tiny
    # (<= Q * k * rerank_factor rows — the same bound the cand-id
    # collect always relied on), so collect its (qid, neighbor_id)
    # pairs once and derive BOTH the id-pushdown list and the rerank's
    # broadcast pair table from the same rows. The old chain was a
    # lazy checkpoint + a distinct() collect (an extra exchange and
    # AQE stage-job) + a pool-subtree rescan inside the rerank plan —
    # three serial pieces over one tiny table.
    pool_pairs = pool.select("qid", "neighbor_id")
    pool_rows = pool_pairs.collect()
    cand_ids = sorted({r["neighbor_id"] for r in pool_rows})
    raw = shards.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col))
    if len(cand_ids) <= max_id_pushdown:
        raw = raw.filter(_isin_ids("neighbor_id", cand_ids))
    pairs_lit = spark.createDataFrame(pool_rows, pool_pairs.schema)
    q = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("_qv")
    )
    exact = (
        raw.join(F.broadcast(pairs_lit), "neighbor_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid", "neighbor_id", l2_distance("_qv", vec_col, dim).alias("dist")
        )
    )
    return top_k_per_group(
        exact, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )


def sq8_pool(
    routed: DataFrame,
    shards: DataFrame,
    path: str,
    k_pool: int,
    *,
    id_col: str = "vec_id",
    dim: int | None = None,
    impl: str = "fold",
    rerank_margin: int = 5,
    ranges: tuple[list[float], list[float]] | None = None,
    routed_rows=None,
) -> DataFrame:
    """Quantized candidate pool of an SQ8 layout: score routed queries
    against decoded bucket midpoints reading ONLY the ``codes`` column
    (parquet column pruning keeps the raw float32 vectors out of the
    scan — plan-pinned in tests), top-``k_pool`` per query by
    (quantized dist, id). The exact-rerank tier consumes this.

    ``impl``: ``"fold"`` is the codegen/oracle-shaped projection —
    per-dim decode + sequential fold, bit-identical to the DuckDB
    mirror. ``"arrow"`` is the scale path (the exact_knn/assign
    pattern): mapInArrow decodes each batch with the IDENTICAL
    arithmetic order, GEMM-nominates an error-bound-widened candidate
    band per (routed query, shard) and selects within it by the exact
    sequential fold — DETERMINISTICALLY bit-equal to the fold impl
    (see ``_sq8_pool_arrow``; parity-tested) while the scan runs at
    memory bandwidth instead of interpreted-expression speed (measured
    ~6× on 2M×64, SCALE.md)."""
    from big_ann_spark.operators import oplayout

    spark = routed.sparkSession
    if ranges is not None:
        # caller already holds the layout's (mins, maxs) sidecar values
        # (e.g. from the build it just ran, or a session-scoped layout
        # cache) — skip the per-search one-row driver read (r14: one
        # fewer serial job on the serving critical path)
        mins, maxs = list(ranges[0]), list(ranges[1])
    else:
        ranges_path = f"{path}/sq8_ranges.parquet"
        if not oplayout.path_exists(spark, ranges_path):
            # layouts written before the sidecar rename (r9) used
            # {path}/sq8.parquet — read them rather than forcing a
            # rebuild. An existence check, not a bare except: a genuine
            # read failure (permissions, corrupt footer) must surface
            # as itself, not as a misleading not-found on the legacy
            # name.
            ranges_path = f"{path}/sq8.parquet"
        # explicit schema (r14): write_sharded's sidecar schema — no
        # footer inference job on the serving path
        rng = (
            spark.read.schema("mins array<double>, maxs array<double>")
            .parquet(ranges_path)
            .collect()[0]
        )
        mins, maxs = list(rng["mins"]), list(rng["maxs"])
    if impl == "arrow":
        return _sq8_pool_arrow(
            routed, shards, mins, maxs, k_pool,
            id_col=id_col, rerank_margin=rerank_margin,
            routed_rows=routed_rows,
        )
    if impl != "fold":
        raise ValueError(f"impl must be 'fold' or 'arrow', got {impl!r}")
    from big_ann_spark.operators.pq import sq8_decode_col

    cands = routed.join(
        shards.select(
            F.col(id_col).alias("neighbor_id"), F.col("codes"), "shard_id"
        ),
        "shard_id",
    )
    scored = cands.select(
        "qid",
        "neighbor_id",
        l2_distance("qvec", sq8_decode_col("codes", mins, maxs), dim).alias("dist"),
    )
    return top_k_per_group(
        scored, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k_pool
    )


def _arrow_nominating_pool(
    routed: DataFrame,
    shards: DataFrame,
    k_pool: int,
    *,
    id_col: str,
    payload_col: str,
    payload_dtype,
    make_state,
    score_shard,
    routed_rows=None,
) -> DataFrame:
    """The shared skeleton of the numpy candidate pools (sq8 decode
    GEMM, pq LUT gather): routing ships as ONE broadcast (sorted query
    ids, caller-built per-query state, shard→query-index lists); each
    Arrow batch extracts the payload matrix once, and for every
    (probed shard ∩ batch) group the caller's
    ``score_shard(state, qids, qidx, payload_rows, id_rows)`` yields
    (global qid, selected ids, dists) nominations — emitted as
    (qid, neighbor_id, dist) rows and globally top-``k_pool``'d per
    query with the fold impls' (dist, id) tie-break. The nomination
    arithmetic lives entirely in the scorer, so bit-parity with the
    expression impls is the scorer's contract, not the skeleton's."""
    import numpy as np

    # routed_rows (r14): a caller that already collected the routing
    # table (ivf_search_from_disk derives probe_ids from the same rows)
    # passes it through — one routing materialization per search, not
    # two serial jobs over the same 40-row table
    rrows = (
        routed_rows
        if routed_rows is not None
        else routed.select("qid", "qvec", "shard_id").collect()
    )
    qvec_by_id: dict[int, list[float]] = {}
    shard_to_q: dict[int, list[int]] = {}
    for r in rrows:
        qvec_by_id.setdefault(int(r["qid"]), [float(x) for x in r["qvec"]])
    qids = np.array(sorted(qvec_by_id), dtype=np.int64)
    qpos = {int(q): i for i, q in enumerate(qids)}
    for r in rrows:
        shard_to_q.setdefault(int(r["shard_id"]), []).append(qpos[int(r["qid"])])
    shard_to_q = {s: np.unique(np.array(v)) for s, v in shard_to_q.items()}
    state = make_state(qids, qvec_by_id)
    bc = routed.sparkSession.sparkContext.broadcast((qids, state, shard_to_q))

    def part(batches):
        import pyarrow as pa

        from big_ann_spark.functions.arrowio import int_col, list_col_matrix

        qids, state, shard_to_q = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = int_col(rb, id_col)
            sh = int_col(rb, "shard_id")
            payload = list_col_matrix(rb, payload_col, payload_dtype)
            out_q, out_n, out_d = [], [], []
            for s in np.unique(sh):
                qidx = shard_to_q.get(int(s))
                if qidx is None or len(qidx) == 0:
                    continue
                rows = np.flatnonzero(sh == s)
                for gq, sel_ids, dists in score_shard(
                    state, qids, qidx, payload[rows], ids[rows]
                ):
                    out_q.append(np.full(len(sel_ids), gq, dtype=np.int64))
                    out_n.append(sel_ids)
                    out_d.append(np.asarray(dists, dtype=np.float64))
            if not out_q:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), type=pa.int64()),
                    pa.array(np.concatenate(out_n), type=pa.int64()),
                    pa.array(np.concatenate(out_d), type=pa.float64()),
                ],
                names=["qid", "neighbor_id", "dist"],
            )

    partial = shards.select(
        F.col(id_col), F.col(payload_col), F.col("shard_id")
    ).mapInArrow(part, schema="qid long, neighbor_id long, dist double")
    return top_k_per_group(
        partial, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k_pool
    )


def _sq8_pool_arrow(
    routed: DataFrame,
    shards: DataFrame,
    mins: list[float],
    maxs: list[float],
    k_pool: int,
    *,
    id_col: str = "vec_id",
    rerank_margin: int = 5,
    routed_rows=None,
) -> DataFrame:
    """BLAS scoring of the codes scan: each batch decodes its codes
    ONCE with the exact fold-order arithmetic
    ``mn + ((c + 0.5) * (mx − mn)) / 255`` (numpy elementwise ops round
    identically to the scalar expression, so decoded values are
    bit-equal to ``sq8_decode_col``).

    Fold bit-parity is DETERMINISTIC, not margin-probabilistic: GEMM
    distances nominate a candidate BAND — every row within the kk-th
    smallest GEMM distance widened by 2δ, where δ is an a-priori bound
    on |GEMM − fold| derived from the batch (FP summation error:
    ``|√a − √b| ≤ √|a−b|`` and both accumulations carry at most
    ``4·d·ulp·(‖q‖+‖x‖)²`` of squared-distance error) — and the final
    kk are selected INSIDE the band by the exact sequential fold
    (dist, id) order. Any row the fold impl would rank into the top kk
    lies within the band by construction, so emitted pools are
    bit-equal to ``impl="fold"`` regardless of how many near-tie GEMM
    inversions a batch produces. ``rerank_margin`` only sizes kk (the
    per-shard nomination count, kk = k_pool + margin ≥ k_pool) — it no
    longer carries any correctness weight."""
    import numpy as np

    mn = np.array(mins, dtype=np.float64)
    mx = np.array(maxs, dtype=np.float64)
    n_cand = k_pool + rerank_margin

    def make_state(qids, qvec_by_id):
        return np.array(
            [qvec_by_id[int(q)] for q in qids], dtype=np.float64
        )

    def score_shard(qmat, qids, qidx, codes_rows, id_rows):
        from big_ann_spark.operators.knn import _exact_fold_l2

        # EXACT decode order: mn + ((c + 0.5) * (mx - mn)) / 255
        X = mn + ((codes_rows + 0.5) * (mx - mn)) / 255.0
        Q = qmat[qidx]
        qsq = (Q * Q).sum(axis=1)
        d2 = qsq[:, None] + (X * X).sum(axis=1)[None, :] - 2.0 * (Q @ X.T)
        np.maximum(d2, 0.0, out=d2)
        d = np.sqrt(d2)
        kk = min(n_cand, d.shape[1])
        part_idx = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        eps = np.finfo(np.float64).eps
        fp_bound = np.sqrt(4.0 * X.shape[1] * eps)
        xnorm = float(np.sqrt((X * X).sum(axis=1).max())) if X.shape[0] else 0.0
        for qi in range(d.shape[0]):
            row = d[qi]
            thresh = row[part_idx[qi]].max()
            delta = fp_bound * (np.sqrt(qsq[qi]) + xnorm) + 8.0 * eps * thresh
            cand = np.flatnonzero(row <= thresh + 2.0 * delta)
            ex = _exact_fold_l2(Q[qi], X[cand], sqrt=True)
            order = np.lexsort((id_rows[cand], ex))[:kk]
            yield (
                qids[qidx[qi]],
                id_rows[cand[order]],
                ex[order],
            )

    return _arrow_nominating_pool(
        routed, shards, k_pool,
        id_col=id_col, payload_col="codes", payload_dtype=np.float64,
        make_state=make_state, score_shard=score_shard,
        routed_rows=routed_rows,
    )


def pq_pool(
    routed: DataFrame,
    shards: DataFrame,
    path: str,
    k_pool: int,
    *,
    id_col: str = "vec_id",
    impl: str = "fold",
    routed_rows=None,
    _sidecars: tuple | None = None,
) -> DataFrame:
    """Quantized candidate pool of an IVF-PQ (IVFADC) layout: the
    candidate pass scans ONLY the ``pq_codes`` column of the probed
    shards (m sub-codes per row — at m=8 over 64-d float32 that is
    ~16× less column IO than raw, one decade past SQ8's 4×), scoring
    each row as ``Σ_j lut[qid][j][code_j]`` against the broadcast
    per-query ADC lookup tables (driver-computed from the persisted
    codebooks — queries are the contractual small side). top-``k_pool``
    per query by (adc dist, id); ADC distances are approximate, the
    exact-rerank tier above fixes ranks and emits true distances.

    ``impl``: ``"fold"`` scores in whole-stage codegen (zip_with +
    element_at per row — interpreted-expression cost scales with m);
    ``"arrow"`` gathers the same LUT entries with numpy fancy indexing
    per Arrow batch, accumulating left-to-right over j so emitted
    distances are BIT-EQUAL to the fold (parity-tested) while the scan
    runs at memory bandwidth — the sq8 arrow-pool pattern."""
    from big_ann_spark.operators import oplayout
    from big_ann_spark.operators.pq import (
        load_pq_codebooks,
        load_rotation,
        pq_lut_rows,
    )

    spark = routed.sparkSession
    # ``_sidecars``: (codebooks, rotation) already loaded by the caller
    # — ivf_search_from_disk prefetches them on a background thread
    # concurrent with the routing collect (r15); values are identical
    # to loading here.
    if _sidecars is not None:
        codebooks, rotation = _sidecars
    else:
        codebooks = load_pq_codebooks(spark, f"{path}/pq_codebooks.parquet")
        # OPQ layout: codes live in the rotated space, so the per-query
        # LUTs are built from the ROTATED queries (the only place the
        # rotation touches serving — the exact rerank compares raw
        # vectors with raw queries, and an orthogonal R preserves L2
        # exactly)
        rotation = None
        if oplayout.path_exists(spark, f"{path}/opq_rotation.parquet"):
            rotation = load_rotation(spark, f"{path}/opq_rotation.parquet")
    if impl == "arrow":
        return _pq_pool_arrow(
            routed, shards, codebooks, k_pool, id_col=id_col,
            rotation=rotation, routed_rows=routed_rows,
        )
    if impl != "fold":
        raise ValueError(f"impl must be 'fold' or 'arrow', got {impl!r}")
    qvecs: dict[int, list[float]] = {}
    for r in (
        routed_rows
        if routed_rows is not None
        else routed.select("qid", "qvec").collect()
    ):
        qvecs.setdefault(int(r["qid"]), [float(x) for x in r["qvec"]])
    if rotation is not None:
        import numpy as np

        R = np.asarray(rotation, dtype=np.float64)
        qvecs = {
            q: list(np.asarray(v, dtype=np.float64) @ R)
            for q, v in qvecs.items()
        }
    luts = spark.createDataFrame(
        pq_lut_rows(sorted(qvecs.items()), codebooks),
        "qid long, lut array<array<double>>",
    )
    probes = routed.select("qid", "shard_id").join(F.broadcast(luts), "qid")
    cands = probes.join(
        shards.select(
            F.col(id_col).alias("neighbor_id"), F.col("pq_codes"), "shard_id"
        ),
        "shard_id",
    ).select(
        "qid",
        "neighbor_id",
        F.aggregate(
            F.zip_with(
                F.col("lut"),
                F.col("pq_codes"),
                lambda l, c: F.element_at(l, c.cast("int") + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dist"),
    )
    return top_k_per_group(
        cands, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k_pool
    )


def binary_pool(
    routed: DataFrame,
    shards: DataFrame,
    path: str,
    k_pool: int,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate pool of a binary (sign-bit) layout — the 32× tier:
    the candidate pass scans ONLY the packed ``bcodes`` words of the
    probed shards (d bits per row vs d·32 for raw float32) and scores
    XOR+popcount Hamming distance against the broadcast query codes
    (binarized under the layout's frozen thresholds). Integer-exact,
    whole-stage codegen, no Python. top-``k_pool`` per query by
    (hamming, id); the exact-rerank tier above fixes ranks."""
    from big_ann_spark.operators.pq import (
        BINARY_WORD_BITS,
        binarize_col,
        hamming_distance,
    )

    spark = routed.sparkSession
    # explicit schema (r14): write_sharded's sidecar schema — no footer
    # inference job on the serving path
    thr = list(
        spark.read.schema("thresholds array<double>")
        .parquet(f"{path}/binary_thresholds.parquet")
        .collect()[0]["thresholds"]
    )
    qcodes = (
        routed.select("qid", "qvec")
        .dropDuplicates(["qid"])
        .select(
            "qid",
            binarize_col("qvec", thr, word_bits=BINARY_WORD_BITS).alias("_qc"),
        )
    )
    probes = routed.select("qid", "shard_id").join(F.broadcast(qcodes), "qid")
    cands = probes.join(
        shards.select(
            F.col(id_col).alias("neighbor_id"), F.col("bcodes"), "shard_id"
        ),
        "shard_id",
    ).select(
        "qid",
        "neighbor_id",
        hamming_distance("_qc", "bcodes").cast("double").alias("dist"),
    )
    return top_k_per_group(
        cands, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k_pool
    )


def _pq_pool_arrow(
    routed: DataFrame,
    shards: DataFrame,
    codebooks: list[list[list[float]]],
    k_pool: int,
    *,
    id_col: str = "vec_id",
    rotation: list[list[float]] | None = None,
    routed_rows=None,
) -> DataFrame:
    """numpy LUT-gather ADC scan on the shared nominating skeleton:
    each batch gathers ``lut[j, codes[:, j]]`` and accumulates
    LEFT-TO-RIGHT over j — the identical addition order to the fold
    expression, so emitted pool distances are bit-equal
    (parity-tested) while the scan runs at gather speed. ``rotation``:
    OPQ — LUTs are built from the rotated queries."""
    import numpy as np

    from big_ann_spark.operators.pq import pq_lut_rows

    def make_state(qids, qvec_by_id):
        if rotation is not None:
            R = np.asarray(rotation, dtype=np.float64)
            qvec_by_id = {
                q: list(np.asarray(v, dtype=np.float64) @ R)
                for q, v in qvec_by_id.items()
            }
        rows = pq_lut_rows(
            [(int(q), qvec_by_id[int(q)]) for q in qids], codebooks
        )
        return np.array([l for _, l in rows], dtype=np.float64)

    def score_shard(luts, qids, qidx, codes_rows, id_rows):
        for qi in qidx:
            lut = luts[qi]
            # left-to-right accumulation == the fold's order
            acc = np.zeros(len(id_rows), dtype=np.float64)
            for j in range(lut.shape[0]):
                acc = acc + lut[j, codes_rows[:, j]]
            kk = min(k_pool, len(id_rows))
            part_idx = np.argpartition(acc, kk - 1)[:kk]
            thresh = acc[part_idx].max()
            cand = np.flatnonzero(acc <= thresh)
            order = np.lexsort((id_rows[cand], acc[cand]))[:kk]
            sel = cand[order]
            yield qids[qi], id_rows[sel], acc[sel]

    return _arrow_nominating_pool(
        routed, shards, k_pool,
        id_col=id_col, payload_col="pq_codes", payload_dtype=np.int64,
        make_state=make_state, score_shard=score_shard,
        routed_rows=routed_rows,
    )


def write_tag_postings_layout(
    tagged: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    tags_col: str = "tags",
    vec_col: str = "embedding",
    n_tag_buckets: int = 64,
    carry_payload: bool = True,
) -> None:
    """Persist the filtered-track serving artifacts next to a
    ``write_sharded`` layout (big-ann "filtered" track, from disk):

    - ``{path}/tag_postings.parquet`` — the inverted tag index
      ``(neighbor_id, shard_id, _tag)`` partitioned by
      ``_tb = pmod(xxhash64(_tag), n_tag_buckets)``: a query batch
      prunes to its rarest-tags' buckets, and the carried ``shard_id``
      lets the vector fetch open only the shards holding candidates;
    - ``{path}/tag_df.parquet`` — per-tag document frequencies
      (vocabulary-sized), so rarest-tag selection never rescans
      postings;
    - ``{path}/tags.parquet`` — the id-sorted ``(neighbor_id, tags)``
      side table the containment verify point-fetches (bounded id In,
      row-group skipping — the refine-rerank pattern applied to tags).

    ``carry_payload=True`` (the DEFAULT — it is the only mode whose
    serving cost is measured corpus-independent) additionally stores
    each posting row's FULL payload — ``_bvec`` (the vector) and
    ``_btags`` (the tag set) — making the query entirely
    POSTING-LOCAL: distance and containment are computed on the rows
    the rarest-tag scan already read, no candidate point-fetch at all.
    This is the space-time trade of Filtered-DiskANN's label-carrying
    records / a search engine's doc values: storage ≈ (avg tags per
    doc) × corpus vector bytes, query IO = the rarest tag's posting
    list ALONE — measured corpus-INDEPENDENT across three decades
    (tools/measure_filtered_mut.py / SCALE.md: 1.07→1.43→2.7 s at
    200k→2M→20M), where the point-fetch plan degrades into a
    corpus-wide embedding-column scan once candidates scatter across
    shards (5.3 s → 22.6 s over one decade on the same query).
    Mutations on a payload layout require vectors and tags in the SAME
    op (``upsert_vectors(..., tags_col=...)``) — enforced, because a
    vector change without its postings would leave stale payloads
    serving wrong distances. Pass ``carry_payload=False`` only when
    that coupling is unacceptable and the corpus is small or the tags
    shard-clustered (the point-fetch caveats in
    :func:`filtered_search_from_disk`).

    ``tagged``: ``(id_col, tags_col)`` rows for every vector in the
    layout; shard ids (and payload vectors) come from the layout
    itself, so the caller never re-derives assignment."""
    from big_ann_spark.operators.knn import build_tag_postings

    spark = tagged.sparkSession
    shard_cols = [F.col(id_col).alias("neighbor_id"), F.col("shard_id")]
    if carry_payload:
        shard_cols.append(F.col(vec_col).alias("_bvec"))
    shard_of = spark.read.parquet(f"{path}/shards").select(*shard_cols)
    posts = build_tag_postings(
        tagged.select(F.col(id_col).alias("neighbor_id"), F.col(tags_col)),
        base_id="neighbor_id",
        tags_col=tags_col,
    ).join(shard_of, "neighbor_id")
    if carry_payload:
        posts = posts.join(
            tagged.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(tags_col).alias("_btags"),
            ),
            "neighbor_id",
        )
    posts = posts.withColumn(
        "_tb", F.pmod(F.xxhash64("_tag"), F.lit(n_tag_buckets))
    )
    # the base build lands at _mb = BASE_EPOCH, the op-ledger epoch
    # convention (oplayout) — tag mutations (operators/tag_ops.py)
    # land their deltas as _mb=<op id> siblings
    from big_ann_spark.operators import oplayout

    base_mb = F.lit(oplayout.BASE_EPOCH)
    (
        posts.withColumn("_mb", base_mb)
        .write.partitionBy("_tb", "_mb")
        .mode("overwrite")
        .parquet(f"{path}/tag_postings.parquet")
    )
    (
        posts.groupBy("_tag")
        .agg(F.count("*").alias("_df"))
        .withColumn("_mb", base_mb)
        .write.partitionBy("_mb")
        .mode("overwrite")
        .parquet(f"{path}/tag_df.parquet")
    )
    (
        tagged.select(F.col(id_col).alias("neighbor_id"), F.col(tags_col).alias("_btags"))
        .sort("neighbor_id")
        .write.mode("overwrite")
        .parquet(f"{path}/tags.parquet")
    )
    # the bucket count is a LAYOUT CONSTANT the query side must hash
    # with — inferring it from observed _tb values would break the
    # moment a trailing bucket happens to be empty
    (
        spark.createDataFrame(
            [(int(n_tag_buckets), bool(carry_payload))],
            "n_tag_buckets int, carry_payload boolean",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/tag_meta.parquet")
    )
    # a rebuild at the same path must not serve the old constants from
    # the read-side memo (r14)
    from big_ann_spark.operators import tag_ops as _to

    _to._TAG_META_MEMO.pop(path, None)


def _filtered_candidates(
    spark,
    q: DataFrame,
    path: str,
    *,
    as_of: int | None = None,
    uncommitted: list[int] | None = None,
    payload: bool = False,
) -> DataFrame:
    """Rarest-tag candidate generation off the persisted artifacts —
    LAZY (the caller checkpoints; the plan-pin test inspects this):
    per-query rarest tag via the vocabulary-sized df table, then a
    static ``_tb`` partition filter (bounded by the query count, no
    matter how wide the tag vocabulary) over the bucketed postings.
    Tag-op visibility (tag_ops.visible_postings) adds only ``_mb``
    partition-column predicates — the ``_tb`` pruning survives.
    ``payload``: also project the carried ``_bvec``/``_btags`` (+
    ``_mb`` for latest-op resolution) on a carry layout."""
    from big_ann_spark.operators import tag_ops

    uncommitted = list(uncommitted or [])
    tag_df = tag_ops.tag_df_view(spark, path, as_of=as_of, uncommitted=uncommitted)
    # explode_OUTER (r14): an empty/null query tag set keeps a row with
    # a NULL rarest tag, so the caller's empty-tag contract guard folds
    # into the bucket collect below — one serial job per search where
    # the guard used to run its own limit-1 count first. For every
    # valid query (non-empty tags) the produced rows are identical to
    # plain explode.
    q_rare = (
        q.select("qid", F.explode_outer("_qtags").alias("_tag"))
        .join(tag_df, "_tag", "left")
        .groupBy("qid")
        .agg(
            F.min(
                F.struct(F.coalesce("_df", F.lit(0)).alias("_df"), "_tag")
            )["_tag"].alias("_tag")
        )
        # lazy (r14): the bucket collect just below materializes it
        .localCheckpoint(eager=False)
    )
    n_buckets = tag_ops.n_tag_buckets(spark, path)
    rare_rows = q_rare.select(
        "_tag", F.pmod(F.xxhash64("_tag"), F.lit(n_buckets)).alias("_tb")
    ).distinct().collect()
    if any(r["_tag"] is None for r in rare_rows):
        raise ValueError(
            "filtered search: query with an empty tag set is "
            "unconstrained — use ivf_search_from_disk for those queries"
        )
    tbs = {r["_tb"] for r in rare_rows}
    posts = tag_ops.visible_postings(
        spark, path, as_of=as_of, uncommitted=uncommitted
    ).filter(F.col("_tb").isin([int(b) for b in tbs]))
    cols = ["qid", "neighbor_id", "shard_id"]
    if payload:
        cols += ["_mb", "_bvec", "_btags"]
    return posts.join(F.broadcast(q_rare), "_tag").select(*cols)


def filtered_search_from_disk(
    queries: DataFrame,
    path: str,
    k: int = 10,
    *,
    query_id: str = "qid",
    query_vec: str = "qvec",
    query_tags: str = "qtags",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_id_pushdown: int = 1024,
    as_of: int | None = None,
) -> DataFrame:
    """Tag-containment filtered kNN SERVED from a persisted layout
    (``write_tag_postings_layout`` artifacts): per query, candidates
    come off the RAREST query tag's posting list (exactness preserved
    — a qualifying neighbor contains every query tag, hence the
    rarest), read with ``_tb`` partition pruning.

    Two serving modes, auto-detected from the layout meta:

    - ``carry_payload`` layouts (the 100 TB mode): the verify is
      POSTING-LOCAL — distance + containment run on the payload the
      pruned scan already read, so query IO is the rarest tag's
      posting list alone. Measured corpus-INDEPENDENT
      (tools/measure_filtered_mut.py: 1.1 s at 200k, 1.4 s at 2M).
    - point-fetch layouts (opt-in via ``carry_payload=False``):
      candidate vectors and tag sets are fetched by id from the shard
      layout and the id-sorted tags table. The candidate-id set is
      COUNT-GATED before anything reaches the driver: only when the
      distinct count is ≤ ``max_id_pushdown`` (default at the measured
      ~1k ``isin`` threshold, SCALE.md) are the ids collected and
      pushed as literal filters for row-group skipping; a wider set is
      verified purely by the distributed joins — no driver collect of
      candidate ids ever happens above the cap. HONEST caveat, by
      measurement: when candidates scatter across shards (uniformly
      distributed tags do), the fetch degrades into a corpus-wide
      embedding-column scan — 5.3 s at 200k but 22.6 s at 2M on the
      same query. Fine for small/medium layouts or shard-clustered
      tags; build with ``carry_payload=True`` (the default) when the
      corpus outgrows it.

    MUTATED layouts (vector_ops/tag_ops) are served exactly: the
    vector fetch is the live probed view, the containment verify uses
    the live tags view, and postings visibility excludes in-flight
    ops — a stale posting of a re-tagged or deleted id is a candidate
    the verify drops. ``as_of``: snapshot search at that op id (one
    time axis — vector and tag ops share the layout's ledger). A
    pristine layout takes the identical plan as before mutations
    existed."""
    from big_ann_spark.operators import oplayout, tag_ops, vector_ops

    spark = queries.sparkSession
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("_qvec"),
        F.col(query_tags).alias("_qtags"),
    ).localCheckpoint(eager=False)
    # empty-tag contract guard: folded into _filtered_candidates'
    # rarest-tag collect (explode_outer keeps a NULL-tag row per
    # empty-tag query), so no dedicated guard job runs here (r14)
    uncommitted = sorted(
        vector_ops._ops_on_disk(spark, path)
        - oplayout.committed_ops(spark, path)
    ) if (vector_ops.has_vector_ops(spark, path) or tag_ops.has_tag_ops(spark, path)) else []
    if tag_ops.tag_meta(spark, path)[1]:
        # PAYLOAD layout: the query never leaves the posting rows —
        # scan cost is the rarest tags' posting lists alone, corpus-
        # independent (see write_tag_postings_layout). Mutation
        # resolution is one op-sized broadcast: a posting is live iff
        # its id is untouched or its _mb IS the id's latest op
        # (tombstones match nothing, re-tags/re-upserts match only
        # their newest payload rows).
        cand = _filtered_candidates(
            spark, q, path, as_of=as_of, uncommitted=uncommitted, payload=True
        )
        latest = tag_ops.latest_op_of_contested(
            spark, path, as_of=as_of, uncommitted=uncommitted
        )
        if latest is not None:
            cand = cand.join(F.broadcast(latest), "neighbor_id", "left").filter(
                F.col("_latest").isNull() | (F.col("_mb") == F.col("_latest"))
            )
        verified = (
            cand.join(F.broadcast(q), "qid")
            .filter(F.size(F.array_except(F.col("_qtags"), F.col("_btags"))) == 0)
            .select(
                "qid",
                "neighbor_id",
                l2_distance("_qvec", "_bvec", dim).alias("dist"),
            )
        )
        return top_k_per_group(
            verified, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
        )
    cand = _filtered_candidates(
        spark, q, path, as_of=as_of, uncommitted=uncommitted
    ).localCheckpoint(eager=False)  # lazy: the gate job materializes it
    # COUNT-GATE before any id set reaches the driver — ONE job whose
    # payload is bounded by the cap itself (limit cap+1): only a
    # ≤ max_id_pushdown set is kept (for literal In pushdown /
    # row-group skipping on the id-sorted tags table); a wider
    # candidate set — df_rarest can be 10⁶–10⁸ at 100 TB — is verified
    # entirely by the distributed joins below, never a driver collect.
    gate_rows = (
        cand.select("neighbor_id")
        .distinct()
        .limit(int(max_id_pushdown) + 1)
        .collect()
    )
    bounded = (
        [r["neighbor_id"] for r in gate_rows]
        if len(gate_rows) <= max_id_pushdown
        else None
    )
    # shard ids: bounded by the layout's shard count m, always tiny
    shard_ids = [
        r["shard_id"] for r in cand.select("shard_id").distinct().collect()
    ]
    base_vecs = open_probed_shards(spark, path, shard_ids)
    # probe_ids=None on the live view: the BASE scan stays pruned to
    # the posting shards (exact — an id whose live row is still in the
    # base has accurate posting shards by construction), but the
    # op-sized RESOLVED side must not be shard-filtered: a vector-only
    # upsert (legal on point-fetch layouts) may have MOVED an id to a
    # shard its stale posting doesn't name, and filtering resolved
    # rows by the posting-derived probe set would silently drop that
    # live qualifying neighbor from the verify.
    vecs = vector_ops.live_probed_view(
        spark, path, base_vecs, None,
        as_of=as_of, id_col=id_col, vec_col=vec_col,
    ).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_bvec"))
    btags = tag_ops.live_tags_view(
        spark, path, as_of=as_of, uncommitted=uncommitted, bounded_ids=bounded
    )
    if bounded is not None:
        vecs = vecs.filter(F.col("neighbor_id").isin(bounded))
    verified = (
        # distinct: a re-tagged id carries postings for the SAME tag
        # under two _mb partitions — without dedup the pair would be
        # verified twice and occupy two ranks (candidate-sized, cheap)
        cand.select("qid", "neighbor_id")
        .distinct()
        .join(vecs, "neighbor_id")
        .join(btags, "neighbor_id")
        .join(F.broadcast(q), "qid")
        .filter(F.size(F.array_except(F.col("_qtags"), F.col("_btags"))) == 0)
        .select(
            "qid",
            "neighbor_id",
            l2_distance("_qvec", "_bvec", dim).alias("dist"),
        )
    )
    return top_k_per_group(
        verified, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )


def route_queries(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    *,
    query_id: str = "qid",
    query_vec: str = "qvec",
    dim: int | None = None,
) -> DataFrame:
    """J3: top-``nprobe`` nearest centroids per query →
    (qid, qvec, shard_id, probe_rank).

    Zero-exchange form (mirrors assign_to_centroids): the centroid
    table collapses to ONE broadcast array row; per query, the probe
    list is ``array_sort(struct(cdist, shard_id))[:nprobe]`` exploded —
    a pure projection fused into the query scan. The r1 window form
    hash-exchanged all Q×M scored rows by qid before WindowGroupLimit
    could trim them; with batch-ANN query sets in the millions that
    exchange is the routing cost. Sort cost is M·log M per row — fine
    for M ≤ 10^5 broadcastable centroids; ties break on shard_id
    (struct field order), identical to the window form."""
    cents = centroids.agg(
        F.collect_list(
            F.struct(F.col("shard_id").alias("_sid"), F.col("centroid").alias("_cv"))
        ).alias("_cents")
    )
    scored = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec")
    ).crossJoin(F.broadcast(cents))
    probes = F.slice(
        F.array_sort(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    l2_distance(F.col("qvec"), c["_cv"], dim).alias("cdist"),
                    c["_sid"].alias("shard_id"),
                ),
            )
        ),
        1,
        nprobe,
    )
    return scored.select(
        "qid", "qvec", F.posexplode(probes).alias("_p", "_probe")
    ).select(
        "qid",
        "qvec",
        F.col("_probe")["shard_id"].alias("shard_id"),
        (F.col("_p") + 1).alias("probe_rank"),
    )


def ivf_search(
    queries: DataFrame,
    sharded_vectors: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    *,
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    static_prune: bool = True,
    _routed: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k: route → candidate join on shard_id → per-query top-k
    globally re-ranked by true distance (W2: union of per-shard
    candidates re-sorted, ``kanndi/README.md:46-47``).

    ``sharded_vectors`` must have (id_col, vec_col, shard_id). When it
    is a ``partitionBy("shard_id")`` parquet table, ``static_prune``
    (default) collects the DISTINCT routed shard ids — bounded by
    min(Q·nprobe, m), contractually tiny — and applies them as an
    ``isin`` filter before the join, so the scan carries static
    PartitionFilters and reads ONLY probed shard directories. This is
    what keeps search wall N-independent at fixed shard size (measured:
    the join-only form relies on DPP, which Spark's heuristics decline
    for this plan shape, silently degrading to a full scan — 11 s vs
    0.9 s at 2M vectors). Disable for huge query batches that probe
    every shard anyway (the filter is then a no-op costing one routing
    pass).

    ``_routed``: a caller that already computed (and pruned its scan
    by) the routing table passes it here so the centroid argmin is not
    recomputed — the streaming live-view search does exactly this;
    implies ``static_prune`` handling stays with the caller."""
    routed = (
        _routed
        if _routed is not None
        else route_queries(
            queries, centroids, nprobe, query_id=query_id, query_vec=query_vec, dim=dim
        )
    )
    if static_prune and _routed is None:
        # materialize routing ONCE: the distinct-id collect and the
        # candidate join below both reuse it (without this the routing
        # lineage — centroid agg + broadcast argmin — executes twice).
        # Lazy (r14): the collect right below is the materializing job.
        routed = routed.localCheckpoint(eager=False)
        probe_ids = [
            r["shard_id"] for r in routed.select("shard_id").distinct().collect()
        ]
        sharded_vectors = sharded_vectors.filter(
            _isin_ids("shard_id", probe_ids)
        )
    cands = routed.join(
        sharded_vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_bvec"), "shard_id"
        ),
        "shard_id",
    )
    scored = cands.select(
        "qid", "neighbor_id", l2_distance("qvec", "_bvec", dim).alias("dist")
    )
    return top_k_per_group(
        scored, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )


def lsh_bucket_search(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    *,
    n_planes: int = 8,
    seed_planes: list[list[float]] | None = None,
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    multiprobe: bool = False,
) -> DataFrame:
    """Random-hyperplane LSH bucketed cosine search: sign-bit signature
    over ``n_planes`` fixed hyperplanes → equi-join on bucket →
    exact re-rank inside the bucket. The equi-join makes candidate
    generation a hash join (no cross product); recall depends on bucket
    granularity. Deterministic planes (seeded LCG) so results are
    reproducible."""
    if seed_planes is None:
        from big_ann_spark.functions.vector import lcg_planes

        planes = lcg_planes(n_planes, dim)
    else:
        planes = seed_planes

    def bucket_expr(vec):
        bits = []
        for i, plane in enumerate(planes):
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec).cast("array<double>"),
                    F.array(*[F.lit(x) for x in plane]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    qb = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qvec")
    ).withColumn("bucket", bucket_expr("qvec"))
    if multiprobe:
        # probe the query's bucket plus every bucket at Hamming
        # distance 1 (one flipped hyperplane sign): n_planes+1 probes
        # per query — the standard multi-probe LSH recall lift without
        # touching the base side's layout
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        qb = qb.withColumn("bucket", F.explode(probes))
    bb = base.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_bvec")
    ).withColumn("bucket", bucket_expr("_bvec"))
    cands = qb.join(bb, "bucket").select(
        "qid", "neighbor_id", l2_distance("qvec", "_bvec").alias("dist")
    )
    if multiprobe:
        cands = cands.distinct()
    return top_k_per_group(
        cands, ["qid"], [F.col("dist").asc(), F.col("neighbor_id").asc()], k
    )


def nn_descent_knn_graph(
    vectors: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 3,
    dim: int | None = None,
    build_k: int | None = None,
    reverse_cap: int | None = None,
    init_memberships: int = 2,
    seed: int = 1,
    merge_strategy: str = "window",
    sample_rate: float = 1.0,
    local_join: str = "full",
    converge_churn: float | None = None,
    init_graph: DataFrame | None = None,
    local_join_cap: int | None = None,
    local_join_schedule: list[int] | None = None,
) -> DataFrame:
    """Approximate kNN-graph construction by NN-Descent (Dong, Moses &
    Li, WWW 2011) — the build stage behind graph-ANN indexes
    (HNSW/NSG/kNN-graph pipelines), expressed entirely as joins +
    per-node top-k:

    1. **Init**: each node hashes into ``init_memberships``
       pseudo-random buckets sized ~k (deterministic ``xxhash64``, no
       RNG state); all within-bucket pairs seed the graph.
    2. **Iterate**: "a neighbor of my neighbor is likely my neighbor" —
       per pivot node, its (bounded) forward ∪ reverse neighbor set is
       locally joined with itself; fresh pairs are scored exactly and
       merged into the per-node top-k (ties break on (dist, id) so the
       whole build is deterministic).

    Scale shape: per-iteration candidate volume is Σ_v deg(v)² ≤
    n·(k + reverse_cap)² — LINEAR in n for fixed k (vs the O(n²)
    all-pairs graph build); every stage is an equi-join on node/pair
    keys or a WindowGroupLimit top-k, the graph state is exactly n·k
    rows, and ``localCheckpoint`` truncates per-round lineage (the
    min_label_components pattern). The default is the simple
    bounded-degree full-local-join variant; ``local_join="new_old"``
    enables the paper's new/old-flag trim (see below).

    ``build_k`` (default 2·k) is the internal graph degree — the
    standard search-amplification trick: descending on a 2× wider graph
    then truncating to k lifts recall from ~0.79 to ~0.99 on the 64-d
    gaussian fixtures (measured at n=300) because the wider frontier
    escapes local optima that a k-degree descent converges into.

    ``converge_churn`` (requires ``local_join="new_old"``): stop as
    soon as a round changes ≤ that fraction of the n·build_k graph
    edges — the paper's delta stopping rule; ``iterations`` then acts
    as the safety cap. Pair it with the new/old trim: converged rounds
    are exactly the ones where the trim makes candidates ~10% of the
    full join (SCALE.md).

    ``init_graph``: a pre-seeded ``(src, dst[, dist])`` edge set that
    REPLACES the hash-bucket init (re-scored with the canonical
    distance expression — see the inline invariant — and truncated to
    build_k per src) — the
    scale path (VERDICT r12 #1): the hash init's early rounds are
    all-churn and their candidate volume is what killed the 2M build
    (>80 GB spill / OOM); an IVF-seeded start
    (:func:`ivf_seeded_knn_graph`) begins at high recall so the
    iterations are REFINEMENT, not discovery. The orphan backfill is
    the seeder's responsibility (every node needs ≥1 src row).

    ``local_join_cap`` (J): bound each pivot's local-join membership
    to its J NEAREST forward and J nearest reverse neighbors
    ((dist, dst) order), capping per-round candidate volume at
    n·(2J)² regardless of build_k — the knob that keeps a refinement
    round's shuffle linear-in-n small at 2M+ (SCALE.md r13). The
    merge still unions the FULL previous graph, so no edge is ever
    dropped from the graph state; only pair GENERATION is trimmed
    (like ``sample_rate``, but deterministic and biased to the
    current-best neighborhood — the right bias when the seed is
    already high-recall; on a cold hash init it slows discovery).

    ``local_join_schedule``: a per-round J list (e.g. ``[8, 12, 16]``)
    replacing the single ``local_join_cap`` — ``iterations`` becomes
    ``len(schedule)``. Rationale (VERDICT r13 #4): early rounds on a
    high-recall seed only need small-J cheap passes to fix easy
    edges; on near-equidistant (clusterless) data the REMAINING
    misses need a wider candidate neighborhood, so spending J where
    the graph has already partially converged buys more recall per
    candidate than a flat J at every round. Total volume is
    n·Σ(2Jᵢ)² — still linear in n. Mutually exclusive with
    ``local_join_cap``.

    Returns ``(src, dst, dist, rank)``, rank 1..k by (dist, dst).
    """
    kb = build_k if build_k is not None else 2 * k
    # validate BEFORE any Spark job (the init checkpoint is the
    # build's most expensive stage — a knob typo must not cost it).
    # `is not None`, not truthiness: a falsy 0 must not silently run
    # the UNCAPPED join (the exact spill/OOM regime the cap prevents)
    jcap = int(local_join_cap) if local_join_cap is not None else None
    if jcap is not None and jcap < 1:
        raise ValueError(f"local_join_cap must be >= 1, got {jcap}")
    if local_join_schedule is not None:
        if local_join_cap is not None:
            raise ValueError(
                "local_join_schedule and local_join_cap are mutually "
                "exclusive — the schedule IS the per-round cap"
            )
        schedule = [int(j) for j in local_join_schedule]
        if not schedule or any(j < 1 for j in schedule):
            raise ValueError(
                f"local_join_schedule needs >=1 rounds of J >= 1, "
                f"got {local_join_schedule!r}"
            )
        iterations = len(schedule)
    else:
        schedule = None
    vt = vectors.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nvec"))
    # n feeds only the hash init's bucket count and the churn stop
    # rule — a seeded build without converge_churn must not pay a
    # full-scan count job (the seeder counted already)
    n = (
        vt.count()
        if init_graph is None or converge_churn is not None
        else 0
    )
    n_buckets = max(1, (n * init_memberships) // max(kb, 1))
    member = vt.select(
        "_nid",
        F.explode(
            F.array(
                *[
                    (
                        F.xxhash64(F.col("_nid"), F.lit(seed), F.lit(j)) % n_buckets
                        + n_buckets
                    )
                    % n_buckets
                    for j in range(init_memberships)
                ]
            )
        ).alias("_bkt"),
    ).distinct()
    init_pairs = (
        member.alias("a")
        .join(member.alias("b"), "_bkt")
        .select(F.col("a._nid").alias("u"), F.col("b._nid").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    # Orphan backfill (ADVICE r6): a node whose init buckets are ALL
    # singletons gets no init pair, and a node absent from the seed
    # graph can never be rediscovered by later iterations — it would be
    # silently missing from the returned graph. Detect orphans from the
    # BUCKET SIZES (a node is orphaned iff its largest bucket has one
    # member — n·m rows aggregated twice, never touching the much
    # larger init_pairs stream) and pair each with the two globally
    # smallest ids (two, so the min node itself can orphan) — a
    # broadcastable 2-row anchor table, exact scoring, and the descent
    # iterations then pull the node toward its true neighborhood.
    # Orphan pairs are disjoint from init_pairs by construction (an
    # orphan appears in NO init pair), so the union needs no distinct.
    # Every node is thereby guaranteed ≥1 src row in the output; an
    # orphan's competitiveness as an INCOMING edge of its anchor
    # remains heuristic, as for every edge in NN-Descent.
    bkt_sizes = member.groupBy("_bkt").agg(F.count("*").alias("_bn"))
    orphans = (
        member.join(bkt_sizes, "_bkt")
        .groupBy("_nid")
        .agg(F.max("_bn").alias("_mx"))
        .filter(F.col("_mx") == 1)
        .select("_nid")
    )
    anchors = vt.select(F.col("_nid").alias("_aid")).orderBy("_aid").limit(2)
    orphan_pairs = (
        orphans.crossJoin(F.broadcast(anchors))
        .filter(F.col("_nid") != F.col("_aid"))
        .select(
            F.least("_nid", "_aid").alias("u"),
            F.greatest("_nid", "_aid").alias("v"),
        )
        .distinct()
    )
    init_pairs = init_pairs.unionByName(orphan_pairs)

    def _score(cand: DataFrame) -> DataFrame:
        s = (
            cand.join(vt.alias("va"), F.col("u") == F.col("va._nid"))
            .join(vt.alias("vb"), F.col("v") == F.col("vb._nid"))
            .select(
                "u", "v", l2_distance("va._nvec", "vb._nvec", dim).alias("dist")
            )
        )
        return s.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "dist"
        ).union(s.select(F.col("v").alias("src"), F.col("u").alias("dst"), "dist"))

    order = [F.col("dist").asc(), F.col("dst").asc()]
    if init_graph is not None:
        # the seed replaces the hash init (which stays lazy above —
        # zero jobs). RE-SCORE the seed pairs with the one l2_distance
        # expression every iteration uses: the merge's dedup invariant
        # is "a duplicate (src,dst) always carries the identical dist",
        # and a seed scored elsewhere (numpy gemm) differs in the last
        # ulp, so the same edge would survive twice and a node's top-k
        # could hold duplicate dsts. Any provided dist is ignored.
        ig = (
            init_graph.select("src", "dst")
            .distinct()
            .join(
                vt.select(
                    F.col("_nid").alias("src"), F.col("_nvec").alias("_sv")
                ),
                "src",
            )
            .join(
                vt.select(
                    F.col("_nid").alias("dst"), F.col("_nvec").alias("_dv")
                ),
                "dst",
            )
            .select("src", "dst", l2_distance("_sv", "_dv", dim).alias("dist"))
        )
        graph = (
            top_k_per_group(ig, ["src"], order, kb)
            .drop("rank")
            .localCheckpoint()
        )
    else:
        graph = (
            top_k_per_group(_score(init_pairs), ["src"], order, kb)
            .drop("rank")
            .localCheckpoint()
        )
    rcap = reverse_cap if reverse_cap is not None else kb
    # new/old flags (Dong et al. §2.2, the paper's actual candidate
    # trim): a co-neighbor pair needs scoring only in a round where at
    # least one endpoint is NEWLY arrived in the shared pivot's
    # adjacency — a both-old pair was generated in the round the later
    # endpoint arrived, and re-scoring it is pure waste (the duplicate
    # collapses in the merge anyway). After round 1 most adjacency is
    # old, so candidate volume per round drops toward the churn rate
    # instead of staying at Σdeg². NOT guaranteed bit-identical to the
    # full local join when reverse_cap truncates: an edge can persist
    # in the graph while bouncing in and out of the capped reverse
    # list, re-surfacing as "old" in a round the full join would have
    # paired it — equality holds on the test fixtures, and recall is
    # pinned either way. flags_new holds last round's graph additions
    # (round 0: everything is new).
    flags_new = None
    if sample_rate < 1.0 and local_join == "new_old":
        # an edge Bernoulli-sampled out of its ONLY "new" round becomes
        # old forever, so its co-neighbor pairs are never generated in
        # any later round — the combination silently loses recall far
        # beyond either knob's documented cost. The knobs also serve
        # opposite regimes (volume-capped early rounds vs converged
        # late rounds), so combining them is rejected, not repaired.
        raise ValueError(
            'sample_rate < 1.0 cannot combine with local_join="new_old"'
        )
    if converge_churn is not None and local_join != "new_old":
        # churn is a by-product of the flags machinery; requiring the
        # flag mode also means a convergence-driven build automatically
        # runs the candidate trim that makes its late rounds ~10% cost
        # (SCALE.md) — the regime the stop rule exists for
        raise ValueError('converge_churn requires local_join="new_old"')
    if local_join == "new_old":
        flags_new = graph.select("src", "dst")
    for it in range(iterations):
        jcap_it = schedule[it] if schedule is not None else jcap
        if local_join == "new_old":
            g_ann = graph.join(
                flags_new.withColumn("_new", F.lit(True)), ["src", "dst"], "left"
            ).withColumn("_new", F.coalesce("_new", F.lit(False)))
        else:
            g_ann = graph.withColumn("_new", F.lit(True))
        # local_join_cap: only a pivot's J nearest forward neighbors
        # enter its self-join (the reverse side is capped to J below
        # too) — per-round candidate volume ≤ n·(2J)² whatever kb is.
        # Pair generation only; the merge still unions the full graph.
        g_join = (
            top_k_per_group(g_ann, ["src"], order, jcap_it).drop("rank")
            if jcap_it is not None and jcap_it < kb
            else g_ann
        )
        rev = g_ann.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "dist", "_new"
        )
        rev = top_k_per_group(
            rev, ["src"], order, rcap if jcap_it is None else min(rcap, jcap_it)
        ).drop("rank")
        both = (
            g_join.select("src", "dst", "_new")
            .union(rev.select("src", "dst", "_new"))
            .groupBy("src", "dst")
            .agg(F.max("_new").alias("_new"))
        )
        if jcap_it is not None and jcap_it < kb:
            # materialize the trimmed adjacency (n·2J id rows, tiny):
            # the two window lineages otherwise reach the self-join as
            # a PartitioningCollection whose members AQE coalesced to
            # different partition counts — the planner rejects that
            # ("requirement failed") — and the checkpoint also stops
            # the double recompute through the a/b aliases below
            both = both.localCheckpoint()
        if sample_rate < 1.0:
            # the paper's ρ-sampling (Dong et al. §2.3), coarse form:
            # thin each adjacency list to an expected ρ fraction
            # BEFORE the pivot self-join, cutting candidate volume by
            # ρ² per iteration. Deterministic Bernoulli via an edge
            # hash keyed on the iteration index (different edges each
            # round, reproducible across runs) — a pure filter, no
            # extra shuffle, unlike exact per-list ρ·K sampling which
            # would cost another per-src window. The merge below still
            # unions the FULL previous graph, so sampling only skips
            # pivots this round — no edge is ever dropped from the
            # graph state, matching the paper (sampling affects
            # candidate generation only). Measured honestly in
            # SCALE.md: on a single node this coarse row-level variant
            # slows convergence faster than it cuts cost (a pair needs
            # both endpoints to survive on a shared pivot, ρ²/round);
            # the new/old-flag refinement (local_join="new_old") is the
            # principled alternative — mutually exclusive with this
            # knob, see the guard above.
            both = both.filter(
                F.pmod(
                    F.xxhash64("src", "dst", F.lit(seed), F.lit(1000 + it)),
                    F.lit(1_000_000),
                )
                < int(sample_rate * 1_000_000)
            )
        # carry each neighbor's VECTOR through one self-join on the
        # pivot: the candidate pairs (the biggest stream by far,
        # n·deg² rows) materialize with both vectors already in-task,
        # so they are scored and projected down to (src, dst, dist)
        # inside the join stage — never shuffled, never re-joined to
        # the vector table (the previous form shuffled the candidate
        # id-pair stream three more times: distinct + two vector
        # joins). Duplicate pairs from shared pivots are rescored
        # (cheap codegen) and collapse in the dropDuplicates below.
        both_v = both.join(vt, both["dst"] == vt["_nid"]).select(
            "src", "dst", "_new", F.col("_nvec").alias("_dv")
        )
        pair_pred = F.col("a.dst") < F.col("b.dst")
        if local_join == "new_old":
            pair_pred = pair_pred & (F.col("a._new") | F.col("b._new"))
        pairs = (
            both_v.alias("a")
            .join(both_v.alias("b"), "src")
            .filter(pair_pred)
            .select(
                F.col("a.dst").alias("u"),
                F.col("b.dst").alias("v"),
                l2_distance("a._dv", "b._dv", dim).alias("dist"),
            )
        )
        edges = pairs.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "dist"
        ).union(pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"), "dist"))
        merged = graph.union(edges)
        if merge_strategy == "agg":
            # ONE exchange per round: groupBy(src) collecting each
            # node's (dist, dst) structs, sort + adjacent-dup removal +
            # slice(kb) inside the aggregate. The window form below
            # shuffles the edge stream twice (dropDuplicates clusters
            # on (src,dst), the top-k window re-clusters on src);
            # identical output because a duplicate (src,dst) always
            # carries the identical dist (deterministic expression), so
            # struct-identity dedup == pair dedup, and (dist, dst)
            # struct order == the window's order. Per-group state is
            # bounded by the node's per-round candidate degree (~deg²),
            # not by n. A/B-measured in SCALE.md.
            agg = merged.groupBy("src").agg(
                F.slice(
                    F.array_distinct(
                        F.array_sort(F.collect_list(F.struct("dist", "dst")))
                    ),
                    1,
                    kb,
                ).alias("_nn")
            )
            graph_next = (
                agg.select("src", F.explode("_nn").alias("_e"))
                .select("src", F.col("_e.dst").alias("dst"), F.col("_e.dist").alias("dist"))
                .localCheckpoint()
            )
        else:
            merged = merged.dropDuplicates(["src", "dst"])
            graph_next = (
                top_k_per_group(merged, ["src"], order, kb)
                .drop("rank")
                .localCheckpoint()
            )
        last_round = it == iterations - 1
        if local_join == "new_old" and (converge_churn is not None or not last_round):
            # next round's "new" set = edges the merge just added (on
            # the final round the flags are only read by the churn
            # stopping rule — skip the job entirely otherwise)
            flags_new = (
                graph_next.select("src", "dst")
                .join(graph.select("src", "dst"), ["src", "dst"], "left_anti")
                .localCheckpoint()
            )
        graph = graph_next
        if converge_churn is not None:
            # stop when the merge changed ≤ converge_churn of the n·kb
            # graph edges — run-to-convergence is NN-Descent's natural
            # stopping rule (the paper's delta parameter), and
            # `iterations` becomes the safety CAP, not the schedule.
            # The count is on the already-checkpointed flags (no extra
            # lineage), one tiny job per round.
            if flags_new.count() <= converge_churn * n * kb:
                break
    return top_k_per_group(graph, ["src"], order, k)


def _assign_top_probes(
    points: DataFrame,
    centroids: list[tuple[int, list[float]]],
    probes: int,
    *,
    id_col: str,
    vec_col: str,
    row_block: int = 1024,
) -> DataFrame:
    """Each point duplicated onto its ``probes`` nearest centroids —
    ``(id, vec, _sid)``, one mapInArrow pass over a broadcast centroid
    matrix (the ``sharding._assign_arrow`` shape, specialized to
    top-p). Exact f64 distances; WHICH p at an equal-distance boundary
    is argpartition-arbitrary but deterministic for identical input
    (all p assignments are emitted, so intra-p order is moot)."""
    import numpy as np

    sids = np.array([c[0] for c in centroids], dtype=np.int64)
    C = np.array([c[1] for c in centroids], dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    p = max(1, min(int(probes), len(sids)))
    idt = points.schema[id_col].dataType.simpleString()
    vct = points.schema[vec_col].dataType.simpleString()
    out_schema = f"{id_col} {idt}, {vec_col} {vct}, _sid int"

    def run(batches):
        # self-contained closure: no repo imports — the worker process
        # need not have the package importable (driver-contract runs
        # launch from an arbitrary cwd); this is arrowio's
        # list_col_matrix inlined (flatten honors offsets/slices)
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            arr = rb.column(vec_col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if arr.null_count:
                raise ValueError(f"{vec_col}: null vectors are not supported")
            V = np.asarray(arr.flatten()).reshape(n, -1).astype(np.float64)
            tops = np.empty((n, p), dtype=np.int32)
            for lo in range(0, n, row_block):
                hi = min(lo + row_block, n)
                blk = V[lo:hi]
                d2 = (
                    (blk * blk).sum(axis=1)[:, None]
                    - 2.0 * (blk @ C.T)
                    + c_sq[None, :]
                )
                m = d2.shape[1]
                if p < m:
                    part = np.argpartition(d2, p - 1, axis=1)[:, :p]
                else:
                    part = np.tile(np.arange(m), (hi - lo, 1))
                tops[lo:hi] = sids[part].astype(np.int32)
            idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), p))
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(id_col).take(idx),
                    rb.column(vec_col).take(idx),
                    pa.array(tops.ravel(), type=pa.int32()),
                ],
                names=[id_col, vec_col, "_sid"],
            )

    return points.select(id_col, vec_col).mapInArrow(run, schema=out_schema)


# ``seeding="auto"`` switches the cell fit to the two-level path above
# this many cells: flat MLlib Lloyd cost is sample·k·d per iteration,
# and the 2M-validated build (977 cells) is the last decade where one
# flat fit is clearly fine — at 20M the build needs ~9.8k cells and at
# 200M ~98k (n_shards grows linearly with n; VERDICT r13 #1).
TWO_LEVEL_SEEDING_ABOVE = 4096


def _seed_cell_centroids(
    samp: DataFrame,
    n_cells: int,
    *,
    seed: int,
    max_iter: int,
    mode: str = "auto",
) -> list[tuple[int, list[float]]]:
    """The cell-centroid fit behind :func:`ivf_seeded_knn_graph`'s
    seeding pass — ``[(cell_id, centroid)]`` over the (already
    sample-capped) vector table ``samp`` with columns
    ``(_nid, _nvec)``.

    ``mode="flat"``: one MLlib KMeans with k = ``n_cells`` — exact
    r13 behavior, fine through ~4k cells.

    ``mode="two_level"``: hierarchical seeding that removes the flat
    fit's k-scaling ceiling (VERDICT r13 #1 — cells grow LINEARLY
    with n at fixed ``target_shard_rows``, so one flat Lloyd is
    sample·n_cells·d per iteration and its k×d centroid broadcast
    grows with n): first a SMALL MLlib fit to ``ceil(sqrt(n_cells))``
    super-cells, then ONE ``applyInPandas`` pass sub-clustering each
    super-cell's sample rows with a local numpy Lloyd into its
    apportioned share of the cells (largest-remainder split of
    ``n_cells`` by super-cell sample mass, each share capped by the
    super-cell's row count). Total Lloyd work drops from
    sample·n_cells·d to sample·(sqrt + n_cells/sqrt)·d per iteration,
    the driver never broadcasts more than the super-cell table, and
    the sub-fits parallelize across the cluster. Cells out =
    ``n_cells`` up to apportionment caps (a super-cell cannot host
    more centers than sample rows — the deficit is documented, not
    silently re-spread, so cell counts stay reproducible).

    ``mode="auto"``: flat at or under ``TWO_LEVEL_SEEDING_ABOVE``
    cells (bit-identical to r13 builds), two-level above.

    The downstream contract is unchanged either way: the centroids
    seed a multi-probe assignment, so seeding quality shifts WHERE
    the within-cell kNN work lands, never correctness — the
    NN-Descent refinement closes seams regardless."""
    import numpy as np
    import pandas as pd

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if mode not in ("auto", "flat", "two_level"):
        raise ValueError(
            f"seeding={mode!r}: expected auto | flat | two_level"
        )
    n_cells = int(n_cells)

    def _mllib_fit(df: DataFrame, k: int) -> list[list[float]]:
        feat = df.select(
            array_to_vector(F.col("_nvec").cast("array<double>")).alias(
                "features"
            )
        )
        model = KMeans(k=k, seed=seed, maxIter=int(max_iter)).fit(feat)
        return [[float(x) for x in c] for c in model.clusterCenters()]

    if mode == "flat" or (
        mode == "auto" and n_cells <= TWO_LEVEL_SEEDING_ABOVE
    ):
        return list(enumerate(_mllib_fit(samp, n_cells)))

    # ---- two-level path ----
    # materialize the sample once: it feeds the super fit, the
    # assignment AND the sub-fits (re-evaluating a Bernoulli sample
    # lineage three times is wasted scans, not a correctness risk)
    samp = samp.localCheckpoint()
    n_super = max(2, int(np.ceil(np.sqrt(n_cells))))
    super_cents = list(enumerate(_mllib_fit(samp, n_super)))
    sa = _assign_top_probes(
        samp, super_cents, 1, id_col="_nid", vec_col="_nvec"
    ).localCheckpoint()  # consumed twice: counts + sub-fits
    counts = {
        int(r["_sid"]): int(r["cnt"])
        for r in sa.groupBy("_sid").agg(F.count("*").alias("cnt")).collect()
    }
    n_samp = sum(counts.values())
    # largest-remainder apportionment of n_cells by sample mass;
    # every non-empty super-cell holds >= 1 center, none more centers
    # than rows
    quotas = {s: n_cells * c / n_samp for s, c in counts.items()}
    k_map = {
        s: max(1, min(counts[s], int(quotas[s]))) for s in counts
    }
    deficit = n_cells - sum(k_map.values())
    if deficit > 0:
        by_frac = sorted(
            counts,
            key=lambda s: (quotas[s] - int(quotas[s]), s),
            reverse=True,
        )
        for s in by_frac:
            if deficit <= 0:
                break
            if k_map[s] < counts[s]:
                k_map[s] += 1
                deficit -= 1
    iters = int(max_iter)

    def sub_fit(key, pdf):
        import numpy as np

        k_i = min(int(k_map.get(int(key[0]), 1)), len(pdf))
        ids = pdf["_nid"].to_numpy(dtype=np.int64)
        V = np.asarray(np.stack(pdf["_nvec"].to_numpy()), dtype=np.float64)
        # deterministic hash-spread init (id order carries no geometry;
        # the golden-ratio hash spreads picks across the cell)
        h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        C = V[np.sort(np.argsort(h, kind="stable")[:k_i])].copy()
        for _ in range(iters):
            d2 = (
                (V * V).sum(axis=1)[:, None]
                - 2.0 * (V @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            a = d2.argmin(axis=1)
            S = np.zeros_like(C)
            np.add.at(S, a, V)
            cnt = np.bincount(a, minlength=k_i).astype(np.float64)
            nz = cnt > 0
            C[nz] = S[nz] / cnt[nz, None]  # empty centers keep position
        return pd.DataFrame(
            {
                "_ssid": np.full(k_i, int(key[0]), dtype=np.int64),
                "_idx": np.arange(k_i, dtype=np.int64),
                "centroid": [c.tolist() for c in C],
            }
        )

    rows = (
        sa.groupBy("_sid")
        .applyInPandas(
            sub_fit, schema="_ssid long, _idx long, centroid array<double>"
        )
        .collect()
    )
    # stable global ids: collect order is partition-arbitrary, so sort
    # by (super-cell, local index) before numbering
    rows.sort(key=lambda r: (r["_ssid"], r["_idx"]))
    return [(i, list(r["centroid"])) for i, r in enumerate(rows)]


def ivf_seeded_knn_graph(
    vectors: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    build_k: int | None = None,
    probes: int = 2,
    target_shard_rows: int = 4096,
    max_shard_rows: int = 65536,
    refine_iterations: int = 1,
    local_join_cap: int | None = 8,
    refine_schedule: list[int] | None = None,
    seed: int = 1,
    kmeans_sample_cap: int = 200_000,
    kmeans_max_iter: int = 10,
    merge_strategy: str = "agg",
    seeding: str = "auto",
) -> DataFrame:
    """kNN-graph build that SURVIVES a scale-up (VERDICT r12 #1) —
    IVF-seeded init + capped NN-Descent refinement, replacing the
    hash-bucket init whose all-churn early rounds killed the 2M build
    (>80 GB shuffle spill, then OOM; ROUND_NOTES r12):

    1. **Partition**: a cell-centroid fit on a seeded Bernoulli
       sample (cap ``kmeans_sample_cap`` — spread across partitions,
       never a ``limit`` slice: the r12 codebook lesson) into
       ``ceil(n·probes / target_shard_rows)`` cells. ``seeding=``
       picks the fit: one flat MLlib KMeans, or the two-level
       hierarchical fit past ``TWO_LEVEL_SEEDING_ABOVE`` cells
       (``"auto"``, the default — see
       :func:`_seed_cell_centroids`; cells grow linearly with n, so
       the flat fit's sample·k·d Lloyd cost is the build's only
       super-linear-in-n term, VERDICT r13 #1).
    2. **Multi-assign**: every vector rides to its ``probes`` nearest
       cells (one broadcast-matrix Arrow pass) — the 2nd+ probe is
       what covers Voronoi-boundary neighbors, the recall hole of
       single-cell seeding.
    3. **Within-cell exact kNN**: one ``applyInPandas`` per cell —
       blocked f64 BLAS, candidates hash-subsampled past
       ``max_shard_rows`` (skew guard: all rows stay sources; the
       QUADRATIC distance work and the candidate matrix are bounded,
       so a runaway cell degrades recall rather than exploding
       compute — note ``applyInPandas`` still materializes the whole
       group's rows once, an O(n_cell·d) linear term the cap cannot
       remove; a cell would need ~10⁸ rows before THAT is the task
       killer). Per-cell cost is n_cell², bounded by the shard
       target — TOTAL work ~n·target_shard_rows·probes², linear in n.
    4. **Merge + refine**: per-src union across probes (min-dist dedup
       — the same pair scored in two cells can differ in the last ulp
       across gemm shapes), then ``refine_iterations`` NN-Descent
       rounds with ``init_graph=`` the seed and ``local_join_cap=`` J
       (candidate volume n·(2J)² per round) to close the remaining
       cross-cell edges. ``refine_schedule=[J₁, J₂, …]`` replaces
       that flat pair with per-round growing caps (VERDICT r13 #4 —
       spend J where the graph has already partially converged; see
       :func:`nn_descent_knn_graph`'s ``local_join_schedule``).

    The reference's analog is its per-shard hnswlib build
    (``src/util/utils.py:286-296``) — shard-local index construction;
    this distributes the sharding AND the within-shard build, with the
    descent rounds recovering the cross-shard edges the reference
    simply forgoes. Scale shape at 100 TB: every stage is a bounded
    shuffle linear in n (n·probes assignment rows, n·probes·build_k
    seed edges, n·(2J)² refinement candidates); nothing is quadratic
    in n and no stage collects to the driver beyond the centroid
    table. Returns ``(src, dst, dist, rank)`` like
    :func:`nn_descent_knn_graph`."""
    import pandas as pd

    kb = build_k if build_k is not None else 2 * k
    order = [F.col("dist").asc(), F.col("dst").asc()]
    vt = vectors.select(
        F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nvec")
    )
    n = vt.count()
    if n == 0:
        raise ValueError("ivf_seeded_knn_graph: empty vector table")
    p = max(1, int(probes))
    n_shards = int(max(p, min(n, -(-(n * p) // int(target_shard_rows)))))

    frac = min(1.0, kmeans_sample_cap / n)
    samp = vt.sample(fraction=frac, seed=seed) if frac < 1.0 else vt
    cents = _seed_cell_centroids(
        samp,
        n_shards,
        seed=seed,
        max_iter=int(kmeans_max_iter),
        mode=seeding,
    )

    assigned = _assign_top_probes(
        vt, cents, p, id_col="_nid", vec_col="_nvec"
    )

    kb_ = int(kb)
    cap_ = int(max_shard_rows)

    def shard_knn(pdf):
        import numpy as np

        n_s = len(pdf)
        if n_s < 2:
            return pd.DataFrame(
                {
                    "src": pd.array([], dtype="int64"),
                    "dst": pd.array([], dtype="int64"),
                    "dist": pd.array([], dtype="float64"),
                }
            )
        ids = pdf["_nid"].to_numpy(dtype=np.int64)
        V = np.asarray(np.stack(pdf["_nvec"].to_numpy()), dtype=np.float64)
        if n_s > cap_:
            # skew guard: hash-spread candidate subset, all rows stay
            # sources — bounds the quadratic work and the candidate
            # matrix (the group's own rows are already materialized by
            # applyInPandas; see the operator docstring)
            h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            keep = np.sort(np.argsort(h, kind="stable")[:cap_])
            Cm, cids = V[keep], ids[keep]
        else:
            Cm, cids = V, ids
        c_sq = (Cm * Cm).sum(axis=1)
        srcs, dsts, dists = [], [], []
        for lo in range(0, n_s, 512):
            hi = min(lo + 512, n_s)
            blk = V[lo:hi]
            d2 = (
                (blk * blk).sum(axis=1)[:, None]
                - 2.0 * (blk @ Cm.T)
                + c_sq[None, :]
            )
            np.maximum(d2, 0.0, out=d2)
            d2[cids[None, :] == ids[lo:hi, None]] = np.inf  # no self edge
            m = d2.shape[1]
            kk = min(kb_, m)
            if kk < m:
                part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            else:
                part = np.tile(np.arange(m), (hi - lo, 1))
            rows = np.repeat(np.arange(hi - lo), part.shape[1])
            dd = d2[rows, part.ravel()]
            fin = np.isfinite(dd)
            srcs.append(np.repeat(ids[lo:hi], part.shape[1])[fin])
            dsts.append(cids[part.ravel()][fin])
            dists.append(np.sqrt(dd[fin]))
        return pd.DataFrame(
            {
                "src": np.concatenate(srcs),
                "dst": np.concatenate(dsts),
                "dist": np.concatenate(dists),
            }
        )

    seed_edges = assigned.groupBy("_sid").applyInPandas(
        shard_knn, schema="src long, dst long, dist double"
    )
    # cross-probe dedup by MIN dist (ulp-level gemm drift across cell
    # shapes means the same pair's two scores need not be bit-equal),
    # then the per-src truncation to the internal degree
    seed_pairs = seed_edges.groupBy("src", "dst").agg(F.min("dist").alias("dist"))
    # materialize: consumed twice below (output + the orphan anti-join)
    # — never recompute the per-cell kNN pass
    seed_graph = (
        top_k_per_group(seed_pairs, ["src"], order, kb_)
        .drop("rank")
        .localCheckpoint()
    )

    # orphan backfill (every node needs ≥1 src row — the init contract
    # nn_descent's hash path guarantees and init_graph delegates): a
    # node whose every probe cell is a singleton emits no edges; pair
    # it with the two smallest ids, both directions, exactly scored
    anchors = vt.orderBy("_nid").limit(2).select(
        F.col("_nid").alias("_aid"), F.col("_nvec").alias("_avec")
    )
    orphans = vt.join(
        seed_graph.select(F.col("src").alias("_nid")).distinct(),
        "_nid",
        "left_anti",
    )
    opairs = (
        orphans.crossJoin(F.broadcast(anchors))
        .filter(F.col("_nid") != F.col("_aid"))
        .select(
            F.col("_nid").alias("src"),
            F.col("_aid").alias("dst"),
            l2_distance("_nvec", "_avec", dim).alias("dist"),
        )
    )
    # checkpoint the union: a lazy union of an RDD-backed side with a
    # join lineage reports a PartitioningCollection whose members
    # disagree on numPartitions, and the refinement round's planner
    # rejects it (Spark EnsureRequirements `requirement failed`) —
    # materializing flattens it to one scan (and the orphan anti-join
    # is one tiny job)
    seed_graph = seed_graph.unionByName(
        opairs.unionByName(
            opairs.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "dist"
            )
        )
    ).localCheckpoint()

    if refine_schedule is not None or refine_iterations > 0:
        # refine_schedule (growing-J rounds, VERDICT r13 #4) replaces
        # the flat (refine_iterations × local_join_cap) pair when given
        return nn_descent_knn_graph(
            vectors,
            k,
            id_col=id_col,
            vec_col=vec_col,
            iterations=int(refine_iterations),
            dim=dim,
            build_k=kb_,
            seed=seed,
            merge_strategy=merge_strategy,
            init_graph=seed_graph,
            local_join_cap=None if refine_schedule is not None else local_join_cap,
            local_join_schedule=refine_schedule,
        )
    return top_k_per_group(
        seed_graph.dropDuplicates(["src", "dst"]), ["src"], order, k
    )


def knn_graph_search(
    queries: DataFrame,
    graph: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    *,
    beam: int = 24,
    hops: int = 6,
    n_entry: int = 64,
    query_id: str = "qid",
    query_vec: str = "qvec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Batch beam search over a kNN graph (the search half of the
    graph-ANN pair whose build half is ``nn_descent_knn_graph``) —
    HNSW/NSG-style greedy navigation re-expressed as per-hop joins:

    1. every query scores ``n_entry`` fixed entry nodes (min-id — the
       same deterministic entries for all queries, like an HNSW entry
       point);
    2. per hop, BEST-FIRST: the ``beam`` best scored-but-unexpanded
       nodes per query join the graph's UNDIRECTED edge closure on
       node id (hash join) and freshly discovered nodes are scored —
       expanding only newly-found nodes instead stalls in dead ends,
       and directed kNN edges alone are near-untraversable backwards;
    3. after ``hops`` rounds, top-k per query over everything scored.

    Tuning (measured on 64-d gaussians): ENTRY COUNT is the lever that
    scales with n, not hop depth — a flat kNN graph has no long-range
    edges (the thing HNSW's hierarchy adds), so from 4 entries a 20k-
    node graph needs 10+ hops for recall 0.8, while 64 entries reach
    recall 1.0 in 6 hops at both 2k and 20k. Scoring entries is one
    tiny broadcast join, so err high.

    Scale shape: per hop the frontier is Q·beam rows and the expansion
    Q·beam·degree — independent of n; the vector table is touched only
    through equi-joins on candidate node ids (at a partitioned layout:
    shard-pruned point lookups), and the accumulated state is bounded
    by Q·(n_entry + hops·beam·degree). Queries ride along the frontier
    rows; nothing is O(n) per query, which is what makes graph search
    the lowest-IO ANN tier. Wholly deterministic ((dist, id)
    tie-breaks), so recall is a stable, testable number.

    Returns (qid, neighbor_id, dist, rank), rank 1..k by (dist, id).
    """
    vt = vectors.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nvec"))
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("_qv"))
    # navigate the UNDIRECTED closure: a directed kNN graph is hard to
    # traverse backwards (b in kNN(a) rarely implies a in kNN(b) in
    # high dim); the reverse edges double the usable degree for free
    edges = (
        graph.select("src", "dst")
        .union(graph.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    entries = vt.orderBy("_nid").limit(n_entry).select("_nid")

    def _score(cand: DataFrame) -> DataFrame:
        # (qid, node) -> (qid, node, dist)
        return (
            cand.join(vt, cand["node"] == vt["_nid"])
            .join(q, "qid")
            .select("qid", "node", l2_distance("_qv", "_nvec", dim).alias("dist"))
        )

    order = [F.col("dist").asc(), F.col("node").asc()]
    scored = _score(
        q.select("qid").crossJoin(
            F.broadcast(entries).select(F.col("_nid").alias("node"))
        )
    ).localCheckpoint()
    expanded = scored.select("qid", "node").filter(F.lit(False)).localCheckpoint()
    for _ in range(hops):
        # BEST-FIRST: expand the beam best scored-but-unexpanded nodes
        # (not merely the newest) — a frontier of fresh-only nodes
        # cannot back up out of a dead end and stalls on larger graphs
        frontier = top_k_per_group(
            scored.join(expanded, ["qid", "node"], "left_anti"),
            ["qid"], order, beam,
        ).drop("rank")
        expanded = expanded.union(frontier.select("qid", "node")).localCheckpoint()
        nbrs = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("qid", F.col("dst").alias("node"))
            .distinct()
        )
        fresh = nbrs.join(scored.select("qid", "node"), ["qid", "node"], "left_anti")
        scored = scored.union(_score(fresh)).localCheckpoint()
    return top_k_per_group(
        scored.withColumnRenamed("node", "neighbor_id"),
        ["qid"],
        [F.col("dist").asc(), F.col("neighbor_id").asc()],
        k,
    )


GRAPH_MAX_ENTRIES = 256


def write_knn_graph_layout(
    graph: DataFrame,
    vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_graph_buckets: int = 64,
    n_entries: int = GRAPH_MAX_ENTRIES,
    discard_ops: bool = False,
) -> None:
    """Persist a kNN graph (``nn_descent_knn_graph`` edges) as the
    GRAPH SERVING TIER — the Spark analog of the reference's one
    serving artifact, an on-disk HNSW per shard
    (``src/util/utils.py:286-296``: hnswlib save/load,
    ef_construction=200, M=16). Three artifacts under ``path``:

    - ``graph.parquet`` — ONE ROW PER NODE: ``(node, _nvec,
      neighbors array<long>)`` over the UNDIRECTED edge closure
      (reverse edges folded in at build so the search never recomputes
      them), partitioned by ``_gb = pmod(xxhash64(node),
      n_graph_buckets)`` and id-sorted within each bucket — a hop's
      record fetch prunes to its node ids' buckets and row-group-skips
      inside them. The node's vector rides ON the adjacency row
      (DiskANN's record layout): one fetch serves both expansion and
      scoring, so per-hop IO is O(frontier · degree) records, corpus-
      independent.
    - ``graph_entries.parquet`` — the ``n_entries`` min-id nodes WITH
      vectors (entry scoring is one tiny broadcast, no graph scan;
      default ``GRAPH_MAX_ENTRIES``, a build knob since VERDICT r12
      #6 — size it to the largest ``n_entry`` searches will ask for).
    - ``graph_meta.parquet`` — the bucket count and the stored entry
      count (layout constants the query side must respect; readers of
      pre-knob layouts fall back to ``GRAPH_MAX_ENTRIES``).

    The TRAVERSAL structure is rebuild-only, like the reference's HNSW
    artifacts — but the tier takes exactly-once mutations through the
    op ledger (``operators/graph_ops``): ops land beside the layout,
    searches serve the live view (contested suppression + brute-force
    side), and compaction rebuilds. The graph tier is the low-IO
    read-optimized serving shape."""
    spark = graph.sparkSession
    # a fresh layout must be PRISTINE: writing into a dir that carried
    # an op ledger (a compaction target reused across generations, or
    # a rebuild over a mutated layout) would otherwise leave the stale
    # ops visible and silently applied to the NEW base at search time.
    # The purge+write runs UNDER the layout's writer lock (ADVICE r13):
    # COMMITTED ops are refused unless the caller says discard_ops
    # (a direct rebuild over a live mutated layout would silently drop
    # committed mutations — fold them with graph_ops.compact_graph_
    # layout / compact_graph_in_place, which pass the flag after
    # resolving the live view), and a mutator racing this write can no
    # longer land an op between the purge and the new base (both sides
    # contend on the same lock; the lock's compact-marker check also
    # refuses a dst that is mid-swap). Purge-FIRST by design: a crash
    # mid-write then leaves a dst that is OBVIOUSLY inconsistent
    # (ledger gone, base partial) rather than a readable layout
    # silently serving new-base+old-ops. A reused LIVE dst is not
    # crash-atomic either way (the overwrite itself is not) — compact
    # to a fresh dir, or use the swap-guarded
    # graph_ops.compact_graph_in_place for same-path folds.
    from big_ann_spark.operators import oplayout as _ol

    with _ol.writer_lock(spark, path, owner="write_knn_graph_layout"):
        committed = _ol.committed_ops(spark, path)
        if committed and not discard_ops:
            raise ValueError(
                f"write_knn_graph_layout: {path} carries {len(committed)} "
                "committed op(s) — overwriting would silently discard "
                "them. Fold them with graph_ops.compact_graph_layout / "
                "compact_graph_in_place, or pass discard_ops=True to "
                "drop them deliberately."
            )
        _purge_graph_ledger(spark, path)
        _write_graph_artifacts(
            graph, vectors, path,
            id_col=id_col, vec_col=vec_col,
            n_graph_buckets=n_graph_buckets, n_entries=n_entries,
        )


def _purge_graph_ledger(spark, path: str) -> None:
    """Delete the op ledger under ``path`` — ``ops/`` wholesale, and
    ``_ops/`` CONTENTS except the held writer lock (the caller holds
    it; deleting the dir out from under the lock would re-open the
    purge/land race the lock exists to close)."""
    from big_ann_spark.operators import oplayout as _ol

    fs, jp = _ol.fs_path(spark, f"{path}/ops")
    if fs.exists(jp):
        fs.delete(jp, True)
    fs, jp = _ol.fs_path(spark, f"{path}/_ops")
    if fs.exists(jp):
        for st in fs.listStatus(jp):
            if st.getPath().getName() != _ol.WRITER_LOCK:
                fs.delete(st.getPath(), True)
    _ol.invalidate_contested_memo(path)


def _write_graph_artifacts(
    graph: DataFrame,
    vectors: DataFrame,
    path: str,
    *,
    id_col: str,
    vec_col: str,
    n_graph_buckets: int,
    n_entries: int,
) -> None:
    spark = graph.sparkSession
    vt = vectors.select(
        F.col(id_col).alias("node"), F.col(vec_col).alias("_nvec")
    )
    edges = graph.select("src", "dst").union(
        graph.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    adj = edges.groupBy(F.col("src").alias("node")).agg(
        F.sort_array(F.collect_list("dst")).alias("neighbors")
    )
    records = (
        # LEFT join from the vector table: an edgeless node (possible
        # only on degenerate graphs) still gets a scorable record
        vt.join(adj, "node", "left")
        .withColumn(
            "neighbors",
            F.coalesce("neighbors", F.array().cast("array<long>")),
        )
        .withColumn(
            "_gb", F.pmod(F.xxhash64("node"), F.lit(int(n_graph_buckets)))
        )
    )
    (
        records.repartition(int(n_graph_buckets), "_gb")
        .sortWithinPartitions("node")
        .write.partitionBy("_gb")
        .mode("overwrite")
        .parquet(f"{path}/graph.parquet")
    )
    (
        vt.orderBy("node")
        .limit(int(n_entries))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/graph_entries.parquet")
    )
    (
        spark.createDataFrame(
            [(int(n_graph_buckets), int(n_entries))],
            "n_graph_buckets int, n_entries int",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/graph_meta.parquet")
    )


def _collect_ids_and_buckets(
    ids_df: DataFrame, n_buckets: int, cap: int
) -> tuple[list[int] | None, list[int] | None]:
    """Count-gate a point-fetch id set (SCALE.md isin rule) in ONE
    job: collect at most ``cap``+1 rows (``limit`` bounds the driver
    payload — no unbounded collect even before the gate decides) WITH
    their ``_gb`` buckets (computed by the same Spark xxhash64 the
    layout hashed with — no driver-side hash mirror to drift). More
    than ``cap`` distinct ids → (None, None), the caller joins
    distributively."""
    rows = (
        ids_df.select(
            "node", F.pmod(F.xxhash64("node"), F.lit(int(n_buckets))).alias("_gb")
        )
        .limit(int(cap) + 1)
        .collect()
    )
    if len(rows) > cap:
        return None, None
    return [r["node"] for r in rows], sorted({r["_gb"] for r in rows})


def _fetch_graph_records(
    spark,
    path: str,
    ids: list[int] | None,
    tbs: list[int] | None,
    cols: list[str],
) -> DataFrame:
    """Point-fetch node records. Bounded ids (the point-lookup
    regime): static ``_gb`` partition filter + literal id ``In`` —
    reads only the ids' buckets, row-group-skips on the sorted node
    column. ``ids=None`` (the big-batch regime, where the bucket set
    saturates at the layout constant anyway): one column-pruned scan
    the caller joins against — amortized over the whole query batch."""
    scan = spark.read.parquet(f"{path}/graph.parquet")
    if ids is not None:
        scan = scan.filter(F.col("_gb").isin([int(b) for b in tbs])).filter(
            F.col("node").isin([int(i) for i in ids])
        )
    return scan.select(*cols)


def knn_graph_search_from_disk(
    queries: DataFrame,
    path: str,
    k: int = 10,
    *,
    beam: int = 24,
    hops: int = 6,
    n_entry: int = 64,
    query_id: str = "qid",
    query_vec: str = "qvec",
    dim: int | None = None,
    max_id_pushdown: int = 1024,
    as_of: int | None = None,
) -> DataFrame:
    """``knn_graph_search`` served off a :func:`write_knn_graph_layout`
    — identical hop algebra, identical results (equality-tested), but
    every adjacency AND vector access is a pruned point-fetch of the
    node-record table instead of an in-memory join: per hop the
    frontier's records (vector + neighbor list in one row) are read
    with ``_gb`` partition pruning and id row-group skipping, so a hop
    costs O(frontier·degree) record reads no matter the corpus size —
    the cold-start story the in-memory operator lacked (its adjacency
    had to be rebuilt per session).

    The frontier id set is COUNT-GATED like every point-fetch in the
    repo (SCALE.md isin rule): ≤ ``max_id_pushdown`` ids push literal
    filters; a wider frontier (large query batches — the bucket set
    saturates at the layout constant anyway) switches to one
    column-pruned scan per hop joined distributively, amortized over
    the batch.

    MUTATIONS (``graph_ops``, VERDICT r12 #2): a layout carrying
    committed ops serves the LIVE view — the beam walks the base graph
    unchanged (tombstoned records still route, the FreshDiskANN rule),
    then contested node ids are suppressed from the surfaced results
    and the latest-op live vectors are scored exactly as an op-sized
    brute-force side beside the beam, so a fresh upsert that belongs
    in the top-k always surfaces. ``as_of`` snapshots the ledger
    (``None`` = head; same contract as the IVF tiers)."""
    spark = queries.sparkSession
    meta = spark.read.parquet(f"{path}/graph_meta.parquet").collect()[0]
    n_buckets = int(meta["n_graph_buckets"])
    # pre-knob layouts stored only the bucket count; they were all
    # written with the then-constant entry table size
    stored_entries = int(
        meta["n_entries"]
        if "n_entries" in meta.__fields__
        else GRAPH_MAX_ENTRIES
    )
    if n_entry > stored_entries:
        raise ValueError(
            f"n_entry={n_entry} exceeds the layout's stored entry table "
            f"({stored_entries}) — rebuild with write_knn_graph_layout("
            "n_entries=...) sized to it, or lower n_entry"
        )
    q = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("_qv")
    ).localCheckpoint()
    entries = (
        spark.read.parquet(f"{path}/graph_entries.parquet")
        .orderBy("node")
        .limit(n_entry)
    )
    order = [F.col("dist").asc(), F.col("node").asc()]

    def _score_against(cand_with_vec: DataFrame) -> DataFrame:
        return cand_with_vec.join(F.broadcast(q), "qid").select(
            "qid", "node", l2_distance("_qv", "_nvec", dim).alias("dist")
        )

    scored = _score_against(
        q.select("qid").crossJoin(F.broadcast(entries.select("node", "_nvec")))
    ).localCheckpoint()
    expanded = scored.select("qid", "node").filter(F.lit(False)).localCheckpoint()
    for _ in range(hops):
        frontier = top_k_per_group(
            scored.join(expanded, ["qid", "node"], "left_anti"),
            ["qid"], order, beam,
        ).drop("rank").localCheckpoint()
        # expanded = union of checkpointed frontiers: the lineage is a
        # union of materialized nodes, no re-checkpoint needed
        expanded = expanded.union(frontier.select("qid", "node"))
        f_ids_df = frontier.select("node").distinct()
        f_ids, f_tbs = _collect_ids_and_buckets(
            f_ids_df, n_buckets, max_id_pushdown
        )
        if f_ids is not None and not f_ids:
            # every scored node of every query is expanded — the search
            # space is exhausted; remaining hops would be no-op jobs
            break
        recs = _fetch_graph_records(
            spark, path, f_ids, f_tbs, ["node", "neighbors"]
        )
        if f_ids is None:
            # over-cap regime: the id set EXCEEDS max_id_pushdown and
            # grows with Q·beam·degree — never force a broadcast of an
            # unbounded set (ADVICE r12); AQE picks the strategy from
            # the runtime size (small batches still get a broadcast)
            recs = recs.join(f_ids_df, "node", "left_semi")
        nbrs = (
            frontier.select("qid", "node")
            .join(recs, "node")
            .select("qid", F.explode("neighbors").alias("node"))
            .distinct()
        )
        fresh = nbrs.join(
            scored.select("qid", "node"), ["qid", "node"], "left_anti"
        ).localCheckpoint()
        c_ids_df = fresh.select("node").distinct()
        c_ids, c_tbs = _collect_ids_and_buckets(
            c_ids_df, n_buckets, max_id_pushdown
        )
        if c_ids is not None and not c_ids:
            continue  # frontier fully explored — nothing new to score
        cvecs = _fetch_graph_records(
            spark, path, c_ids, c_tbs, ["node", "_nvec"]
        )
        if c_ids is None:
            # same unbounded-set rule as the frontier fetch above
            cvecs = cvecs.join(c_ids_df, "node", "left_semi")
        scored = scored.union(
            _score_against(fresh.join(cvecs, "node"))
        ).localCheckpoint()
    from big_ann_spark.operators import vector_ops as VO

    state = (
        VO.mutation_state(spark, path, as_of)
        if VO.has_vector_ops(spark, path)
        else None
    )
    if state is not None:
        contested, resolved = state
        # suppress contested ids from the BASE results (deletes vanish,
        # re-upserts must not surface their stale vector)...
        scored = scored.join(
            F.broadcast(contested.select(F.col("vec_id").alias("node"))),
            "node",
            "left_anti",
        )
        # ...and score the live winners exactly beside the beam —
        # op-sized × query-batch, the IVF contested-side contract
        live = q.crossJoin(
            F.broadcast(
                resolved.select(
                    F.col("vec_id").alias("node"),
                    F.col("embedding").alias("_lv"),
                )
            )
        )
        scored = scored.select("qid", "node", "dist").union(
            live.select("qid", "node", l2_distance("_qv", "_lv", dim).alias("dist"))
        )
    return top_k_per_group(
        scored.withColumnRenamed("node", "neighbor_id"),
        ["qid"],
        [F.col("dist").asc(), F.col("neighbor_id").asc()],
        k,
    )
