"""BM25 lexical retrieval over an inverted index — the classic
Robertson/Spärck-Jones ranking function (BM25; Lucene's non-negative
idf variant), as pure relational algebra.

Reference context: the reference repo is a dense-vector engine
(``shard_by_distance.py`` on fbin blocks) with Solr/Elasticsearch
*encoders* for vectors (``src/solr/…``) — the lexical side those
engines rank with is BM25, so the engine carries it as a first-class
retrieval mode: LLM data pipelines use BM25 for decontamination
sweeps, more-like-this dedup candidates, and the sparse half of hybrid
(RRF) retrieval next to the dense kNN stack.

Spark-first design, mirroring operators/sparse.py (BM25 IS sparse MIPS
with corpus-statistic weights):

1. the index is three lazy DataFrames — term postings ``(doc, term,
   tf, dl)`` (one explode + count of the corpus, at 100 TB bucketable
   BY TERM so a query only touches its terms' posting-list
   partitions), document frequencies ``(term, df)`` (vocabulary-sized)
   and a one-row ``(n_docs, avgdl)`` aggregate;
2. query terms equi-join the postings on ``term`` — a broadcast hash
   join for a query batch, so the scored volume is the term-at-a-time
   bound Σ_t |postings(t)|, independent of corpus width;
3. per-hit contribution ``qtf · idf(t) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))``
   is plain arithmetic on joined columns; ``groupBy (qid, doc)`` sums
   with map-side partial aggregation;
4. windowed top-k per query (``WindowGroupLimit``).

idf is Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — always
positive, so dropping no-overlap docs (they simply never appear in the
join) is exact. High-df terms are the skew risk; ``max_df`` drops them
(the standard stopword cap, same knob family as sparse MIPS /
dedup hot-shingle caps).

Determinism contract for oracles: per-pair scores are double sums
whose addend order differs between engines; rank on the ROUNDED score
with the doc id as tiebreak (``score_round``) so exact-duplicate
documents — which tie — order identically everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_ann_spark.functions.text import tokens
from big_ann_spark.operators import oplayout
from big_ann_spark.operators.topk import top_k_per_group

K1 = 1.2
B = 0.75


class Bm25Index(NamedTuple):
    """postings: (doc, term, tf, dl); dfs: (term, df);
    stats: one row (n_docs, avgdl). All lazy — persist with plain
    ``.write.parquet`` (bucket postings by term at scale)."""

    postings: DataFrame
    dfs: DataFrame
    stats: DataFrame


def terms(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf) — per-document term frequencies, one explode +
    two-level hash aggregate (map-side combined)."""
    return (
        docs.select(
            F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: bool = False,
) -> Bm25Index:
    """Build the three index tables from a corpus. ONE corpus-sized
    shuffle total: dl is just the doc's token count, computed BEFORE
    the explode and carried through it, so the (doc, dl, term)
    aggregate needs no corpus-sized dl re-join (grouping by the
    functionally-dependent dl is free); df and the stats row both
    derive from postings (vocabulary-/unit-sized), so the corpus text
    is scanned and tokenized exactly once — PER CONSUMING SUBTREE.

    ``checkpoint=True`` (r14, guide §5/§2.4): lazily localCheckpoints
    the postings before deriving dfs/stats from them. A scorer like
    ``bm25_topk`` consumes the index through three plan subtrees (the
    hits join, the broadcast dfs, the broadcast stats), and exchange
    reuse does NOT fire across broadcast subqueries — measured at
    sf0.1 the un-checkpointed plan scanned and tokenized the corpus
    4×/0 ReusedExchange. The checkpoint makes the build compute once
    within one job, the in-memory mirror of the built-once
    write_bm25_index layout. Leave False for plans that must stay
    fully lazy (the streaming build path) or that write the tables
    wholesale anyway."""
    if checkpoint:
        idx = bm25_index(docs, id_col=id_col, text_col=text_col)
        postings = idx.postings.localCheckpoint(eager=False)
        dfs = postings.groupBy("term").agg(F.count("*").alias("df"))
        stats = (
            postings.select("doc", "dl")
            .distinct()
            .agg(
                F.count("*").alias("n_docs"),
                F.avg(F.col("dl").cast("double")).alias("avgdl"),
            )
        )
        return Bm25Index(postings=postings, dfs=dfs, stats=stats)
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.size(tokens(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    )
    postings = base.groupBy("doc", "dl", "term").agg(
        F.count("*").alias("tf")
    ).select("doc", "term", "tf", "dl")
    dfs = postings.groupBy("term").agg(F.count("*").alias("df"))
    # stats from the postings' own (doc, dl) pairs — NOT a second
    # tokenizing scan of the corpus (r14, guide §2.4: one corpus pass
    # total). Same universe as filtering on text IS NOT NULL: split()
    # returns a non-empty array for every non-null string (empty text
    # gives [""], dl=1), and explode of the null split drops null-text
    # docs — so distinct (doc, dl) is exactly one row per non-null doc.
    # avgdl is unchanged bit-for-bit: the same multiset of integer dl
    # values (< 2^53) sums exactly in double under any order.
    stats = (
        postings.select("doc", "dl")
        .distinct()
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )
    )
    return Bm25Index(postings=postings, dfs=dfs, stats=stats)


def bm25_topk(
    queries: DataFrame,
    index: Bm25Index,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    max_df: int | None = None,
    exclude_self: bool = False,
    score_round: int | None = None,
) -> DataFrame:
    """(qid, neighbor_id, score, rank) — BM25 top-k over the index for
    a batch of query documents (their text is the query; a
    more-like-this / decontamination probe). The query side is
    exploded to (qid, term, qtf) and broadcast; ``max_df`` drops
    posting lists longer than the cap before the join; ``score_round``
    ranks on the rounded score (see module docstring)."""
    q = terms(queries, id_col=id_col, text_col=text_col).select(
        F.col("id").alias("qid"), "term", F.col("tf").alias("qtf")
    )
    hits = index.postings.join(F.broadcast(q), "term")
    return _score_and_rank(
        hits, index.dfs, index.stats, k=k, k1=k1, b=b, max_df=max_df,
        exclude_self=exclude_self, score_round=score_round,
    )


def _score_and_rank(
    hits: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    *,
    k: int,
    k1: float,
    b: float,
    max_df: int | None,
    exclude_self: bool,
    score_round: int | None,
) -> DataFrame:
    """Rank pre-joined hits ``(qid, qtf, doc, term, tf, dl)`` — shared
    by the in-memory and partition-pruned from-disk query paths."""
    if max_df is not None:
        dfs = dfs.filter(F.col("df") <= max_df)
    hits = hits.join(F.broadcast(dfs), "term")
    if exclude_self:
        hits = hits.filter(F.col("doc") != F.col("qid"))
    hits = hits.crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        hits.select(
            "qid",
            F.col("doc").alias("neighbor_id"),
            (F.col("qtf") * idf * tf_part).alias("_c"),
        )
        .groupBy("qid", "neighbor_id")
        .agg(F.sum("_c").alias("score"))
    )
    if score_round is not None:
        scored = scored.withColumn("score", F.round("score", score_round))
    return top_k_per_group(
        scored, ["qid"], [F.col("score").desc(), F.col("neighbor_id").asc()], k
    )


# ---------------------------------------------------------------------------
# Persisted index: term-bucketed layout, partition-pruned queries,
# idempotent history-size-independent incremental ops.
#
# At 100 TB the index is built once and queried/merged forever after —
# rebuilding the postings per query batch (a full corpus scan) is the
# anti-pattern. The layout mirrors the sharded-vector (S7) and binned-
# interval layouts: postings land under partitionBy(_tb, _mb) where
# _tb = pmod(xxhash64(term), n_term_buckets) is the term bucket a query
# batch prunes on (dynamic partition pruning reads ONLY the touched
# bucket directories) and _mb is the OP ID that makes every mutation
# exactly-once (the streaming sink's protocol, imported into the batch
# layout):
#
# - the base build writes everything under _mb = -1 (the streaming
#   compaction convention — op ids start at 0, so the base can never
#   collide with an op);
# - each merge/delete op writes ONLY its own _mb=<id> partitions via
#   dynamic partition overwrite, then drops a commit marker file under
#   _ops/<id>. Re-running a crashed op with the same id overwrites
#   exactly its own partitions — idempotent by construction — and
#   readers exclude any on-disk op id with no marker (NOT-IN over the
#   tiny in-flight set), so a half-written op is invisible;
# - corpus statistics are SIGNED per-op deltas: dfs_delta rows carry
#   +df (merge) or -df (delete), stats_delta rows carry ±(n_docs,
#   sum_dl) — sums merge exactly across ops, so the logical dfs/stats
#   are a vocabulary-sized / op-count-sized aggregate at ANY corpus
#   size, and NOTHING is ever rewritten in place (no crash window at
#   all, unlike the old global-dfs rewrite);
# - deletes are tombstones: the op lands (doc) rows under
#   tombstones.parquet/_mb=<id> plus the negative df/stats deltas;
#   queries anti-join the (broadcast, tiny) tombstone set and
#   compact_bm25_index folds them into a fresh base epoch.
# ---------------------------------------------------------------------------


def _term_bucket(term, n_buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(n_buckets))


# the generic exactly-once op protocol now lives in operators.oplayout
# (extracted so the sharded vector layout shares it verbatim); the
# bm25-local names below stay as aliases — the module's own call sites
# and tests reference them.
_fs = oplayout.fs_path
_glob_op_ids = oplayout.glob_op_ids


def _op_ids_on_disk(spark, path: str) -> set[int]:
    """Every op id with ANY bytes on disk (committed or in-flight).

    stats_delta is the OP-ID LEDGER: every op writes exactly one
    stats_delta partition and writes it FIRST (:func:`_land_op`), so
    this single O(ops) glob sees every op that has any bytes anywhere
    — globbing the postings table instead would walk O(buckets × ops)
    directory entries per index open, a real cost on object stores."""
    ids = _glob_op_ids(spark, f"{path}/stats_delta.parquet/_mb=*")
    ids.discard(_BASE_EPOCH)
    return ids


_committed_ops = oplayout.committed_ops
_mark_committed = oplayout.mark_committed


def uncommitted_op_ids(spark, path: str) -> list[int]:
    """Op ids with bytes on disk but no commit marker — crashed or
    in-flight writes, invisible to every reader. O(crashes), tiny."""
    return sorted(_op_ids_on_disk(spark, path) - _committed_ops(spark, path))


def _purge_op(spark, path: str, op_id: int) -> None:
    """Remove every ``_mb=op_id`` partition dir across the four tables
    — metadata-only FS ops. Run before an op writes, so landing at a
    previously-crashed id can never leave the old attempt's partitions
    mixed under a now-committed id."""
    oplayout.purge_op_dirs(
        spark,
        [
            f"{path}/postings.parquet/_tb=*/_mb={op_id}",
            f"{path}/dfs_delta.parquet/_mb={op_id}",
            f"{path}/stats_delta.parquet/_mb={op_id}",
            f"{path}/tombstones.parquet/_mb={op_id}",
        ],
    )


_BASE_EPOCH = -1

# (path -> (meta dir mtime, n_term_buckets)): caching the bucket count
# saves one tiny Spark job per from-disk query/op in a serving
# session. The entry is validated against meta.parquet's modification
# time (one FS metadata call, no Spark job) so a rebuild by ANOTHER
# process — possibly with a different bucket count, which would make
# cached _tb hashes prune the wrong partitions — is picked up.
_META_CACHE: dict[str, tuple[int, int]] = {}


def _meta_mtime(spark, path: str) -> int:
    fs, jp = _fs(spark, f"{path}/meta.parquet")
    return int(fs.getFileStatus(jp).getModificationTime())


def _n_term_buckets(spark, path: str) -> int:
    mtime = _meta_mtime(spark, path)
    hit = _META_CACHE.get(path)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    v = int(spark.read.parquet(f"{path}/meta.parquet").collect()[0][0])
    _META_CACHE[path] = (mtime, v)
    return v


# dynamic-partition-overwrite landing (the idempotence ADVICE r8 asked
# for) — kept as a module name because the fault-injection tests patch
# it to simulate crashes between table writes
_write_op_partitions = oplayout.write_op_partitions


def _bucketed_postings(postings: DataFrame, n_buckets: int, op_id: int) -> DataFrame:
    p = postings.withColumn("_tb", _term_bucket(F.col("term"), n_buckets))
    # one file per bucket, TERM-SORTED within it: parquet row-group
    # min/max stats on `term` then let a query's pushed term predicate
    # skip row groups inside probed buckets (bucket dirs bound the
    # directory read, term sorting bounds the bytes read within them)
    return (
        p.withColumn("_mb", F.lit(op_id))
        .repartition("_tb")
        .sortWithinPartitions("_tb", "term")
    )


def _stats_delta(docs: DataFrame, text_col: str, sign: int) -> DataFrame:
    """±(n_docs, sum_dl) for one op — SUMS, not means, because sums
    merge exactly across ops (the streaming BM25 convention)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return docs.filter(c.isNotNull()).agg(
        (F.lit(sign) * F.count("*")).alias("n_docs"),
        (F.lit(sign) * F.sum(F.size(tokens(text_col)).cast("double"))).alias(
            "sum_dl"
        ),
    )


def write_bm25_index(
    index: Bm25Index, path: str, *, n_term_buckets: int = 256
) -> None:
    """Persist the index as the base epoch: ``postings.parquet``
    partitioned by ``(_tb, _mb=-1)`` (the partition-pruned query/merge
    layout), ``dfs.parquet``, ``stats.parquet`` and a one-row
    ``meta.parquet`` carrying the bucket count (the layout contract ops
    must reproduce). Any delta/op state from a previous index at the
    same path is cleared — this is a full rebuild.

    The persisted dfs is derived from the postings AS WRITTEN (df ≡
    per-term posting count is the layout invariant the delete protocol
    also relies on): re-executing ``index.dfs``'s corpus-sized
    explode+aggregate lineage for a second action would cost another
    full corpus pass — Spark does not reuse exchanges across jobs —
    while counting terms over the written files is a single-column
    columnar read. Measured 2× less lineage work on a 20M-posting
    build. ``index.stats`` scans the raw docs (shuffle-free agg) and
    is written as passed.

    The previous incarnation's op state is cleared FIRST: clearing it
    last would let a crash between the new base landing and the
    cleanup leave the OLD index's committed tombstones/deltas applied
    to the NEW base — silent corruption. With the purge first, a crash
    anywhere leaves an obviously-incomplete rebuild whose recovery is
    re-running the rebuild. (An in-place rebuild is still not atomic
    for CONCURRENT readers — build into a fresh dir and switch for
    that, the compaction pattern.)"""
    spark = index.dfs.sparkSession
    fs, _ = _fs(spark, path)
    jvm = spark._jvm
    for stale in ("dfs_delta.parquet", "stats_delta.parquet",
                  "tombstones.parquet", "_ops"):
        jp = jvm.org.apache.hadoop.fs.Path(f"{path}/{stale}")
        if fs.exists(jp):
            fs.delete(jp, True)
    p = _bucketed_postings(index.postings, n_term_buckets, _BASE_EPOCH)
    p.write.mode("overwrite").partitionBy("_tb", "_mb").parquet(
        f"{path}/postings.parquet"
    )
    dfs = (
        spark.read.parquet(f"{path}/postings.parquet")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    dfs.write.mode("overwrite").parquet(f"{path}/dfs.parquet")
    index.stats.write.mode("overwrite").parquet(f"{path}/stats.parquet")
    spark.createDataFrame(
        [(n_term_buckets,)], "n_term_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.parquet")
    _META_CACHE[path] = (_meta_mtime(spark, path), int(n_term_buckets))


class _DiskIndex(NamedTuple):
    """Committed-only scans over a persisted layout: ``postings`` keeps
    ``_tb`` (the from-disk query path joins on it) and ``_mb`` (the
    tombstone resolution needs op order) with tombstoned docs NOT yet
    removed; ``tombstones`` is the (tiny) committed delete set as
    ``(_t_doc, _t_mb)`` or None; ``dfs``/``stats`` are the logical
    base+deltas fold."""

    postings: DataFrame
    dfs: DataFrame
    stats: DataFrame
    tombstones: DataFrame | None
    n_buckets: int


def _drop_tombstoned(postings: DataFrame, tombstones: DataFrame | None) -> DataFrame:
    """Latest-op-wins tombstone resolution: a posting row added by op M
    is dead iff some tombstone for its doc was committed AFTER M
    (``_t_mb > _mb``). A plain doc-equality anti-join would also kill
    rows a LATER merge re-added — the documented replace-a-doc flow
    (delete, then merge the new version) — permanently. Broadcast
    anti-join: equi on doc, op-order filter on top. Drops ``_mb``."""
    if tombstones is not None:
        postings = postings.join(
            F.broadcast(tombstones),
            (postings["doc"] == tombstones["_t_doc"])
            & (postings["_mb"] < tombstones["_t_mb"]),
            "left_anti",
        )
    return postings.drop("_mb")


def _open_bm25_index(spark, path: str, as_of: int | None = None) -> _DiskIndex:
    """``as_of``: snapshot read — only ops with id ≤ ``as_of`` are
    visible (the base epoch always is; ``as_of=-1`` is the pristine
    base). A RANGE predicate on the ``_mb`` partition column plus the
    usual tiny NOT-IN over in-flight ids, so old snapshots stay as
    cheap as the head: the filter never grows with history."""
    n_buckets = _n_term_buckets(spark, path)
    uncommitted = sorted(_op_ids_on_disk(spark, path) - _committed_ops(spark, path))
    if as_of is not None:
        uncommitted = [b for b in uncommitted if b <= as_of]

    def _committed_only(df: DataFrame) -> DataFrame:
        # NOT-IN over the tiny in-flight set (a static partition-column
        # filter — pruned at planning, never isin(committed) whose
        # literal list grows per op)
        if as_of is not None:
            df = df.filter(F.col("_mb") <= int(as_of))
        if uncommitted:
            df = df.filter(~F.col("_mb").isin([int(b) for b in uncommitted]))
        return df

    postings = _committed_only(spark.read.parquet(f"{path}/postings.parquet"))

    def _optional(sub: str) -> DataFrame | None:
        fs, jp = _fs(spark, f"{path}/{sub}")
        if not fs.exists(jp):
            return None
        return _committed_only(spark.read.parquet(f"{path}/{sub}"))

    dfs = spark.read.parquet(f"{path}/dfs.parquet")
    d_delta = _optional("dfs_delta.parquet")
    if d_delta is not None:
        dfs = (
            dfs.unionByName(d_delta.select("term", "df"))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .filter(F.col("df") > 0)
        )
    stats = spark.read.parquet(f"{path}/stats.parquet")
    s_delta = _optional("stats_delta.parquet")
    if s_delta is not None:
        stats = (
            stats.select("n_docs", (F.col("avgdl") * F.col("n_docs")).alias("sum_dl"))
            .unionByName(s_delta.select("n_docs", "sum_dl"))
            .agg(
                F.sum("n_docs").alias("n_docs"),
                # try_divide: deleting the last document leaves
                # n_docs=0 and avgdl NULL (a legal empty index) — the
                # ANSI division would throw instead
                F.try_divide(F.sum("sum_dl"), F.sum("n_docs")).alias("avgdl"),
            )
        )
    tomb = _optional("tombstones.parquet")
    if tomb is not None:
        tomb = tomb.select(
            F.col("doc").alias("_t_doc"), F.col("_mb").alias("_t_mb")
        )
    return _DiskIndex(
        postings=postings, dfs=dfs, stats=stats, tombstones=tomb,
        n_buckets=n_buckets,
    )


def read_bm25_index(spark, path: str, *, as_of: int | None = None) -> Bm25Index:
    """The LOGICAL index over a persisted layout — committed ops only,
    tombstoned rows removed (latest-op-wins, see
    :func:`_drop_tombstoned`), deltas folded into dfs/stats. postings
    keep the ``_tb`` partition column (in-memory :func:`bm25_topk`
    ignores it).

    ``as_of``: SNAPSHOT read — the index exactly as it stood after op
    ``as_of`` committed (``-1`` = the pristine base build). The
    op-delta layout makes time travel a partition-range filter: no
    extra storage, no replay, old snapshots cost the same as the head.
    The reproducibility contract a training run wants — score against
    the index as of the corpus snapshot it trained on — for free."""
    idx = _open_bm25_index(spark, path, as_of)
    return Bm25Index(
        postings=_drop_tombstoned(idx.postings, idx.tombstones),
        dfs=idx.dfs,
        stats=idx.stats,
    )


MAX_PUSHDOWN_TERMS = 1024


def bm25_topk_from_disk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    max_df: int | None = None,
    exclude_self: bool = False,
    score_round: int | None = None,
    max_pushdown_terms: int = MAX_PUSHDOWN_TERMS,
    as_of: int | None = None,
) -> DataFrame:
    """BM25 top-k against a persisted index reading ONLY the term
    buckets the query batch touches: the query batch's distinct bucket
    set — BOUNDED by ``n_term_buckets``, a layout constant, no matter
    how wide the query vocabulary is — is pushed as a STATIC partition
    filter, so pruning happens at planning time with no DPP subquery
    run (plan-pinned in tests/test_bm25.py) and the from-disk read is
    O(query vocabulary), not O(index). Tombstoned (deleted) docs are
    anti-joined out of the hits before scoring. ``as_of`` queries a
    SNAPSHOT (see :func:`read_bm25_index`)."""
    idx = _open_bm25_index(spark, path, as_of)
    tb_t = dict(idx.postings.dtypes)["_tb"]
    q = terms(queries, id_col=id_col, text_col=text_col).select(
        F.col("id").alias("qid"), "term", F.col("tf").alias("qtf"),
        _term_bucket(F.col("term"), idx.n_buckets).cast(tb_t).alias("_tb"),
    ).localCheckpoint(eager=False)  # lazy: the probe job materializes it
    # STATIC bucket pruning: collect the query batch's distinct bucket
    # set (≤ n_term_buckets values by construction — this literal list
    # can never grow with the vocabulary) and push it onto the
    # partition column. Strictly cheaper than the DPP form: pruning
    # resolves at planning, no runtime subquery — and unlike DPP it
    # survives a wide query batch (DPP only fires when a SELECTIVE
    # predicate reaches the probe side, which a decontamination-shaped
    # batch doesn't have).
    # ONE probe job over the (lazily checkpointed, tiny) query side gets
    # the bucket set, the exact vocabulary size AND — r14, merging what
    # was a second collect job — the sorted vocabulary itself, sliced to
    # cap+1 elements so the bytes reaching the driver stay bounded by
    # the pushdown cap no matter how wide the batch is (the aggregation
    # buffer already held every distinct term for countDistinct).
    probe = q.agg(
        F.collect_set("_tb").alias("tbs"),
        F.countDistinct("term").alias("n_terms"),
        F.slice(
            F.sort_array(F.collect_set("term")), 1, max_pushdown_terms + 1
        ).alias("terms") if max_pushdown_terms else F.lit(None).alias("terms"),
    ).collect()[0]
    postings = idx.postings.filter(F.col("_tb").isin(list(probe.tbs)))
    # push the query vocabulary onto the scan as an In predicate IF it
    # is small: bucket pruning bounds the DIRECTORIES read, but a
    # narrow query batch probes few buckets and the equi-join alone
    # would still SCAN every posting in them — the pushed filter lets
    # parquet row-group term min/max stats (the layout is term-sorted
    # within each bucket) skip the bytes instead. Semantically
    # redundant with the join, so results are unchanged. GATED on
    # vocabulary size (VERDICT r8 #1): a decontamination-shaped batch
    # has 10⁴–10⁵ distinct terms, and SCALE.md measured a 20k-literal
    # isin costing 18–44 s per scan vs broadcast-join 1.7–8.1 s on the
    # vector index — past the cap the broadcast join + static bucket
    # pruning carry the plan alone. The term list is only ever
    # collected when it is under the cap, so driver memory is bounded.
    if max_pushdown_terms and probe.n_terms <= max_pushdown_terms:
        # probe.terms is complete here: its slice cap (max_pushdown_terms
        # + 1) exceeds n_terms, so every distinct term is present
        postings = postings.filter(F.col("term").isin(list(probe.terms)))
    hits = _drop_tombstoned(
        postings.join(F.broadcast(q), ["_tb", "term"]).drop("_tb"),
        idx.tombstones,
    )
    return _score_and_rank(
        hits, idx.dfs, idx.stats, k=k, k1=k1, b=b, max_df=max_df,
        exclude_self=exclude_self, score_round=score_round,
    )


def merge_bm25_index(
    spark,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_id: int | None = None,
) -> int:
    """Fold a new document batch into a persisted index WITHOUT reading
    the postings history: the op's postings land as delta-sized files
    under its own ``(_tb, _mb=op_id)`` partitions, its per-term df and
    (n_docs, sum_dl) land as SIGNED delta partitions, and a commit
    marker lands last. The incremental cost is O(batch) +
    O(batch vocabulary) — history-size-independent, the same contract
    as incremental_exact_dedup — and nothing is rewritten in place.

    EXACTLY-ONCE: every table write is a dynamic partition overwrite of
    the op's own ``_mb`` partitions, and readers ignore op ids without
    a marker — so a crash mid-merge leaves an invisible half-op, and
    re-running overwrites it cleanly instead of double-counting
    (ADVICE r8): an explicit ``op_id`` (returned) replays exactly that
    op; an omitted one auto-reuses the lowest crashed id (its partial
    partitions are purged before the write) else allocates max+1.

    Contract: ``new_docs`` ids must be NEW (a re-ingested id would
    double-count its postings and df — screen the batch first with
    incremental_exact_dedup, the streaming corpus pattern; to replace
    a doc, :func:`delete_from_bm25_index` it first). Concurrent ops
    must use distinct ``op_id``s — orchestrate serially (foreachBatch,
    or the ingestion pipeline's exactly-once sink)."""
    delta = bm25_index(new_docs, id_col=id_col, text_col=text_col)
    return _land_op(
        spark, path,
        postings=delta.postings,
        dfs_delta=None,  # derived from the written delta partitions
        stats_delta=_stats_delta(new_docs, text_col, +1),
        tombstones=None,
        op_id=op_id,
    )


def delete_from_bm25_index(
    spark,
    path: str,
    deleted_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_id: int | None = None,
) -> int:
    """Tombstone a document batch out of a persisted index WITHOUT
    reading the postings history (VERDICT r8 #4, the vector index's
    op-tagged template): the op lands the deleted ids under
    ``tombstones.parquet/_mb=op_id`` (queries broadcast-anti-join
    them), NEGATIVE per-term df deltas and a negative (n_docs, sum_dl)
    stats delta — so the logical corpus statistics are exact
    immediately, at O(batch) + O(batch vocabulary) cost. The dead
    postings bytes stay on disk (skipped at query time) until
    :func:`compact_bm25_index` folds them away.

    Same exactly-once protocol as :func:`merge_bm25_index` (dynamic
    overwrite of the op's own partitions + commit marker last; re-run
    a crashed op with the returned ``op_id``).

    Contract: ``deleted_docs`` must carry the id AND the exact text
    that was indexed (the corpus store has it — decontamination and
    takedown lists are document lists). The negative deltas are
    recomputed from that text; deleting an id that is not in the index
    (or with different text) would corrupt df/stats the same way a
    duplicate merge would. Duplicate rows in the batch (takedown lists
    repeat) are dropped by id here — the negative deltas must subtract
    each document exactly once."""
    deleted_docs = deleted_docs.dropDuplicates([id_col])
    delta = bm25_index(deleted_docs, id_col=id_col, text_col=text_col)
    tomb = deleted_docs.select(F.col(id_col).alias("doc"))
    return _land_op(
        spark, path,
        postings=None,
        dfs_delta=delta.dfs.select("term", (-F.col("df")).alias("df")),
        stats_delta=_stats_delta(deleted_docs, text_col, -1),
        tombstones=tomb,
        op_id=op_id,
    )


def _land_op(
    spark,
    path: str,
    *,
    postings: DataFrame | None,
    dfs_delta: DataFrame | None,
    stats_delta: DataFrame,
    tombstones: DataFrame | None,
    op_id: int | None,
) -> int:
    # SINGLE-WRITER (oplayout module docstring): id allocation, purge,
    # writes, and the commit marker run under the layout's best-effort
    # writer lock — a concurrent merge/delete against the same index
    # raises ConcurrentWriterError instead of cross-purging
    n_buckets = _n_term_buckets(spark, path)
    with oplayout.writer_lock(spark, path, owner="bm25"):
        return _land_op_locked(
            spark, path, n_buckets,
            postings=postings, dfs_delta=dfs_delta,
            stats_delta=stats_delta, tombstones=tombstones, op_id=op_id,
        )


def _land_op_locked(
    spark,
    path: str,
    n_buckets: int,
    *,
    postings: DataFrame | None,
    dfs_delta: DataFrame | None,
    stats_delta: DataFrame,
    tombstones: DataFrame | None,
    op_id: int | None,
) -> int:
    # create-marker-first allocation: atomic claim before any purge
    op_id = oplayout.claim_op_id(
        spark, path, _op_ids_on_disk(spark, path), _committed_ops(spark, path),
        op_id=op_id,
    )
    if int(op_id) not in _committed_ops(spark, path):
        # landing at a fresh or crashed id: clear any prior attempt's
        # partitions first (a committed id is a deliberate replay of
        # the SAME batch — dynamic overwrite alone is exact there)
        _purge_op(spark, path, int(op_id))
    mb = F.lit(int(op_id))
    # stats_delta lands FIRST: it is the op-id ledger
    # (_op_ids_on_disk) — any later crash leaves the id discoverable
    # by the single O(ops) glob, so readers exclude the half-op and
    # the next auto-id op reclaims it
    _write_op_partitions(
        stats_delta.withColumn("_mb", mb), f"{path}/stats_delta.parquet", ["_mb"]
    )
    if postings is not None:
        _write_op_partitions(
            _bucketed_postings(postings, n_buckets, int(op_id)),
            f"{path}/postings.parquet", ["_tb", "_mb"],
        )
    if dfs_delta is None:
        # derive the +df delta from the op's WRITTEN postings (same
        # rationale as write_bm25_index: a second execution of the
        # batch's explode lineage vs a pruned single-column read)
        dfs_delta = (
            spark.read.parquet(f"{path}/postings.parquet")
            .filter(F.col("_mb") == int(op_id))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
    _write_op_partitions(
        dfs_delta.withColumn("_mb", mb), f"{path}/dfs_delta.parquet", ["_mb"]
    )
    if tombstones is not None:
        _write_op_partitions(
            tombstones.withColumn("_mb", mb),
            f"{path}/tombstones.parquet", ["_mb"],
        )
    _mark_committed(spark, path, int(op_id))
    return int(op_id)


def compact_bm25_index(spark, src_path: str, dst_path: str) -> int:
    """Copy-on-write compaction into a fresh index dir: the logical
    index (committed ops only, tombstoned docs dropped, deltas folded)
    becomes the new base epoch — dead postings bytes and per-op delta
    tables disappear. Returns the live posting count. ``src`` stays
    valid until the caller switches readers (the streaming compactors'
    contract)."""
    idx = read_bm25_index(spark, src_path)
    n_buckets = _n_term_buckets(spark, src_path)
    # postings checkpoint: the tombstone-fold lineage feeds both the
    # count and the write. dfs/stats stay LAZY — write_bm25_index
    # re-derives dfs from the written postings and only executes stats
    # once, so an eager checkpoint here would run the vocabulary fold
    # for nothing.
    live = Bm25Index(
        postings=idx.postings.select("doc", "term", "tf", "dl").localCheckpoint(),
        dfs=idx.dfs,
        stats=idx.stats,
    )
    n = live.postings.count()
    write_bm25_index(live, dst_path, n_term_buckets=n_buckets)
    return n
