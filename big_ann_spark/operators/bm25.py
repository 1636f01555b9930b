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
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> Bm25Index:
    """Build the three index tables from a corpus. ONE corpus-sized
    shuffle total: dl is just the doc's token count, computed BEFORE
    the explode and carried through it, so the (doc, dl, term)
    aggregate needs no corpus-sized dl re-join (grouping by the
    functionally-dependent dl is free); df and the stats row derive
    from postings / the raw scan (vocabulary-/unit-sized)."""
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.size(tokens(text_col)).alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    )
    postings = base.groupBy("doc", "dl", "term").agg(
        F.count("*").alias("tf")
    ).select("doc", "term", "tf", "dl")
    dfs = postings.groupBy("term").agg(F.count("*").alias("df"))
    # null-text docs produce no postings (explode drops them) — keep
    # the corpus statistics consistent with that universe
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    stats = docs.filter(c.isNotNull()).agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokens(text_col)).cast("double")).alias("avgdl"),
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
# history-size-independent incremental merge.
#
# At 100 TB the index is built once and queried/merged forever after —
# rebuilding the postings per query batch (a full corpus scan) is the
# anti-pattern. The layout mirrors the sharded-vector (S7) and binned-
# interval layouts: postings land under partitionBy(_tb) where
# _tb = pmod(xxhash64(term), n_term_buckets), so a query batch — whose
# distinct terms map to a small bucket set — joins on the raw partition
# attribute and Spark's dynamic partition pruning reads ONLY those
# bucket directories. dfs stays vocabulary-sized and stats is one row;
# both rewrite in full on merge (cheap at any corpus size), while the
# postings merge is a pure APPEND of delta-sized files into the same
# bucket scheme — history is never read, let alone rewritten.
# ---------------------------------------------------------------------------


def _term_bucket(term, n_buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(n_buckets))


def write_bm25_index(
    index: Bm25Index, path: str, *, n_term_buckets: int = 256
) -> None:
    """Persist the index: ``postings.parquet`` partitioned by the term
    bucket (the partition-pruned query/merge layout), ``dfs.parquet``,
    ``stats.parquet`` and a one-row ``meta.parquet`` carrying the
    bucket count (the layout contract merges must reproduce)."""
    p = index.postings.withColumn("_tb", _term_bucket(F.col("term"), n_term_buckets))
    # one file per bucket, TERM-SORTED within it: parquet row-group
    # min/max stats on `term` then let a query's pushed term predicate
    # skip row groups inside probed buckets (bucket dirs bound the
    # directory read, term sorting bounds the bytes read within them)
    p = p.repartition("_tb").sortWithinPartitions("_tb", "term")
    p.write.mode("overwrite").partitionBy("_tb").parquet(f"{path}/postings.parquet")
    index.dfs.write.mode("overwrite").parquet(f"{path}/dfs.parquet")
    index.stats.write.mode("overwrite").parquet(f"{path}/stats.parquet")
    spark = index.dfs.sparkSession
    spark.createDataFrame(
        [(n_term_buckets,)], "n_term_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta.parquet")


def read_bm25_index(spark, path: str) -> Bm25Index:
    """Lazy scans over a :func:`write_bm25_index` layout (postings keep
    the ``_tb`` partition column — :func:`bm25_topk_from_disk` needs
    it; in-memory :func:`bm25_topk` ignores it)."""
    return Bm25Index(
        postings=spark.read.parquet(f"{path}/postings.parquet"),
        dfs=spark.read.parquet(f"{path}/dfs.parquet"),
        stats=spark.read.parquet(f"{path}/stats.parquet"),
    )


def _read_n_buckets(spark, path: str) -> int:
    return spark.read.parquet(f"{path}/meta.parquet").collect()[0][0]


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
) -> DataFrame:
    """BM25 top-k against a persisted index reading ONLY the term
    buckets the query batch touches: the broadcast query side carries
    ``_tb`` typed as the raw partition attribute, so the equi-join on
    ``(_tb, term)`` gets a dynamic-partition-pruning subquery on the
    postings scan (plan-pinned in tests/test_bm25.py) — the from-disk
    read is O(query vocabulary), not O(index)."""
    postings = spark.read.parquet(f"{path}/postings.parquet")
    n_buckets = _read_n_buckets(spark, path)
    # type the probe-side bucket as the READ-BACK partition dtype — a
    # cast on the partition side would defeat DPP's scan-lineage match
    tb_t = dict(postings.dtypes)["_tb"]
    q = terms(queries, id_col=id_col, text_col=text_col).select(
        F.col("id").alias("qid"), "term", F.col("tf").alias("qtf"),
        _term_bucket(F.col("term"), n_buckets).cast(tb_t).alias("_tb"),
    ).localCheckpoint()
    # push the query vocabulary onto the scan as an In predicate:
    # bucket pruning bounds the DIRECTORIES read, but a wide query
    # batch probes most buckets and the equi-join alone would still
    # SCAN every posting in them — the pushed filter lets parquet
    # row-group term min/max stats (the layout is term-sorted within
    # each bucket) skip the bytes instead. The list is the query
    # batch's distinct terms — the same contractually-small set the
    # broadcast join ships anyway; semantically redundant with the
    # join, so results are unchanged.
    q_terms = [r.term for r in q.select("term").distinct().collect()]
    hits = (
        postings.filter(F.col("term").isin(q_terms))
        .join(F.broadcast(q), ["_tb", "term"])
        .drop("_tb")
    )
    dfs = spark.read.parquet(f"{path}/dfs.parquet")
    stats = spark.read.parquet(f"{path}/stats.parquet")
    return _score_and_rank(
        hits, dfs, stats, k=k, k1=k1, b=b, max_df=max_df,
        exclude_self=exclude_self, score_round=score_round,
    )


def merge_bm25_index(
    spark,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold a new document batch into a persisted index WITHOUT reading
    the postings history: delta postings append into the same bucket
    scheme (delta-sized write), merged dfs is ``old ∪ delta`` summed
    per term (vocabulary-sized rewrite at ANY corpus size), stats is
    the exact weighted combination (one row). The incremental cost is
    O(batch) + O(vocabulary) — history-size-independent, the same
    contract as incremental_exact_dedup.

    Contract: ``new_docs`` ids must be NEW (a re-ingested id would
    double-count its postings and df — screen the batch first with
    incremental_exact_dedup, the streaming corpus pattern). Deletes
    need a postings rewrite by design; use copy-on-write compaction
    (streaming/vector_index.py is the template) at that point. The
    three-table update is not atomic — orchestrate merges serially
    (foreachBatch, or the ingestion pipeline's exactly-once sink).
    On local paths dfs/stats rewrite via write-new-then-swap, so a
    crash mid-merge can leave the delta postings applied without the
    stats (re-runnable state), but never a half-written or deleted
    dfs/stats table; URI paths (no atomic local rename) fall back to
    a materialize-then-overwrite whose crash window is metadata-only."""
    n_buckets = _read_n_buckets(spark, path)
    delta = bm25_index(new_docs, id_col=id_col, text_col=text_col)
    dp = delta.postings.withColumn("_tb", _term_bucket(F.col("term"), n_buckets))
    # same term-sorted one-file-per-bucket layout as write_bm25_index
    dp = dp.repartition("_tb").sortWithinPartitions("_tb", "term")
    dp.write.mode("append").partitionBy("_tb").parquet(f"{path}/postings.parquet")
    merged_dfs = (
        spark.read.parquet(f"{path}/dfs.parquet")
        .unionByName(delta.dfs)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    _replace_table(merged_dfs, f"{path}/dfs.parquet")
    merged_stats = (
        spark.read.parquet(f"{path}/stats.parquet")
        .unionByName(delta.stats)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            (
                F.sum(F.col("avgdl") * F.col("n_docs")) / F.sum("n_docs")
            ).alias("avgdl"),
        )
    )
    _replace_table(merged_stats, f"{path}/stats.parquet")


def _replace_table(df: DataFrame, final_dir: str) -> None:
    """Rewrite a (small) parquet table that the plan also READS: write
    the new version to a sibling ``.new`` dir first, then swap — the
    Spark job never overwrites its own input, and the crash window
    shrinks from the whole write to two local-FS metadata ops. Paths
    with a URI scheme (object stores: no atomic rename) fall back to
    localCheckpoint + in-place overwrite."""
    if "://" in final_dir:
        df.localCheckpoint().write.mode("overwrite").parquet(final_dir)
        return
    import os
    import shutil

    new = final_dir + ".new"
    df.write.mode("overwrite").parquet(new)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.rename(new, final_dir)
