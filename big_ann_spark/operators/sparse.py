"""Sparse-vector maximum-inner-product search (MIPS) via an inverted
index — the public big-ann-benchmarks "sparse" track shape (SPLADE-style
learned sparse embeddings, typically ~100-400 nonzeros over a 30k-dim
vocabulary).

Reference context: the reference repo targets the dense billion-scale
tracks only (``shard_by_distance.py`` operates on fbin float blocks);
sparse search is the companion track of the same benchmark family and a
first-class retrieval mode for LLM data pipelines (lexical/learned-sparse
retrieval for decontamination and doc-level dedup candidates), so the
engine carries it as an extension.

Spark-first design
------------------
A sparse vector is the pair of aligned arrays ``(indices, values)`` —
the COO form every sparse-retrieval system stores. Search is pure
relational algebra, which is exactly why it belongs on Spark:

1. explode base postings once → ``(id, dim, val)`` — at 100 TB this is
   the inverted index, bucketable/partitionable BY DIM so each query
   term only touches its posting-list partitions;
2. explode the (tiny) query batch the same way and equi-join on
   ``dim`` — a broadcast hash join, never an all-pairs scan; dims absent
   from a query contribute exactly 0 to the dot product, so the join IS
   the sparsity skip;
3. ``groupBy (qid, id) sum(qval·bval)`` — map-side partial aggregation
   collapses each partition's hits before the shuffle;
4. windowed top-k per query (``WindowGroupLimit``).

Scale notes: the shuffle after the join carries only (qid, id, product)
hits — bounded by Σ_t |postings(t)| over query terms t, the classic
term-at-a-time bound, independent of corpus width. Hot dims (stopword
terms) are the skew risk: the standard mitigation is dropping or
impact-capping high-df dims (``max_df``), same knob family as the dedup
hot-shingle caps (see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_ann_spark.operators.topk import top_k_per_group


def sparsify_dense(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.5,
) -> DataFrame:
    """Dense → sparse COO postings: ``(id, dim, val)`` rows for every
    component with ``val > tau`` (1-based dims, matching SQL array
    indexing so oracles line up). One posexplode, no UDF; the filter
    lands before the shuffle so only surviving postings move."""
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(vec_col).alias("_p", "val"))
        .filter(F.col("val") > tau)
        .select("id", (F.col("_p") + 1).alias("dim"), F.col("val").cast("double"))
    )


def sparse_mips_topk(
    query_postings: DataFrame,
    base_postings: DataFrame,
    k: int = 10,
    *,
    max_df: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k maximum-inner-product neighbors over COO postings.

    ``query_postings`` / ``base_postings``: ``(id, dim, val)`` rows (use
    :func:`sparsify_dense` for dense inputs). Returns ``(qid,
    neighbor_id, score, rank)``, rank 1..k by (score DESC, neighbor_id).
    Docs sharing no nonzero dim with a query score 0 and are simply
    absent — correct MIPS semantics for non-negative postings, where a
    no-overlap doc can never beat any overlapping one.

    ``max_df``: drop dims whose posting list exceeds ``max_df`` docs —
    the hot-key (stopword) cap; scores become exact over the capped dim
    universe. ``exclude_self`` drops the qid==id hit (self-retrieval).
    """
    b = base_postings.select(
        F.col("id").alias("neighbor_id"), "dim", F.col("val").alias("_bv")
    )
    if max_df is not None:
        dfc = (
            base_postings.groupBy("dim")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("dim")
        )
        b = b.join(dfc, "dim")
    q = query_postings.select(
        F.col("id").alias("qid"), "dim", F.col("val").alias("_qv")
    )
    hits = b.join(F.broadcast(q), "dim")
    if exclude_self:
        hits = hits.filter(F.col("neighbor_id") != F.col("qid"))
    scored = hits.groupBy("qid", "neighbor_id").agg(
        F.sum(F.col("_qv") * F.col("_bv")).alias("score")
    )
    return top_k_per_group(
        scored, ["qid"], [F.col("score").desc(), F.col("neighbor_id").asc()], k
    )
