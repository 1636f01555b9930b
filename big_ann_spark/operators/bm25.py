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
    p = index.postings
    dfs = index.dfs
    if max_df is not None:
        dfs = dfs.filter(F.col("df") <= max_df)
    hits = p.join(F.broadcast(q), "term").join(F.broadcast(dfs), "term")
    if exclude_self:
        hits = hits.filter(F.col("doc") != F.col("qid"))
    hits = hits.crossJoin(F.broadcast(index.stats))
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
