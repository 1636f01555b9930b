"""Rank fusion for hybrid retrieval — combining runs from different
searchers (dense ANN, sparse MIPS, lexical) into one ranking.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
``score(d) = Σ_runs 1/(c + rank_run(d))`` — the standard
score-calibration-free fusion every hybrid search stack ships, and the
natural companion to the engine's dense (``operators/knn``) + sparse
(``operators/sparse``) retrieval pair. The reference repo has no
multi-run search to fuse; this extension exists because the engine does.

Spark-first: fusion is a union + one map-side-combinable aggregate +
a windowed top-k — no scoring model, no UDF. Each run contributes
O(Q·k_run) rows, so fusion cost is independent of corpus size by
construction."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_ann_spark.operators.topk import top_k_per_group


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 10,
    *,
    c: int = 60,
) -> DataFrame:
    """Fuse ranked runs — each ``(qid, neighbor_id, rank)`` with rank
    1-based — into ``(qid, neighbor_id, rrf, rank)``, top-``k`` per qid
    by (rrf DESC, neighbor_id). ``c`` is the RRF damping constant (60 in
    the paper; larger flattens the head). A document absent from a run
    contributes 0 for that run, per the paper."""
    if not runs:
        raise ValueError("need at least one run")
    contrib = None
    for r in runs:
        part = r.select(
            "qid",
            "neighbor_id",
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("_c"),
        )
        contrib = part if contrib is None else contrib.unionByName(part)
    fused = contrib.groupBy("qid", "neighbor_id").agg(F.sum("_c").alias("rrf"))
    return top_k_per_group(
        fused, ["qid"], [F.col("rrf").desc(), F.col("neighbor_id").asc()], k
    )
