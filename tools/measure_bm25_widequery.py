"""Wide-query BM25 measurement (VERDICT r8 #1 'done' criterion): a
decontamination-shaped query batch (thousands of query docs, 10^4+
distinct terms) against a persisted Zipf-vocabulary index, comparing
the r9 GATED plan (static bucket pruning + broadcast join only) against
the r8 behavior (query vocabulary forced onto the scan as a literal
In) — plus the tombstone-delete + compaction costs at the same scale.

Usage: python tools/measure_bm25_widequery.py [n_docs] [n_query_docs]
Writes nothing to the repo; prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_QUERY = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
DOC_LEN = 100
VOCAB = 50_000
ZIPF_S = 1.05
MAX_DF = 4_000


def main() -> None:
    from pyspark.sql import functions as F

    from big_ann_spark.operators import bm25 as BM
    from big_ann_spark.session import get_spark

    spark = get_spark("bm25-widequery")

    # deterministic Zipf(1.05) corpus (the r8 Zipf campaign's df
    # shape), generated Arrow-batched — per-doc rng seeded by doc_id,
    # inverse-CDF word draw (measurement scaffolding, not engine code)
    import numpy as np
    import pandas as pd

    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()
    cdf = np.cumsum(probs)

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            texts = []
            for d in ids:
                r = np.random.default_rng(int(d))
                ws = np.searchsorted(cdf, r.random(DOC_LEN))
                texts.append(" ".join(f"w{int(i)}" for i in ws))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (
        spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
        .localCheckpoint()
    )

    path = tempfile.mkdtemp(prefix="bm25_wide_") + "/idx"
    t0 = time.perf_counter()
    BM.write_bm25_index(BM.bm25_index(docs), path, n_term_buckets=256)
    t_build = time.perf_counter() - t0
    print(json.dumps({"step": "build", "n_docs": N_DOCS, "sec": round(t_build, 1)}), flush=True)

    q = docs.filter(F.col("doc_id") < N_QUERY).localCheckpoint()
    n_terms = q.select(F.explode(F.split("text", " "))).distinct().count()
    print(json.dumps({"step": "query_vocab", "n_query_docs": N_QUERY,
                      "distinct_terms": n_terms}), flush=True)

    def run(label: str, cap: int) -> None:
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            BM.bm25_topk_from_disk(
                spark, path, q, k=10, max_df=MAX_DF, max_pushdown_terms=cap
            ).count()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"step": label, "sec_min": round(min(ts), 1),
                          "sec_cold": round(ts[0], 1)}), flush=True)

    run("wide_query_gated", BM.MAX_PUSHDOWN_TERMS)   # r9 default: no In push
    run("wide_query_forced_in", 10**9)               # r8 behavior: push all

    # tombstone delete of 1k docs + query-after-delete + compaction
    dead = docs.filter((F.col("doc_id") >= 10_000) & (F.col("doc_id") < 11_000))
    t0 = time.perf_counter()
    BM.delete_from_bm25_index(spark, path, dead)
    print(json.dumps({"step": "delete_1k", "sec": round(time.perf_counter() - t0, 1)}), flush=True)
    t0 = time.perf_counter()
    BM.bm25_topk_from_disk(spark, path, q, k=10, max_df=MAX_DF).count()
    print(json.dumps({"step": "query_after_delete", "sec": round(time.perf_counter() - t0, 1)}), flush=True)
    dst = tempfile.mkdtemp(prefix="bm25_wide_cmp_") + "/idx"
    t0 = time.perf_counter()
    n = BM.compact_bm25_index(spark, path, dst)
    print(json.dumps({"step": "compact", "postings": n,
                      "sec": round(time.perf_counter() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
