"""BENCH harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "knn_exact_top10",
    "knn_exact_arrow",
    "knn_cosine_top5",
    "pairwise_distance_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "grouped_joins",
    "per_dim_profile",
    "ks_statistic_dims",
    "window_rankings",
    "centroid_assignment_stats",
    "ivf_search_top5",
    "ann_recall_at_10",
    "ngram_jaccard_top_pairs",
    "dedup_exact",
    "minhash_lsh_near_dup",
    "interval_merges",
    "interval_stabs",
    "text_metrics",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    sf = float(m.group(1)) if m else -1.0  # -1: custom fixture dir
    from big_ann_spark.queries import load_all
    from big_ann_spark.session import get_spark

    registry = load_all()
    spark = get_spark("big-ann-spark-bench")

    # warm the JVM + parquet footers outside the timed region
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry.get(name)
        if q is None:
            continue
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()  # force full execution
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # A14: the reference's QPS metric (MAXIMUM_QUERIES / elapsed,
    # kanndi_search.py:64-66) — ours over the arrow kNN batch
    n_queries = 20
    knn_qps = (
        round(n_queries / timings["knn_exact_arrow"], 2)
        if timings.get("knn_exact_arrow")
        else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "knn_qps": knn_qps,
            }
        )
    )


if __name__ == "__main__":
    main()
