"""SCALE measurement: graph-tier freshness lifecycle — contested-set
GROWTH CURVE (VERDICT r13 #8) and the post-compact serving re-measure
(VERDICT r13 #3).

The r13 numbers measured ONE contested size (1.5k: +0.7–0.9 s on the
2M layout) and ONE post-compact warm run (23.9 s vs 18.8 s pristine —
unconfirmed whether that is layout quality or JIT/listing warmth).
This tool walks the contested size up (1.5k → 10k → 50k), measuring
the serving wall at each level, then compacts and re-measures with
SEVERAL warm runs so warmth and layout quality separate. The curve is
what sizes ``compact_if_needed``'s threshold: compaction pays when the
accumulated per-search overhead (brute-force side + suppression
anti-join, both O(contested)) exceeds the amortized rebuild.

Prereqs: ``measure_graph_tier.py gen N`` + ``seeded N`` built
``/tmp/graphtier/graph_{N}``. Phases (own invocation each):

    python tools/measure_graph_freshness.py serve    [n]  # pristine baseline, best-of-3 + per-run list
    python tools/measure_graph_freshness.py curve    [n]  # land ops to 1.5k/10k/50k contested, serve at each
    python tools/measure_graph_freshness.py compact  [n]  # compact_graph_in_place wall
    python tools/measure_graph_freshness.py postcompact [n]  # 4 warm runs + 1 cold on the rebuilt layout

All serving runs: 20 queries, k=10, beam=24, hops=6, n_entry=64 — the
r12/r13 comparable configuration.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_ann_spark.session import get_spark

BASE = "/tmp/graphtier"
D = 64
NQ = 20


def _evict(layout: str) -> None:
    for root, _dirs, files in os.walk(layout):
        for fn in files:
            fd = os.open(os.path.join(root, fn), os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)


def main() -> None:
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    emb_path = f"{BASE}/emb_{n}"
    gpath = f"{BASE}/graph_{n}"
    spark = get_spark("graph-freshness-measure")
    from big_ann_spark.operators import ann as ANN

    emb = spark.read.parquet(emb_path)
    qs = (
        emb.filter(F.col("vec_id") < NQ)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .localCheckpoint()
    )

    def serve(tag: str, runs: int = 3, cold: bool = False, **kw) -> None:
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            ANN.knn_graph_search_from_disk(
                qs, gpath, k=10, beam=24, hops=6, n_entry=64, dim=D, **kw
            ).localCheckpoint()
            walls.append(round(time.perf_counter() - t0, 2))
        line = f"{tag}: warm best {min(walls):.2f}s  runs {walls}"
        if cold:
            _evict(gpath)
            spark.catalog.refreshByPath(gpath)
            t0 = time.perf_counter()
            ANN.knn_graph_search_from_disk(
                qs, gpath, k=10, beam=24, hops=6, n_entry=64, dim=D, **kw
            ).localCheckpoint()
            line += f"  cold {time.perf_counter() - t0:.2f}s"
        print(line, flush=True)

    if phase == "serve":
        serve("pristine", runs=3, cold=True)
        return

    if phase == "curve":
        from big_ann_spark.operators import graph_ops as GO

        # contested levels: ids are disjoint across levels so landing
        # is incremental — upserts move existing vectors (2/3) and
        # deletes tombstone others (1/3), the r13 mix
        levels = [1_500, 10_000, 50_000]
        landed = 0
        for lvl in levels:
            add = lvl - landed
            ups = add * 2 // 3
            dels = add - ups
            lo = 100_000 + landed  # keep clear of the 20 query ids
            t0 = time.perf_counter()
            moved = (
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + ups)
                )
                .select(
                    "vec_id",
                    F.transform(
                        "embedding", lambda x: x + F.lit(5.0)
                    ).alias("embedding"),
                )
            )
            GO.upsert_graph_vectors(spark, gpath, moved)
            GO.delete_graph_nodes(
                spark,
                gpath,
                emb.filter(
                    (F.col("vec_id") >= lo + ups)
                    & (F.col("vec_id") < lo + add)
                ).select("vec_id"),
            )
            land_wall = time.perf_counter() - t0
            landed = lvl
            print(f"landed to contested={lvl}: {land_wall:.1f}s", flush=True)
            serve(f"mutated contested={lvl}", runs=3)
            serve(f"as_of=0 snapshot at contested={lvl}", runs=1, as_of=0)
        return

    if phase == "compact":
        from big_ann_spark.operators import graph_ops as GO

        t0 = time.perf_counter()
        folded = GO.compact_graph_in_place(
            spark, gpath, k=10, dim=D, build="ivf",
        )
        print(
            f"compact_graph_in_place: {time.perf_counter() - t0:.1f}s "
            f"({folded} ops folded)",
            flush=True,
        )
        return

    if phase == "postcompact":
        # VERDICT r13 #3: several warm runs so JIT/listing warmth and
        # layout quality separate — r13's single 23.9 s run could not
        serve("post-compact", runs=4, cold=True)
        return

    raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
