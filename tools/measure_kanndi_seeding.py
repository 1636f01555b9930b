"""SCALE measurement: KANNDI seeding pass — id-order (the reference's
first-unassigned rule, ``shard_by_distance.py:103-111``) vs the
IVF-cell-spread seeding (VERDICT r13 #5) at 200k.

The loop cost model: ⌈M/S⌉ rounds, each a full pass over the remaining
set (broadcast-argmin projection + capacity window + anti-join).
Id-order seeds can't widen S — adjacent ids are adjacent vectors on
real layouts, overlapping admission regions starve wide rounds into
the special shard. Cell-spread seeds keep regions disjoint, so S grows
toward M and rounds collapse. This tool measures the wall AND the
assignment quality (special-shard fraction, realized shards, mean
admitted distance) so a wall win can't hide a routing-quality loss.

Fixture: the graph-tier clustered 64-d one (``measure_graph_tier.py
gen 200000`` must have run first — /tmp/graphtier/emb_200000).

    python tools/measure_kanndi_seeding.py [n] [m]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_ann_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark("kanndi-seeding-measure")
    emb = spark.read.parquet(f"/tmp/graphtier/emb_{n}").localCheckpoint()
    emb.count()  # warm

    from big_ann_spark.operators import sharding as SH

    def run(tag: str, **kw) -> None:
        t0 = time.perf_counter()
        res = SH.kanndi_shard(emb, m=m, **kw)
        stats = res.assignments.groupBy(
            (F.col("shard_id") == -2).alias("special")
        ).agg(
            F.count("*").alias("n"),
            F.countDistinct("shard_id").alias("shards"),
            F.avg("dist").alias("mean_dist"),
        ).collect()
        wall = time.perf_counter() - t0
        by = {r["special"]: r for r in stats}
        reg = by.get(False)
        spec = by.get(True)
        print(
            f"{tag}: wall {wall:.1f}s  assigned "
            f"{reg['n'] if reg else 0} in {reg['shards'] if reg else 0} shards "
            f"(mean dist {reg['mean_dist']:.3f})  special "
            f"{spec['n'] if spec else 0} "
            f"({(spec['n'] if spec else 0) / n:.1%})  "
            f"threshold {res.threshold:.3f} capacity {res.capacity}"
        )

    run("id-order S=4 (default)", seeds_per_round=4)
    run("id-order S=25 (wide, expected to starve)", seeds_per_round=25)
    run("ivf S=25", seeds_per_round=25, seeding="ivf")
    run("ivf S=50", seeds_per_round=50, seeding="ivf")


if __name__ == "__main__":
    main()
