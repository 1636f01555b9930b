"""Per-stage profile of one headline query: run it N times (fresh
DataFrame each run, like bench.py), then pull stage metrics from the
Spark REST API and print the top stages by executor run time.

Usage: python tools/profile_query.py <query> [n_runs]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_ann_spark.queries import load_all  # noqa: E402
from big_ann_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    q = registry[name]
    spark = get_spark("profile-" + name)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    walls = []
    for r in range(n_runs):
        spark.sparkContext.setJobDescription(f"{name} run{r}")
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        n = df.count()
        w = time.perf_counter() - t0
        walls.append(w)
        print(f"run{r}: wall {w:.3f}s (build {t_build:.3f}s) rows={n}")
    print(f"min wall: {min(walls):.3f}s")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print("\ntop stages by executorRunTime (ms):")
    print(f"{'stage':>6} {'runTime':>8} {'cpuTime':>8} {'tasks':>5} "
          f"{'shufRead':>9} {'shufWrite':>9} {'input':>9}  name")
    for s in stages[:25]:
        print(
            f"{s['stageId']:>6} {s.get('executorRunTime', 0):>8} "
            f"{int((s.get('executorCpuTime') or 0) / 1e6):>8} "
            f"{s.get('numCompleteTasks', 0):>5} "
            f"{s.get('shuffleReadBytes', 0):>9} "
            f"{s.get('shuffleWriteBytes', 0):>9} "
            f"{s.get('inputBytes', 0):>9}  "
            f"{(s.get('description') or s.get('name', ''))[:70]}"
        )
    total_rt = sum(s.get("executorRunTime") or 0 for s in stages)
    print(f"\ntotal executorRunTime across {len(stages)} stages: {total_rt} ms")
    spark.stop()


if __name__ == "__main__":
    main()
