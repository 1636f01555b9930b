"""Split each headline query's warm wall into DataFrame BUILD time
(python-side query construction: py4j round trips, analysis, any eager
construction-side jobs) vs EXECUTE time (count()).

The r14 profiling found the suite at sf0.1 is dominated by build-side
driver work, not executor compute — this tool tracks that split per
query so build-cost regressions are visible.

Usage: python tools/measure_build_exec.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from big_ann_spark.queries import load_all  # noqa: E402
from big_ann_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("MEASURE_RUNS", "3"))
    registry = load_all()
    spark = get_spark("measure-build-exec")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    rows = []
    for name in names:
        q = registry.get(name)
        if q is None:
            continue
        builds, execs, walls = [], [], []
        for r in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            walls.append(t2 - t0)
        rows.append((name, min(builds), min(execs), min(walls)))
        print(
            f"{name:32s} build {min(builds):6.3f}s exec {min(execs):6.3f}s "
            f"wall {min(walls):6.3f}s",
            flush=True,
        )
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    tw = sum(r[3] for r in rows)
    print(f"{'TOTAL':32s} build {tb:6.3f}s exec {te:6.3f}s wall {tw:6.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
