"""SCALE measurement: CDX-split WARC reads vs file-granular reads.

The Common Crawl unit is a ~1 GB .warc.gz; without an offset index a
file is ONE task (gzip members are not splittable by inspection), so a
single big file caps parallelism at 1 regardless of cluster width.
build_cdx + read_warc_split turn the same file into ~split_bytes
byte-range tasks. This tool writes ONE record-gzipped WARC file from
synthetic ~1 KB docs and times warc_to_documents().count() both ways.

Phases:
    python tools/measure_warc_cdx.py gen    [n_docs]   # one .warc.gz
    python tools/measure_warc_cdx.py index  [n_docs]   # build + persist cdx
    python tools/measure_warc_cdx.py read   [n_docs]   # file-read vs split-read

At 100 TB: a crawl snapshot is ~90k files, so file granularity is
already wide — the split path matters for the SINGLE-big-file cases
(consolidated exports, one-file-per-domain dumps) and for point
lookups (a pre-filtered cdx reads only matching members).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_ann_spark.session import get_spark

BASE = "/tmp/warccdx"


def _docs(spark, n: int):
    # ~1 KB per doc, deterministic, gzip-resistant (hex digests)
    return spark.range(0, n).select(
        F.concat(F.lit("urn:doc:"), F.col("id")).alias("url"),
        F.concat_ws(
            " ",
            *[F.md5(F.conv(F.col("id") * (i + 1), 10, 16)) for i in range(30)],
        ).alias("text"),
    )


def main() -> None:
    phase = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    warc_dir = f"{BASE}/warc_{n}"
    cdx_path = f"{BASE}/cdx_{n}.parquet"
    spark = get_spark("warc-cdx-measure")
    from big_ann_spark.sources import warc as W

    if phase == "gen":
        t0 = time.perf_counter()
        manifest = W.write_warc(
            _docs(spark, n), warc_dir, uri_col="url",
            gzip_records=True, files=1, mode="overwrite",
        )
        sz = sum(b for _, _, b in manifest)
        print(
            f"gen n={n}: ONE file, {sz/1e6:.0f} MB, "
            f"{time.perf_counter()-t0:.1f}s"
        )
        return

    if phase == "index":
        t0 = time.perf_counter()
        W.build_cdx(spark, warc_dir).write.mode("overwrite").parquet(cdx_path)
        n_members = spark.read.parquet(cdx_path).count()
        print(f"index: {n_members} members, {time.perf_counter()-t0:.1f}s")
        return

    if phase == "read":
        def wall(label, df):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                c = W.warc_to_documents(df).count()
                runs.append(time.perf_counter() - t0)
            print(
                f"{label}: best {min(runs):.1f}s runs="
                + "/".join(f"{r:.1f}" for r in runs)
                + f" ({c} docs)"
            )

        wall("file-granular (1 task)", W.read_warc(spark, warc_dir))
        for mb in (32, 8, 2):
            wall(
                f"cdx split ({mb} MB ranges)",
                W.read_warc_split(spark, cdx_path, split_bytes=mb << 20),
            )
        return

    raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
