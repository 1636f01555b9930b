"""Generate an n×-scaled fixture from an existing sf dir for headroom
runs (VERDICT r2 #8): every fact table becomes n id-shifted copies,
dimension tables stay single-copy (TPC-H-style sublinear dims), and
join keys shift consistently so join cardinalities scale linearly
(10× rows → 10× groups, never accidental fan-out).

Copies are NOT byte-identical — that would turn the dedup/near-dup
queries into degenerate all-duplicates workloads:
- embeddings: each copy's vectors are scaled by (1 + copy·1e-3) with a
  small per-copy offset, so copies are near but not exact;
- documents: each copy's text gains one copy-specific trailing token —
  high-but-<1 Jaccard twins, the realistic near-dup shape;
- events: timestamps shift by `copy` seconds.

Usage:
    python tools/make_scaled_fixture.py --src /root/testdata/sf0.1 \
        --dst /tmp/sf1x --factor 10
Then:
    SPARK_GRAFT_SF_DIR=/tmp/sf1x python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_ann_spark.catalog import load_table  # noqa: E402
from big_ann_spark.session import get_spark  # noqa: E402


def _pow10_ceil(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def _union_copies(df: DataFrame, factor: int, build) -> DataFrame:
    out = build(df, 0)
    for i in range(1, factor):
        out = out.unionByName(build(df, i))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1x")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--dedup-free",
        action="store_true",
        help="document copies get a per-copy suffix on EVERY word "
        "(shared shingles across copies = 0, per-copy df distribution "
        "unchanged) instead of a trailing token — separates size-driven "
        "scaling from dup-cluster-driven scaling for the Σdf² "
        "inverted-index queries",
    )
    args = ap.parse_args()

    spark = get_spark("make-scaled-fixture")
    src, dst, n = args.src, args.dst, args.factor

    t = {name: load_table(spark, src, name) for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )}
    ck = _pow10_ceil(t["customer"].agg(F.max("c_custkey")).collect()[0][0])
    ok = _pow10_ceil(t["orders"].agg(F.max("o_orderkey")).collect()[0][0])
    ek = _pow10_ceil(t["events"].agg(F.max("event_id")).collect()[0][0])
    dk = _pow10_ceil(t["documents"].agg(F.max("doc_id")).collect()[0][0])
    vk = _pow10_ceil(t["embeddings"].agg(F.max("vec_id")).collect()[0][0])

    for name in ("region", "nation", "supplier", "part"):
        t[name].write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    _union_copies(
        t["customer"], n,
        lambda df, i: df.withColumn("c_custkey", F.col("c_custkey") + i * ck),
    ).write.mode("overwrite").parquet(f"{dst}/customer.parquet")

    _union_copies(
        t["orders"], n,
        lambda df, i: df.withColumn("o_orderkey", F.col("o_orderkey") + i * ok)
        .withColumn("o_custkey", F.col("o_custkey") + i * ck),
    ).write.mode("overwrite").parquet(f"{dst}/orders.parquet")

    _union_copies(
        t["lineitem"], n,
        lambda df, i: df.withColumn("l_orderkey", F.col("l_orderkey") + i * ok),
    ).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")

    _union_copies(
        t["events"], n,
        lambda df, i: df.withColumn("event_id", F.col("event_id") + i * ek)
        .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECONDS")),
    ).write.mode("overwrite").parquet(f"{dst}/events.parquet")

    def doc_copy(df, i):
        df = df.withColumn("doc_id", F.col("doc_id") + i * dk)
        if i == 0:
            return df
        if args.dedup_free:
            # tag every word with the copy index: copy i's shingles can
            # only collide with other copy-i docs, so the per-shingle df
            # distribution matches the original corpus exactly and total
            # Σdf² grows linearly with the factor. (A word SHUFFLE does
            # NOT work here: random word orders over the small synthetic
            # vocabulary produce trigrams that collide pathologically
            # ACROSS unrelated docs, inflating df instead of keeping it
            # constant.)
            tagged = F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit(f"_{i}")),
                ),
                " ",
            )
            return df.withColumn("text", tagged)
        return df.withColumn("text", F.concat(F.col("text"), F.lit(f" copytok{i}")))

    _union_copies(t["documents"], n, doc_copy).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )

    _union_copies(
        t["embeddings"], n,
        lambda df, i: df.withColumn("vec_id", F.col("vec_id") + i * vk)
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x: (x * (1.0 + i * 1e-3) + i * 1e-4).cast("float"),
            ),
        ),
    ).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    for name in t:
        print(name, spark.read.parquet(f"{dst}/{name}.parquet").count())


if __name__ == "__main__":
    main()
