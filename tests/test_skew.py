"""Salted join must be semantics-preserving vs the plain join, on a
deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of left rows share one key — classic skew
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rval")
    )
    plain = sorted(map(tuple, left.join(right, "k").select("k", "lval", "rval").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k").select("k", "lval", "rval").collect()))
    assert salted == plain
    assert len(plain) == 1000
