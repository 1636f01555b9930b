"""Bucketed-table co-located join: writing both fact tables bucketed
by the join key must let Catalyst join them with NO Exchange (shuffle)
on either side — the pre-partitioning strategy for repeated big×big
joins at 100 TB (SCALE.md 'minimize shuffles')."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_warehouse(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="big_ann_warehouse_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{wh}'")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (
        l.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bucketed.lineitem_b")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bucketed.orders_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketed.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bucketed.orders_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_warehouse):
    lb = spark.table("bucketed.lineitem_b")
    ob = spark.table("bucketed.orders_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderpriority").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    # disable auto-broadcast so only bucketing can avoid the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # neither join input may re-shuffle: no Exchange below the join
    below_join = plan[plan.index("Join"):]
    assert "Exchange hashpartitioning" not in below_join, plan

    # and the result matches the unbucketed join
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = sorted(
        map(
            tuple,
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
            .collect(),
        )
    )
    assert sorted(map(tuple, joined.collect())) == want
