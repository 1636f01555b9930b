"""Spark 4 transformWithStateInPandas variant: agrees with the batch
aggregate where the runtime supports it (needs google.protobuf); in
this container it must fail fast with a clear gate error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.streaming import events as EV
from big_ann_spark.streaming import experimental as EX


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state(spark, sf_dir):
    stream = EV.read_event_stream(spark, sf_dir)
    if not _protobuf_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            EX.user_totals_transform_with_state(stream)
        return
    out = EV.run_to_memory(
        EX.user_totals_transform_with_state(stream), "t_tws", output_mode="update"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))
