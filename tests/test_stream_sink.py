"""foreachBatch landing sink: stream → date-partitioned parquet with a
checkpoint; restart with the same checkpoint must not duplicate."""

from __future__ import annotations

import tempfile

from big_ann_spark.catalog import load_table
from big_ann_spark.streaming import events as EV


def test_foreach_batch_sink_exactly_once(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="big_ann_landing_")
    EV.stream_to_partitioned_parquet(EV.read_event_stream(spark, sf_dir), path)
    out = spark.read.parquet(f"{path}/data")
    n_src = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_src
    assert "event_date" in out.columns

    # re-run with the same checkpoint: no new input → no new rows
    EV.stream_to_partitioned_parquet(EV.read_event_stream(spark, sf_dir), path)
    assert spark.read.parquet(f"{path}/data").count() == n_src
