"""Hypothesis property tests: interval merges vs a brute-force model.
Few examples (Spark jobs are slow); the model is an independent
pure-Python implementation of the half-open merge semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_ann_spark.operators import intervals as iv

intervals_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 15)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(intervals_strategy)
def test_merge_overlaps_matches_model(spark, rows):
    df = spark.createDataFrame(rows, "begin long, end long")
    got = sorted(map(tuple, iv.merge_overlaps(df, strict=True).collect()))
    # model: strict merge = union of maximal runs of truly-overlapping
    want = []
    for b, e in sorted(rows):
        if want and b < want[-1][1]:
            want[-1] = (want[-1][0], max(want[-1][1], e))
        else:
            want.append((b, e))
    assert got == sorted(want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(intervals_strategy, st.integers(0, 5))
def test_merge_neighbors_matches_model(spark, rows, dist):
    df = spark.createDataFrame(rows, "begin long, end long")
    got = sorted(map(tuple, iv.merge_neighbors(df, dist).collect()))
    want = []
    for b, e in sorted(rows):
        if want and b <= want[-1][1] + dist:
            want[-1] = (want[-1][0], max(want[-1][1], e))
        else:
            want.append((b, e))
    assert got == sorted(want)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(intervals_strategy, st.integers(0, 60))
def test_point_query_matches_model(spark, rows, p):
    df = spark.createDataFrame(rows, "begin long, end long")
    pts = spark.createDataFrame([(p,)], "p long")
    got = sorted(
        map(tuple, iv.point_query(df, pts).select("begin", "end").collect())
    )
    want = sorted((b, e) for b, e in rows if b <= p < e)
    assert got == want
