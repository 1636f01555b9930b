"""Statistics operator semantics: VIF inverse property, Anderson-
Darling vs direct numpy, KS matrix vs single-pair oracle query, buddy
ordering, approx-distinct error bounds."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators.stats import (
    anderson_darling_per_dim,
    buddy_order,
    correlation_matrix,
    dim_table,
    ks_matrix,
    vif_matrix,
)


def test_vif_times_corr_is_identity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cor = correlation_matrix(emb, dims=6)
    vif = vif_matrix(emb, dims=6)
    np.testing.assert_allclose(vif @ cor, np.eye(6), atol=1e-8)


def test_anderson_darling_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    d = dim_table(emb).filter(F.col("pos") < 2)
    got = {r["pos"]: r["a2"] for r in anderson_darling_per_dim(d).collect()}
    vals = (
        d.filter(F.col("pos") == 0).select("val").toPandas()["val"].to_numpy()
    )
    x = np.sort(vals)
    n = len(x)
    z = (x - x.mean()) / x.std(ddof=1)
    cdf = np.clip(
        np.array([0.5 * (1 + math.erf(v / math.sqrt(2))) for v in z]), 1e-15, 1 - 1e-15
    )
    i = np.arange(1, n + 1)
    want = -n - np.sum((2 * i - 1) * (np.log(cdf) + np.log(1 - cdf[::-1]))) / n
    assert abs(got[0] - want) < 1e-9


def test_ks_matrix_agrees_with_single_pair_query(spark, sf_dir):
    from big_ann_spark.queries import load_all

    emb = load_table(spark, sf_dir, "embeddings")
    mat = {
        (r["pos_i"], r["pos_j"]): r["ks_stat"]
        for r in ks_matrix(emb, dims=3).collect()
    }
    assert len(mat) == 3
    single = (
        load_all()["dim_pair_stats"]
        .fn(spark, sf_dir)
        .filter("variant = 'ks_ranged'")
        .collect()[0]["stat"]
    )
    assert abs(mat[(0, 1)] - single) < 1e-9


def test_ks_matrix_ranged_bitwise_matches_arrow(spark, sf_dir):
    """The (pair, bin)-partitioned form (no task holds a full pair —
    VERDICT r2 #2) must be bit-identical to the per-pair Arrow form:
    counts are integers, divisions share operands."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {
        (r["pos_i"], r["pos_j"]): r["ks_stat"]
        for r in ks_matrix(emb, dims=4, ranged=True, n_bins=16).collect()
    }
    b = {
        (r["pos_i"], r["pos_j"]): r["ks_stat"]
        for r in ks_matrix(emb, dims=4, ranged=False).collect()
    }
    assert a == b and len(a) == 6


def test_ks_matrix_ranged_plan_has_no_per_pair_window(spark, sf_dir):
    """Scale pin: every Window in the ranged plan is partitioned by
    (pair, bin) or runs over the tiny per-bin totals table — never a
    sort of a full pair's 2N values in one partition. The giveaway of
    the old shape was an applyInPandas (FlatMapGroupsInPandas) over
    (pos_i, pos_j) groups; the ranged plan must contain no Python
    evaluation at all."""
    from big_ann_spark.plans import executed_plan as _plan

    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(ks_matrix(emb, dims=3, ranged=True))
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_ks_two_sample_raises_on_empty_group(spark):
    import pytest as _pytest

    from big_ann_spark.operators.stats import ks_two_sample

    v = spark.createDataFrame([(1.0, 0), (2.0, 0)], "x double, grp int")
    with _pytest.raises(ValueError, match="non-empty"):
        ks_two_sample(v)


def test_ks_two_sample_lazy_counts_matches_eager(spark):
    """r14: lazy_counts folds the group totals into the plan as a
    broadcast one-row aggregate instead of an eager collect — the
    statistic must be BIT-identical (integer counts, same double
    divisors) on both the ranged and global-window paths."""
    from big_ann_spark.operators.stats import ks_two_sample

    rows = [(float(i % 7) * 0.5 - 1.0, i % 2) for i in range(200)]
    v = spark.createDataFrame(rows, "x double, grp int")
    for ranged in (False, True):
        eager = ks_two_sample(v, ranged=ranged, n_bins=13).collect()[0]["ks_stat"]
        lazy = ks_two_sample(
            v, ranged=ranged, n_bins=13, lazy_counts=True
        ).collect()[0]["ks_stat"]
        assert lazy == eager


def test_buddy_order_is_permutation_and_greedy():
    w = np.array(
        [
            [1.0, 0.9, 0.1, 0.2],
            [0.9, 1.0, 0.3, 0.1],
            [0.1, 0.3, 1.0, 0.8],
            [0.2, 0.1, 0.8, 1.0],
        ]
    )
    order = buddy_order(w)
    assert sorted(order) == [0, 1, 2, 3]
    # strongest edge (0,1) leads the ordering
    assert order[0] == 0 and 1 in order[:3]


def test_approx_distinct_within_tolerance(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    approx = l.agg(F.approx_count_distinct("l_partkey").alias("a")).collect()[0]["a"]
    exact = l.select("l_partkey").distinct().count()
    assert abs(approx - exact) / exact < 0.05
