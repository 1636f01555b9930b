"""Every registered query with an oracle must match DuckDB exactly —
the local mirror of the driver's sf0.01 correctness gate, run at
sf0.001 for speed (override with SPARK_GRAFT_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

from big_ann_spark.queries import load_all
from tests.oracle_utils import compare_query

ALL = load_all()
NAMES = sorted(n for n, q in ALL.items() if q.sql is not None)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    q = ALL[name]
    problems = compare_query(spark, name, q.fn, q.sql, sf_dir)
    assert not problems, "; ".join(problems)


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_runs_nonempty(spark, sf_dir, name):
    df = ALL[name].fn(spark, sf_dir)
    assert df.count() >= 0  # smoke: plan executes
