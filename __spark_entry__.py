"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``big_ann_spark.queries`` — every implemented operator
from SURVEY.md §2 registers there with a callable and (when
SQL-expressible) a DuckDB oracle query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_ann_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact top-10 L2 kNN over the sf0.001 embeddings
    (SURVEY §7.0 — scan, broadcast cross join, native array-expression
    distance, windowed top-k)."""
    q = load_all()["knn_exact_top10"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in load_all().items() if q.sql is not None}
