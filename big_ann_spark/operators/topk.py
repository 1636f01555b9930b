"""Top-k-per-group — the reference's core query shape.

Reference behavior: ``knnQuery(query, k=10)`` returns the k nearest
ids ordered by distance (``src/util/utils.py:307-312``,
``kanndi_search.py:52-59``); multi-shard candidates are re-sorted
globally ("re-sort the list with respect to the true distance",
``src/algorithms/sharding/kanndi/README.md:46-47``).

Spark mapping (SURVEY W1/W2): rank window + filter. Catalyst turns the
``row_number() <= k`` filter into a ``WindowGroupLimit`` physical node
(partial top-k before the shuffle, final top-k after), so per-group
state is O(k) and the shuffle carries at most k rows per (partition,
group) — this survives a 100 TB scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str | Column],
    order_cols: Sequence[str | Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per group ordered by ``order_cols``.

    Ties are the caller's problem: pass a unique column last in
    ``order_cols`` for deterministic output.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
