"""Skew-mitigation join strategies (SCALE.md 'skewed keys → salting or
AQE skew-join').

AQE's skew-join splitting handles most cases at runtime; explicit
salting remains the tool when one key dominates so hard that even a
split partition exceeds memory, or when AQE is unavailable (streaming
joins, non-AQE engines). The salted join here is semantics-preserving:
``salted_join(a, b, key) ≡ a.join(b, key)`` for inner joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt: int = 8,
) -> DataFrame:
    """Inner equi-join with the left side's hot keys spread over
    ``salt`` sub-keys:

    - left rows get a random-but-deterministic salt
      ``pmod(xxhash64(all left columns), salt)`` — each left row lands
      in exactly one sub-partition;
    - right rows are replicated ``salt`` times (explode), once per
      sub-key;
    - the join key becomes (key, salt), so a key that held p% of all
      rows now holds p/salt% per shuffle partition.

    Use when the LEFT side is the skewed fact table and the RIGHT side
    is small enough to replicate ``salt``× (but too big or too dynamic
    to broadcast outright).
    """
    lcols = [F.col(c) for c in left.columns]
    l = left.withColumn("_salt", F.pmod(F.xxhash64(*lcols), F.lit(salt)))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "_salt"])
    return out.drop("_salt")
