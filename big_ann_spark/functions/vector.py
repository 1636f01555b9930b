"""Vector scalar functions as native Spark column expressions.

Reference behavior (SURVEY §2.7):
- F1 L2 distance: ``np.linalg.norm(centroid - point)``
  (reference ``src/algorithms/sharding/clustering/shard.py:127``,
  ``src/algorithms/sharding/kanndi/shard_by_distance.py:223-228``).
- F2 cosine similarity: normalized dot product
  (reference ``src/util/utils.py:216-235``).
- F3 L2 normalize + round for the Elasticsearch encoder
  (reference ``src/util/utils.py:56-69``).
- S13 Solr indexed-vector string encoder
  (reference ``src/util/utils.py:37-49``).

All of these are pure ``pyspark.sql.functions`` array expressions —
no Python UDFs — so they run JVM-side inside whole-stage codegen and
scale linearly with executor count. Elements are cast to DOUBLE before
arithmetic so results are bit-reproducible across engines (float32 →
float64 widening is exact in IEEE 754).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def sq_l2_distance(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two float-array columns.

    fold-left over ``zip_with(a, b, (x,y) -> (x-y)^2)`` — sequential,
    deterministic summation order so the DuckDB oracle (same left-to-right
    fold in double) produces bit-identical values.
    """
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """L2 (Euclidean) distance; reference F1."""
    return F.sqrt(sq_l2_distance(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns."""
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = _as_double(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; reference F2 (``utils.py:216-235``)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize a vector column (array<double> out)."""
    a = _as_double(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)


def to_elasticsearch_vector(a: Column | str, decimals: int = 10) -> Column:
    """L2-normalized, rounded vector — reference ``get_elasticsearch_vector``
    (``src/util/utils.py:56-69``: sklearn normalize + ``np.round(.., 10)``)."""
    a = _as_double(a)
    n = l2_norm(a)
    return F.transform(a, lambda x: F.round(x / n, decimals))


def to_solr_vector(a: Column | str) -> Column:
    """``"1|v1 2|v2 ..."`` indexed-vector string — reference
    ``to_solr_vector`` (``src/util/utils.py:37-49``), 1-based positions."""
    c = F.col(a) if isinstance(a, str) else a
    indexed = F.transform(c, lambda x, i: F.concat_ws("|", (i + 1).cast("string"), x.cast("string")))
    return F.array_join(indexed, " ")
