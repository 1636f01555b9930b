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


def _unrolled_sum(terms: list[Column]) -> Column:
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sq_l2_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Squared L2 distance between two float-array columns.

    Default: fold-left over ``zip_with(a, b, (x,y) -> (x-y)^2)`` —
    sequential, deterministic summation order so the DuckDB oracle
    (same left-to-right fold in double) produces bit-identical values.

    With ``dim`` (known fixed dimensionality): the fold unrolls into an
    explicit 2·dim-term expression — higher-order-function lambdas run
    interpreted, the unrolled form whole-stage-codegens (~30% faster
    per-row, measured) and keeps the identical left-to-right double
    summation, so values stay bit-equal to the fold and the oracle.

    Trade-off (re-measured round 2 at sf0.1): the big expression tree
    inflates planning + codegen-compile time, and at d=64 the 128-term
    tree exceeds the whole-stage-codegen budget — the unrolled exact-kNN
    scan then measures SLOWER even warm (1.59 s vs 0.95 s). Callers
    default to the fold; pass ``dim`` only for small fixed dims (≲16)
    on repeated scans, where the flat expression still codegens.
    """
    ac, bc = (F.col(a) if isinstance(a, str) else a), (F.col(b) if isinstance(b, str) else b)
    if dim is not None:
        diffs = [
            (ac[i].cast("double") - bc[i].cast("double")) for i in range(dim)
        ]
        return _unrolled_sum([d * d for d in diffs])
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """L2 (Euclidean) distance; reference F1."""
    return F.sqrt(sq_l2_distance(a, b, dim))


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Dot product of two float-array columns."""
    ac, bc = (F.col(a) if isinstance(a, str) else a), (F.col(b) if isinstance(b, str) else b)
    if dim is not None:
        return _unrolled_sum(
            [ac[i].cast("double") * bc[i].cast("double") for i in range(dim)]
        )
    a, b = _as_double(a), _as_double(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    if dim is not None:
        return F.sqrt(
            _unrolled_sum([ac[i].cast("double") * ac[i].cast("double") for i in range(dim)])
        )
    a = _as_double(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Cosine similarity; reference F2 (``utils.py:216-235``)."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


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


def lcg_planes(n_planes: int, dim: int, *, state: int = 88172645463325252) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): a fixed LCG
    (public Numerical Recipes constants) so every engine — Spark plans,
    tests, and the DuckDB oracle (which embeds the values as literals) —
    sees the exact same planes. Shared by operators.ann.lsh_bucket_search
    and operators.dedup.embedding_lsh_near_dup_pairs."""
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 1664525 + 1013904223) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes
