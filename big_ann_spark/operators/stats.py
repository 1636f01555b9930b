"""Dataset-statistics operators beyond plain aggregates: correlation
matrix + VIF (A8/A9), Anderson-Darling normality (A11), all-pairs
Kolmogorov-Smirnov (A10), and the greedy "buddy" dimension ordering
(W4) used for PQ reordering.

Reference: ``multicollinearity.py:92-131`` (df.corr → np.linalg.inv),
``variance.py:109`` (scipy.stats.anderson per dim),
``komolgorovsmirnov.py:90-113`` (sequential all-pairs kstest with an
``assert sample_size <= 100000`` cost guard),
``network_blended.py:83-106`` / ``network_mutlicollinearity.py:108-119``
(edges sorted by weight → greedy node/neighbor emission).

Scale split (SURVEY §2.4 notes): the N-dimension of every statistic is
distributed (one scan, map-side partial aggs); the d×d matrices are
tiny (d ≤ a few hundred) and are finished driver-side — inverting a
64×64 matrix is not a distributed op. The KS all-pairs matrix runs as
d²/2 independent Arrow-batched group tasks where the reference is a
sequential Python double loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_table(emb: DataFrame, *, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, pos, val) exploded dimension view, val as double."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )


def correlation_matrix(emb: DataFrame, dims: int, *, vec_col: str = "embedding") -> np.ndarray:
    """A8: d×d Pearson correlation matrix. Distributed sufficient
    statistics (one pass over (pos_i, pos_j) pairs via MLlib's
    Correlation on assembled vectors), tiny result to the driver."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Correlation

    feat = emb.select(
        array_to_vector(
            F.slice(F.col(vec_col).cast("array<double>"), 1, dims)
        ).alias("features")
    )
    mat = Correlation.corr(feat, "features", "pearson").collect()[0][0]
    return mat.toArray()


def vif_matrix(emb: DataFrame, dims: int, *, vec_col: str = "embedding") -> np.ndarray:
    """A9: multicollinearity (VIF) matrix = inverse of the correlation
    matrix (reference ``multicollinearity.py:96-97``). The inverse runs
    on the driver — d×d only."""
    cor = correlation_matrix(emb, dims, vec_col=vec_col)
    return np.linalg.inv(cor)


def anderson_darling_per_dim(dim_df: DataFrame, *, dist: str = "normal") -> DataFrame:
    """A11: Anderson-Darling statistic per dimension (reference
    ``variance.py:109`` via scipy.stats.anderson; scipy is absent here
    so the statistic is computed directly:
    A² = -n - (1/n) Σ (2i-1)[ln F(z_i) + ln(1-F(z_{n+1-i}))]).
    One Arrow group task per dimension — d independent tasks.

    ``dist="normal"``: F = Φ via math.erf — the reference's normality
    test, verified against a direct numpy evaluation in tests.
    ``dist="logistic"``: F = 1/(1+e^(-z)) — same machinery, but every
    term is elementary (exp/ln), so the DuckDB oracle reproduces the
    whole statistic; this is the driver-checked variant."""
    import math

    def ad_stat(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(pdf["val"].to_numpy(dtype=np.float64))
        n = len(x)
        mu, sigma = x.mean(), x.std(ddof=1)
        z = (x - mu) / sigma
        if dist == "logistic":
            # mirror the oracle term-for-term: ln F = -ln(1+e^-z),
            # ln(1-F) = -z - ln(1+e^-z); math.log/exp = libm, same as
            # DuckDB's ln/exp (numpy's SIMD log can differ by 1 ulp)
            lse = np.array([math.log(1.0 + math.exp(-v)) for v in z])
            ln_cdf = -lse
            ln_sf = -z - lse
        else:
            # normal CDF via erf; clip to avoid log(0)
            cdf = np.array([0.5 * (1.0 + math.erf(v / math.sqrt(2.0))) for v in z])
            cdf = np.clip(cdf, 1e-15, 1 - 1e-15)
            ln_cdf = np.log(cdf)
            ln_sf = np.log(1 - cdf)
        i = np.arange(1, n + 1)
        a2 = -n - np.sum((2 * i - 1) * (ln_cdf + ln_sf[::-1])) / n
        # small-sample correction for estimated params (Stephens 1974)
        a2_corr = a2 * (1 + 0.75 / n + 2.25 / n**2)
        return pd.DataFrame({"pos": [pdf["pos"].iloc[0]], "a2": [a2], "a2_corrected": [a2_corr]})

    return (
        dim_df.groupBy("pos")
        .applyInPandas(ad_stat, schema="pos int, a2 double, a2_corrected double")
    )


def ks_two_sample(
    v: DataFrame,
    *,
    x_col: str = "x",
    grp_col: str = "grp",
    ranged: bool = True,
    n_bins: int = 64,
    lazy_counts: bool = False,
) -> DataFrame:
    """A10: two-sample KS statistic over a tagged value table
    (x, grp∈{0,1}) → one row (ks_stat). D = sup_x |ECDF_0 - ECDF_1|,
    ECDFs via RANGE windows so tied values count correctly.

    ``ranged=True`` (default): the running counts decompose into
    per-value-bin RANGE windows plus driver-prefix carries
    (operators.ranged) — the ECDF never sorts on a single task. The
    counts are integers either way, so the statistic is bit-identical
    to the global-window form.

    ``lazy_counts=True`` (r14): the group totals fold into the plan as
    a broadcast one-row aggregate instead of an EAGER driver collect —
    one fewer serial job per call. Identical arithmetic (the same
    double divisors); the only behavioral difference is the empty-group
    guard: the eager path raises at build time, the lazy path yields a
    NULL ks_stat at execution — pass it only where both groups are
    non-empty by construction."""
    from pyspark.sql import Window

    if lazy_counts:
        cnts = v.agg(
            F.count(F.when(F.col(grp_col) == 0, 1)).cast("double").alias("_ks_n0"),
            F.count(F.when(F.col(grp_col) == 1, 1)).cast("double").alias("_ks_n1"),
        )
        n0_col, n1_col = F.col("_ks_n0"), F.col("_ks_n1")
    else:
        counts = v.agg(
            F.count(F.when(F.col(grp_col) == 0, 1)).cast("double").alias("n0"),
            F.count(F.when(F.col(grp_col) == 1, 1)).cast("double").alias("n1"),
        ).collect()[0]
        if not counts["n0"] or not counts["n1"]:
            # an empty side would silently divide to null downstream
            raise ValueError(
                f"ks_two_sample: both groups must be non-empty "
                f"(n0={int(counts['n0'])}, n1={int(counts['n1'])})"
            )
        cnts = None
        n0_col, n1_col = F.lit(counts["n0"]), F.lit(counts["n1"])
    is0 = F.when(F.col(grp_col) == 0, 1).otherwise(0)
    is1 = F.when(F.col(grp_col) == 1, 1).otherwise(0)
    if ranged:
        from big_ann_spark.operators.ranged import add_value_bins, bin_prefix_table

        b = add_value_bins(v, x_col, n_bins)
        carry = bin_prefix_table(
            b, {"c0": (F.sum(is0), "sum"), "c1": (F.sum(is1), "sum")}
        )
        w_loc = (
            Window.partitionBy("_bin")
            .orderBy(x_col)
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        e = b.join(F.broadcast(carry), "_bin", "left").select(
            (F.sum(is0).over(w_loc) + F.coalesce(F.col("_pfx_c0"), F.lit(0))).alias("c0"),
            (F.sum(is1).over(w_loc) + F.coalesce(F.col("_pfx_c1"), F.lit(0))).alias("c1"),
        )
    else:
        w = Window.orderBy(x_col).rangeBetween(Window.unboundedPreceding, 0)
        e = v.select(
            F.sum(is0).over(w).alias("c0"),
            F.sum(is1).over(w).alias("c1"),
        )
    if cnts is not None:
        e = e.crossJoin(F.broadcast(cnts))
    return e.agg(
        F.max(F.abs(F.col("c0") / n0_col - F.col("c1") / n1_col)).alias("ks_stat")
    )


def ks_matrix(
    emb: DataFrame,
    dims: int,
    *,
    vec_col: str = "embedding",
    ranged: bool = True,
    n_bins: int = 64,
) -> DataFrame:
    """A10 at scale: two-sample KS statistic for every dimension pair
    (i < j). The reference runs d²/2 sequential scipy calls under a
    100k-row assert (``komolgorovsmirnov.py:84,90-113``).

    ``ranged=True`` (default, VERDICT r2 #2): fully declarative
    (pair, bin)-partitioned ECDF — NO task ever materializes a whole
    dimension pair (the cliff the reference's 100k assert guards):

    1. tagged union (pair, val, side) — 2·N·d_pairs rows, one scan;
    2. value bins per pair from broadcast per-dim min/max (bin ids are
       monotone in the value, so all rows in earlier bins precede all
       rows in later bins in the value order);
    3. per-(pair, bin) running counts via a RANGE window (ties count
       correctly), partition size N/n_bins — bounded;
    4. carry-in per (pair, bin): exclusive prefix over the per-bin
       totals table (pairs × n_bins rows — a window over ≤ n_bins rows
       per pair), broadcast-joined back;
    5. D = max |c0/n0 − c1/n1| per pair.

    Counts are integers, so the statistic is bit-identical to the
    ``ranged=False`` Arrow form (kept as the small-d fast path: one
    task per pair, each holding both dims' full arrays)."""
    pairs = [(i, j) for i in range(dims) for j in range(dims) if i < j]
    spark = emb.sparkSession
    pair_df = spark.createDataFrame(pairs, "pos_i int, pos_j int")
    d = dim_table(emb, vec_col=vec_col).filter(F.col("pos") < dims)
    left = d.join(pair_df, d.pos == pair_df.pos_i).select(
        "pos_i", "pos_j", F.col("val"), F.lit(0).alias("side")
    )
    right = d.join(pair_df, d.pos == pair_df.pos_j).select(
        "pos_i", "pos_j", F.col("val"), F.lit(1).alias("side")
    )
    tagged = left.unionByName(right)

    if not ranged:
        def ks(pdf: pd.DataFrame) -> pd.DataFrame:
            a = np.sort(pdf.loc[pdf["side"] == 0, "val"].to_numpy())
            b = np.sort(pdf.loc[pdf["side"] == 1, "val"].to_numpy())
            allv = np.concatenate([a, b])
            ca = np.searchsorted(a, allv, side="right") / len(a)
            cb = np.searchsorted(b, allv, side="right") / len(b)
            d_stat = float(np.max(np.abs(ca - cb)))
            return pd.DataFrame(
                {
                    "pos_i": [pdf["pos_i"].iloc[0]],
                    "pos_j": [pdf["pos_j"].iloc[0]],
                    "ks_stat": [d_stat],
                }
            )

        # same-key repartition ahead of the group shuffle (r14, guide
        # §2.4/§2.5): the pair groups are byte-light but CPU-dense, and
        # byte-based AQE coalescing (parallelismFirst=false) would pack
        # all d²/2 sorts onto ONE python task; an explicit repartition
        # on the grouping keys is exempt from coalescing and satisfies
        # the groupBy's distribution, so no extra Exchange appears.
        n_tasks = min(
            len(pairs), tagged.sparkSession.sparkContext.defaultParallelism
        )
        return (
            tagged.repartition(n_tasks, "pos_i", "pos_j")
            .groupBy("pos_i", "pos_j")
            .applyInPandas(ks, schema="pos_i int, pos_j int, ks_stat double")
        )

    from pyspark.sql import Window

    # per-dim min/max (d rows) → per-pair value range, fully lazy: the
    # old driver collect + createDataFrame cost one eager job per call
    # (r14 optimization); bin edges only steer partitioning, results
    # are identical for any binning
    mmdf = d.groupBy("pos").agg(F.min("val").alias("_mn1"), F.max("val").alias("_mx1"))
    bounds = (
        pair_df.join(
            mmdf.select(
                F.col("pos").alias("pos_i"),
                F.col("_mn1").alias("_mn_i"),
                F.col("_mx1").alias("_mx_i"),
            ),
            "pos_i",
        )
        .join(
            mmdf.select(
                F.col("pos").alias("pos_j"),
                F.col("_mn1").alias("_mn_j"),
                F.col("_mx1").alias("_mx_j"),
            ),
            "pos_j",
        )
        .select(
            "pos_i",
            "pos_j",
            F.least("_mn_i", "_mn_j").alias("_mn"),
            F.greatest("_mx_i", "_mx_j").alias("_mx"),
        )
    )
    b = tagged.join(F.broadcast(bounds), ["pos_i", "pos_j"])
    width = (F.col("_mx") - F.col("_mn")) / n_bins
    raw_bin = F.floor((F.col("val") - F.col("_mn")) / width).cast("int")
    binned = b.withColumn(
        "_bin",
        F.when(
            F.col("_mx") == F.col("_mn"), F.lit(0)
        ).otherwise(F.least(F.greatest(raw_bin, F.lit(0)), F.lit(n_bins - 1))),
    ).drop("_mn", "_mx")

    is0 = F.when(F.col("side") == 0, 1).otherwise(0)
    is1 = F.when(F.col("side") == 1, 1).otherwise(0)
    # per-(pair, bin) totals: tiny table, windows over ≤ n_bins rows
    totals = binned.groupBy("pos_i", "pos_j", "_bin").agg(
        F.sum(is0).alias("_t0"), F.sum(is1).alias("_t1")
    )
    w_pfx = (
        Window.partitionBy("pos_i", "pos_j")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("pos_i", "pos_j")
    carry = totals.select(
        "pos_i",
        "pos_j",
        "_bin",
        F.coalesce(F.sum("_t0").over(w_pfx), F.lit(0)).alias("_pfx0"),
        F.coalesce(F.sum("_t1").over(w_pfx), F.lit(0)).alias("_pfx1"),
        F.sum("_t0").over(w_tot).alias("_n0"),
        F.sum("_t1").over(w_tot).alias("_n1"),
    )
    w_loc = (
        Window.partitionBy("pos_i", "pos_j", "_bin")
        .orderBy("val")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    e = binned.join(F.broadcast(carry), ["pos_i", "pos_j", "_bin"]).select(
        "pos_i",
        "pos_j",
        F.abs(
            (F.sum(is0).over(w_loc) + F.col("_pfx0")) / F.col("_n0")
            - (F.sum(is1).over(w_loc) + F.col("_pfx1")) / F.col("_n1")
        ).alias("_d"),
    )
    return e.groupBy("pos_i", "pos_j").agg(F.max("_d").alias("ks_stat"))


def buddy_order(weights: np.ndarray) -> list[int]:
    """W4: greedy weighted-edge "buddy" ordering (reference
    ``network_blended.py:93-104``): edges sorted by |weight| descending;
    emit a node then its unvisited neighbors by descending weight;
    append missing dims at the end. Driver-side — ≤ d² edges."""
    d = weights.shape[0]
    edges = sorted(
        ((abs(weights[i, j]), i, j) for i in range(d) for j in range(d) if i < j),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    order: list[int] = []
    seen: set[int] = set()
    for _w, i, j in edges:
        for node in (i, j):
            if node not in seen:
                seen.add(node)
                order.append(node)
                nbrs = sorted(
                    (k for k in range(d) if k != node and k not in seen),
                    key=lambda k: (-abs(weights[node, k]), k),
                )
                for k in nbrs[:2]:
                    if k not in seen:
                        seen.add(k)
                        order.append(k)
    for k in range(d):
        if k not in seen:
            order.append(k)
    return order
