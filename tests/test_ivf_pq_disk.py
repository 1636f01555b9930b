"""IVF-PQ persisted serving tier (FAISS IVFADC-with-refine shape):
pq_codes-only ADC candidate scan + exact point-fetch rerank off a
``write_sharded(pq_codebooks=...)`` layout."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import ann as ANN
from big_ann_spark.operators import sharding as SH
from big_ann_spark.operators.pq import load_pq_codebooks, train_pq

_CACHE: dict[str, tuple] = {}


def _pq_layout(spark, sf_dir):
    """Session-cached: train once (8 MLlib KMeans fits), reuse across
    tests in the module."""
    got = _CACHE.get(sf_dir)
    if got is not None:
        return got
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = SH.label_centroids(load_table(spark, sf_dir, "embeddings"))
    assign = SH.assign_to_centroids(emb, cents, extra_cols=["embedding"])
    books = train_pq(emb, m=8, k=16)
    path = tempfile.mkdtemp(prefix="big_ann_pq_disk_") + "/layout"
    SH.write_sharded(assign, emb, path, pq_codebooks=books)
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    got = (emb, cents, path, books)
    _CACHE[sf_dir] = got
    return got


def _queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_pq_layout_roundtrip(spark, sf_dir):
    emb, cents, path, books = _pq_layout(spark, sf_dir)
    tbl = spark.read.parquet(f"{path}/shards")
    assert {"vec_id", "embedding", "pq_codes", "shard_id"} <= set(tbl.columns)
    assert load_pq_codebooks(spark, f"{path}/pq_codebooks.parquet") == books
    n_codes = tbl.select(F.size("pq_codes").alias("s")).distinct().collect()
    assert [r["s"] for r in n_codes] == [8]


def test_pq_from_disk_exhaustive_pool_equals_exact(spark, sf_dir):
    """With the pool covering every probed row, the exact rerank makes
    the PQ path EQUAL the raw IVF search — ADC only selects, never
    ranks, the final answer."""
    emb, cents, path, _ = _pq_layout(spark, sf_dir)
    queries = _queries(emb)
    got = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="pq", rerank_factor=10_000
    )
    want = ANN.ivf_search_from_disk(queries, path, cents, k=5, nprobe=2)
    a = sorted(map(tuple, got.select("qid", "neighbor_id", "dist", "rank").collect()))
    b = sorted(map(tuple, want.select("qid", "neighbor_id", "dist", "rank").collect()))
    assert a == b and len(a) == 40


def test_pq_default_rf_recall(spark, sf_dir):
    """Default rerank_factor: the ADC pool must put most true
    neighbors in front of the exact rerank (recall vs the raw-codec
    search of the same layout)."""
    emb, cents, path, _ = _pq_layout(spark, sf_dir)
    queries = _queries(emb)
    got = ANN.ivf_search_from_disk(queries, path, cents, k=5, nprobe=2, codec="pq")
    want = ANN.ivf_search_from_disk(queries, path, cents, k=5, nprobe=2)
    g = {(r["qid"], r["neighbor_id"]) for r in got.collect()}
    w = {(r["qid"], r["neighbor_id"]) for r in want.collect()}
    recall = len(g & w) / len(w)
    assert recall >= 0.7, recall
    # the hits it does return carry EXACT distances (rerank tier)
    gd = {(r["qid"], r["neighbor_id"]): r["dist"] for r in got.collect()}
    wd = {(r["qid"], r["neighbor_id"]): r["dist"] for r in want.collect()}
    for key in g & w:
        assert gd[key] == wd[key]


def test_pq_candidate_scan_reads_codes_only(spark, sf_dir):
    """Column pruning: the ADC candidate pass must not read the raw
    vector column — that is the entire point of the layout."""
    emb, cents, path, _ = _pq_layout(spark, sf_dir)
    queries = _queries(emb)
    routed = ANN.route_queries(queries, cents, 2).localCheckpoint()
    probe_ids = [r["shard_id"] for r in routed.select("shard_id").distinct().collect()]
    shards = ANN.open_probed_shards(spark, path, probe_ids)
    pool = ANN.pq_pool(routed, shards, path, 20)
    plan = pool._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("ReadSchema")[1].splitlines()[0]
    assert "pq_codes" in seg and "embedding" not in seg


def test_pq_pool_arrow_equals_fold(spark, sf_dir):
    """The numpy LUT-gather impl must be bit-identical to the fold —
    left-to-right accumulation over j makes the doubles equal, not
    just close."""
    emb, cents, path, _ = _pq_layout(spark, sf_dir)
    queries = _queries(emb)
    routed = ANN.route_queries(queries, cents, 2).localCheckpoint()
    probe_ids = [r["shard_id"] for r in routed.select("shard_id").distinct().collect()]
    shards = ANN.open_probed_shards(spark, path, probe_ids)
    fold = ANN.pq_pool(routed, shards, path, 20, impl="fold")
    arrow = ANN.pq_pool(routed, shards, path, 20, impl="arrow")
    a = sorted(map(tuple, fold.select("qid", "neighbor_id", "dist", "rank").collect()))
    b = sorted(map(tuple, arrow.select("qid", "neighbor_id", "dist", "rank").collect()))
    assert a == b and len(a) == 160


def test_cli_build_pq_refine_and_search(spark, sf_dir, tmp_path):
    from big_ann_spark.cli import main

    src = f"{sf_dir}/embeddings.parquet"
    idx = str(tmp_path / "idx_pq")
    assert main(["build-index", src, idx, "--m", "5", "--pq-refine"]) == 0
    cols = spark.read.parquet(f"{idx}/shards").columns
    assert "pq_codes" in cols and "embedding" in cols
    out = str(tmp_path / "res.parquet")
    assert main(["search", idx, src, "--k", "5", "--nprobe", "2", "--out", out]) == 0
    res = spark.read.parquet(out)
    assert res.count() == res.select("qid").distinct().count() * 5


def test_pq_encode_arrow_equals_fold(spark, sf_dir):
    """Bulk (numpy) encode must assign the IDENTICAL code per
    subvector as the expression form — same left-to-right arithmetic,
    same lowest-code tie-break."""
    from big_ann_spark.operators.pq import pq_encode, with_pq_codes_arrow

    emb, cents, path, books = _pq_layout(spark, sf_dir)
    fold = {
        r["id"]: list(r["codes"])
        for r in pq_encode(emb, books).collect()
    }
    arrow = {
        r["vec_id"]: list(r["pq_codes"])
        for r in with_pq_codes_arrow(emb, books).select("vec_id", "pq_codes").collect()
    }
    assert fold == {k: v for k, v in arrow.items()}
    assert len(fold) == emb.count()


# --------------------------------------------------- OPQ serving tier


def _opq_layout(spark, sf_dir):
    from big_ann_spark.operators.pq import train_opq

    got = _CACHE.get(sf_dir + ":opq")
    if got is not None:
        return got
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = SH.label_centroids(load_table(spark, sf_dir, "embeddings"))
    assign = SH.assign_to_centroids(emb, cents, extra_cols=["embedding"])
    R, books, pmse, omse = train_opq(emb, m=8, k=16)
    assert omse <= pmse  # the trainer's non-increasing invariant
    path = tempfile.mkdtemp(prefix="big_ann_opq_disk_") + "/layout"
    SH.write_sharded(
        assign, emb, path,
        pq_codebooks=books, opq_rotation=R, pq_encode_impl="arrow",
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    got = (emb, cents, path)
    _CACHE[sf_dir + ":opq"] = got
    return got


def test_opq_from_disk_exhaustive_pool_equals_exact(spark, sf_dir):
    """End-to-end rotation invariance: with an exhaustive pool, the
    OPQ path's exact rerank (raw vectors, unrotated queries) must
    equal the raw search — the orthogonal R cancels out entirely.
    codec='opq' is the explicit tier (VERDICT r11 #7) and must serve
    bit-identically to codec='pq' on the same rotation-carrying layout
    (pq_pool applies the rotation whenever the sidecar exists)."""
    emb, cents, path = _opq_layout(spark, sf_dir)
    queries = _queries(emb)
    got = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="opq", rerank_factor=10_000
    )
    want = ANN.ivf_search_from_disk(queries, path, cents, k=5, nprobe=2)
    a = sorted(map(tuple, got.select("qid", "neighbor_id", "dist", "rank").collect()))
    b = sorted(map(tuple, want.select("qid", "neighbor_id", "dist", "rank").collect()))
    assert a == b and len(a) == 40
    via_pq = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="pq", rerank_factor=10_000
    )
    assert sorted(
        map(tuple, via_pq.select("qid", "neighbor_id", "dist", "rank").collect())
    ) == a
    # the detector reports the real tier
    assert ANN.detect_refine_codec(spark, path) == "opq"


def test_opq_codec_refused_without_rotation(spark, sf_dir):
    """codec='opq' on a PLAIN PQ layout must refuse loudly — serving
    it as plain PQ would silently drop the +recall the rotation buys."""
    import pytest

    emb, cents, path, _books = _pq_layout(spark, sf_dir)
    queries = _queries(emb).limit(2)
    with pytest.raises(ValueError, match="opq_rotation"):
        ANN.ivf_search_from_disk(
            queries, path, cents, k=5, nprobe=2, codec="opq"
        ).collect()
    assert ANN.detect_refine_codec(spark, path) == "pq"


def test_opq_pool_impls_agree_and_mutations_compose(spark, sf_dir):
    emb, cents, path = _opq_layout(spark, sf_dir)
    queries = _queries(emb)
    fold = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="pq", pool_impl="fold"
    )
    arrow = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="pq", pool_impl="arrow"
    )
    assert sorted(map(tuple, fold.collect())) == sorted(map(tuple, arrow.collect()))

    # upsert re-encodes under the frozen rotation; deleted ids vanish
    from big_ann_spark.operators import vector_ops as VO

    VO.upsert_vectors(spark, path, emb.filter(F.col("vec_id") < 2))
    VO.delete_vectors(spark, path, [3])
    got = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=3, codec="pq", rerank_factor=10_000
    )
    live = emb.filter(F.col("vec_id") != 3)
    lassign = SH.assign_to_centroids(live, cents, extra_cols=["embedding"])
    want = ANN.ivf_search(queries, lassign, cents, k=5, nprobe=3, static_prune=False)
    a = sorted(map(tuple, got.select("qid", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, want.select("qid", "neighbor_id", "rank").collect()))
    assert a == b
    # invalidate the cached layout — this test mutated it
    _CACHE.pop(sf_dir + ":opq")


def test_cli_build_opq_refine_and_search(spark, sf_dir, tmp_path):
    from big_ann_spark.cli import main

    src = f"{sf_dir}/embeddings.parquet"
    idx = str(tmp_path / "idx_opq")
    assert main(["build-index", src, idx, "--m", "5", "--opq-refine"]) == 0
    cols = spark.read.parquet(f"{idx}/shards").columns
    assert "pq_codes" in cols and "embedding" in cols
    import os

    assert os.path.isdir(f"{idx}/opq_rotation.parquet")
    out = str(tmp_path / "res.parquet")
    assert main(["search", idx, src, "--k", "5", "--nprobe", "2", "--out", out]) == 0
    res = spark.read.parquet(out)
    assert res.count() == res.select("qid").distinct().count() * 5


# --------------------------------------------------- binary (32×) tier


def _binary_layout(spark, sf_dir):
    from big_ann_spark.operators.pq import train_binary

    got = _CACHE.get(sf_dir + ":bin")
    if got is not None:
        return got
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = SH.label_centroids(load_table(spark, sf_dir, "embeddings"))
    assign = SH.assign_to_centroids(emb, cents, extra_cols=["embedding"])
    thr = train_binary(emb)
    path = tempfile.mkdtemp(prefix="big_ann_bin_disk_") + "/layout"
    SH.write_sharded(assign, emb, path, binary_thresholds=thr)
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    got = (emb, cents, path)
    _CACHE[sf_dir + ":bin"] = got
    return got


def test_binary_from_disk_exhaustive_pool_equals_exact(spark, sf_dir):
    emb, cents, path = _binary_layout(spark, sf_dir)
    queries = _queries(emb)
    got = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="binary", rerank_factor=10_000
    )
    want = ANN.ivf_search_from_disk(queries, path, cents, k=5, nprobe=2)
    a = sorted(map(tuple, got.select("qid", "neighbor_id", "dist", "rank").collect()))
    b = sorted(map(tuple, want.select("qid", "neighbor_id", "dist", "rank").collect()))
    assert a == b and len(a) == 40


def test_binary_candidate_scan_reads_bcodes_only(spark, sf_dir):
    emb, cents, path = _binary_layout(spark, sf_dir)
    queries = _queries(emb)
    routed = ANN.route_queries(queries, cents, 2).localCheckpoint()
    probe_ids = [r["shard_id"] for r in routed.select("shard_id").distinct().collect()]
    shards = ANN.open_probed_shards(spark, path, probe_ids)
    pool = ANN.binary_pool(routed, shards, path, 20)
    plan = pool._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("ReadSchema")[1].splitlines()[0]
    assert "bcodes" in seg and "embedding" not in seg


def test_cli_build_binary_refine_and_search(spark, sf_dir, tmp_path):
    from big_ann_spark.cli import main

    src = f"{sf_dir}/embeddings.parquet"
    idx = str(tmp_path / "idx_bin")
    assert main(["build-index", src, idx, "--m", "5", "--binary-refine"]) == 0
    cols = spark.read.parquet(f"{idx}/shards").columns
    assert "bcodes" in cols and "embedding" in cols
    out = str(tmp_path / "res.parquet")
    assert main(["search", idx, src, "--k", "5", "--nprobe", "2", "--out", out]) == 0
    res = spark.read.parquet(out)
    assert res.count() == res.select("qid").distinct().count() * 5


def test_binary_mutation_runbook(spark, sf_dir):
    """Upsert/delete on a binary layout: upserted rows get bcodes under
    the frozen thresholds, deleted rows vanish — exhaustive-pool search
    equals the raw search over the logical live set."""
    from big_ann_spark.operators import vector_ops as VO
    from big_ann_spark.operators.pq import train_binary

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = SH.label_centroids(load_table(spark, sf_dir, "embeddings"))
    base = emb.filter(F.col("vec_id") % 3 != 0)
    assign = SH.assign_to_centroids(base, cents, extra_cols=["embedding"])
    path = tempfile.mkdtemp(prefix="big_ann_bin_ops_") + "/layout"
    SH.write_sharded(assign, base, path, binary_thresholds=train_binary(emb))
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    VO.upsert_vectors(spark, path, emb.filter(F.col("vec_id") % 3 == 0))
    VO.delete_vectors(spark, path, emb.filter(F.col("vec_id") % 7 == 0).select("vec_id"))
    queries = _queries(emb)
    got = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=3, codec="binary", rerank_factor=10_000
    )
    live = emb.filter(F.col("vec_id") % 7 != 0)
    lassign = SH.assign_to_centroids(live, cents, extra_cols=["embedding"])
    want = ANN.ivf_search(queries, lassign, cents, k=5, nprobe=3, static_prune=False)
    a = sorted(map(tuple, got.select("qid", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, want.select("qid", "neighbor_id", "rank").collect()))
    assert a == b and len(a) == 40
