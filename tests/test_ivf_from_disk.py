"""S8 end-to-end: IVF search over the PERSISTED sharded layout (read
back from partitioned parquet) must equal the in-memory IVF search —
the full index-build → index-scan lifecycle of the reference
(build: shard_by_distance/save_shard; search: kanndi_search) as one
write + one partition-pruned read."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import ann as ANN
from big_ann_spark.operators import sharding as SH


def test_ivf_from_disk_equals_in_memory(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    path = tempfile.mkdtemp(prefix="big_ann_ivf_disk_")
    SH.write_sharded(assign, emb, path)

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    sharded_mem = assign.select("vec_id", "shard_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    mem = ANN.ivf_search(queries, sharded_mem, cents, k=10, nprobe=3)
    disk_tbl = spark.read.parquet(f"{path}/shards")
    disk = ANN.ivf_search(queries, disk_tbl, cents, k=10, nprobe=3)

    a = sorted(map(tuple, mem.select("qid", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, disk.select("qid", "neighbor_id", "rank").collect()))
    assert a == b and len(a) == 100


def test_ivf_search_from_disk_skips_listing(spark, sf_dir):
    """ivf_search_from_disk (explicit probed-directory read, no
    full-layout listing walk) must equal ivf_search over the fully
    listed table; open_probed_shards must tolerate probed ids whose
    shard never landed a directory (empty clusters)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    path = tempfile.mkdtemp(prefix="big_ann_ivf_probed_")
    SH.write_sharded(assign, emb, path)

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    full = ANN.ivf_search(
        queries, spark.read.parquet(f"{path}/shards"), cents, k=10, nprobe=3
    )
    probed = ANN.ivf_search_from_disk(queries, path, cents, k=10, nprobe=3)
    a = sorted(map(tuple, full.select("qid", "neighbor_id", "rank").collect()))
    b = sorted(map(tuple, probed.select("qid", "neighbor_id", "rank").collect()))
    assert a == b and len(a) == 100

    real = [r.shard_id for r in assign.select("shard_id").distinct().collect()]
    some = ANN.open_probed_shards(spark, path, [real[0], 999_999])
    assert some.select("shard_id").distinct().count() == 1
    empty = ANN.open_probed_shards(spark, path, [999_999])
    assert empty.count() == 0 and "shard_id" in empty.columns


def test_cli_build_index_and_search(spark, sf_dir, tmp_path):
    """The reference's main workflow as two CLI calls: build-index
    (K-Means shard -> partitioned parquet + centroids) then search;
    results must carry valid ranks for every query."""
    from big_ann_spark.cli import main

    idx = str(tmp_path / "idx")
    assert main(["build-index", f"{sf_dir}/embeddings.parquet", idx, "--m", "5"]) == 0
    out = str(tmp_path / "res.parquet")
    assert main(
        ["search", idx, f"{sf_dir}/embeddings.parquet", "--k", "5",
         "--nprobe", "2", "--out", out]
    ) == 0
    res = spark.read.parquet(out)
    n_q = load_table(spark, sf_dir, "embeddings").count()
    assert res.count() == 5 * n_q
    ranks = res.groupBy("qid").agg(
        F.min("rank").alias("mn"), F.max("rank").alias("mx")
    ).collect()
    assert all(r.mn == 1 and r.mx == 5 for r in ranks)
    # partition pruning is live: the shards table is shard_id-partitioned
    import os

    assert any(d.startswith("shard_id=") for d in os.listdir(f"{idx}/shards"))


def test_cli_build_graph_and_search(spark, sf_dir, tmp_path):
    """Graph-tier lifecycle as two CLI calls: build-graph (NN-Descent
    edges -> parquet) then graph-search from the landed edge list;
    every query gets k ranked results and its own dist-0 self hit."""
    from big_ann_spark.cli import main

    gdir = str(tmp_path / "graph")
    src = f"{sf_dir}/embeddings.parquet"
    assert main(["build-graph", src, gdir, "--k", "5"]) == 0
    out = str(tmp_path / "gres.parquet")
    assert main(
        ["graph-search", gdir, src, "--base", src, "--k", "5", "--out", out]
    ) == 0
    res = spark.read.parquet(out)
    n_q = load_table(spark, sf_dir, "embeddings").count()
    assert res.count() == 5 * n_q
    ranks = res.groupBy("qid").agg(
        F.min("rank").alias("mn"), F.max("rank").alias("mx"),
        F.min("dist").alias("md"),
    ).collect()
    assert all(r.mn == 1 and r.mx == 5 and r.md == 0.0 for r in ranks)
    # a plain edges dir without --base is refused with guidance
    assert main(["graph-search", gdir, src, "--k", "5"]) == 2


def test_cli_graph_serving_layout_from_disk(spark, sf_dir, tmp_path):
    """--serving-layout persists the graph TIER (node records: vector +
    adjacency in one bucketed row — the on-disk-HNSW analog of
    reference src/util/utils.py:286-296); graph-search then needs NO
    base table and returns exactly what the edges+base path returns."""
    from big_ann_spark.cli import main

    gdir = str(tmp_path / "graph")
    src = f"{sf_dir}/embeddings.parquet"
    assert main(
        ["build-graph", src, gdir, "--k", "5", "--serving-layout",
         "--graph-buckets", "8"]
    ) == 0
    out_mem = str(tmp_path / "mem.parquet")
    out_disk = str(tmp_path / "disk.parquet")
    # force the edges+base path by pointing at a copy without graph.parquet
    edges_only = str(tmp_path / "edges_only")
    import shutil

    os.makedirs(edges_only)
    shutil.copytree(f"{gdir}/edges.parquet", f"{edges_only}/edges.parquet")
    assert main(
        ["graph-search", edges_only, src, "--base", src, "--k", "5",
         "--out", out_mem]
    ) == 0
    assert main(["graph-search", gdir, src, "--k", "5", "--out", out_disk]) == 0
    key = lambda p: sorted(
        (r["qid"], r["neighbor_id"], round(r["dist"], 6), r["rank"])
        for r in spark.read.parquet(p).collect()
    )
    assert key(out_disk) == key(out_mem) and len(key(out_disk)) > 0


def test_cli_build_index_sq8_and_search(spark, sf_dir, tmp_path):
    """IVF-SQ8 (FAISS IVFSQ shape): shards land as int8 codes (no
    float vector column on disk), search auto-detects the ranges
    sidecar and decodes as a projection; quantized results recover
    >= 0.9 of the float index's neighbors."""
    from big_ann_spark.cli import main

    src = f"{sf_dir}/embeddings.parquet"
    idx_f = str(tmp_path / "idx_float")
    idx_q = str(tmp_path / "idx_sq8")
    assert main(["build-index", src, idx_f, "--m", "5"]) == 0
    assert main(["build-index", src, idx_q, "--m", "5", "--sq8"]) == 0
    shard_cols = spark.read.parquet(f"{idx_q}/shards").columns
    assert "codes" in shard_cols and "embedding" not in shard_cols

    out_f = str(tmp_path / "res_f.parquet")
    out_q = str(tmp_path / "res_q.parquet")
    for idx, out in [(idx_f, out_f), (idx_q, out_q)]:
        assert main(
            ["search", idx, src, "--k", "5", "--nprobe", "2", "--out", out]
        ) == 0
    f = {(r.qid, r.neighbor_id) for r in spark.read.parquet(out_f).collect()}
    qres = spark.read.parquet(out_q)
    n_q = load_table(spark, sf_dir, "embeddings").count()
    assert qres.count() == 5 * n_q
    q = {(r.qid, r.neighbor_id) for r in qres.collect()}
    assert len(q & f) / len(f) >= 0.9, len(q & f) / len(f)


def test_cli_float_rebuild_over_sq8_index(spark, sf_dir, tmp_path):
    """ADVICE r6: a float rebuild into a dir that previously held an
    --sq8 index overwrites shards/ but leaves the stale
    sq8_ranges.parquet sidecar behind — search must key detection off
    the DATA (codes column), so the rebuilt float index searches fine
    despite the stale sidecar."""
    from big_ann_spark.cli import main

    src = f"{sf_dir}/embeddings.parquet"
    idx = str(tmp_path / "idx_rebuilt")
    assert main(["build-index", src, idx, "--m", "5", "--sq8"]) == 0
    assert main(["build-index", src, idx, "--m", "5"]) == 0  # float rebuild
    import os

    assert os.path.exists(f"{idx}/sq8_ranges.parquet")  # stale sidecar survives
    assert "codes" not in spark.read.parquet(f"{idx}/shards").columns
    out = str(tmp_path / "res.parquet")
    assert main(["search", idx, src, "--k", "5", "--nprobe", "2", "--out", out]) == 0
    n_q = load_table(spark, sf_dir, "embeddings").count()
    assert spark.read.parquet(out).count() == 5 * n_q


def test_gt_round_trip_and_cli_evaluate(spark, sf_dir, tmp_path):
    """Ground-truth file round-trip (big-ann GT format) and the
    `evaluate` CLI closing the benchmark loop: at nprobe == m the IVF
    search is exhaustive, so recall vs an exact-kNN-derived GT is 1.0."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_ann_spark.cli import main
    from big_ann_spark.operators.knn import exact_knn
    from big_ann_spark.sources import fbin as FB

    ids = np.arange(12, dtype=np.int32).reshape(3, 4)
    dists = (ids * 0.5).astype(np.float32)
    gt_path = str(tmp_path / "gt.ibin")
    FB.write_ground_truth_local(gt_path, ids, dists)
    r_ids, r_dists = FB.read_ground_truth_local(gt_path)
    assert (r_ids == ids).all() and np.allclose(r_dists, dists)

    # the public format stores UNSIGNED ids: >=2^31 must round-trip
    # positive (ADVICE r7: an int32 read wrapped them negative and they
    # silently never matched), negatives have no representation
    big = np.array([[2**31 + 5, 2**32 - 1, 7, 0]], dtype=np.int64)
    gt_big = str(tmp_path / "gt_big.ibin")
    FB.write_ground_truth_local(gt_big, big, np.zeros((1, 4), np.float32))
    rb, _ = FB.read_ground_truth_local(gt_big)
    assert (rb == big).all() and rb.min() >= 0
    import pytest as _pt

    with _pt.raises(ValueError, match="non-negative"):
        FB.write_ground_truth_local(
            str(tmp_path / "gt_neg.ibin"),
            np.array([[-1]], dtype=np.int64),
            np.zeros((1, 1), np.float32),
        )
    gdf = FB.ground_truth_df(spark, gt_path, k=2)
    assert gdf.count() == 6  # 3 queries x first-2 columns

    # end-to-end: build a small index, GT from exact kNN, evaluate
    src = f"{sf_dir}/embeddings.parquet"
    emb = spark.read.parquet(src).filter(F.col("vec_id") < 300)
    emb_path = str(tmp_path / "emb.parquet")
    emb.write.parquet(emb_path)
    q = emb.filter(F.col("vec_id") < 8)
    q_path = str(tmp_path / "q.parquet")
    q.write.parquet(q_path)
    exact = exact_knn(
        q, emb, k=5,
        query_id="vec_id", query_vec="embedding",
        base_id="vec_id", base_vec="embedding", impl="sql",
    ).collect()
    nq, k = 8, 5
    gids = np.zeros((nq, k), dtype=np.int32)
    gd = np.zeros((nq, k), dtype=np.float32)
    for r in exact:
        gids[r.qid, r.rank - 1] = r.neighbor_id
        gd[r.qid, r.rank - 1] = r.dist
    gt2 = str(tmp_path / "gt2.ibin")
    FB.write_ground_truth_local(gt2, gids, gd)

    idx = str(tmp_path / "idx")
    assert main(["build-index", emb_path, idx, "--m", "4"]) == 0
    # exhaustive probe of every shard -> identical to exact -> recall 1.0
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(
            ["evaluate", idx, q_path, gt2, "--k", "5", "--nprobe", "4"]
        ) == 0
    out = buf.getvalue()
    assert "recall@5" in out and "1.0000" in out, out


def test_cli_evaluate_guards_and_sq8(spark, sf_dir, tmp_path):
    """evaluate must work on --sq8 indexes (shared shard loader) and
    fail LOUDLY — not print recall 0 — on non-ordinal query ids or a
    --k the GT file cannot support."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from big_ann_spark.cli import main
    from big_ann_spark.sources import fbin as FB

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    emb_path = str(tmp_path / "emb.parquet")
    emb.write.parquet(emb_path)
    q_path = str(tmp_path / "q.parquet")
    emb.filter(F.col("vec_id") < 4).write.parquet(q_path)
    gt = str(tmp_path / "gt.ibin")
    FB.write_ground_truth_local(
        gt,
        np.arange(12, dtype=np.int32).reshape(4, 3),
        np.zeros((4, 3), dtype=np.float32),
    )
    idx = str(tmp_path / "idx8")
    assert main(["build-index", emb_path, idx, "--m", "4", "--sq8"]) == 0
    # sq8 index evaluates (decode path shared with `search`)
    assert main(["evaluate", idx, q_path, gt, "--k", "3", "--nprobe", "4"]) == 0
    # --k beyond the GT file's k is an error, not a silently-capped metric
    with pytest.raises(SystemExit, match="exceeds the GT file"):
        main(["evaluate", idx, q_path, gt, "--k", "5"])
    # non-ordinal query ids are an error, not recall 0
    bad_q = str(tmp_path / "badq.parquet")
    emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 104)).write.parquet(bad_q)
    with pytest.raises(SystemExit, match="row ordinals"):
        main(["evaluate", idx, bad_q, gt, "--k", "3"])
    # a parquet DIRECTORY not named *.parquet is sniffed as parquet
    # (ADVICE r7: it used to hit the fbin reader and die on a garbage
    # header); an unrecognizable FILE fails with the format contract
    q_dir = str(tmp_path / "queries_dir")
    emb.filter(F.col("vec_id") < 4).write.parquet(q_dir)
    assert main(["evaluate", idx, q_dir, gt, "--k", "3", "--nprobe", "4"]) == 0
    bogus = str(tmp_path / "queries.bin_xyz")
    open(bogus, "wb").write(b"\x00" * 16)
    with pytest.raises(SystemExit, match="queries format"):
        main(["evaluate", idx, bogus, gt, "--k", "3"])


def test_shard_loader_never_decodes_refine_layouts(spark, sf_dir, tmp_path):
    """A REFINE layout carries codes AND raw vectors; the shared shard
    loader (evaluate path) must return the RAW embeddings, not decoded
    quantization midpoints — recall would otherwise silently measure
    the quantizer."""
    from big_ann_spark.cli import _load_index_shards, main

    src = f"{sf_dir}/embeddings.parquet"
    idx = str(tmp_path / "idx_refine")
    assert main(["build-index", src, idx, "--m", "4", "--sq8-refine"]) == 0
    loaded = _load_index_shards(spark, idx, "vec_id", "embedding")
    joined = (
        loaded.select("vec_id", F.col("embedding").alias("_got"))
        .join(spark.read.parquet(src).select("vec_id", "embedding"), "vec_id")
        .filter(F.col("_got") != F.col("embedding"))
    )
    assert joined.count() == 0


# ------------------------------------------------------- SQ8 serving layout


def _sq8_layout(spark, sf_dir):
    import numpy as np

    from big_ann_spark.operators.pq import train_sq8

    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents, extra_cols=["embedding"])
    path = tempfile.mkdtemp(prefix="big_ann_sq8_disk_")
    ranges = train_sq8(emb)
    SH.write_sharded(assign, emb, path, sq8_ranges=ranges)
    return emb, cents, path, ranges


def test_sq8_layout_roundtrip(spark, sf_dir):
    """Codes column lands next to raw vectors; ranges round-trip; codes
    match re-encoding the raw column with the persisted ranges."""
    from big_ann_spark.operators.pq import sq8_encode_col

    emb, cents, path, (mins, maxs) = _sq8_layout(spark, sf_dir)
    rng = spark.read.parquet(f"{path}/sq8_ranges.parquet").collect()[0]
    assert list(rng["mins"]) == mins and list(rng["maxs"]) == maxs
    tbl = spark.read.parquet(f"{path}/shards")
    assert {"vec_id", "embedding", "codes", "shard_id"} <= set(tbl.columns)
    bad = tbl.filter(
        sq8_encode_col("embedding", mins, maxs).cast("array<smallint>")
        != F.col("codes")
    ).count()
    assert bad == 0 and tbl.count() == emb.count()


def test_sq8_from_disk_matches_exact_rerank_semantics(spark, sf_dir):
    """The sq8 path's results must (a) re-rank exactly — every returned
    dist equals the true L2 recomputed independently — and (b) come
    from the probed shards only."""
    import math

    emb, cents, path, _ = _sq8_layout(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="sq8", rerank_factor=4
    ).collect()
    assert len(out) == 40
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in out:
        qv, nv = vecs[r["qid"]], vecs[r["neighbor_id"]]
        acc = 0.0
        for a, b in zip(qv, nv):
            acc += (a - b) * (a - b)
        assert r["dist"] == math.sqrt(acc)  # exact rerank, bit-for-bit
    routed = ANN.route_queries(queries, cents, 2)
    allowed = {
        (r["qid"], r["shard_id"]) for r in routed.collect()
    }
    assigned = {
        r["vec_id"]: r["shard_id"]
        for r in SH.assign_to_centroids(emb, cents).collect()
    }
    for r in out:
        assert (r["qid"], assigned[r["neighbor_id"]]) in allowed


def test_sq8_scan_plans(spark, sf_dir):
    """100 TB posture pins: the quantized pool scan must read codes and
    NOT the raw embedding column; the rerank scan must read embedding,
    NOT codes, with the bounded candidate-id In pushed to parquet."""
    from big_ann_spark.plans import formatted_plan

    emb, cents, path, _ = _sq8_layout(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    routed = ANN.route_queries(queries, cents, 2).localCheckpoint()
    probe_ids = [r["shard_id"] for r in routed.select("shard_id").distinct().collect()]
    shards = ANN.open_probed_shards(spark, path, probe_ids)
    pool_plan = formatted_plan(
        ANN.sq8_pool(routed, shards, path, 20)
    )
    scan = [
        seg for seg in pool_plan.split("Scan parquet") if "codes" in seg
    ]
    assert scan, "no codes scan in the pool plan"
    assert "embedding" not in scan[0].split("ReadSchema")[1].splitlines()[0]

    final_plan = formatted_plan(
        ANN.ivf_search_from_disk(
            queries, path, cents, k=5, nprobe=2, codec="sq8", rerank_factor=4
        )
    )
    # the rerank scan: embedding in ReadSchema, In(vec_id, ...) pushed
    rer = [
        seg
        for seg in final_plan.split("Scan parquet")
        if "ReadSchema" in seg and "embedding" in seg.split("ReadSchema")[1].splitlines()[0]
    ]
    assert rer, "no raw rerank scan in the final plan"
    seg = rer[0]
    read_schema_line = seg.split("ReadSchema")[1].splitlines()[0]
    assert "codes" not in read_schema_line
    assert "In(vec_id" in seg or "In(vec_id" in final_plan


def test_sq8_pool_arrow_equals_fold(spark, sf_dir):
    """The BLAS pool impl must be bit-identical to the fold impl —
    decode order and fold re-score make it so (the exact_knn arrow
    contract, applied to quantized scoring)."""
    emb, cents, path, _ = _sq8_layout(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    routed = ANN.route_queries(queries, cents, 2).localCheckpoint()
    probe_ids = [r["shard_id"] for r in routed.select("shard_id").distinct().collect()]
    shards = ANN.open_probed_shards(spark, path, probe_ids)
    fold = ANN.sq8_pool(routed, shards, path, 20, impl="fold")
    arrow = ANN.sq8_pool(routed, shards, path, 20, impl="arrow")
    a = sorted(map(tuple, fold.select("qid", "neighbor_id", "dist", "rank").collect()))
    b = sorted(map(tuple, arrow.select("qid", "neighbor_id", "dist", "rank").collect()))
    assert a == b and len(a) == 160  # bit-equal dists included


def test_sq8_from_disk_arrow_pool_end_to_end(spark, sf_dir):
    emb, cents, path, _ = _sq8_layout(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    fold = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="sq8", pool_impl="fold"
    )
    arrow = ANN.ivf_search_from_disk(
        queries, path, cents, k=5, nprobe=2, codec="sq8", pool_impl="arrow"
    )
    a = sorted(map(tuple, fold.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b and len(a) == 40


def test_cli_build_index_sq8_refine_and_search(spark, sf_dir, tmp_path):
    """--sq8-refine (FAISS SQ-then-refine shape): codes AND raw both
    land; search auto-detects the two-tier layout, scans codes for
    candidates and re-ranks exactly — so every returned dist matches
    the float index's dist for the same (qid, neighbor) pair."""
    from big_ann_spark.cli import main

    src = f"{sf_dir}/embeddings.parquet"
    idx_f = str(tmp_path / "idx_float")
    idx_r = str(tmp_path / "idx_refine")
    assert main(["build-index", src, idx_f, "--m", "5"]) == 0
    assert main(["build-index", src, idx_r, "--m", "5", "--sq8-refine"]) == 0
    cols = spark.read.parquet(f"{idx_r}/shards").columns
    assert "codes" in cols and "embedding" in cols

    out_f = str(tmp_path / "res_f.parquet")
    out_r = str(tmp_path / "res_r.parquet")
    for idx, out in [(idx_f, out_f), (idx_r, out_r)]:
        assert main(
            ["search", idx, src, "--k", "5", "--nprobe", "2", "--out", out]
        ) == 0
    f = {(r.qid, r.neighbor_id): r.dist for r in spark.read.parquet(out_f).collect()}
    r_ = {(r.qid, r.neighbor_id): r.dist for r in spark.read.parquet(out_r).collect()}
    common = set(f) & set(r_)
    assert len(common) / len(f) >= 0.95, len(common) / len(f)
    for key in common:
        assert f[key] == r_[key]  # exact rerank: dists bit-equal


def test_sq8_pool_arrow_parity_is_margin_free(spark, sf_dir):
    """Fold parity must be DETERMINISTIC, not margin-probabilistic
    (ADVICE r10): with rerank_margin=0 and a hostile cluster of rows
    whose quantized distances tie within float rounding (identical
    codes → exactly-tied GEMM rows → any number of near-boundary
    inversions), the error-bound band + in-band exact-fold selection
    still emits pools bit-equal to the fold impl."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    rows = []
    # 3 clusters of 40 near-identical vectors each (jitter far below
    # the SQ8 quantization step — all 40 share one code row)
    for c in range(3):
        center = base + c * 2.0
        for i in range(40):
            v = center + rng.normal(size=64) * 1e-13
            rows.append((c * 1000 + i, c, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents, extra_cols=["embedding"])
    path = tempfile.mkdtemp(prefix="big_ann_sq8_ties_") + "/layout"
    from big_ann_spark.operators.pq import train_sq8

    SH.write_sharded(assign, emb, path, sq8_ranges=train_sq8(emb))
    queries = emb.filter(F.col("vec_id").isin(0, 1000, 2000)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    routed = ANN.route_queries(queries, cents, 3).localCheckpoint()
    probe_ids = [r["shard_id"] for r in routed.select("shard_id").distinct().collect()]
    shards = ANN.open_probed_shards(spark, path, probe_ids)
    fold = ANN.sq8_pool(routed, shards, path, 25, impl="fold")
    arrow = ANN.sq8_pool(routed, shards, path, 25, impl="arrow", rerank_margin=0)
    a = sorted(map(tuple, fold.select("qid", "neighbor_id", "dist").collect()))
    b = sorted(map(tuple, arrow.select("qid", "neighbor_id", "dist").collect()))
    assert a == b and len(a) == 75
