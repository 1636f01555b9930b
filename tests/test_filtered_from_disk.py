"""Filtered (tag-containment) ANN served from a persisted layout:
write_tag_postings_layout artifacts + filtered_search_from_disk must
equal the in-memory filtered_knn tag mode exactly, with the posting
scan pruned to the rare tags' _tb partitions."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import ann as ANN
from big_ann_spark.operators import sharding as SH
from big_ann_spark.operators.knn import filtered_knn

_CACHE: dict[str, tuple] = {}


def _tagged_layout(spark, sf_dir):
    got = _CACHE.get(sf_dir)
    if got is not None:
        return got
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    tagged = emb.join(
        docs.select("doc_id", "lang", "source"), emb.vec_id == docs.doc_id
    ).select(
        "vec_id",
        "embedding",
        F.array(
            F.concat(F.lit("lang:"), F.col("lang")),
            F.concat(F.lit("src:"), F.col("source")),
        ).alias("tags"),
    )
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(
        tagged, cents, extra_cols=["embedding", "tags"]
    )
    path = tempfile.mkdtemp(prefix="big_ann_ftag_") + "/layout"
    SH.write_sharded(assign.drop("tags"), tagged, path)
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    ANN.write_tag_postings_layout(
        tagged.select("vec_id", "tags"), path, n_tag_buckets=16
    )
    got = (tagged, path)
    _CACHE[sf_dir] = got
    return got


def _queries(tagged):
    return tagged.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("tags").alias("qtags"),
    )


def test_filtered_from_disk_equals_in_memory(spark, sf_dir):
    tagged, path = _tagged_layout(spark, sf_dir)
    queries = _queries(tagged)
    got = ANN.filtered_search_from_disk(queries, path, k=3)
    want = filtered_knn(
        queries,
        tagged,
        k=3,
        query_id="qid",
        query_vec="qvec",
        query_tags="qtags",
        base_id="vec_id",
        base_vec="embedding",
        tags_col="tags",
    )
    a = sorted(map(tuple, got.select("qid", "neighbor_id", "dist", "rank").collect()))
    b = sorted(map(tuple, want.select("qid", "neighbor_id", "dist", "rank").collect()))
    assert a == b and len(a) == 18


def test_filtered_from_disk_prunes_posting_buckets(spark, sf_dir):
    """The posting scan must carry a PartitionFilters entry on _tb —
    a wide tag vocabulary never makes the query read every bucket."""
    tagged, path = _tagged_layout(spark, sf_dir)
    q = _queries(tagged).limit(2).select(
        "qid", F.col("qvec").alias("_qvec"), F.col("qtags").alias("_qtags")
    )
    cand = ANN._filtered_candidates(spark, q, path)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    seg = [
        ln for ln in plan.splitlines()
        if "tag_postings.parquet" in ln and "PartitionFilters" in ln
    ]
    assert seg and "_tb" in seg[0].split("PartitionFilters")[1].split("]")[0]


def test_cli_index_tags_and_filtered_search(spark, sf_dir, tmp_path):
    from big_ann_spark.cli import main

    tagged, path = _tagged_layout(spark, sf_dir)
    src = str(tmp_path / "tagged.parquet")
    tagged.select("vec_id", "embedding", "tags").write.parquet(src)
    idx = str(tmp_path / "idx")
    assert main(["build-index", src, idx, "--m", "4"]) == 0
    assert main(["index-tags", idx, src, "--tag-buckets", "8"]) == 0
    out = str(tmp_path / "res.parquet")
    assert main(["filtered-search", idx, src, "--k", "3", "--out", out]) == 0
    res = spark.read.parquet(out)
    n_q = tagged.count()
    # rare (lang, source) combos legitimately have < 3 qualifying
    # neighbors; every query returns SOMETHING (itself qualifies) and
    # nobody exceeds k
    assert res.select("qid").distinct().count() == n_q
    assert res.groupBy("qid").count().agg(F.max("count")).collect()[0][0] <= 3
    # every returned neighbor satisfies the query's tag containment
    qt = tagged.select(F.col("vec_id").alias("qid"), F.col("tags").alias("_qt"))
    bt = tagged.select(
        F.col("vec_id").alias("neighbor_id"), F.col("tags").alias("_bt")
    )
    bad = (
        res.join(qt, "qid").join(bt, "neighbor_id")
        .filter(F.size(F.array_except("_qt", "_bt")) != 0)
    )
    assert bad.count() == 0


def test_filtered_from_disk_rejects_empty_tag_sets(spark, sf_dir):
    import pytest

    tagged, path = _tagged_layout(spark, sf_dir)
    q = tagged.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.array().cast("array<string>").alias("qtags"),
    )
    with pytest.raises(ValueError, match="unconstrained"):
        ANN.filtered_search_from_disk(q, path, k=3)
