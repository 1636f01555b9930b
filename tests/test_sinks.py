"""S9/S10 sink coverage: bucket JSON sink (per-shard assignment dump)
and KMeans model persistence round-trip."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import sharding as SH


def test_bucket_json_sink_roundtrip(spark, sf_dir):
    """S9 (reference shard.py:107-147): per-centroid bucket dump of
    (point_id, distance) — here partitionBy(shard_id) JSON."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = SH.label_centroids(emb)
    assign = SH.assign_to_centroids(emb, cents)
    path = tempfile.mkdtemp(prefix="big_ann_buckets_")
    assign.select(
        "vec_id", "shard_id", F.round("dist", 6).alias("dist")
    ).write.partitionBy("shard_id").mode("overwrite").json(path)
    back = spark.read.json(path)
    assert back.count() == emb.count()
    assert {r["shard_id"] for r in back.select("shard_id").distinct().collect()} == set(
        range(10)
    )


def test_kmeans_model_save_load(spark, sf_dir):
    """S10 (reference centroids.py:106-109 pickle round-trip): MLlib
    KMeansModel save/load preserves centroids and predictions."""
    from pyspark.ml.clustering import KMeansModel

    emb = load_table(spark, sf_dir, "embeddings")
    assign, cents, model = SH.kmeans_shard(emb, m=5)
    path = tempfile.mkdtemp(prefix="big_ann_kmeans_") + "/model"
    model.save(path)
    loaded = KMeansModel.load(path)
    import numpy as np

    for a, b in zip(model.clusterCenters(), loaded.clusterCenters()):
        np.testing.assert_array_equal(a, b)


def test_heatmap_png_sink(spark, sf_dir, tmp_path):
    """S12: KS/VIF heatmap PNGs — valid signature, IHDR dims, parseable
    zlib stream (reference komolgorovsmirnov.py:131-149)."""
    import struct
    import zlib

    from big_ann_spark.catalog import load_table
    from big_ann_spark.sources.heatmap import save_ks_heatmap, save_vif_heatmap

    emb = load_table(spark, sf_dir, "embeddings")
    for fn, name in ((save_ks_heatmap, "ks.png"), (save_vif_heatmap, "vif.png")):
        p = str(tmp_path / name)
        fn(emb, 4, p)
        data = open(p, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        w, h = struct.unpack(">II", data[16:24])
        assert (w, h) == (64, 64)  # 4x4 cells at 16px
        idat_start = data.index(b"IDAT") + 4
        idat_len = struct.unpack(">I", data[idat_start - 8:idat_start - 4])[0]
        raw = zlib.decompress(data[idat_start:idat_start + idat_len])
        assert len(raw) == h * (1 + 3 * w)
