"""Multimodal-column and binary-source queries.

The media pipeline runs on binary payloads built deterministically from
the documents table (no image libs in the container — the codec is a
deterministic fake; the Spark plumbing is real, see
operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import multimodal as MM
from big_ann_spark.queries import register


@register(
    "multimodal_frame_counts",
    sql="""
SELECT doc_id,
       length(text)::BIGINT AS media_len,
       CAST(ceil(length(text) / 64.0) AS BIGINT) AS n_frames
FROM documents
""",
)
def multimodal_frame_counts(spark, sf_dir):
    """Binary-column plumbing, oracle-checked end to end: text bytes →
    binary media column → mapInPandas 64-byte frame sampler → per-doc
    frame counts (must equal ceil(len/64) exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_media(docs)
    frames = MM.frame_sample(media, every_n_bytes=64)
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    return media.select("doc_id", "media_len").join(counts, "doc_id")


@register("multimodal_features", sql=None)
def multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction over binary media (deterministic
    fake codec — byte-bucket histogram); rows-only check, semantics
    tested in tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_media(docs)
    return MM.extract_features(media)


@register("fbin_roundtrip", sql=None)
def fbin_roundtrip(spark, sf_dir):
    """S1-S5 source coverage: embeddings → local .fbin (header +
    float32 rows) → distributed binaryFile+mapInPandas re-ingest →
    row/element equality summary."""
    import os
    import tempfile

    from big_ann_spark.sources import fbin as FB

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    d = tempfile.mkdtemp(prefix="big_ann_fbin_")
    path = os.path.join(d, "embeddings.fbin")
    FB.write_fbin_from_df(emb, path)
    back = FB.read_fbin_spark(spark, path)
    joined = emb.alias("a").join(back.alias("b"), F.col("a.id") == F.col("b.id"))
    stats = joined.select(
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col("a.vec").cast("array<double>"),
                    F.col("b.vec").cast("array<double>"),
                    lambda x, y: F.abs(x - y),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
            == 0.0,
            1,
        )
        .otherwise(0)
        .alias("exact"),
    )
    nvecs, dim = FB.read_header(path)
    return stats.agg(
        F.count("*").alias("n_roundtripped"),
        F.sum("exact").alias("n_exact"),
        F.lit(nvecs).alias("header_nvecs"),
        F.lit(dim).alias("header_dim"),
    )
