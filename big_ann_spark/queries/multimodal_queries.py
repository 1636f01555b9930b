"""Multimodal-column queries.

The media pipeline runs on binary payloads built deterministically from
the documents table (no image libs in the container — the codec is a
deterministic fake; the Spark plumbing is real, see
operators.multimodal). Both mapInPandas stages — the 64-byte frame
sampler and the Arrow feature extractor — are folded into ONE
oracle-checked query: the fake codec's byte-bucket histogram is kept
as raw integer counts (exact in float32), so DuckDB reproduces the
whole Arrow path from the text bytes. The fbin round-trip check lives
in sharding_queries.pipeline_invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import multimodal as MM
from big_ann_spark.queries import register


@register(
    "multimodal_pipeline",
    sql="""
WITH frames AS (
  SELECT 'frames' AS variant, doc_id,
         length(text)::BIGINT AS k,
         CAST(ceil(length(text) / 64.0) AS BIGINT) AS n
  FROM documents
),
chars AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
feat AS (
  SELECT 'feature_hist' AS variant, doc_id,
         (ascii(c) // 16)::BIGINT AS k, COUNT(*)::BIGINT AS n
  FROM chars GROUP BY 1, 2, 3
)
SELECT * FROM frames UNION ALL SELECT * FROM feat
""",
)
def multimodal_pipeline(spark, sf_dir):
    """Binary-column plumbing, oracle-checked end to end:
    - ``frames``: text bytes → binary media column → mapInPandas
      64-byte frame sampler → per-doc frame counts (= ceil(len/64));
    - ``feature_hist``: Arrow-batched feature extraction (deterministic
      fake codec, 16 byte-buckets, raw counts) → posexplode to
      (doc_id, bucket, count) scalar rows — integer-exact, so the
      driver hashes the actual mapInPandas output against DuckDB's
      character-class counts. Zero-count buckets are dropped to match
      the SQL group-by."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_media(docs)

    frames = (
        MM.frame_sample(media, every_n_bytes=64)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .join(media.select("doc_id", "media_len"), "doc_id")
        .select(
            F.lit("frames").alias("variant"),
            "doc_id",
            F.col("media_len").cast("long").alias("k"),
            F.col("n").cast("long").alias("n"),
        )
    )

    feats = MM.extract_features(media, normalize=False)
    hist = (
        feats.select(
            "doc_id", F.posexplode(F.col("features")).alias("bucket", "cnt")
        )
        .filter(F.col("cnt") > 0)
        .select(
            F.lit("feature_hist").alias("variant"),
            "doc_id",
            F.col("bucket").cast("long").alias("k"),
            F.col("cnt").cast("long").alias("n"),
        )
    )
    return frames.unionByName(hist)
