"""Deduplication queries (training-data pipeline surface): exact,
n-gram Jaccard, MinHash-LSH, SimHash, embedding-cosine near-dup.

The driver corpus has no exact duplicates, so the exact-dedup query
doubles the corpus deterministically (ids shifted by 100000) in both
engines to exercise the duplicate path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import dedup as D
from big_ann_spark.queries import register


@register(
    "dedup_exact",
    sql="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
)
SELECT min(doc_id) AS kept_doc_id, count(*) AS n_copies
FROM corpus GROUP BY text
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup (hash-groupBy, min-id winner) on the doubled corpus."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.union(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return D.exact_dedup(corpus)


@register(
    "ngram_jaccard_top_pairs",
    sql="""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
       FROM docs, range(1, 2000) t(i) WHERE i <= len(toks) - 2),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY doc_a, doc_b),
j AS (SELECT doc_a, doc_b,
             n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard
FROM j ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20
""",
)
def ngram_jaccard_top_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard via shingle inverted index; top-20 most
    similar pairs (deterministic tie-break on ids)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_similarity_pairs(d)
    return (
        pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )


@register(
    "embedding_near_dup",
    sql="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i]))
           / (a.nrm * b.nrm) AS cosine
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
FROM p WHERE cosine >= 0.45
""",
)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (threshold 0.45 — the
    synthetic blobs top out near 0.51; real near-dup corpora use
    ~0.95 with the same plan)."""
    e = load_table(spark, sf_dir, "embeddings")
    out = D.embedding_near_dup_pairs(e, threshold=0.45)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register("minhash_lsh_near_dup", sql=None)
def minhash_lsh_near_dup(spark, sf_dir):
    """MinHash(32) + LSH(8 bands × 4 rows) near-dup candidates verified
    by exact Jaccard ≥ 0.3, on a corpus doubled with truncated copies
    (guaranteed true near-dups). Rows-only driver check — the xxhash64
    shingle hashing has no DuckDB equivalent; tests/test_dedup.py
    asserts candidate recall vs exact Jaccard instead."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # truncated copies: drop the last 3 words → high-but-<1 Jaccard twins
    mutated = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, F.greatest(F.size(F.split("text", " ")) - 3, F.lit(1))), " ").alias("text"),
    )
    corpus = d.union(mutated)
    return D.minhash_dedup_pairs(corpus, threshold=0.3)


@register("simhash_fingerprints", sql=None)
def simhash_fingerprints(spark, sf_dir):
    """64-bit SimHash fingerprints per document (rows-only check:
    xxhash64 token hashing is Spark-specific; semantics tested in
    tests/test_dedup.py via Hamming-distance properties)."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash64(d)
