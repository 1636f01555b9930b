"""Text-analysis queries over the documents table (training-data
pipeline surface, BASELINE.json north star): token counting, quality
scoring, language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.functions import text as T
from big_ann_spark.operators import dedup as D
from big_ann_spark.queries import register

_SW = {lg: ", ".join(f"'{w}'" for w in ws) for lg, ws in T.STOPWORDS.items()}


@register(
    "text_metrics",
    sql=f"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS toks,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio
  FROM documents
),
s AS (
  SELECT doc_id, text, toks,
         punct_ratio,
         len(list_filter(toks, x -> list_contains([{_SW['en']}], x)))::DOUBLE / len(toks) AS sw
  FROM t
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish,
       length(text) AS n_chars,
       ROUND(0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
           + 0.3 * greatest(0.0, 1.0 - 4.0 * punct_ratio)
           + 0.3 * greatest(0.0, 1.0 - abs(sw - 0.4) / 0.4), 6) AS quality
FROM s
""",
)
def text_metrics(spark, sf_dir):
    """Token census + quality score per document, folded into one
    per-doc row: whitespace tokens, BPE-ish regex tokens, char count,
    and the composite quality score (length, punctuation noise,
    stopword naturalness — functions.text.quality_score for the
    contract). One scan, pure column expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpe_ish_token_count("text").alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
        F.round(T.quality_score("text"), 6).alias("quality"),
    )


@register(
    "language_id",
    sql=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> list_contains([{_SW['en']}], x)))::DOUBLE / len(toks) AS s_en,
         len(list_filter(toks, x -> list_contains([{_SW['es']}], x)))::DOUBLE / len(toks) AS s_es,
         len(list_filter(toks, x -> list_contains([{_SW['de']}], x)))::DOUBLE / len(toks) AS s_de,
         len(list_filter(toks, x -> list_contains([{_SW['fr']}], x)))::DOUBLE / len(toks) AS s_fr,
         len(list_filter(toks, x -> list_contains([{_SW['zh']}], x)))::DOUBLE / len(toks) AS s_zh
  FROM t
),
p AS (
  SELECT doc_id, lang,
         greatest(s_en, s_es, s_de, s_fr, s_zh) AS best,
         CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
              WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
              WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
              WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
              ELSE 'zh' END AS predicted_lang
  FROM s
)
SELECT predicted_lang, lang AS labeled_lang, COUNT(*) AS n_docs
FROM p GROUP BY predicted_lang, labeled_lang
""",
)
def language_id_q(spark, sf_dir):
    """Stopword-hit-rate language ID vs the labeled lang column —
    confusion-matrix counts."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            T.language_id("text").alias("predicted_lang"),
            F.col("lang").alias("labeled_lang"),
        )
        .groupBy("predicted_lang", "labeled_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "pipeline_clean_corpus",
    sql=f"""
WITH t AS (
  SELECT doc_id, source,
         string_split(text, ' ') AS toks,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
         text
  FROM documents
),
s AS (
  SELECT doc_id, source, text, len(toks) AS n_tokens,
         0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
       + 0.3 * greatest(0.0, 1.0 - 4.0 * punct_ratio)
       + 0.3 * greatest(0.0, 1.0 - abs(
           len(list_filter(toks, x -> list_contains([{_SW['en']}], x)))::DOUBLE / len(toks)
           - 0.4) / 0.4) AS quality
  FROM t
),
filtered AS (SELECT * FROM s WHERE quality >= 0.5),
deduped AS (
  SELECT min(doc_id) AS doc_id, min(source) AS source,
         min(n_tokens) AS n_tokens, min(quality) AS quality
  FROM filtered GROUP BY text
)
SELECT source,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_tokens), 4) AS avg_tokens,
       ROUND(AVG(quality), 6) AS avg_quality
FROM deduped GROUP BY source
""",
)
def pipeline_clean_corpus(spark, sf_dir):
    """North-star composite: the training-data cleaning pipeline as ONE
    declarative plan — quality scoring → threshold filter → exact dedup
    (min-id winner per text) → per-source corpus stats. Catalyst fuses
    the whole chain into a scan + two aggregates; at 100 TB this is the
    shape of a real corpus-prep job."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "text",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    )
    filtered = scored.filter(F.col("quality") >= 0.5)
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
        F.min("quality").alias("quality"),
    )
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


# n=8 gram folds: k = fold_j (k*cb + H[i+j]) % p over TWO independent
# (base, mod) pairs, combined as g1*mod2 + g2 — mirrors
# dedup.duplicate_ngram_spans' 64-bit key_at exactly
_GRAM8_A = "H[i]"
_GRAM8_B = "H2[i]"
for _j in range(1, 8):
    _GRAM8_A = f"({_GRAM8_A} % 1000000007 * 1000003 + H[i+{_j}])"
    _GRAM8_B = f"({_GRAM8_B} % 998244353 * 1000033 + H2[i+{_j}])"
_GRAM8_A += " % 1000000007"
_GRAM8_B += " % 998244353"

# position enumeration is derived from len(H) (lateral unnest of
# generate_series), NOT a fixed range cap — oracle coverage is
# unbounded in document length, matching the Spark side.
_FP_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 3, 1)], ' ')
  FROM documents
),
docs AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        w -> list_reduce(list_prepend(0::BIGINT,
                               list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                               (a, b) -> (a * 31 + b) % 1000000007)) AS H,
         list_transform(string_split(text, ' '),
                        w -> list_reduce(list_prepend(0::BIGINT,
                               list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                               (a, b) -> (a * 37 + b) % 998244353)) AS H2
  FROM corpus
),
posn AS (SELECT doc_id, H, H2,
                unnest(generate_series(1, greatest(len(H) - 7, 0)))::BIGINT AS i
         FROM docs),
g AS (SELECT doc_id, (i - 1)::BIGINT AS pos,
             ({_GRAM8_A}) * 998244353 + ({_GRAM8_B}) AS gram
      FROM posn),
c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram),
d AS (SELECT doc_id, pos AS s, pos + 8 AS e
      FROM g JOIN c USING (gram) WHERE cnt >= 2),
m AS (SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS brk
      FROM d),
isl AS (SELECT doc_id, s, e,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM m)
SELECT 'dup_span' AS variant, doc_id, MIN(s)::BIGINT AS v1, MAX(e)::BIGINT AS v2
FROM isl GROUP BY doc_id, island
UNION ALL
SELECT 'char_fp', doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007),
       0
FROM documents WHERE doc_id < 100
"""


@register("doc_fingerprint", sql=_FP_SQL)
def doc_fingerprint(spark, sf_dir):
    """Fingerprint-hash text surface, tagged union (schema (variant,
    doc_id, v1, v2)):
    - ``char_fp``: polynomial rolling-hash document fingerprint
      (char-level, mod 1e9+7) — identical left fold in both engines;
      v1 = fingerprint.
    - ``dup_span``: exact duplicated-substring spans at 8-token
      granularity (operators.dedup.duplicate_ngram_spans — the Lee et
      al. span-removal shape: gram-hash occurrence counts → interval
      merge per doc; the corpus is doubled with truncated copies so
      guaranteed duplicated spans exist). v1 = span begin, v2 = span
      end, in token positions."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.filter(F.col("doc_id") < 100).select(
        F.lit("char_fp").alias("variant"),
        "doc_id",
        T.char_fingerprint("text").alias("v1"),
        F.lit(0).cast("long").alias("v2"),
    )
    mutated = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(
            F.slice(
                F.split("text", " "),
                1,
                F.greatest(F.size(F.split("text", " ")) - 3, F.lit(1)),
            ),
            " ",
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").union(mutated)
    spans = D.duplicate_ngram_spans(corpus, n=8).select(
        F.lit("dup_span").alias("variant"),
        "doc_id",
        F.col("begin").alias("v1"),
        F.col("end").alias("v2"),
    )
    return spans.unionByName(fp)
