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
),
wf AS (
  SELECT doc_id, MAX(c) / SUM(c) AS max_word_frac
  FROM (SELECT doc_id, w, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w)
  GROUP BY doc_id
),
bf AS (
  SELECT doc_id, MAX(c) / SUM(c) AS top_bigram_frac
  FROM (SELECT doc_id, b, COUNT(*) AS c
        FROM (SELECT t.doc_id, t.toks[u.i] || ' ' || t.toks[u.i + 1] AS b
              FROM t, LATERAL unnest(generate_series(1, len(t.toks) - 1)) AS u(i))
        GROUP BY doc_id, b)
  GROUP BY doc_id
),
cnt AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
tot AS (SELECT SUM(c) AS T, COUNT(*) AS V FROM cnt),
lm AS (
  SELECT doc_id, AVG(ln((c + 1)::DOUBLE / (T + V))) AS lp
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  JOIN cnt USING (w) CROSS JOIN tot
  GROUP BY doc_id
),
-- Stupid Backoff trigram LM trained on the src0 slice, scored over
-- the whole corpus (CCNet's KenLM filter shape): per position the
-- cascade S3 = c3/cc3 | 0.4*(c2/cc2) | 0.16*(c1+1)/(T+V)
tr AS (SELECT list_concat(['<s>', '<s>'], string_split(text, ' ')) AS p
       FROM documents WHERE source = 'src0'),
trp AS (SELECT array_to_string(p[u.i-2:u.i], ' ') AS g3,
               array_to_string(p[u.i-1:u.i], ' ') AS g2,
               p[u.i] AS g1,
               array_to_string(p[u.i-2:u.i-1], ' ') AS x3,
               p[u.i-1] AS x2
        FROM tr, LATERAL unnest(generate_series(3, len(p))) AS u(i)),
c3 AS (SELECT g3 AS g, COUNT(*) AS c FROM trp GROUP BY 1),
c2 AS (SELECT g2 AS g, COUNT(*) AS c FROM trp GROUP BY 1),
c1 AS (SELECT g1 AS g, COUNT(*) AS c FROM trp GROUP BY 1),
x3c AS (SELECT x3 AS x, COUNT(*) AS cc FROM trp GROUP BY 1),
x2c AS (SELECT x2 AS x, COUNT(*) AS cc FROM trp GROUP BY 1),
sbtot AS (SELECT SUM(c) AS T, COUNT(*) AS V FROM c1),
ap AS (SELECT doc_id, list_concat(['<s>', '<s>'], string_split(text, ' ')) AS p
       FROM documents),
app AS (SELECT doc_id,
               array_to_string(p[u.i-2:u.i], ' ') AS g3,
               array_to_string(p[u.i-1:u.i], ' ') AS g2,
               p[u.i] AS g1,
               array_to_string(p[u.i-2:u.i-1], ' ') AS x3,
               p[u.i-1] AS x2
        FROM ap, LATERAL unnest(generate_series(3, len(p))) AS u(i)),
sbsc AS (
  SELECT app.doc_id, ln(
    CASE WHEN c3.c IS NOT NULL THEN c3.c::DOUBLE / x3c.cc
         WHEN c2.c IS NOT NULL THEN 0.4 * (c2.c::DOUBLE / x2c.cc)
         ELSE 0.4 * 0.4 * (COALESCE(c1.c, 0) + 1)::DOUBLE / (T + V) END) AS lp
  FROM app
  LEFT JOIN c3 ON app.g3 = c3.g
  LEFT JOIN c2 ON app.g2 = c2.g
  LEFT JOIN c1 ON app.g1 = c1.g
  LEFT JOIN x3c ON app.x3 = x3c.x
  LEFT JOIN x2c ON app.x2 = x2c.x
  CROSS JOIN sbtot
),
lmsb AS (SELECT doc_id, ROUND(AVG(lp), 6) AS lp_sb FROM sbsc GROUP BY 1),
sbthr AS (SELECT quantile_cont(lp_sb, 0.7) AS hi, quantile_cont(lp_sb, 0.3) AS lo
          FROM lmsb),
lmb AS (SELECT doc_id, lp_sb,
               CASE WHEN lp_sb >= hi THEN 'head'
                    WHEN lp_sb < lo THEN 'tail'
                    ELSE 'middle' END AS ppl_bucket
        FROM lmsb CROSS JOIN sbthr)
SELECT s.doc_id,
       len(toks) AS n_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish,
       length(text) AS n_chars,
       ROUND(0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
           + 0.3 * greatest(0.0, 1.0 - 4.0 * punct_ratio)
           + 0.3 * greatest(0.0, 1.0 - abs(sw - 0.4) / 0.4), 6) AS quality,
       ROUND(wf.max_word_frac, 6) AS max_word_frac,
       ROUND(COALESCE(bf.top_bigram_frac, 0.0), 6) AS top_bigram_frac,
       ROUND(lm.lp, 6) AS lp_per_token,
       lmb.lp_sb,
       lmb.ppl_bucket
FROM s JOIN wf ON s.doc_id = wf.doc_id
LEFT JOIN bf ON s.doc_id = bf.doc_id
JOIN lm ON s.doc_id = lm.doc_id
JOIN lmb ON s.doc_id = lmb.doc_id
""",
)
def text_metrics(spark, sf_dir):
    """Token census + quality score per document, folded into one
    per-doc row: whitespace tokens, BPE-ish regex tokens, char count,
    the composite quality score (length, punctuation noise, stopword
    naturalness — functions.text.quality_score for the contract), and
    the Gopher-style repetition signals (max_word_frac /
    top_bigram_frac — functions.text.repetition_metrics: explode →
    two-level hash agg, linear in tokens), and the CCNet-style
    unigram-LM score (lp_per_token — functions.text.unigram_logprob:
    vocabulary-sized LM aggregate broadcast to the scoring join), plus
    the real CCNet filter shape: a Stupid-Backoff trigram LM trained
    on the src0 slice scoring every document (lp_sb) and the
    head/middle/tail perplexity bucket (ppl_bucket) cut at exact
    30/70 percentiles (operators.ngram_lm — one corpus shuffle to
    train, vocabulary-sized broadcast joins to score). The scalar
    columns stay one scan of pure column expressions; the
    repetition/LM joins key on doc_id."""
    from big_ann_spark.operators.ngram_lm import (
        ccnet_buckets,
        score_stupid_backoff,
        train_ngram_lm,
    )

    from big_ann_spark.queries import spread_input

    d = load_table(spark, sf_dir, "documents")
    # r14 (guide §2.5): the one-file corpus scan is a single task, and
    # base/rep/lm/sb all tokenize inside it — spread once (skipped when
    # the scan already splits wide); the four consumers share the
    # exchange via ReusedExchange. Per-doc rows and aggregates only —
    # placement-invariant.
    d = spread_input(d, spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpe_ish_token_count("text").alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
        F.round(T.quality_score("text"), 6).alias("quality"),
    )
    rep = T.repetition_metrics(d)
    lm = T.unigram_logprob(d)
    sb_lm = train_ngram_lm(d.filter(F.col("source") == "src0"), order=3)
    sb = ccnet_buckets(
        score_stupid_backoff(d, sb_lm).withColumn("lp_sb", F.round("lp_sb", 6)),
        head_frac=0.3,
        tail_frac=0.3,
    )
    return (
        base.join(rep, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .join(sb, "doc_id", "left")
        .select(
            base["*"],
            F.round("max_word_frac", 6).alias("max_word_frac"),
            F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
            F.round("lp_per_token", 6).alias("lp_per_token"),
            "lp_sb",
            "ppl_bucket",
        )
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


# ---- pipeline_clean_corpus: the full pretraining-prep composite as a
# tagged union, one stage per variant (VERDICT r5 #2/#7 — the r5 ops
# get oracle-checked driver rows WITHOUT new registry entries):
#   redact    — PII match census on the (synthetically injected) corpus
#   clean     — redact → quality filter → exact dedup, per-source stats
#   sample    — + deterministic hash_sample(0.5, salt=1)
#   mix       — + token_budget_mix (pinned weights/budget, salt=2)
#   tmix      — + temperature_mix (DATA-derived n^alpha source weights,
#               alpha=0.5, salt=6; the T5/UNIMAX sampling rule — the
#               oracle re-derives the weights in SQL via pow())
#   bpe       — + BPE segmentation of the sampled set (PINNED 8-merge
#               table applied as rank-order codegen folds — the JVM
#               equivalent of bpe_segment, equality unit-tested)
#   bpe_train — the 8-merge table trained on the raw corpus, certified
#               by an unrolled argmax+apply CTE chain in DuckDB
# Every stage is plain arithmetic/regex, so DuckDB reproduces the whole
# pipeline bit-for-bit. Schema: (variant, key, n, v1, v2).

_PIN_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
]  # bpe_train(documents@sf0.01, 8, mode="driver") — pinned constant
_MIX_WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0, "nosuch": 1.0}
_MIX_TOTAL = 1500
_TMIX_TOTAL = 1200
_TMIX_ALPHA = 0.5


def _ha_s(salt: int) -> int:
    """The _stable_hash multiplier for this salt — ``_HA^(salt+1) mod
    _HP`` (see dedup._stable_hash: per-salt multipliers are what make
    chained salted selections independent), including its degeneracy
    fallback (a_s == 1 → the salt-0 multiplier) so the mirror stays
    exact for every salt."""
    a_s = pow(_HA, salt + 1, _HP)
    return a_s if a_s != 1 else _HA % _HP
_HP = 2_147_483_647  # dedup.MINHASH_P — the hash_sample modulus
_HA = 2_654_435_761


def _pipeline_sql() -> str:
    from big_ann_spark.functions.text import (
        C4_BAD_WORDS,
        C4_MIN_SENTENCES,
        C4_MIN_WORDS_PER_LINE,
        PII_PATTERNS,
    )

    qual = (
        "0.4 * least(len(string_split(red, ' '))::DOUBLE / 100.0, 1.0)\n"
        "       + 0.3 * greatest(0.0, 1.0 - 4.0 *"
        " (length(regexp_replace(red, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(red)))\n"
        "       + 0.3 * greatest(0.0, 1.0 - abs("
        "len(list_filter(string_split(red, ' '), x -> list_contains(["
        + _SW["en"]
        + "], x)))::DOUBLE / len(string_split(red, ' ')) - 0.4) / 0.4)"
    )
    red_expr = "text"
    for k in PII_PATTERNS:
        red_expr = (
            f"regexp_replace({red_expr}, '{PII_PATTERNS[k]}', '<{k.upper()}>', 'g')"
        )
    pii_union = "\nUNION ALL\n".join(
        f"SELECT '{k}' AS key,"
        f" coalesce(sum(len(regexp_extract_all(text, '{p}'))), 0)::BIGINT AS n,"
        f" (count(*) FILTER (WHERE len(regexp_extract_all(text, '{p}')) > 0))::DOUBLE AS v1"
        " FROM inj"
        for k, p in PII_PATTERNS.items()
    )
    th_half = int(0.5 * _HP)
    w_sum = sum(_MIX_WEIGHTS.values())
    real_srcs = [s for s in _MIX_WEIGHTS if s != "nosuch"]
    frac_case = " ".join(
        f"WHEN '{s}' THEN least(1.0, ({float(_MIX_TOTAL)} * ({_MIX_WEIGHTS[s]} / {w_sum})) / tot)"
        for s in real_srcs
    )
    tgt_case = " ".join(
        f"WHEN '{s}' THEN {float(int(_MIX_TOTAL * (_MIX_WEIGHTS[s] / w_sum)))}"
        for s in real_srcs
    )
    src_list = ", ".join(f"'{s}'" for s in real_srcs)
    # per-word BPE token count: symbols as a chr(31)-framed string
    # (outer single, inner double separators), merges applied in rank
    # order by left-to-right non-overlapping replace — exactly the
    # greedy-leftmost fold
    rep = (
        "chr(31) || array_to_string(list_append(string_split(w, ''), '</w>'),"
        " chr(31)||chr(31)) || chr(31)"
    )
    for a, b in _PIN_MERGES:
        rep = (
            f"replace({rep}, chr(31)||'{a}'||chr(31)||chr(31)||'{b}'||chr(31),"
            f" chr(31)||'{a}{b}'||chr(31))"
        )
    ntok = (
        f"len(string_split(substring({rep}, 2, length({rep}) - 2),"
        " chr(31)||chr(31)))"
    )
    # unrolled trainer stages: pairs -> argmax (n desc, a, b) -> apply
    train_ctes = []
    train_rows = []
    prev = "v0"
    for k in range(1, len(_PIN_MERGES) + 1):
        train_ctes.append(
            f"""l{k} AS MATERIALIZED (SELECT string_split(substring(s, 2, length(s) - 2), chr(31)||chr(31)) AS l, freq FROM {prev}),
p{k} AS MATERIALIZED (SELECT l[i] AS a, l[i+1] AS b, sum(freq) AS n
         FROM (SELECT l, freq, unnest(generate_series(1, greatest(len(l) - 1, 0)))::BIGINT AS i FROM l{k})
         GROUP BY 1, 2),
b{k} AS MATERIALIZED (SELECT a, b FROM p{k} WHERE n >= 2 ORDER BY n DESC, a, b LIMIT 1),
v{k} AS MATERIALIZED (SELECT replace(s,
           coalesce(chr(31)||(SELECT a FROM b{k})||chr(31)||chr(31)||(SELECT b FROM b{k})||chr(31), chr(30)),
           coalesce(chr(31)||(SELECT a FROM b{k})||(SELECT b FROM b{k})||chr(31), chr(30))) AS s, freq
      FROM {prev})"""
        )
        train_rows.append(
            f"SELECT 'bpe_train' AS variant, a || '->' || b AS key,"
            f" {k}::BIGINT AS n, 0.0 AS v1, 0.0 AS v2 FROM b{k}"
        )
        prev = f"v{k}"
    train_ctes_sql = ",\n".join(train_ctes)
    train_rows_sql = "\nUNION ALL\n".join(train_rows)
    # C4 fixture: sentence-structure injection (every 10 words becomes a
    # terminal-punctuated line) + page-drop triggers on disjoint doc_id
    # residues; first-match-wins CASE mirrors the Spark when-chain
    bad_re = "|".join(rf"\b{w}\b" for w in C4_BAD_WORDS)
    keep_line = (
        "regexp_matches(trim(l), '[.!?\"]$')"
        " AND len(regexp_extract_all(trim(l), '\\S+')) >= "
        f"{C4_MIN_WORDS_PER_LINE}"
        " AND NOT regexp_matches(lower(trim(l)), 'javascript')"
    )
    c4_ctes = f"""
c4src AS (
  SELECT doc_id, source,
         regexp_replace(text, '((\\S+ ){{9}}\\S+) ', '\\1.' || chr(10), 'g') AS st
  FROM documents
),
c4inj AS (
  SELECT doc_id, source, CASE
     WHEN doc_id % 11 = 0 THEN st || chr(10) || 'lorem ipsum dolor sit amet okay.'
     WHEN doc_id % 13 = 3 THEN st || chr(10) || 'curly {{ brace line with words.'
     WHEN doc_id % 7 = 0 THEN st || chr(10) || 'this javascript line would be dropped anyway.'
     WHEN doc_id % 17 = 5 THEN st || chr(10) || 'a badword line with enough words.'
     ELSE st END AS st
  FROM c4src
),
c4pages AS (
  SELECT doc_id, source, st,
         array_to_string(list_transform(
           list_filter(string_split(st, chr(10)), l -> {keep_line}),
           l -> trim(l)), chr(10)) AS kept,
         len(list_filter(string_split(st, chr(10)), l -> {keep_line})) AS nk,
         len(regexp_extract_all(st, '\\S+')) AS nt_all
  FROM c4inj
),
c4flag AS (
  SELECT *,
         (len(regexp_extract_all(kept, '[.!?\"]')) < {C4_MIN_SENTENCES}
          OR contains(lower(st), 'lorem ipsum')
          OR contains(st, '{{')
          OR regexp_matches(lower(st), '{bad_re}')) AS dropped
  FROM c4pages
)"""
    c4_row = f"""
SELECT 'c4', source, (count(*) FILTER (WHERE NOT dropped))::BIGINT,
       coalesce(sum(nk) FILTER (WHERE NOT dropped), 0)::DOUBLE,
       ROUND(coalesce(sum(len(regexp_extract_all(kept, '\\S+')))
                        FILTER (WHERE NOT dropped), 0)::DOUBLE
             / sum(nt_all), 6)
FROM c4flag GROUP BY source"""
    return f"""
WITH inj AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact u' || doc_id || '@example.com ref ' || (7000000 + doc_id * 7)
              ELSE text END AS text
  FROM documents
),
pii AS ({pii_union}),
redtbl AS MATERIALIZED (SELECT doc_id, source, {red_expr} AS red FROM inj),
scored AS MATERIALIZED (
  SELECT doc_id, source, red,
         len(string_split(red, ' ')) AS n_tokens,
         {qual} AS quality
  FROM redtbl
),
filtered AS (SELECT * FROM scored WHERE quality >= 0.5),
deduped AS MATERIALIZED (
  SELECT min(doc_id) AS doc_id, min(source) AS source,
         min(n_tokens) AS n_tokens, min(quality) AS quality, red
  FROM filtered GROUP BY red
),
sampled AS MATERIALIZED (
  SELECT * FROM deduped
  WHERE ((doc_id % {_HP} + 1) % {_HP} * {_ha_s(1)}) % {_HP} < {th_half}
),
tok_totals AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM sampled GROUP BY source),
mixf AS (SELECT source, tot,
                CASE source {frac_case} END AS frac,
                CASE source {tgt_case} END AS target
         FROM tok_totals WHERE source IN ({src_list})),
mixed AS (SELECT s.*, m.frac, m.target
          FROM sampled s JOIN mixf m USING (source)
          WHERE ((s.doc_id % {_HP} + 2) % {_HP} * {_ha_s(2)}) % {_HP}
                < CAST(trunc(m.frac * {_HP}) AS BIGINT)),
tmixws AS (SELECT sum(pow(tot, {_TMIX_ALPHA})) AS ws FROM tok_totals),
tmixf AS (SELECT source, tot,
                 least(1.0, ({_TMIX_TOTAL} * (pow(tot, {_TMIX_ALPHA}) / ws)) / tot) AS frac,
                 CAST(trunc({_TMIX_TOTAL} * (pow(tot, {_TMIX_ALPHA}) / ws)) AS BIGINT) AS target
          FROM tok_totals, tmixws),
tmixed AS (SELECT s.*, m.target
           FROM sampled s JOIN tmixf m USING (source)
           WHERE ((s.doc_id % {_HP} + 6) % {_HP} * {_ha_s(6)}) % {_HP}
                 < CAST(trunc(m.frac * {_HP}) AS BIGINT)),
pack AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM deduped
),
capped AS (
  SELECT source, doc_id, n_tokens FROM (
    SELECT source, doc_id, n_tokens,
           row_number() OVER (PARTITION BY source
             ORDER BY ((doc_id % {_HP} + 3) % {_HP} * {_ha_s(3)}) % {_HP}, doc_id) AS rk
    FROM deduped)
  WHERE rk <= 100
),
dsw AS MATERIALIZED (
  SELECT doc_id, source, n_tokens,
         list_transform(string_split(red, ' '),
           w -> list_reduce(list_prepend(0::BIGINT,
                  list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                  (a, b) -> (a * 31 + b) % 1000000007) % 256) AS bs
  FROM deduped
),
drc AS (SELECT b, count(*)::BIGINT AS cr
        FROM (SELECT unnest(bs) AS b FROM dsw) GROUP BY b),
dtc AS (SELECT b, count(*)::BIGINT AS ct
        FROM (SELECT unnest(bs) AS b FROM dsw WHERE source = 'src0') GROUP BY b),
dtot AS (SELECT (SELECT coalesce(sum(ct), 0) FROM dtc) AS tt,
                (SELECT coalesce(sum(cr), 0) FROM drc) AS tr),
dlam AS (
  SELECT g.b AS b,
         ln((coalesce(ct, 0) + 1)::DOUBLE / (tt + 256))
           - ln((coalesce(cr, 0) + 1)::DOUBLE / (tr + 256)) AS lam
  FROM (SELECT unnest(generate_series(0, 255))::BIGINT AS b) g
  LEFT JOIN dtc USING (b) LEFT JOIN drc USING (b) CROSS JOIN dtot
),
dlarr AS (SELECT list(lam ORDER BY b) AS lam_arr FROM dlam),
dscore AS (
  SELECT doc_id, n_tokens,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(bs, b -> lam_arr[b + 1])), (a, x) -> a + x) AS logw
  FROM dsw CROSS JOIN dlarr
),
dsel AS (
  SELECT doc_id, n_tokens, logw,
         logw + (-ln(-ln(
           (((doc_id % {_HP} + 4) % {_HP} * {_ha_s(4)}) % {_HP} + 0.5) / {_HP}
         ))) AS gk
  FROM dscore
  ORDER BY gk DESC, doc_id LIMIT 40
),
-- dsir2: hashed n-gram (uni+bi) feature space — same model/selection
-- machinery over the wider bucket array (word pairs hashed as the
-- space-joined string, appended after the unigrams in doc order)
dsw2 AS MATERIALIZED (
  SELECT doc_id, source, n_tokens,
         list_transform(
           list_concat(ws, list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i + 1])),
           w -> list_reduce(list_prepend(0::BIGINT,
                  list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
                  (a, b) -> (a * 31 + b) % 1000000007) % 256) AS bs
  FROM (SELECT doc_id, source, n_tokens, string_split(red, ' ') AS ws
        FROM deduped)
),
drc2 AS (SELECT b, count(*)::BIGINT AS cr
         FROM (SELECT unnest(bs) AS b FROM dsw2) GROUP BY b),
dtc2 AS (SELECT b, count(*)::BIGINT AS ct
         FROM (SELECT unnest(bs) AS b FROM dsw2 WHERE source = 'src0') GROUP BY b),
dtot2 AS (SELECT (SELECT coalesce(sum(ct), 0) FROM dtc2) AS tt,
                 (SELECT coalesce(sum(cr), 0) FROM drc2) AS tr),
dlam2 AS (
  SELECT g.b AS b,
         ln((coalesce(ct, 0) + 1)::DOUBLE / (tt + 256))
           - ln((coalesce(cr, 0) + 1)::DOUBLE / (tr + 256)) AS lam
  FROM (SELECT unnest(generate_series(0, 255))::BIGINT AS b) g
  LEFT JOIN dtc2 USING (b) LEFT JOIN drc2 USING (b) CROSS JOIN dtot2
),
dlarr2 AS (SELECT list(lam ORDER BY b) AS lam_arr FROM dlam2),
dscore2 AS (
  SELECT doc_id, n_tokens,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(bs, b -> lam_arr[b + 1])), (a, x) -> a + x) AS logw
  FROM dsw2 CROSS JOIN dlarr2
),
dsel2 AS (
  SELECT doc_id, n_tokens, logw,
         logw + (-ln(-ln(
           (((doc_id % {_HP} + 4) % {_HP} * {_ha_s(4)}) % {_HP} + 0.5) / {_HP}
         ))) AS gk
  FROM dscore2
  ORDER BY gk DESC, doc_id LIMIT 40
),
bpe_docs AS (
  SELECT source,
         coalesce(list_sum(list_transform(
           list_filter(string_split(red, ' '), w -> w != ''),
           w -> {ntok})), 0)::BIGINT AS n_bpe
  FROM sampled
),
w0 AS (SELECT w, count(*)::BIGINT AS freq
       FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w FROM documents)
       GROUP BY w),
v0 AS MATERIALIZED (SELECT chr(31) || array_to_string(list_append(string_split(w, ''), '</w>'), chr(31)||chr(31)) || chr(31) AS s, freq FROM w0),
{c4_ctes},
{train_ctes_sql}
SELECT 'redact' AS variant, key, n, v1, 0.0 AS v2 FROM pii
UNION ALL
SELECT 'clean', source, COUNT(*)::BIGINT, ROUND(AVG(n_tokens), 4), ROUND(AVG(quality), 6)
FROM deduped GROUP BY source
UNION ALL
SELECT 'sample', source, COUNT(*)::BIGINT, SUM(n_tokens)::DOUBLE, 0.0
FROM sampled GROUP BY source
UNION ALL
SELECT 'mix', source, COUNT(*)::BIGINT, SUM(n_tokens)::DOUBLE, ANY_VALUE(target)
FROM mixed GROUP BY source
UNION ALL
SELECT 'tmix', source, COUNT(*)::BIGINT, SUM(n_tokens)::DOUBLE, ANY_VALUE(target)
FROM tmixed GROUP BY source
UNION ALL
SELECT 'bpe', source, COUNT(*)::BIGINT, SUM(n_bpe)::DOUBLE, ROUND(AVG(n_bpe), 6)
FROM bpe_docs GROUP BY source
UNION ALL
SELECT 'pack', doc_id::VARCHAR, n_tokens::BIGINT,
       floor(off / 256)::DOUBLE,
       floor((off + greatest(n_tokens - 1, 0)) / 256)::DOUBLE
FROM pack
UNION ALL
SELECT 'cap', source, COUNT(*)::BIGINT, SUM(doc_id)::DOUBLE, SUM(n_tokens)::DOUBLE
FROM capped GROUP BY source
UNION ALL
SELECT 'dsir', doc_id::VARCHAR, n_tokens::BIGINT, ROUND(logw, 6), ROUND(gk, 6)
FROM dsel
UNION ALL
SELECT 'dsir2', doc_id::VARCHAR, n_tokens::BIGINT, ROUND(logw, 6), ROUND(gk, 6)
FROM dsel2
UNION ALL
SELECT 'shards',
       ((((doc_id % {_HP} + 5) % {_HP} * {_ha_s(5)}) % {_HP}) % 8)::VARCHAR,
       COUNT(*)::BIGINT, SUM(n_tokens)::DOUBLE, SUM(doc_id)::DOUBLE
FROM deduped GROUP BY 2
UNION ALL
{c4_row}
UNION ALL
{train_rows_sql}
"""


@register("pipeline_clean_corpus", sql=_pipeline_sql())
def pipeline_clean_corpus(spark, sf_dir):
    """North-star composite: the pretraining-data prep pipeline as ONE
    tagged-union plan, each stage certified by the same DuckDB oracle —
    PII redaction (functions.text.redact_pii; the corpus gets a
    deterministic synthetic PII suffix on every 5th doc so the patterns
    have real work) → quality scoring + threshold filter → exact dedup
    (min-id winner per redacted text) → deterministic
    ``hash_sample(0.5)`` → ``token_budget_mix`` (pinned weights incl. a
    missing source) → BPE segmentation of the sampled set with the
    PINNED 8-merge table applied as rank-order codegen folds (the
    JVM-side equivalent of ``bpe_segment``, equality unit-tested) —
    plus the 8-merge ``bpe_train`` table itself (driver-local path),
    and concat-and-chunk sequence packing of the deduped set into
    256-token training windows (operators.packing.pack_sequences —
    ranged two-pass prefix sum, no global window; per-doc placement
    rows), a Dolma-style per-source document cap
    (operators.dedup.cap_per_source: keep ≤100 docs per source by the
    content-stable hash rank — WindowGroupLimit, per-task state is the
    cap; the ``cap`` variant's doc_id/token sums certify the exact
    survivor set), plus C4-style heuristic cleaning (Raffel et al.
    2020 §2.2,
    functions.text.c4_clean: line retention by terminal punctuation /
    >=5 words / no-javascript, page drops for <3 sentences, 'lorem
    ipsum', '{{', pinned bad words — per-source kept-page counts, kept
    lines and token-retention ratio as the ``c4`` variant; the corpus
    gets deterministic sentence structure injected so every rule has
    real work), DSIR importance resampling
    (operators.importance.dsir_resample: hashed-unigram importance
    weights toward the src0 slice + deterministic Gumbel top-k — the
    ``dsir`` variant's per-doc weight/key rows certify the exact
    selected set; ``dsir2`` repeats the selection under the paper's
    hashed n-gram (uni+bi) feature space, where word order is signal), and the deterministic training-shard layout
    (operators.packing.assign_training_shards: content-stable hash mod
    8 — the ``shards`` variant's per-shard doc/token/id sums certify
    the exact membership).
    All stages are column expressions; the only driver-side pieces are
    token_budget_mix's per-source fraction map and the collected
    distinct-word vocab, both contractually tiny."""
    from big_ann_spark.operators import bpe as BP
    from big_ann_spark.operators.dedup import hash_sample

    from big_ann_spark.queries import spread_input

    d = load_table(spark, sf_dir, "documents")
    # spread the corpus BEFORE the regex-dense per-row work (r14, guide
    # §2.5): a one-file corpus scans as ONE task, so redact/score/
    # pii_counts/c4/tokenize all ran single-core in the scan stage; the
    # round-robin spread is skipped automatically once the scan itself
    # splits wide (spread_input). Every consumer below is an aggregate
    # or content-keyed rank — placement-invariant.
    d = spread_input(d, spark, sf_dir, "documents")
    inj = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com ref "),
                (F.lit(7000000) + F.col("doc_id") * 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def b_redact():
        cnts = T.pii_counts("text")
        aggs = []
        for k in T.PII_PATTERNS:
            aggs.append(F.sum(cnts[k]).alias(f"{k}_n"))
            aggs.append(F.count(F.when(cnts[k] > 0, F.lit(1))).alias(f"{k}_d"))
        stack_args = ", ".join(f"'{k}', {k}_n, {k}_d" for k in T.PII_PATTERNS)
        return (
            inj.agg(*aggs)
            .select(
                F.expr(
                    f"stack({len(T.PII_PATTERNS)}, {stack_args}) as (key, n, d)"
                )
            )
            .select(
                F.lit("redact").alias("variant"),
                "key",
                F.col("n").cast("long").alias("n"),
                F.col("d").cast("double").alias("v1"),
                F.lit(0.0).alias("v2"),
            )
        )

    scored = inj.select(
        "doc_id",
        "source",
        T.redact_pii("text").alias("red"),
    ).select(
        "doc_id",
        "source",
        "red",
        T.token_count("red").alias("n_tokens"),
        T.quality_score("red").alias("quality"),
    )
    # six variant branches (clean/pack/cap/sample/mix/bpe) fan out from
    # this table: checkpoint it so the regex-heavy redact -> score ->
    # dedup lineage runs ONCE instead of once per branch (the regexes
    # dominate the composite's wall; measured ~2x on the bench entry)
    from big_ann_spark.operators.importance import doc_buckets

    # _bs: the DSIR feature array, hashed ONCE here (the char-level
    # poly hash is dsir's dominant cost; materializing it in the same
    # checkpoint turns 3 hash passes — raw counts, target counts,
    # scoring — into 1)
    # repartition before the bucket hashing (r14 optimization): AQE
    # coalesces the tiny post-dedup shuffle to ONE partition, which
    # serialized the char-level polynomial folds of _bs/_bs2 onto a
    # single task (guide §2.5 "synthetic partitioning"); a round-robin
    # spread runs them in parallel. Width is SIZE-DERIVED, not the raw
    # session parallelism (r14 re-measure): ~one task per 64 KB of the
    # source corpus file, capped at the session parallelism — a width
    # grid at sf0.1 put exec at 1.87-1.94 s for 8 tasks vs 2.47-2.91 s
    # for 32 (per-task overhead beats the spread past the basin), and
    # the cap keeps real corpora cores-wide. Row placement does not
    # affect any downstream aggregate.
    # scale guard (r15, VERDICT r14 #2): the spread exists to break the
    # ONE-task shape AQE's byte-coalescing gives the tiny post-dedup
    # shuffle at toy scale. Once the source corpus splits into >= width
    # scan tasks, the deduped shuffle output is AQE-sized to many
    # advisory-byte partitions anyway and a cores-capped repartition
    # would COLLAPSE it — so the width is None and the spread skipped.
    from big_ann_spark.queries import spread_width_if_narrow

    _spread = spread_width_if_narrow(spark, sf_dir)

    # r14: the localCheckpoint CALL is not free even with eager=False —
    # on an AQE plan, Dataset.checkpoint's physicalPlan.execute()
    # materializes every upstream query stage synchronously (measured
    # 0.8-2.4 s of the build's critical path: the redact/score regex +
    # dedup shuffle run INSIDE the call). Build the checkpointed table
    # on the background pool instead: the main thread keeps
    # constructing the corpus-side branches (redact/c4/bpe) while the
    # checkpoint's stages run, and deduped-dependent branches resolve
    # the future from inside build_concurrently's pool. Same plan, same
    # checkpoint, same single materialization — only the wall-clock
    # interleaving changes (guide §2.6).
    def _make_deduped():
        dd = (
            scored.filter(F.col("quality") >= 0.5)
            .groupBy("red")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min("source").alias("source"),
                F.min("n_tokens").alias("n_tokens"),
                F.min("quality").alias("quality"),
            )
        )
        if _spread is not None:
            dd = dd.repartition(_spread)
        return (
            dd.withColumn("_bs", doc_buckets("red", 256))
            .withColumn("_bs2", doc_buckets("red", 256, ngram=2))
            .localCheckpoint(eager=False)
        )
    def b_clean():
        deduped = _deduped()
        return (
            deduped.groupBy("source")
            .agg(
                F.count("*").alias("n"),
                F.round(F.avg("n_tokens"), 4).alias("v1"),
                F.round(F.avg("quality"), 6).alias("v2"),
            )
            .select(
                F.lit("clean").alias("variant"),
                F.col("source").alias("key"),
                "n",
                "v1",
                "v2",
            )
        )

    def b_pack():
        deduped = _deduped()
        from big_ann_spark.operators.packing import pack_sequences

        return pack_sequences(deduped, 256, tokens_col="n_tokens").select(
            F.lit("pack").alias("variant"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("n_tokens").alias("n"),
            F.col("window_start").cast("double").alias("v1"),
            F.col("window_end").cast("double").alias("v2"),
        )

    def b_cap():
        deduped = _deduped()
        from big_ann_spark.operators.dedup import cap_per_source

        return (
            cap_per_source(deduped, 100, salt=3)
            .groupBy("source")
            .agg(
                F.count("*").alias("n"),
                F.sum("doc_id").cast("double").alias("v1"),
                F.sum("n_tokens").cast("double").alias("v2"),
            )
            .select(
                F.lit("cap").alias("variant"),
                F.col("source").alias("key"),
                "n",
                "v1",
                "v2",
            )
        )

    from big_ann_spark.operators.importance import dsir_resample
    from big_ann_spark.operators.packing import assign_training_shards

    # DSIR importance resampling: select the 40 deduped docs that look
    # most like the src0 slice under hashed-unigram (256-bucket)
    # importance weights + deterministic Gumbel top-k (salt 4)
    def b_dsir():
        deduped = _deduped()
        return dsir_resample(
            deduped,
            None,
            40,
            text_col="red",
            n_buckets=256,
            salt=4,
            bucket_col="_bs",
            target_pred=F.col("source") == "src0",
        ).select(
            F.lit("dsir").alias("variant"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("n_tokens").alias("n"),
            F.round("log_weight", 6).alias("v1"),
            F.round("gumbel_key", 6).alias("v2"),
        )

    # dsir2: the paper's hashed n-gram (uni+bi) feature space — same
    # 256-bucket model + Gumbel top-k over the wider feature array
    # (precomputed as _bs2 in the same checkpoint)
    def b_dsir2():
        deduped = _deduped()
        return dsir_resample(
            deduped,
            None,
            40,
            text_col="red",
            n_buckets=256,
            salt=4,
            bucket_col="_bs2",
            target_pred=F.col("source") == "src0",
        ).select(
            F.lit("dsir2").alias("variant"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("n_tokens").alias("n"),
            F.round("log_weight", 6).alias("v1"),
            F.round("gumbel_key", 6).alias("v2"),
        )

    # deterministic global-shuffle shard assignment (salt 5, 8 shards):
    # per-shard doc/token/id sums certify the exact membership
    def b_shards():
        deduped = _deduped()
        return (
            assign_training_shards(deduped, 8, salt=5)
            .groupBy("shard")
            .agg(
                F.count("*").alias("n"),
                F.sum("n_tokens").cast("double").alias("v1"),
                F.sum("doc_id").cast("double").alias("v2"),
            )
            .select(
                F.lit("shards").alias("variant"),
                F.col("shard").cast("string").alias("key"),
                "n",
                "v1",
                "v2",
            )
        )

    # r14 overlap (guide §2.6): the checkpoint chain (deduped →
    # hash_sample → temperature_mix's per-source totals collect, whose
    # first action also materializes the lazy checkpoint) and
    # bpe_train's vocab collect run on background threads, concurrent
    # with the branch construction below. Results are identical: the
    # same plans, the same jobs, the same collected values — only the
    # wall-clock interleaving changes.
    from concurrent.futures import ThreadPoolExecutor

    from big_ann_spark.operators.dedup import mix_source_totals

    _pool = ThreadPoolExecutor(2)

    def _ck_chain():
        dd = _make_deduped()
        sp = hash_sample(dd, 0.5, salt=1)
        return dd, sp, mix_source_totals(sp, text_col="red", source_col="source")

    _chain = _pool.submit(_ck_chain)
    fut_merges = _pool.submit(BP.bpe_train, d, len(_PIN_MERGES), mode="driver")

    def _deduped():
        return _chain.result()[0]

    def _sampled():
        return _chain.result()[1]

    def b_sampled_family():
        # r15 (VERDICT r14 #3): the sample/mix/tmix/bpe variants were
        # FOUR independent groupBy("source") subtrees over the same
        # checkpointed `sampled` table — four scans, four
        # partial+final aggregate exchange pairs, four union branches
        # of AQE micro-jobs. They fuse into ONE conditional aggregate:
        # the mix/tmix selections are broadcast hash-threshold
        # predicates (never windows), so each variant's rows are
        # `when(hash < thresh)` conditions inside a single pass, and a
        # stack() fans the per-source aggregate back out to the four
        # variant rows. Every aggregate is computed over the identical
        # row set with the identical expression as the unfused
        # branches (mix/tmix tables come from the same *_mix_table
        # builders token_budget_mix/temperature_mix themselves use;
        # the v2 target is constant per source so max == first) —
        # proven by the unchanged oracle hash. Sources with zero
        # selected rows produced no group in the unfused mix/tmix
        # aggregates; the n > 0 filter reproduces that exactly
        # (sample/bpe groups always have n >= 1 by construction).
        from big_ann_spark.operators.dedup import (
            mix_hash,
            temperature_mix_rows,
            token_budget_mix_rows,
        )

        sampled = _sampled()
        # literal when() lookups (r15 follow-up): the background chain
        # already collected the per-source token totals — the SAME
        # sums both mix tables derive from — and the mix contract
        # keeps sources driver-tiny, so the per-source thresholds and
        # targets inline as literal CASE chains on the selection scan.
        # Zero joins, zero broadcast stages, no in-plan aggregate
        # gating the CPU-dense n_bpe projection (a lazy-totals
        # broadcast form measured +1.4 s, a literal-broadcast-join
        # form +0.6 s: the broadcast builds sat on the heavy stage's
        # critical path). A NULL source matches no when() arm -> NULL,
        # exactly the left-join-miss semantics.
        mrows = token_budget_mix_rows(
            _MIX_WEIGHTS, _MIX_TOTAL, _chain.result()[2]
        )
        trows = temperature_mix_rows(
            _TMIX_TOTAL, alpha=_TMIX_ALPHA, totals=_chain.result()[2]
        )

        def _lookup(rows, idx, dtype):
            expr = F.lit(None).cast(dtype)
            for r in rows:
                expr = F.when(F.col("source") == F.lit(r[0]), F.lit(r[idx])).otherwise(expr)
            return expr

        end_arr = F.array(F.lit(BP.END))

        def seg_count(w):
            expr = F.concat(F.split(w, ""), end_arr)
            for a, b in _PIN_MERGES:
                expr = BP._merge_fold(a, b)(expr)
            return F.size(expr)

        words = F.filter(F.split("red", " "), lambda w: w != "")
        n_bpe = F.aggregate(
            F.transform(words, seg_count), F.lit(0), lambda acc, x: acc + x
        )
        rows = sampled.select(
            "source",
            "n_tokens",
            n_bpe.alias("_nb"),
            (mix_hash("doc_id", 2) < _lookup(mrows, 1, "long")).alias("_ms"),
            (mix_hash("doc_id", 6) < _lookup(trows, 1, "long")).alias("_ts"),
            _lookup(mrows, 2, "long").alias("_m_target"),
            _lookup(trows, 2, "long").alias("_t_target"),
        )
        agg = rows.groupBy("source").agg(
            F.count("*").alias("sample_n"),
            F.sum("n_tokens").cast("double").alias("sample_v1"),
            F.count(F.when(F.col("_ms"), 1)).alias("mix_n"),
            F.sum(F.when(F.col("_ms"), F.col("n_tokens")))
            .cast("double")
            .alias("mix_v1"),
            F.max("_m_target").cast("double").alias("mix_v2"),
            F.count(F.when(F.col("_ts"), 1)).alias("tmix_n"),
            F.sum(F.when(F.col("_ts"), F.col("n_tokens")))
            .cast("double")
            .alias("tmix_v1"),
            F.max("_t_target").cast("double").alias("tmix_v2"),
            F.sum("_nb").cast("double").alias("bpe_v1"),
            F.round(F.avg("_nb"), 6).alias("bpe_v2"),
        )
        return (
            agg.select(
                F.col("source").alias("key"),
                F.expr(
                    "stack(4, "
                    "'sample', sample_n, sample_v1, cast(0.0 as double), "
                    "'mix', mix_n, mix_v1, mix_v2, "
                    "'tmix', tmix_n, tmix_v1, tmix_v2, "
                    "'bpe', sample_n, bpe_v1, bpe_v2"
                    ") as (variant, n, v1, v2)"
                ),
            )
            .filter(F.col("n") > 0)
            .select("variant", "key", "n", "v1", "v2")
        )

    # C4 heuristic cleaning over the same corpus with deterministic
    # sentence-structure injection (functions.text.c4_clean; the CASE
    # chain mirrors the oracle's first-match-wins residues)
    def b_c4():
        struct_text = F.regexp_replace("text", r"((\S+ ){9}\S+) ", "$1.\n")
        c4doc = d.select(
            "source",
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(struct_text, F.lit("\nlorem ipsum dolor sit amet okay.")),
            )
            .when(
                F.col("doc_id") % 13 == 3,
                F.concat(struct_text, F.lit("\ncurly { brace line with words.")),
            )
            .when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    struct_text, F.lit("\nthis javascript line would be dropped anyway.")
                ),
            )
            .when(
                F.col("doc_id") % 17 == 5,
                F.concat(struct_text, F.lit("\na badword line with enough words.")),
            )
            .otherwise(struct_text)
            .alias("st"),
        )
        c4 = T.c4_clean("st")
        c4pages = c4doc.select(
            "source",
            c4["kept_text"].alias("kept"),
            c4["n_lines_kept"].alias("nk"),
            c4["drop_page"].alias("dropped"),
            F.size(F.regexp_extract_all("st", F.lit(r"\S+"), 0)).alias("nt_all"),
        )
        return (
            c4pages.groupBy("source")
            .agg(
                F.count(F.when(~F.col("dropped"), 1)).alias("n"),
                F.sum(F.when(~F.col("dropped"), F.col("nk")).otherwise(0))
                .cast("double")
                .alias("v1"),
                F.round(
                    F.sum(
                        F.when(
                            ~F.col("dropped"),
                            F.size(F.regexp_extract_all("kept", F.lit(r"\S+"), 0)),
                        ).otherwise(0)
                    ).cast("double")
                    / F.sum("nt_all"),
                    6,
                ).alias("v2"),
            )
            .select(
                F.lit("c4").alias("variant"),
                F.col("source").alias("key"),
                "n",
                "v1",
                "v2",
            )
        )

    # r14: the branch families above are independent plans over the
    # shared inj/deduped/sampled tables — build them on a thread pool
    # (build_concurrently: identical plans, overlapped py4j round trips;
    # this construction measured ~3 s serialized at sf0.1). The two
    # eager collects (fut_totals/fut_merges) were already in flight.
    # r15: sample/mix/tmix/bpe are ONE fused branch (b_sampled_family).
    from big_ann_spark.queries import build_concurrently

    (
        redact_rows, clean_rows, sampled_family_rows,
        pack_rows, cap_rows, dsir_rows, dsir2_rows,
        shard_rows, c4_rows,
    ) = build_concurrently(
        b_redact, b_clean, b_sampled_family,
        b_pack, b_cap, b_dsir, b_dsir2, b_shards, b_c4,
    )

    merges = fut_merges.result()
    _pool.shutdown(wait=False)
    train_rows = spark.createDataFrame(
        [(f"{a}->{b}", i + 1) for i, (a, b) in enumerate(merges)],
        "key string, n long",
    ).select(
        F.lit("bpe_train").alias("variant"),
        "key",
        "n",
        F.lit(0.0).alias("v1"),
        F.lit(0.0).alias("v2"),
    )

    return (
        redact_rows.unionByName(clean_rows)
        .unionByName(sampled_family_rows)
        .unionByName(pack_rows)
        .unionByName(cap_rows)
        .unionByName(dsir_rows)
        .unionByName(dsir2_rows)
        .unionByName(shard_rows)
        .unionByName(c4_rows)
        .unionByName(train_rows)
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
        FROM m),
-- line-level dedup fixture: 10-token windows of the raw docs as
-- synthetic "lines" (the fixture is single-line); lns/ltot shared by
-- the line_strip (CCNet boilerplate cap) and line_first (RefinedWeb
-- keep-first paragraph dedup) variants below
lin AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
lns AS (SELECT doc_id, u.i AS ln,
               array_to_string(toks[(u.i-1)*10+1 : u.i*10], ' ') AS line
        FROM lin, LATERAL unnest(generate_series(1, (len(toks)+9)//10)) AS u(i)),
ltot AS (SELECT doc_id, COUNT(*) AS nl FROM lns GROUP BY 1),
lcnt AS (SELECT line, COUNT(*) AS c FROM lns GROUP BY 1),
lkeep AS (SELECT l.doc_id, l.ln, l.line
          FROM lns l JOIN lcnt c USING (line) WHERE c.c <= 3),
lreb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS t,
                COUNT(*) AS nk
         FROM lkeep GROUP BY 1),
lrk AS (SELECT doc_id, ln, line,
               row_number() OVER (PARTITION BY line ORDER BY doc_id, ln) AS rn
        FROM lns),
lreb2 AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS t,
                 COUNT(*) AS nk
          FROM lrk WHERE rn = 1 GROUP BY 1)
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
UNION ALL
-- decontam: distinct 8-gram overlap of each train doc (doc_id % 13 <> 0)
-- against the benchmark split (doc_id % 13 = 0); raw docs only (the
-- doubled corpus above is dup_span's fixture, not decontam's)
SELECT 'decontam', doc_id, n_matched, n_grams FROM (
  WITH rg AS (
    SELECT DISTINCT doc_id, ({_GRAM8_A}) * 998244353 + ({_GRAM8_B}) AS gram
    FROM (SELECT doc_id, H, H2,
                 unnest(generate_series(1, greatest(len(H) - 7, 0)))::BIGINT AS i
          FROM docs WHERE doc_id < 100000)
  ),
  bg AS (SELECT DISTINCT gram FROM rg WHERE doc_id % 13 = 0)
  SELECT d.doc_id,
         COUNT(t.gram)::BIGINT AS n_grams,
         COUNT(b.gram)::BIGINT AS n_matched
  FROM documents d
  LEFT JOIN rg t ON t.doc_id = d.doc_id
  LEFT JOIN bg b ON b.gram = t.gram
  WHERE d.doc_id % 13 <> 0
  GROUP BY d.doc_id
)
UNION ALL
-- strip: the Lee et al. ACTION — every duplicated-gram occurrence
-- except the globally-first is masked; v1 = char fold of '#'||cleaned
-- text (sentinel avoids empty-string split divergence), v2 = tokens
-- removed; every corpus doc gets a row
SELECT 'strip', doc_id, v1, v2 FROM (
  WITH ranked AS (
    SELECT doc_id, pos, gram,
           row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
    FROM g
  ),
  lose AS (SELECT doc_id, pos AS s, pos + 8 AS e FROM ranked WHERE rn > 1),
  lm AS (SELECT doc_id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS brk
         FROM lose),
  lisl AS (SELECT doc_id, s, e,
                  SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM lm),
  lmerged AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e
              FROM lisl GROUP BY doc_id, island),
  tok AS (SELECT c.doc_id, c.toks[t.i] AS w, t.i - 1 AS i0, t.i AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus) c,
               LATERAL unnest(generate_series(1, len(c.toks))) AS t(i)),
  keptt AS (SELECT t.doc_id, t.i, t.w FROM tok t
            LEFT JOIN lmerged m
              ON m.doc_id = t.doc_id AND t.i0 >= m.s AND t.i0 < m.e
            WHERE m.doc_id IS NULL),
  cleant AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS ct,
                    count(*) AS nk
             FROM keptt GROUP BY doc_id)
  SELECT c0.doc_id,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(string_split('#' || COALESCE(cl.ct, ''), ''),
                          ch -> ascii(ch)::BIGINT)),
           (a, b) -> (a * 31 + b) % 1000000007) AS v1,
         (len(string_split(c0.text, ' ')) - COALESCE(cl.nk, 0))::BIGINT AS v2
  FROM corpus c0 LEFT JOIN cleant cl USING (doc_id)
)
UNION ALL
-- line_strip: CCNet boilerplate cap — drop lines seen > 3 times
-- corpus-wide; v1 certifies the exact rebuilt text, v2 = lines removed
SELECT 'line_strip', ltot.doc_id,
       list_reduce(list_prepend(0::BIGINT,
         list_transform(string_split('#' || COALESCE(lreb.t, ''), ''),
                        ch -> ascii(ch)::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007),
       (ltot.nl - COALESCE(lreb.nk, 0))::BIGINT
FROM ltot LEFT JOIN lreb USING (doc_id)
UNION ALL
-- line_first: keep-first paragraph dedup — each distinct line survives
-- only at its globally-first (doc_id, ln) occurrence
SELECT 'line_first', ltot.doc_id,
       list_reduce(list_prepend(0::BIGINT,
         list_transform(string_split('#' || COALESCE(lreb2.t, ''), ''),
                        ch -> ascii(ch)::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007),
       (ltot.nl - COALESCE(lreb2.nk, 0))::BIGINT
FROM ltot LEFT JOIN lreb2 USING (doc_id)
UNION ALL
-- chunk: overlapping token-window chunking (chunk=24, overlap=8,
-- stride=16) — v1 certifies each chunk's exact text (char fold of
-- '#'||chunk), v2 = chunk index
SELECT 'chunk', doc_id,
       list_reduce(list_prepend(0::BIGINT,
         list_transform(string_split('#' || ct, ''), ch -> ascii(ch)::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007),
       ci::BIGINT
FROM (
  WITH ctoks AS (SELECT doc_id, string_split(text, ' ') AS toks,
                        len(string_split(text, ' ')) AS n
                 FROM documents),
  cidx AS (SELECT doc_id, toks, n,
                  unnest(generate_series(0,
                    greatest(1, cast(floor((n - 8 + 15) / 16.0) AS INT)) - 1
                  )) AS ci
           FROM ctoks)
  SELECT doc_id, ci,
         array_to_string(
           list_slice(toks, ci * 16 + 1, least(ci * 16 + 24, n)), ' '
         ) AS ct
  FROM cidx
)
UNION ALL
-- chunk_pack: chunk -> pack end-to-end — every chunk's OFFSET in the
-- packed token stream (exclusive prefix sum of chunk token counts in
-- (doc_id, chunk_index) key order; key = doc_id*1024 + index) and its
-- last ctx=64 training window. Hash equality certifies TOKEN
-- CONSERVATION across the chunk->pack composition: any lost or
-- duplicated chunk token shifts every later offset.
SELECT 'chunk_pack', key, off::BIGINT,
       ((off + greatest(nt - 1, 0)) // 64)::BIGINT
FROM (
  WITH ptoks AS (SELECT doc_id, len(string_split(text, ' ')) AS n
                 FROM documents),
  pidx AS (SELECT doc_id, n,
                  unnest(generate_series(0,
                    greatest(1, cast(floor((n - 8 + 15) / 16.0) AS INT)) - 1
                  )) AS ci
           FROM ptoks),
  pch AS (SELECT doc_id * 1024 + ci AS key, least(24, n - ci * 16) AS nt
          FROM pidx)
  SELECT key, nt,
         COALESCE(SUM(nt) OVER (ORDER BY key
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM pch
)
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
      end, in token positions.
    - ``decontam``: benchmark-decontamination census
      (operators.dedup.benchmark_contamination, the GPT-3/PaLM
      n-gram-overlap shape) — docs with doc_id % 13 == 0 act as the
      held-out benchmark, every other doc is train; v1 = distinct
      8-grams matched in the benchmark set, v2 = total distinct
      8-grams (zero-gram short docs included with 0/0).
    - ``strip``: the span-removal ACTION
      (operators.dedup.strip_duplicate_spans) — all but the
      globally-first occurrence of each duplicated 8-gram masked out;
      v1 = char fingerprint of '#'+cleaned text (the hash certifies
      the exact surviving text), v2 = tokens removed.
    - ``line_strip`` / ``line_first``: line-level dedup
      (operators/lines.py — CCNet's stage-1 boilerplate cap at
      count > 3, and RefinedWeb keep-first paragraph dedup), over
      10-token windowed "lines" (the fixture is single-line); v1 =
      char fingerprint of '#'+rebuilt text, v2 = lines removed.
    - ``chunk``: overlapping token-window chunking
      (operators.packing.chunk_documents, the RAG-ingest primitive —
      chunk=24, overlap=8): one row per chunk, v1 = char fingerprint
      of '#'+chunk text (certifies every chunk's exact content and
      boundaries), v2 = chunk index.
    - ``chunk_pack``: the chunk→pack COMPOSITION (chunk_documents →
      pack_sequences over the chunks' token counts, ctx=64, keyed by
      doc_id·1024+chunk_index): v1 = the chunk's offset in the packed
      stream, v2 = its last training window. The offsets are a global
      prefix sum, so the hash match certifies token conservation
      end-to-end — any chunk token lost or duplicated between the two
      stages shifts every later offset (VERDICT r11 #8)."""
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
    contam = D.benchmark_contamination(
        d.filter(F.col("doc_id") % 13 != 0),
        d.filter(F.col("doc_id") % 13 == 0),
        n=8,
    ).select(
        F.lit("decontam").alias("variant"),
        "doc_id",
        F.col("n_matched").alias("v1"),
        F.col("n_grams").alias("v2"),
    )
    strip_rows = D.strip_duplicate_spans(corpus, n=8).select(
        F.lit("strip").alias("variant"),
        "doc_id",
        T.char_fingerprint(F.concat(F.lit("#"), F.col("text"))).alias("v1"),
        F.col("n_removed").alias("v2"),
    )
    from big_ann_spark.operators.lines import (
        dedup_lines_keep_first,
        strip_boilerplate_lines,
        windowed_lines,
    )

    wl = windowed_lines(d, words_per_line=10)

    def _line_rows(rebuilt, tag):
        return rebuilt.select(
            F.lit(tag).alias("variant"),
            F.col("id").alias("doc_id"),
            T.char_fingerprint(F.concat(F.lit("#"), F.col("text"))).alias("v1"),
            F.col("n_removed").cast("long").alias("v2"),
        )

    line_strip = _line_rows(
        strip_boilerplate_lines(wl, max_count=3), "line_strip"
    )
    line_first = _line_rows(dedup_lines_keep_first(wl), "line_first")
    from big_ann_spark.operators.packing import chunk_documents

    chunked = chunk_documents(d, chunk_tokens=24, overlap=8).localCheckpoint(eager=False)
    chunks = chunked.select(
        F.lit("chunk").alias("variant"),
        "doc_id",
        T.char_fingerprint(F.concat(F.lit("#"), F.col("chunk_text"))).alias("v1"),
        F.col("chunk_index").cast("long").alias("v2"),
    )
    from big_ann_spark.operators.packing import pack_sequences

    chunk_units = chunked.select(
        (F.col("doc_id") * 1024 + F.col("chunk_index")).alias("doc_id"),
        "n_tokens",
    )
    chunk_pack = pack_sequences(chunk_units, 64, tokens_col="n_tokens").select(
        F.lit("chunk_pack").alias("variant"),
        "doc_id",
        F.col("offset").alias("v1"),
        F.col("window_end").alias("v2"),
    )
    return (
        spans.unionByName(fp)
        .unionByName(contam)
        .unionByName(strip_rows)
        .unionByName(line_strip)
        .unionByName(line_first)
        .unionByName(chunks)
        .unionByName(chunk_pack)
    )
