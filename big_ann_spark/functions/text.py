"""Text-analysis scalar functions for the training-data-pipeline
surface (BASELINE.json north star): tokenization, quality scoring,
language ID, fingerprinting, shingling.

All native column expressions (split/filter/transform/aggregate) —
JVM-side, no Python in the hot path. Deterministic arithmetic only, so
every function has an exact DuckDB oracle equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; deliberately small + deterministic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row and hand it to ``fn`` as a bound
    lambda variable (one-element ``transform``). This is the
    optimizer-proof materialization point for an expensive array
    expression consumed repeatedly: a projected alias gets INLINED into
    every downstream reference (even across explode boundaries — see
    SCALE.md "Measured pitfalls", a measured 70× blowup), and HOF
    lambdas have no common-subexpression elimination, so without the
    binding an O(len) subexpression referenced per position costs
    O(len²) per row."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and
    individual other non-space chars (a BPE-flavored regex census)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    t = tokens(text)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.size(t)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters outside [a-z0-9 ] (lowercase corpora)."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, "[a-z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(c)


def mean_token_length(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t)


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards
    mid-length documents, low punctuation noise, and a natural stopword
    rate. Deterministic; the exact formula is the contract."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c).cast("double")
    len_score = F.least(n / 100.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), 1.0 - 4.0 * punct_ratio(c))
    sw = stopword_ratio(c, "en")
    sw_score = F.greatest(F.lit(0.0), 1.0 - F.abs(sw - 0.4) / 0.4)
    return 0.4 * len_score + 0.3 * punct_pen + 0.3 * sw_score


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword hit-rate scores."""
    t = tokens(text)
    out = {}
    for lang, sw in STOPWORDS.items():
        out[lang] = F.size(F.filter(t, lambda x: x.isin(*sw))).cast("double") / F.size(t)
    return out


def language_id(text: Column | str) -> Column:
    """Argmax language over stopword hit rates; 'und' when no stopword
    from any list occurs. Ties break in STOPWORDS declaration order."""
    scores = language_scores(text)
    langs = list(scores)
    best = F.greatest(*[scores[lg] for lg in langs])
    expr = F.lit("und")
    # build reversed CASE so earlier languages win ties
    for lg in reversed(langs):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def poly_hash(
    text: Column | str, base: int = FINGERPRINT_BASE, mod: int = FINGERPRINT_MOD
) -> Column:
    """Parameterized polynomial rolling hash over characters: left
    fold, init 0, ``h = (h*base + codepoint) % mod`` — bit-identical to
    DuckDB's ``list_reduce`` with a prepended 0, which is what makes
    hash-dependent pipelines (fingerprints, MinHash, SimHash) exactly
    reproducible by the SQL oracle. ``mod`` must keep ``h*base + c``
    under 2^63."""
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for URL-keyed dedup — the cheap pre-pass crawl
    pipelines run BEFORE content dedup (two fetches of one page differ
    only in tracking params / scheme / case / trailing slash far more
    often than in bytes). Pure regexp column expressions, one scan:

    1. strip the scheme (http/https) and a leading ``www.``;
    2. lowercase the host (path case is significant per RFC 3986 and is
       preserved);
    3. drop known tracking query params (utm_*, gclid, fbclid, ref) and
       then an emptied ``?``;
    4. drop the fragment and the PATH's trailing slash (a slash ending
       a query-parameter value is content-addressing and survives).

    Deliberately conservative: no param re-ordering, no percent-decode
    — those change semantics on real sites; this removes only noise
    that provably does not address different content."""
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")
    c = F.regexp_replace(c, r"^[Ww]{3}\.", "")
    # lowercase ONLY the host part (up to the first / ? or #)
    host = F.lower(F.regexp_extract(c, r"^([^/?#]*)", 1))
    rest = F.regexp_replace(c, r"^[^/?#]*", "")
    c = F.concat(host, rest)
    c = F.regexp_replace(c, r"#.*$", "")
    # rebuild the query from its surviving params (array ops, not
    # positional regex surgery — dropping the FIRST param must not
    # leave a dangling '&' where the '?' belongs)
    base = F.regexp_extract(c, r"^([^?]*)", 1)
    params = F.split(F.regexp_extract(c, r"\?(.*)$", 1), "&")
    kept_params = F.filter(
        params,
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="),
    )
    newq = F.array_join(kept_params, "&")
    # trailing-slash strip applies to the PATH only — a query-parameter
    # value ending in '/' (?next=/admin/) addresses different content
    # and must survive
    base = F.regexp_replace(base, r"/+$", "")
    return F.when(newq == "", base).otherwise(F.concat(base, F.lit("?"), newq))


def char_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over characters, mod 1e9+7 — the
    document-fingerprinting primitive."""
    return poly_hash(text)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """All n-word shingles (space-joined) of the document — the MinHash
    / Jaccard dedup unit. Documents shorter than n words yield an empty
    array. The token array is bound once (``bind_once``) so the
    per-position slice doesn't re-split the document O(len) times."""
    return bind_once(
        tokens(text),
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


# ---- PII-style pattern redaction (corpus-prep hygiene): pure
# regexp_replace/regexp_count column expressions — codegen, zero
# Python, one scan when composed. Patterns are the standard corpus-
# cleaning shapes (emails, URLs, long digit runs ~ phone/account
# numbers, IPv4); redaction inserts stable placeholder tokens so
# downstream tokenization/dedup stay deterministic.

PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "digits": r"\b\d{7,}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """{kind: count-of-matches} per row for every PII pattern."""
    c = F.col(text) if isinstance(text, str) else text
    return {k: F.regexp_count(c, F.lit(p)) for k, p in PII_PATTERNS.items()}


def redact_pii(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with ``<KIND>`` placeholders, applied in
    PII_PATTERNS order (email/url before the bare digit-run pattern so
    digits inside them are consumed by the more specific rule first)."""
    out = F.col(text) if isinstance(text, str) else text
    for k in kinds or list(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


# ---- C4-style heuristic cleaning (Raffel et al. 2020 §2.2, the
# public C4 rule set re-expressed as column expressions): line-level
# retention + page-level drops. Zero Python in the hot path — one
# split/filter/join per document — and every rule is deterministic
# regex/arithmetic, so a DuckDB oracle reproduces the filter exactly.
# The bad-word list is a deliberately tiny pinned placeholder (the real
# C4 uses an external public list; the CONTRACT — page dropped when any
# listed word appears as a token — is what matters here).

C4_BAD_WORDS = ["badword", "unsafeword"]
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3
_C4_TERMINAL = r'[.!?"]$'


def c4_keep_line(line: Column) -> Column:
    """C4 line-retention predicate on a trimmed line: ends in terminal
    punctuation (. ! ? \"), has >= 5 words, and does not mention
    'javascript' (case-insensitive)."""
    t = F.trim(line)
    return (
        t.rlike(_C4_TERMINAL)
        & (F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0)) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(t).rlike("javascript")
    )


def c4_clean(text: Column | str) -> dict[str, Column]:
    """Apply the C4 page pipeline to a newline-delimited document.
    Returns columns:

    - ``kept_text``: newline-join of retained (trimmed) lines
    - ``n_lines`` / ``n_lines_kept``: line census
    - ``n_sentences``: terminal-punctuation marks in the kept text (>= 1
      per kept line by construction; mid-line sentence breaks count too)
    - ``drop_page``: page-level drop — fewer than 3 sentences after
      line filtering, contains 'lorem ipsum' (case-insensitive),
      contains '{', or contains a pinned bad word as a whole token
    """
    c = F.col(text) if isinstance(text, str) else text
    lines = F.split(c, "\n")
    kept = F.transform(F.filter(lines, c4_keep_line), lambda x: F.trim(x))
    kept_text = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(kept_text, F.lit(r'[.!?"]'), 0)
    )
    bad = F.lit(False)
    for w in C4_BAD_WORDS:
        bad = bad | F.lower(c).rlike(rf"\b{w}\b")
    drop = (
        (n_sentences < C4_MIN_SENTENCES)
        | F.lower(c).contains("lorem ipsum")
        | c.contains("{")
        | bad
    )
    return {
        "kept_text": kept_text,
        "n_lines": F.size(lines),
        "n_lines_kept": F.size(kept),
        "n_sentences": n_sentences,
        "drop_page": drop,
    }


def repetition_metrics(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 quality rules, re-expressed relationally): one row per doc —

    - ``max_word_frac``: occurrences of the most frequent token / total
      tokens (Gopher drops docs where any single word dominates).
    - ``top_bigram_frac``: occurrences of the most frequent token
      2-gram / total 2-grams; 0.0 for single-token docs.

    Unlike the scalar helpers above this is a DataFrame op: per-doc
    mode-frequency needs a group-by, not an array fold. Both metrics
    are explode → two-level hash aggregation (the per-dim-entropy
    pattern): map-side partial aggregation reduces each partition to
    its distinct (doc, term) pairs before any shuffle, every stage is
    linear in token count, and no step materializes a per-doc
    vocabulary in one task — so a 100k-token document costs the same
    per token as a 100-token one (an array-expression
    distinct×filter formulation would be quadratic in doc vocabulary).
    MAX(c)/SUM(c) folds the denominator into the same aggregate.
    NULL-text docs (whose explode emits nothing) are restored by a
    left join from the id set with 0.0 metrics — the output is a total
    function of ``docs``."""
    toks = tokens(text_col)
    ids = docs.select(F.col(id_col).alias("doc_id"))
    words = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("w"))
    wf = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("max_word_frac"))
    )
    bigram_arr = bind_once(
        toks,
        # sequence(1, 0) DESCENDS in Spark — guard single-token docs
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    bigrams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(bigram_arr).alias("b")
    )
    bf = (
        bigrams.groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    return (
        ids.join(wf, "doc_id", "left")
        .join(bf, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("max_word_frac", F.lit(0.0)).alias("max_word_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def unigram_logprob(docs, *, id_col: str = "doc_id", text_col: str = "text",
                    lm_docs=None, broadcast_lm: bool = True):
    """CCNet-style language-model quality signal, with a unigram LM in
    place of the KenLM 5-gram: score every document by the mean
    log-probability of its tokens under an add-one-smoothed unigram
    model trained on ``lm_docs`` (default: the scored corpus itself —
    self-perplexity). Low scores mark gibberish / rare-token documents,
    high scores mark repetitive boilerplate; real pipelines bucket on
    this (CCNet keeps head/middle by perplexity). Returns (doc_id,
    lp_per_token) where lp = ln((c(w)+1)/(T+V)) averaged over the
    doc's tokens; unseen tokens get the smoothed floor ln(1/(T+V)).

    Scale shape: the LM is ONE aggregate over the exploded LM corpus
    whose result is vocabulary-sized (language-bounded, ~1e6 rows at
    any corpus size for real words; pass ``broadcast_lm=False`` for a
    shuffle join when the raw token vocabulary is inflated by
    typos/numbers beyond broadcast comfort) → broadcast to the
    scoring join; the scoring side
    explodes once and the single shuffle is the per-doc mean keyed on
    doc_id (map-side partial). Token probabilities are plain
    arithmetic, so a SQL oracle reproduces the score exactly (mod the
    usual ROUND-6 float-sum tolerance)."""
    lm = lm_docs if lm_docs is not None else docs
    lm_toks = lm.select(F.explode(tokens(text_col)).alias("w"))
    counts = lm_toks.groupBy("w").agg(F.count("*").alias("c"))
    # T and V are scalars of a tiny aggregate — fold them in as a
    # broadcast-joined single row to keep the plan lazy (no collect)
    totals = counts.agg(
        F.sum("c").alias("_T"), F.count("*").alias("_V")
    )
    scored = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens(text_col)).alias("w"))
        .join(F.broadcast(counts) if broadcast_lm else counts, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("_T") + F.col("_V")).cast("double")
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(F.avg("_lp").alias("lp_per_token"))
    # NULL-text docs emit no tokens; restore them (lp NULL — there is
    # no principled score for an absent document body)
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left")
