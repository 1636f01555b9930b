"""Deduplication operators for the training-data-pipeline surface:
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design (the point of each variant):

- ``exact_dedup``: groupBy on the text hash — one shuffle keyed by a
  64-bit hash, not the full text; keeps the winner by min id.
- ``jaccard_similarity_pairs``: exact n-gram Jaccard via a shingle
  inverted index (explode → self equi-join on shingle → per-pair
  intersection counts). Cost is Σ_shingle df(shingle)² — fine when no
  shingle is hot; hot shingles are exactly what MinHash bands avoid.
- ``minhash_signatures`` + ``lsh_candidate_pairs``: the 100 TB path.
  k permutation-style hashes ``(a_j·x + b_j) mod p`` over shingle
  hashes; signatures banded so only same-bucket docs ever meet in the
  join. Candidate pairs then verified with exact Jaccard.
- ``simhash64``: 64-bit sign-sum fingerprint over token hashes;
  near-dups = small Hamming distance.
- ``embedding_near_dup_pairs``: cosine-threshold self-join over the
  embeddings table (brute force; IVF/LSH variants in operators.ann).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_ann_spark.functions.text import word_shingles
from big_ann_spark.functions.vector import cosine_similarity

# deterministic MinHash parameters (public LSH construction: k universal
# hashes (a*x+b) mod p over shingle hashes, banded for candidate gen).
# p = 2^31-1 (Mersenne prime); coefficients reduced below 2^30 so that
# a·x stays under 2^62 for 32-bit shingle hashes (ANSI-safe, no overflow)
MINHASH_P = (1 << 31) - 1
_RAW_A = [
    2971215073, 1540483477, 2654435761, 2246822519, 3266489917,
    668265263, 374761393, 3123456791, 2850387313, 1979339339,
    1203793171, 2428391977, 3443216233, 1853730341, 2764369111,
    987654323, 1122334455, 2233445567, 3344556679, 1456789123,
    2567891239, 3678912349, 1789123457, 2891234561, 3912345677,
    1023456789, 2134567891, 3245678903, 1356789011, 2467890121,
    3578901233, 1689012341,
]
_RAW_B = [
    1737352183, 2971215073, 1540483477, 668265263, 374761393,
    2654435761, 2246822519, 3266489917, 1979339339, 2850387313,
    2428391977, 1203793171, 1853730341, 3443216233, 987654323,
    2764369111, 2233445567, 1122334455, 1456789123, 3344556679,
    3678912349, 2567891239, 2891234561, 1789123457, 1023456789,
    3912345677, 3245678903, 2134567891, 2467890121, 1356789011,
    1689012341, 3578901233,
]
_A = [(v % (1 << 30)) | 1 for v in _RAW_A]
_B = [v % MINHASH_P for v in _RAW_B]


def exact_dedup(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the lowest-id copy of each distinct text.
    Returns (kept doc id, n_copies). Groups on ``xxhash64(text)`` so the
    shuffle key is 8 bytes; the min-id winner rule makes output
    deterministic."""
    return (
        docs.groupBy(F.xxhash64(F.col(text_col)).alias("_h"))
        .agg(
            F.min(id_col).alias("kept_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("_h")
    )


def doc_shingles(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) distinct exploded shingle table. The dedup is
    ``array_distinct`` BEFORE the explode — per-row, inside the scan
    stage, instead of a global ``.distinct()`` shuffle; (doc_id,
    shingle) uniqueness is a per-document property, so the results are
    identical and the operator costs zero shuffles."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"),
    )


def doc_shingle_keys(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    word_base: int = 31,
    combine_base: int = 1_000_003,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """(doc_id, shingle: long) — HASHED n-gram shingle keys, built by
    hashing each word once (polynomial char fold mod ``mod``) and
    combining the n word hashes per shingle: ``k = fold (k*combine_base
    + H[i+j]) % mod``. Compared to hashing the shingle *string*
    (``doc_shingles`` + a char fold), this does ~n× less interpreted
    lambda work and every downstream join keys on 8 bytes instead of a
    string — while staying exactly reproducible in DuckDB (same two
    folds). Hash collisions merge distinct shingles identically in
    both engines (≈ m²/2/mod expected for m distinct shingles —
    deterministic, tested parity holds).

    The word-hash array is bound as a LAMBDA VARIABLE (a one-element
    ``transform``) rather than a projected column: the optimizer
    inlines projected aliases into every downstream ``element_at`` —
    even across Generate/explode boundaries — which re-evaluates the
    per-word char fold n× per position (measured 16× blowup for the
    8-gram variant); a lambda binding is opaque to that rewrite, so
    each word folds exactly once per row."""
    from big_ann_spark.functions.text import poly_hash

    toks = F.split(F.col(text_col), " ")
    h = F.transform(toks, lambda w: poly_hash(w, word_base, mod))

    def make_keys(H):
        def key_at(i):
            k = F.lit(0).cast("long")
            for j in range(n):
                k = (k * combine_base + F.element_at(H, i + j)) % mod
            return k

        return F.when(
            F.size(H) >= n,
            F.transform(F.sequence(F.lit(1), F.size(H) - (n - 1)), key_at),
        ).otherwise(F.array().cast("array<long>"))

    from big_ann_spark.functions.text import bind_once

    keys = bind_once(h, make_keys)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(keys)).alias("shingle"),
    )


def gram_key_arrays(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    word_base: int = 31,
    combine_base: int = 1_000_003,
    mod: int = 1_000_000_007,
    word_base2: int | None = 37,
    combine_base2: int = 1_000_033,
    mod2: int | None = 998_244_353,
) -> DataFrame:
    """(doc_id, _keys: array<long>) — the ONE gram-key construction
    every n-gram operator shares (``duplicate_ngram_spans``,
    ``benchmark_contamination``; the DuckDB ``_GRAM8`` oracle macros
    mirror it fold-for-fold): per-word polynomial char hashes
    materialized behind a projection (each word folds once, not once
    per gram), then an n-word positional fold per gram. With ``mod2``
    set (default) the key is TWO independent folds combined as
    ``g1·mod2 + g2`` — a ~2^60 space, so cross-gram collisions stay
    negligible at corpus scale; ``mod2=None`` keeps the legacy single
    ~2^30 fold (oracle back-compat only). Keys are ordered by gram
    position; docs shorter than ``n`` tokens get an empty array.

    The word-hash arrays are bound as LAMBDA VARIABLES (a one-element
    ``transform`` over a struct of both arrays), not projected columns:
    the optimizer inlines projected aliases into every downstream
    ``element_at`` — including across Generate/explode boundaries —
    re-evaluating the per-word char fold n× per gram position
    (measured: a 16× wall blowup for n=8 with two folds, 52 s → 3 s at
    sf0.01). A lambda binding is opaque to that rewrite: the arrays
    materialize exactly once per row whatever sits above this plan."""
    from big_ann_spark.functions.text import poly_hash

    toks = F.split(F.col(text_col), " ")
    parts = [
        F.transform(toks, lambda w: poly_hash(w, word_base, mod)).alias("h1")
    ]
    if mod2 is not None:
        parts.append(
            F.transform(toks, lambda w: poly_hash(w, word_base2, mod2)).alias("h2")
        )
    bound = F.struct(*parts)

    def make_keys(s):
        H = s["h1"]

        def fold_at(arr, cb, m):
            def at(i):
                k = F.lit(0).cast("long")
                for j in range(n):
                    k = (k * cb + F.element_at(arr, i + j)) % m
                return k

            return at

        k1 = fold_at(H, combine_base, mod)
        if mod2 is None:
            key_at = k1
        else:
            k2 = fold_at(s["h2"], combine_base2, mod2)

            def key_at(i):
                # k1 < mod ≈ 1e9, ·mod2 ≈ 1e18 < 2^63 — no overflow
                return k1(i) * F.lit(mod2).cast("long") + k2(i)

        return F.when(
            F.size(H) >= n,
            F.transform(F.sequence(F.lit(1), F.size(H) - (n - 1)), key_at),
        ).otherwise(F.array().cast("array<long>"))

    from big_ann_spark.functions.text import bind_once

    keys = bind_once(bound, make_keys)
    return docs.select(F.col(id_col).alias("doc_id"), keys.alias("_keys"))


def incremental_exact_dedup(
    new_docs: DataFrame,
    history: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "survivors",
) -> DataFrame:
    """Exact dedup of a NEW ingest batch against a historical corpus —
    the incremental form every continuously-crawled training pipeline
    runs (history = everything already kept; new batch = today's
    crawl). Returns (kept_doc_id, n_copies) per distinct new text:

    - ``mode="survivors"`` (default): texts NOT present in history —
      the rows to append; within-batch duplicates collapse to the
      min-id winner with their copy count.
    - ``mode="duplicates"``: texts already present in history — the
      audit/reporting direction.

    Scale shape: both sides project to an 8-byte ``xxhash64(text)``
    before anything shuffles, so the join moves 8-16 bytes per row,
    never the corpus, and the keys are high-entropy hashes (no skew by
    construction). The join runs on the RAW hash projections — a plain
    Project-over-Scan on each side — precisely so Spark's runtime
    Bloom-filter injection
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) can prune
    non-matching batch rows before the shuffle in the ``duplicates``
    direction when the history side is filtered/selective (the
    injection rule declines plans with an Aggregate below the join, so
    pre-deduping either side would forfeit it — plan-pinned in
    tests/test_dedup.py). The per-text aggregation happens after the
    join and reuses the join's hash partitioning, so it adds no
    exchange. The ``survivors`` anti-join cannot be Bloom-pruned (a
    Bloom miss means KEEP, not skip — fundamental, not a missing
    optimization)."""
    if mode not in ("survivors", "duplicates"):
        raise ValueError(f"unknown mode {mode!r}")
    hist = history.select(F.xxhash64(F.col(text_col)).alias("_h"))
    batch = new_docs.select(
        F.xxhash64(F.col(text_col)).alias("_h"), F.col(id_col)
    )
    how = "left_anti" if mode == "survivors" else "left_semi"
    return (
        batch.join(hist, "_h", how)
        .groupBy("_h")
        .agg(
            F.min(id_col).alias("kept_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .drop("_h")
    )


def benchmark_contamination(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    word_base: int = 31,
    combine_base: int = 1_000_003,
    mod: int = 1_000_000_007,
    word_base2: int = 37,
    combine_base2: int = 1_000_033,
    mod2: int = 998_244_353,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination census: for every training document,
    how many of its distinct n-token grams also occur anywhere in the
    held-out benchmark set. Returns (doc_id, n_grams, n_matched,
    contam_frac) with one row per train doc — including zero-gram docs
    (shorter than n tokens), so the output is a total function of the
    train set. Downstream policy (drop when contam_frac exceeds a
    threshold, the GPT-3/PaLM n-gram-overlap decontamination shape) is
    a plain filter over this census.

    Gram keys are the same 64-bit two-fold construction as
    ``duplicate_ngram_spans`` (``g1·mod2 + g2``, key space ≈ 2^60):
    plain arithmetic both engines reproduce bit-for-bit, and cross-gram
    collisions — which would FALSELY flag clean training docs — stay
    ~m²/2^61 corpus-wide instead of dominating at the 1e11-gram scale a
    2^30 key space would.

    Scale shape: the benchmark side is contractually tiny (every public
    eval suite together is MBs of text → its distinct-gram table
    broadcasts; pass ``broadcast_bench=False`` to fall back to a
    shuffle join if yours genuinely is not); the train side streams
    once. Per-doc gram arrays are
    deduped with ``array_distinct`` inside the scan stage (per-row, no
    shuffle), the broadcast left join marks hits without moving the
    train side, and the single shuffle is the per-doc count aggregation
    keyed on ``doc_id`` with map-side partial aggregation. Nothing in
    the plan grows with benchmark count beyond the broadcast, and
    nothing pairs train docs with each other."""

    def gram_keys(docs: DataFrame) -> DataFrame:
        return gram_key_arrays(
            docs,
            id_col=id_col,
            text_col=text_col,
            n=n,
            word_base=word_base,
            combine_base=combine_base,
            mod=mod,
            word_base2=word_base2,
            combine_base2=combine_base2,
            mod2=mod2,
        ).select("doc_id", F.array_distinct("_keys").alias("_grams"))

    bench_grams = (
        gram_keys(bench)
        .select(F.explode("_grams").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_grams = gram_keys(train)
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    flagged = (
        train_grams.select("doc_id", F.explode_outer("_grams").alias("gram"))
        .join(bench_grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_matched"),
        )
    )
    return flagged.select(
        "doc_id",
        "n_grams",
        "n_matched",
        F.when(F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams"))
        .otherwise(F.lit(0.0))
        .alias("contam_frac"),
    )


def jaccard_similarity_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_doc_freq: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for every doc pair sharing ≥1 shingle.
    Inverted-index self-join: |A∩B| from the shingle join, |A|,|B| from
    per-doc counts, J = inter / (|A|+|B|-inter). Pass
    ``shingles=doc_shingle_keys(...)`` to run the whole index on 8-byte
    hashed keys instead of shingle strings.

    ``max_doc_freq``: drop shingles appearing in more than this many
    documents from the JOIN side only (boilerplate/hot-key mitigation —
    the Σ df² blowup is driven entirely by hot shingles). Capped
    shingles then count toward the union but not the intersection, so
    reported J is a LOWER BOUND of the true Jaccard, and pairs
    connected only through capped shingles are missed — the standard
    dedup-at-scale trade (conservative: never over-reports
    similarity)."""
    sh = (
        shingles
        if shingles is not None
        else doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    join_sh = sh
    if max_doc_freq is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        join_sh = sh.join(
            df_counts.filter(F.col("_df") <= max_doc_freq).select("shingle"),
            "shingle",
        )
    a = join_sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = join_sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
    word_base: int = 31,
    combine_base: int = 1_000_003,
    mod: int = 1_000_000_007,
    word_base2: int | None = 37,
    combine_base2: int = 1_000_033,
    mod2: int | None = 998_244_353,
) -> DataFrame:
    """(doc_id, begin, end) — per-document TOKEN spans covered by an
    n-token gram occurring ≥ ``min_count`` times anywhere in the corpus
    (including same-document repeats): exact duplicated-substring
    detection at n-token granularity, the Lee et al. "Deduplicating
    Training Data" span-removal shape re-expressed relationally. The
    downstream action is stripping those spans (or dropping docs whose
    spans cover too much).

    Gram keys are TWO independent polynomial folds combined into one
    64-bit value (``g1·mod2 + g2``, key space ``mod·mod2`` ≈ 2^60 —
    both folds plain arithmetic, so a SQL oracle reproduces the key
    bit-for-bit). A single 2^30 fold would make cross-gram collisions
    dominate at corpus scale (m ≈ 1e11 grams → ~m²/2^31 ≈ 1e12
    colliding pairs, i.e. false spans destructively stripping
    non-duplicated text); at 2^60 the expectation is ~5e3 colliding
    pairs over the whole corpus — vanishing per-gram. Pass
    ``mod2=None`` for the legacy single-mod key (back-compat only).

    Plan: word-hash arrays → positional gram fold → global count per
    gram (map-side partial) → hash join back → each duplicated gram
    contributes the interval [pos, pos+n) →
    ``intervals.merge_overlaps(strict=False, partition_cols=[doc])``
    fuses touching grams into maximal spans — one shuffle keyed by
    doc. Every stage is linear in token count; no pair of documents is
    ever joined, so dup-heavy corpora cost the same as clean ones."""
    from big_ann_spark.operators.intervals import merge_overlaps

    arrs = gram_key_arrays(
        docs,
        id_col=id_col,
        text_col=text_col,
        n=n,
        word_base=word_base,
        combine_base=combine_base,
        mod=mod,
        word_base2=word_base2,
        combine_base2=combine_base2,
        mod2=mod2,
    )
    g = arrs.select("doc_id", F.posexplode("_keys").alias("_pos", "gram"))
    counts = g.groupBy("gram").agg(F.count("*").alias("_c"))
    dup = g.join(
        counts.filter(F.col("_c") >= min_count).select("gram"), "gram"
    )
    spans = dup.select(
        "doc_id",
        F.col("_pos").cast("long").alias("begin"),
        (F.col("_pos") + n).cast("long").alias("end"),
    )
    return merge_overlaps(spans, strict=False, partition_cols=["doc_id"])


def strip_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
    **gram_kw,
) -> DataFrame:
    """The ACTION half of Lee et al. span dedup (``duplicate_ngram_spans``
    is the detection half): remove every occurrence of a duplicated
    n-gram EXCEPT the globally-first one (min (doc_id, position)), so
    exactly one copy of each duplicated substring survives the corpus.
    Returns (doc_id, <text_col> cleaned, n_removed) for EVERY input doc
    (clean docs pass through untouched; a fully-duplicated doc comes
    back empty with n_removed = its token count).

    Plan: the shared ``gram_key_arrays`` 64-bit keys → per-gram
    ``min(struct(doc_id, pos))`` winner (ONE aggregate, no window — a
    hot gram costs a partial-min, not a sorted partition) → loser
    occurrences hash-join back → per-doc interval merge (the
    duplicate_ngram_spans machinery) → spans collected per doc and the
    token array filtered positionally in one codegen projection.
    Linear in token count, no doc-pair join, and the only per-doc state
    is its own merged span list."""
    from big_ann_spark.operators.intervals import merge_overlaps

    arrs = gram_key_arrays(docs, id_col=id_col, text_col=text_col, n=n, **gram_kw)
    g = arrs.select("doc_id", F.posexplode("_keys").alias("_pos", "gram"))
    winners = g.groupBy("gram").agg(
        F.min(F.struct("doc_id", "_pos")).alias("_w"),
        F.count("*").alias("_c"),
    )
    losers = (
        g.join(winners.filter(F.col("_c") >= min_count), "gram")
        .filter(F.struct("doc_id", "_pos") != F.col("_w"))
        .select(
            "doc_id",
            F.col("_pos").cast("long").alias("begin"),
            (F.col("_pos") + n).cast("long").alias("end"),
        )
    )
    merged = merge_overlaps(losers, strict=False, partition_cols=["doc_id"])
    spans_arr = merged.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("begin").alias("s"), F.col("end").alias("e"))
        ).alias("_spans")
    )
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    joined = base.join(spans_arr, "doc_id", "left").select(
        "doc_id",
        "_t",
        F.coalesce(
            "_spans", F.array().cast("array<struct<s:bigint,e:bigint>>")
        ).alias("_spans"),
    )
    toks = F.split("_t", " ")
    marked = F.transform(
        toks, lambda w, i: F.struct(w.alias("w"), i.cast("long").alias("i"))
    )
    kept = F.filter(
        marked,
        lambda s: ~F.exists(
            F.col("_spans"), lambda sp: (s["i"] >= sp["s"]) & (s["i"] < sp["e"])
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda s: s["w"]), " ").alias(text_col),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )


def prefix_filtered_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    max_df: int | None = None,
    verify_partitions: int | None = None,
) -> DataFrame:
    """ALL pairs with n-gram Jaccard ≥ ``threshold`` — exact, via
    df-ordered prefix filtering (Chaudhuri et al. SSJoin / Bayardo et
    al. All-Pairs): order each doc's shingles by ascending global
    document frequency (shingle id as tie-break → total order), and
    index only the first ``|A| − ⌈t·|A|⌉ + 1`` of them. Any pair with
    J ≥ t must share at least one shingle in BOTH prefixes, so joining
    prefix-against-prefix loses nothing; exact Jaccard then verifies
    the candidates. Unlike ``max_doc_freq`` capping there is no
    lower-bound caveat — output is identical to filtering
    ``jaccard_similarity_pairs`` at the same threshold.

    Scale: the inverted-index Σdf² blowup is driven by hot (high-df)
    shingles, which the df-ascending prefix is precisely built to
    exclude — each doc contributes its (1−t)-fraction of RAREST
    shingles to the index. Costs over the naive index: one extra
    df aggregation (8-byte keys) and one per-doc rank window (bounded
    partitions — a document has bounded shingles). Verification is
    Σ_pair(|A|+|B|), output-bound like LSH verification.

    ``max_df``: additionally DROP shingles appearing in more than
    ``max_df`` documents before any pairing — the hot-key cap for
    boilerplate-dominated crawls, where even the prefix index keeps a
    hot shingle when a doc is mostly boilerplate (its rare fraction is
    too small) and one shingle's posting list becomes the straggler
    task. With the cap set, Jaccard is computed over the CAPPED shingle
    universe on BOTH sides (intersection and union consistently exclude
    capped shingles — set semantics stay exact on the sub-universe,
    unlike ``jaccard_similarity_pairs``'s join-side-only lower bound),
    and the result equals ``jaccard_similarity_pairs(shingles=capped)``
    at the same threshold (equality-tested). RECALL CONSEQUENCE: pairs
    similar only through capped boilerplate are missed — for dedup
    that is usually the desired reading (boilerplate similarity is not
    content similarity). Default None = exact over the full universe."""
    sh = (
        shingles
        if shingles is not None
        else doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    )
    # Fused build (the plan-shape that makes df-ordering nearly free):
    # 1. global df per shingle — one agg with map-side partial counts;
    #    its output is |distinct shingles| rows, which AQE broadcasts
    #    back onto the shingle table while it fits (no shuffle of the
    #    big side), falling back to a hash join beyond that.
    # 2. ONE groupBy(doc) collecting array_sort(struct(df, shingle)) —
    #    each doc's shingles materialize already in global df-order, so
    #    the prefix is a pure slice() projection: no rank window, no
    #    second shuffle of the exploded table. localCheckpoint shares
    #    the (expensive) text->hash lineage across index + verify.
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    if max_df is not None:
        # inner join below then drops capped shingles from BOTH the
        # prefix index and the verification arrays — consistent
        # capped-universe semantics (see docstring)
        df_counts = df_counts.filter(F.col("_df") <= max_df)
    arrs = (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
            ).alias("_ds")
        )
        .select(
            "doc_id",
            F.transform("_ds", lambda s: s["shingle"]).alias("shs"),
        )
        .localCheckpoint()
    )
    # Candidate generation joins an asymmetric pair of prefix indexes
    # (Xiao et al., WWW'08 + the TODS'11 indexing-prefix refinement) —
    # all exactness-preserving:
    # - probe side (the (size, id)-LARGER record of a pair): prefix
    #   length |A| − ⌈t·|A|⌉ + 1 (overlap ≥ α ≥ t·|A|);
    # - index side (the smaller record): only |B| − ⌈2t/(1+t)·|B|⌉ + 1
    #   shingles — for any qualifying pair with |A| ≥ |B| the overlap
    #   α = ⌈t/(1+t)(|A|+|B|)⌉ ≥ 2t/(1+t)·|B|, so the first common
    #   shingle (global df-order) sits inside BOTH prefixes;
    # - length filter: J ≥ t forces t·max(|A|,|B|) ≤ min(|A|,|B|);
    # - positional filter: at that first shared shingle every common
    #   shingle sits at positions ≥ (pa, pb), so |A∩B| ≤ 1 +
    #   min(|A|−pa, |B|−pb) must reach α — the first-collision row
    #   always survives, so no qualifying pair is lost.
    n_sh = F.size("shs")
    probe_len = (n_sh - F.ceil(F.lit(threshold) * n_sh) + 1).cast("int")
    idx_len = (
        n_sh - F.ceil(F.lit(2.0 * threshold / (1.0 + threshold)) * n_sh) + 1
    ).cast("int")

    def side(plen, doc, sz, pos):
        return arrs.select(
            F.col("doc_id").alias(doc),
            n_sh.alias(sz),
            F.posexplode(F.slice("shs", F.lit(1), plen)).alias(pos, "shingle"),
        )

    probe = side(probe_len, "doc_a", "_sza", "_pa")
    idx = side(idx_len, "doc_b", "_szb", "_pb")
    alpha = F.ceil(
        F.lit(threshold) / (1.0 + threshold) * (F.col("_sza") + F.col("_szb"))
    )
    cands = (
        probe.join(idx, "shingle")
        .filter(
            # index side strictly precedes the probe side in the
            # (size, id) total order — every unordered pair is probed
            # exactly from its larger record
            (
                (F.col("_szb") < F.col("_sza"))
                | ((F.col("_szb") == F.col("_sza")) & (F.col("doc_b") < F.col("doc_a")))
            )
            & (
                F.least("_sza", "_szb")
                >= F.ceil(F.lit(threshold) * F.greatest("_sza", "_szb"))
            )
            & (
                1
                + F.least(
                    F.col("_sza") - 1 - F.col("_pa"),
                    F.col("_szb") - 1 - F.col("_pb"),
                )
                >= alpha
            )
        )
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    verified = jaccard_for_pairs(
        docs, cands, shingle_arrays=arrs, pair_partitions=verify_partitions
    )
    return verified.filter(F.col("jaccard") >= threshold)


def min_label_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    max_iter: int = 20,
    on_nonconverge: str = "warn",
) -> DataFrame:
    """(id, cluster_rep) connected-component labels over an undirected
    edge list (doc_a, doc_b) by iterative min-label propagation: every
    node starts as its own label; each round takes the min of its own
    and its neighbors' labels; fixpoint = min node id per component —
    deterministic, so a DuckDB recursive CTE reproduces it exactly.

    This is the cluster-representative dedup output (VERDICT r4 #3):
    O(n) rows instead of the O(cluster²) verified-pair contract. Each
    round is one join + one groupBy (8-byte keys); rounds needed =
    graph diameter, and LSH near-dup clusters are near-cliques
    (diameter ≈ 2), so convergence is typically 2–3 rounds — the
    driver-side convergence check stops early, ``max_iter`` bounds the
    pathological chain case. Lineage is truncated with localCheckpoint
    each round so plan depth stays constant (the KANNDI pattern).

    ``nodes``: optional one-column DataFrame of ALL ids; ids with no
    edge become singleton clusters (own id). Default: ids appearing in
    edges only.

    ``on_nonconverge``: what to do when labels still moved at
    ``max_iter`` — i.e. some component's diameter exceeds the bound
    and the returned labels would be over-split (and diverge from an
    exact-components oracle). ``"warn"`` (default) raises a
    RuntimeWarning; ``"raise"`` raises RuntimeError — the right choice
    for oracle-checked or correctness-critical pipelines (ADVICE r6)."""
    if on_nonconverge not in ("warn", "raise"):
        # a typo ("Raise", "error") must not silently degrade the
        # correctness-critical hard-fail to a warning
        raise ValueError(
            f"on_nonconverge must be 'warn' or 'raise', got {on_nonconverge!r}"
        )
    e = edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if nodes is not None:
        ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    else:
        ids = sym.select(F.col("src").alias("id")).distinct()
    labels = ids.select("id", F.col("id").alias("label")).localCheckpoint()
    changed = 0
    for _ in range(max_iter):
        neigh = (
            sym.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("_nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_nl").alias("_min_nl"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("_min_nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "_old"), "id"
            )
            .filter(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # the last sweep still moved labels: the component diameter
        # exceeds max_iter and the returned labels are NOT a fixpoint
        # (clusters would be silently over-split). Surface it loudly.
        msg = (
            f"min_label_components did not converge within max_iter={max_iter} "
            "iterations; returned cluster labels are not a fixpoint "
            "(long duplicate chains would be over-split). Raise max_iter."
        )
        if on_nonconverge == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.withColumnRenamed("label", "cluster_rep").withColumnRenamed(
        "id", "doc_id"
    )


def minhash_dedup_clusters(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_iter: int = 20,
    on_nonconverge: str = "warn",
    **minhash_kw,
) -> DataFrame:
    """(doc_id, cluster_rep) for EVERY input doc: MinHash-LSH verified
    pairs → min-label connected components; docs in no near-dup pair
    keep themselves as representative. The downstream dedup action is
    then ``filter(doc_id == cluster_rep)`` — linear output however
    large the duplicate clusters are."""
    pairs = minhash_dedup_pairs(
        docs, id_col=id_col, text_col=text_col, n=n, threshold=threshold,
        **minhash_kw,
    )
    all_ids = docs.select(F.col(id_col).alias("doc_id"))
    return min_label_components(
        pairs, all_ids, max_iter=max_iter, on_nonconverge=on_nonconverge
    )


def ngram_dedup_clusters(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_iter: int = 20,
    on_nonconverge: str = "warn",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_rep) under EXACT n-gram Jaccard ≥ threshold:
    prefix-filtered pairs (no LSH recall loss) → min-label connected
    components; singletons keep themselves. The exact-threshold
    counterpart of ``minhash_dedup_clusters`` — same O(n) output
    contract, deterministic, dedup action = ``doc_id == cluster_rep``."""
    pairs = prefix_filtered_jaccard_pairs(
        docs, id_col=id_col, text_col=text_col, n=n, threshold=threshold,
        shingles=shingles,
    )
    all_ids = docs.select(F.col(id_col).alias("doc_id"))
    return min_label_components(
        pairs, all_ids, max_iter=max_iter, on_nonconverge=on_nonconverge
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    shingles: DataFrame | None = None,
    shingle_hash: Column | None = None,
) -> DataFrame:
    """(doc_id, sig: array<bigint>[k]) MinHash signatures. Shingles are
    hashed to 32-bit-ish ids with xxhash64 (masked), then each of the k
    universal hashes takes an elementwise min — a single groupBy with k
    min aggregates (map-side partial min ⇒ tiny shuffle). Pass a
    precomputed (persisted) ``shingles`` table to share the explode
    with the verification stage.

    ``shingle_hash``: override the shingle→int hash with a Column
    expression over the ``shingle`` column (must stay < 2^32). The
    oracle-checked query passes the SQL-reproducible polynomial char
    hash; the default xxhash64 is the scale path (one JVM hash per
    shingle instead of a per-char fold)."""
    if k > len(_A):
        raise ValueError(f"k <= {len(_A)} supported")
    sh = shingles if shingles is not None else doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    x = (
        shingle_hash if shingle_hash is not None
        else F.pmod(F.xxhash64("shingle"), F.lit(1 << 32))
    ).alias("x")
    hashed = sh.select("doc_id", x)
    mins = [
        F.min((F.col("x") * _A[j] + _B[j]) % MINHASH_P).alias(f"h{j}")
        for j in range(k)
    ]
    agg = hashed.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[f"h{j}" for j in range(k)]).alias("sig"))


def band_table(
    signatures: DataFrame,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
    bucket_mode: str = "hash",
) -> DataFrame:
    """(doc_id, band, bucket) — each signature exploded into its LSH
    band buckets; the shared primitive behind same-corpus candidate
    pairing (``lsh_candidate_pairs``) and cross-corpus incremental
    matching (``incremental_minhash_dedup``). In a continuously-landing
    pipeline THIS table is the persisted signature store: append new
    batches' rows and every future batch joins against it directly."""
    if bucket_mode == "slice":
        bucket = lambda b: F.slice("sig", b * rows_per_band + 1, rows_per_band)  # noqa: E731
    else:
        bucket = lambda b: F.xxhash64(  # noqa: E731
            F.slice("sig", b * rows_per_band + 1, rows_per_band)
        )
    return signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    bands: int = 8,
    rows_per_band: int = 4,
    bucket_mode: str = "hash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures and emit all same-bucket doc pairs. Bucket
    key = (band index, hash of the band's signature slice); join is a
    pure equi-join on the bucket key — no all-pairs blowup.

    ``bucket_mode="slice"`` joins on the raw signature slice instead of
    its xxhash64 (semantically identical up to hash collisions, which
    only ever ADD candidates; the raw-slice form is exactly
    reproducible in the SQL oracle). The default "hash" keeps the join
    key at a fixed 8 bytes — the at-scale choice.

    ``max_bucket_size``: drop (band, bucket) groups holding more than
    this many docs before pairing — the hot-key cap for crawl-scale
    corpora (SCALE.md 'frequency-capping hot keys is the standard
    move'). A bucket of b docs emits b² /2 pairs in ONE task (the
    equi-join can't split a single key), so one boilerplate-dominated
    bucket is the straggler that decides the stage's wall clock; AQE
    skew-split can't help because the blowup is the join OUTPUT.
    RECALL CONSEQUENCE: a pair whose every matching band lands in a
    dropped bucket is missed. In practice oversized buckets are
    near-identical boilerplate cliques — their members still meet in
    any not-dropped band, and exact/substring dedup upstream is the
    right tool for true clones. Precision is untouched (verification
    still computes exact Jaccard on full shingle sets)."""
    banded = band_table(
        signatures, bands=bands, rows_per_band=rows_per_band, bucket_mode=bucket_mode
    )
    if max_bucket_size is not None:
        # hot set is tiny by construction (only buckets above the cap):
        # one 8-byte-key agg + a broadcastable anti-join
        hot = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(hot, ["band", "bucket"], "left_anti")
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def doc_shingle_arrays(
    docs: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, shs: array<...>) — each doc's distinct shingles as ONE
    sorted array row. The array form is what pair verification wants:
    intersections become a codegen ``array_intersect`` per pair instead
    of an exploded join + per-pair groupBy."""
    sh = (
        shingles
        if shingles is not None
        else doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    )
    return sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("shingle")).alias("shs")
    )


def jaccard_for_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles: DataFrame | None = None,
    shingle_arrays: DataFrame | None = None,
    pair_partitions: int | None = None,
) -> DataFrame:
    """Exact Jaccard computed ONLY for the given (doc_a, doc_b) pairs —
    the verification step after LSH/prefix candidate generation. Each
    side's distinct-shingle ARRAY joins onto the pair row and the
    intersection is a codegen ``array_intersect`` — cost Σ_pair
    (|A|+|B|) like the exploded form, but with no per-pair groupBy and
    ~|shingles-per-doc|× fewer join rows; on dup-heavy corpora (~10⁶
    candidate pairs) this is the difference between minutes and
    seconds. Pass ``shingle_arrays=doc_shingle_arrays(...)`` (ideally
    persisted) to share the build across stages.

    ``pair_partitions``: explicitly round-robin the pair table into
    this many partitions before verification. The pair rows are two
    longs — BYTE-light — while the array_intersect over the joined
    arrays is CPU-dense, so AQE's byte-based coalescing can pack a
    ~1 MB pair shuffle onto ONE task that then burns seconds of
    single-core array work (a by-num repartition is exempt from AQE
    coalescing). Use when the candidate table is known to be small
    in bytes relative to its verify CPU (e.g. bench-scale corpora);
    leave None where candidates are large — their shuffle then already
    spreads and the extra exchange would be pure cost."""
    if pair_partitions is not None:
        pairs = pairs.repartition(pair_partitions)
    arrs = (
        shingle_arrays
        if shingle_arrays is not None
        else doc_shingle_arrays(
            docs, id_col=id_col, text_col=text_col, n=n, shingles=shingles
        )
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        pairs.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("_sa")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("_sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                inter.cast("double")
                / (F.size("_sa") + F.size("_sb") - inter)
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    shingle_hash: Column | None = None,
    bucket_mode: str = "hash",
    shingles: DataFrame | None = None,
    shingle_arrays: DataFrame | None = None,
    signatures: DataFrame | None = None,
    max_bucket_size: int | None = None,
    verify_partitions: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded
    candidates → exact-Jaccard verification ≥ threshold. Verification
    runs only on candidate pairs (that selectivity is LSH's whole
    point — verifying all shingle-sharing pairs would re-create the
    blowup the bands avoid). Pass a precomputed ``shingles`` table
    (e.g. ``doc_shingle_keys`` for 8-byte hashed keys) to replace the
    string-shingle explode in both the signature and verification
    stages; ``shingle_arrays`` / ``signatures`` (already persisted)
    skip the respective builds entirely — the pattern for callers that
    share one corpus-wide build across several dedup stages."""
    # ONE materialized shingle pass (r5): the signature build and the
    # pair verification both derive from the checkpointed array table,
    # so the text->hash lineage runs once — and verification is the
    # array_intersect form, which on dup-heavy corpora (10^6 candidate
    # pairs) replaces an exploded-join + per-pair groupBy over ~10^8
    # rows with one codegen projection per pair. A fully store-backed
    # caller (shingle_arrays + signatures) never touches ``docs``.
    if shingle_arrays is not None:
        arrs = shingle_arrays
    else:
        sh = (
            shingles
            if shingles is not None
            else doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
        )
        arrs = doc_shingle_arrays(shingles=sh).localCheckpoint()
    sigs = signatures
    if sigs is None:
        ex = arrs.select("doc_id", F.explode("shs").alias("shingle"))
        sigs = minhash_signatures(
            docs, id_col=id_col, text_col=text_col, n=n, shingles=ex,
            shingle_hash=shingle_hash,
        )
    cands = lsh_candidate_pairs(
        sigs, bucket_mode=bucket_mode, max_bucket_size=max_bucket_size
    )
    verified = jaccard_for_pairs(
        docs, cands, shingle_arrays=arrs, pair_partitions=verify_partitions
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    history: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    mode: str = "survivors",
    shingle_hash: Column | None = None,
    bucket_mode: str = "hash",
    new_shingles: DataFrame | None = None,
    new_shingle_arrays: DataFrame | None = None,
    new_sigs: DataFrame | None = None,
    history_bands: DataFrame | None = None,
    history_shingles: DataFrame | None = None,
    history_shingle_arrays: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """NEAR-dup (MinHash-LSH) counterpart of ``incremental_exact_dedup``:
    screen a new ingest batch against the landed history, where a new
    doc is a duplicate when its exact Jaccard against SOME history doc
    reaches ``threshold``. Verification is SIDE-TAGGED (each pair's
    left side joins the batch's shingle store, the right side the
    history's), so a doc_id that appears on both sides — a re-crawled
    page with a stable id — is compared new-text-vs-stored-text, never
    against itself.

    - ``mode="survivors"`` (default): the new rows (all columns) with
      no history near-dup — the rows to append. Within-batch near-dups
      among survivors are the caller's second stage
      (``minhash_dedup_clusters`` on the batch) — kept separate because
      batch-internal collapse picks representatives, while
      history-screening is a pure filter.
    - ``mode="duplicates"``: audit pairs (doc_id, dup_of, jaccard) —
      each new doc matched to every verified history near-dup.

    Scale shape — the whole point of the incremental form: per batch,
    history contributes ONLY (a) its band table (``history_bands``, the
    persisted signature store that ``band_table`` documents — 8-byte
    bucket keys, appended as batches land, never recomputed) and (b)
    shingle arrays for the CANDIDATE history docs (semi-join on the
    matched ids; pass ``history_shingles`` — the persisted (doc_id,
    shingle) store — or ``history_shingle_arrays`` — its (doc_id, shs)
    array-column form, what a parquet corpus lands per row — to avoid
    touching history text at all). Batch cost
    is O(|new| + |candidates|), independent of history size; the band
    equi-join is the same never-O(n²) hash join as the batch pipeline.
    When neither store is passed, both are derived from ``history``
    (correct, but O(history) per batch — first-batch/backfill mode).

    The candidate set restricted to (new × history) pairs is exactly
    the full-corpus LSH candidate set's cross pairs (signatures are
    per-doc), so the incremental screen returns precisely what the
    batch pipeline would have flagged between the two sides — the
    oracle-checked ``incr_*`` variants of minhash_lsh_near_dup certify
    that equivalence."""
    if mode not in ("survivors", "duplicates"):
        raise ValueError(f"unknown mode {mode!r}")
    have_shingle_store = (
        history_shingles is not None or history_shingle_arrays is not None
    )
    if history is None and (history_bands is None or not have_shingle_store):
        raise ValueError(
            "pass history, or history_bands plus a shingle store "
            "(history_shingles or history_shingle_arrays)"
        )
    if new_shingle_arrays is not None:
        arrs_new = new_shingle_arrays
    else:
        sh_new = (
            new_shingles
            if new_shingles is not None
            else doc_shingles(new_docs, id_col=id_col, text_col=text_col, n=n)
        )
        arrs_new = doc_shingle_arrays(shingles=sh_new).localCheckpoint()
    sigs_new = new_sigs
    if sigs_new is None:
        ex_new = arrs_new.select("doc_id", F.explode("shs").alias("shingle"))
        sigs_new = minhash_signatures(
            new_docs, id_col=id_col, text_col=text_col, n=n,
            shingles=ex_new, shingle_hash=shingle_hash,
        )
    if history_bands is None:
        sigs_hist = minhash_signatures(
            history, id_col=id_col, text_col=text_col, n=n,
            shingles=history_shingles, shingle_hash=shingle_hash,
        )
        history_bands = band_table(sigs_hist, bucket_mode=bucket_mode)
    new_bands = band_table(sigs_new, bucket_mode=bucket_mode)
    if max_bucket_size is not None:
        # Hot-bucket cap (see lsh_candidate_pairs): the join output per
        # (band, bucket) is |new| x |hist| in ONE task, so drop buckets
        # oversized on EITHER side. History counting is restricted to
        # buckets the batch actually probes (semi-join first), so the
        # aggregated volume stays O(batch buckets), and the anti-join
        # lands on the batch side only — candidate output for a dropped
        # bucket is zero either way.
        probe_buckets = new_bands.select("band", "bucket").distinct()

        def _hot(t: DataFrame) -> DataFrame:
            return (
                t.groupBy("band", "bucket")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > max_bucket_size)
                .select("band", "bucket")
            )

        hist_probed = history_bands.join(
            probe_buckets, ["band", "bucket"], "left_semi"
        )
        hot = _hot(new_bands).unionByName(_hot(hist_probed)).distinct()
        new_bands = new_bands.join(hot, ["band", "bucket"], "left_anti")
    cand = (
        new_bands
        .select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        .join(
            history_bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand_hist_ids = cand.select(F.col("doc_b").alias("doc_id")).distinct()
    if history_shingle_arrays is not None:
        arrs_hist = history_shingle_arrays.select("doc_id", "shs").join(
            cand_hist_ids, "doc_id", "left_semi"
        )
    elif history_shingles is not None:
        arrs_hist = doc_shingle_arrays(
            shingles=history_shingles.join(cand_hist_ids, "doc_id", "left_semi")
        )
    else:
        hist_cand_docs = history.join(
            cand_hist_ids.withColumnRenamed("doc_id", id_col),
            id_col,
            "left_semi",
        )
        arrs_hist = doc_shingle_arrays(
            shingles=doc_shingles(
                hist_cand_docs, id_col=id_col, text_col=text_col, n=n
            )
        )
    # side-tagged verification: doc_a joins ONLY the batch store,
    # doc_b ONLY the history store — a unioned id-keyed table would
    # verify a reused doc_id against the wrong side (J(new_X, new_X)
    # = 1.0 silently dropping a legitimately updated document)
    inter = F.size(F.array_intersect("_sa", "_sb"))
    verified = (
        cand.join(
            arrs_new.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("_sa")),
            "doc_a",
        )
        .join(
            arrs_hist.select(
                F.col("doc_id").alias("doc_b"), F.col("shs").alias("_sb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                inter.cast("double") / (F.size("_sa") + F.size("_sb") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if mode == "duplicates":
        return verified.select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("dup_of"),
            "jaccard",
        )
    return new_docs.join(
        verified.select(F.col("doc_a").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )


def simhash64(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: Column | None = None,
    n_bits: int = 64,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit position, sum
    ±1 weighted by token-hash bit, sign → fingerprint bit. ONE groupBy
    with ``n_bits`` sum aggregates (the minhash_signatures pattern):
    map-side partials reduce each task to one n_bits-wide row per doc,
    and the fingerprint packs sign bits in a pure projection. The
    previous form exploded ``n_bits`` rows per token before its first
    aggregate — ×62 pre-shuffle row inflation (VERDICT r3 #5) for the
    same result.

    ``token_hash``: Column over the ``tok`` column overriding the
    default xxhash64 (the oracle-checked query passes a 62-bit
    two-fold polynomial char hash DuckDB reproduces exactly, with
    ``n_bits=62`` so no fingerprint bit depends on the missing top
    bits)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    h = token_hash if token_hash is not None else F.xxhash64("tok")
    th = toks.select("doc_id", h.alias("h"))
    sums = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)).cast("long") * 2 - 1
            ).alias(f"s{i}")
            for i in range(n_bits)
        ]
    )
    # shiftleft(1L, i) (not a 1<<i literal) so i=63 keeps Java long
    # semantics — bit 63 lands on the sign bit exactly as before
    fp = F.lit(0).cast("long")
    for i in range(n_bits):
        fp = fp + F.when(
            F.col(f"s{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, *, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Exact by pigeonhole: the 64 bits are split into ``max_hamming + 1``
    chunks, so any pair within the distance budget must agree on at
    least one whole chunk → candidate generation is an equi-join per
    chunk (no all-pairs), then an exact popcount filter. Small
    max_hamming keeps chunks wide and buckets selective — at corpus
    scale use ≤ 4; larger budgets shrink chunks toward hot buckets."""
    sh = simhash64(docs, **kw)
    n_chunks = max_hamming + 1
    width = -(-64 // n_chunks)  # ceil
    specs = []
    for c in range(n_chunks):
        lo = c * width
        bits = min(width, 64 - lo)
        if bits <= 0:
            break
        mask = (1 << bits) - 1
        specs.append(
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", lo).bitwiseAND(F.lit(mask)).alias("v"),
            )
        )
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*specs)).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.v")
    a = chunks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk", "v")
    b = chunks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk", "v")
    pairs = (
        a.join(b, ["chunk", "v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_lsh_band_signatures(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 16,
    rows_per_band: int = 3,
    dim: int = 64,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """(id, band, bucket) random-hyperplane LSH band signatures: the
    sign bits of ``rows_per_band`` fixed hyperplane dot products pack
    into one bucket int per band. Two vectors collide in a band iff no
    plane of that band separates them — the banded construction trades
    candidate volume (fewer rows/band → bigger buckets) against recall
    (more bands → more chances to collide), exactly like MinHash
    banding. One pure projection per row: dots computed once, then
    band buckets sliced out — no joins, no shuffles."""
    from big_ann_spark.functions.vector import lcg_planes

    if planes is None:
        planes = lcg_planes(n_bands * rows_per_band, dim)
    planes_col = F.array(*[F.array(*[F.lit(x) for x in p]) for p in planes])
    v = F.col(vec_col).cast("array<double>")
    # fold-left dot per plane — the same left-to-right float64 order the
    # DuckDB oracle's list_sum uses, so sign bits agree across engines
    dots = F.transform(
        planes_col,
        lambda p: F.aggregate(
            F.zip_with(v, p, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        ),
    )
    with_dots = emb.select(F.col(id_col).alias("id"), dots.alias("_ds"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    [
                        F.when(
                            F.element_at(F.col("_ds"), b * rows_per_band + r + 1) > 0,
                            F.lit(1 << r),
                        ).otherwise(F.lit(0))
                        for r in range(rows_per_band)
                    ],
                    start=F.lit(0),
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return with_dots.select("id", F.explode(bands).alias("_bb")).select(
        "id", F.col("_bb")["band"].alias("band"), F.col("_bb")["bucket"].alias("bucket")
    )


def embedding_lsh_near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bands: int = 16,
    rows_per_band: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicates, bucketed (VERDICT r2 #3 — the
    100 TB form): banded hyperplane-LSH candidate generation (equi-join
    on (band, bucket) — a HASH join, never an O(n²) nested loop) +
    exact cosine verification of the distinct candidates only. Output
    is the LSH-recalled subset of ``embedding_near_dup_pairs``;
    recall is tunable: P(candidate) = 1 − (1 − p^r)^b for plane-
    agreement probability p = 1 − θ/π. Candidate volume scales with
    Σ_bucket |bucket|² per band, the same Σdf² economics as the
    MinHash/ngram index — at 100 TB raise rows_per_band to shrink
    buckets. Brute force (embedding_near_dup_pairs) stays the
    tiny-side fallback."""
    sigs = embedding_lsh_band_signatures(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        n_bands=n_bands,
        rows_per_band=rows_per_band,
        dim=dim,
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine_similarity("_va", "_vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicates: all pairs with cosine ≥
    threshold. Brute-force self-join baseline; the LSH/IVF bucketed
    variant for scale lives in operators.ann."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_similarity("_va", "_vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dedup_clusters(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bands: int = 16,
    rows_per_band: int = 3,
    dim: int = 64,
    max_iter: int = 20,
    on_nonconverge: str = "warn",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_rep) semantic dedup over an embedding column —
    the SemDeDup shape (Abbas et al. 2023): documents whose embeddings
    sit within cosine ``threshold`` of each other collapse to one
    representative per connected component. Candidate generation is the
    banded hyperplane-LSH equi-join (never O(n²)); verified pairs ≥
    threshold become edges; min-label propagation picks the min id per
    component; vectors in no near-dup pair keep themselves. The dedup
    action is ``filter(doc_id == cluster_rep)`` — O(n) output however
    large the semantic clusters grow, the same contract as
    ``minhash_dedup_clusters`` / ``ngram_dedup_clusters`` so all three
    dedup families (token-exact, sketch, embedding) expose one
    downstream interface.

    ``pairs``: pre-computed verified pair DataFrame (id_a, id_b[,
    cosine]) to reuse when the caller already built it (e.g. a query
    registering both the pairs and the clusters); default builds the
    LSH pipeline here.

    DIAMETER BOUND: labels are exact only for components of diameter ≤
    ``max_iter``; a longer transitive near-dup chain (realistic for
    cosine chains at scale) triggers ``on_nonconverge`` — "warn"
    (default) or "raise". The DuckDB oracle (recursive CTE) computes
    exact components, so a non-converged run WOULD hash-mismatch it;
    the signal makes that diagnosable instead of silent (ADVICE r6)."""
    if pairs is None:
        pairs = embedding_lsh_near_dup_pairs(
            emb,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            n_bands=n_bands,
            rows_per_band=rows_per_band,
            dim=dim,
        )
    edges = pairs.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    all_ids = emb.select(F.col(id_col).alias("doc_id"))
    return min_label_components(
        edges, all_ids, max_iter=max_iter, on_nonconverge=on_nonconverge
    )


def _stable_hash(id_col: str, salt: int, a: int, mod: int):
    """The ONE multiplicative-hash column all content-stable selection
    ops share (hash_sample / cap_per_source / token_budget_mix /
    temperature_mix / shard assignment / dsir's Gumbel uniform) — their
    documented bit-identical-selection and nesting contracts depend on
    every caller using this exact mixing, so it exists once.

    The salt selects a DISTINCT MULTIPLIER ``a^(salt+1) mod p`` on top
    of the additive shift. With a shared multiplier, hashes at two
    salts differ by the CONSTANT ``(s2-s1)*a mod p`` — chained
    selections are then translates of each other, not independent: a
    ``hash_sample(0.5, salt=1)`` pass shifts every survivor's salt-6
    hash into ``[Δ, p/2+Δ)``, so a later low-fraction stage at salt 6
    can select ZERO rows (found the hard way by the tmix oracle
    variant). Distinct multipliers make the per-salt maps different
    rotations of Z_p — pairwise uncorrelated selections. ``salt=0``
    keeps the historical ``a^1`` multiplier, so unsalted selections are
    unchanged. Both factors stay < p < 2^31, product < 2^62: no int64
    overflow in either engine, any salt, including negative ones.

    Degeneracy guard: ord(a) = (p-1)/9, so nine salt residues mod p-1
    (salt = -1 first among them) would give a^(salt+1) = 1 — a
    non-mixing identity map. Those fall back to the salt-0 multiplier:
    they stay well-mixed and differ from salt 0 by the additive shift
    (the one remaining correlated PAIR, vs every pair correlated
    before this scheme)."""
    a_s = pow(a % mod, (salt % (mod - 1)) + 1, mod)
    if a_s == 1:
        a_s = a % mod
    salted = F.pmod(
        F.pmod(F.col(id_col), F.lit(mod)) + F.lit(salt % mod), F.lit(mod)
    )
    return (salted * F.lit(a_s)) % F.lit(mod)


def hash_sample(
    docs: DataFrame,
    fraction: float,
    *,
    id_col: str = "doc_id",
    salt: int = 0,
    a: int = 2654435761,
    mod: int = MINHASH_P,
) -> DataFrame:
    """Deterministic content-stable sampling: keep a row iff
    ``((id mod p + salt) mod p · a^(salt+1)) mod p < fraction·p``
    (the shared :func:`_stable_hash`, which see — the per-salt
    MULTIPLIER is what makes selections at different salts
    independent; an additive-only salt would make them constant-
    shifted translates). Unlike ``df.sample`` this is reproducible
    across runs/engines (plain arithmetic — a DuckDB oracle computes
    the identical subset once it pins the same per-salt multiplier),
    stable under repartitioning, and consistent across tables sharing
    the id; nested fractions nest (a 10% sample ⊂ the 30% sample at
    the same salt)."""
    thresh = int(fraction * mod)
    return docs.filter(_stable_hash(id_col, salt, a, mod) < thresh)


def cap_per_source(
    docs: DataFrame,
    max_per_source: int,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 0,
    a: int = 2654435761,
    mod: int = MINHASH_P,
) -> DataFrame:
    """Per-source document cap (the Dolma/C4-style per-DOMAIN cap: no
    single site may dominate the corpus): keep at most
    ``max_per_source`` docs per source, selected by the same
    content-stable multiplicative hash as ``hash_sample`` — so the
    survivors are a deterministic pseudo-random subset, reproducible
    across runs/engines/repartitioning, and a larger cap's survivor
    set CONTAINS a smaller cap's (rank order is cap-independent).

    Plan shape: rank = ``row_number`` per source ordered by (hash, id)
    — a WindowGroupLimit, so each partition prunes to its local top
    ``max_per_source`` before the shuffle; per-task state is the cap,
    not the source's row count, which is exactly what makes a
    100M-page domain affordable."""
    hashed = _stable_hash(id_col, salt, a, mod)
    w = Window.partitionBy(source_col).orderBy(hashed.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_source)
        .drop("_rk")
    )


def token_budget_mix(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt: int = 0,
) -> DataFrame:
    """Deterministic data mixing: sample each source so its share of
    the output token count approaches ``weights`` (normalized) of
    ``total_tokens``. Two passes: (1) one aggregate for per-source
    token totals; (2) per-source hash_sample fractions = target/actual
    (capped at 1 — an under-weight source contributes all it has, the
    standard non-upsampling mix). Selection is content-stable
    (hash_sample), so reruns and incremental rebuilds pick identical
    documents. Returns the sampled docs with a ``target_tokens``
    column for audit.

    Plan shape (VERDICT r6 #2): ONE scan of the corpus in the sampling
    pass — the per-source fractions become a tiny (source, threshold,
    target) table broadcast-joined in, and a single content-stable
    predicate ``hash < threshold`` does every source's sampling at
    once. With S sources the old form ran S filtered scans unioned;
    this form's cost is scan + broadcast, independent of S. Sources
    absent from ``weights`` (or with zero tokens) drop out via the
    inner join, exactly as the old per-source loop skipped them.
    Selection is bit-identical to ``hash_sample(frac, salt=salt)`` per
    source: the threshold is ``int(frac * mod)``, the same truncation
    hash_sample applies.

    FULLY LAZY (optimization round r14): the per-source token totals
    were previously collected to the driver — one eager Spark job per
    call, serial in the caller's build path (guide §5: no collects in
    query paths). The totals are now a lazy aggregate joined with a
    literal per-source target table, and the fraction math runs inside
    the plan with the EXACT float sequence of the old driver loop
    (target is literal weight arithmetic computed here; least(1,
    target/tot) and trunc(frac*mod) are IEEE-identical in the JVM and
    in Python — the DuckDB oracle already computes this same lazy
    sequence, see text_queries._pipeline_sql's ``mixf``). The totals
    pass still reads the corpus once; it is simply part of the query's
    own job now instead of a serial pre-job."""
    from big_ann_spark.functions.text import token_count

    sized = docs.withColumn("_toks", token_count(text_col))
    mix = token_budget_mix_table(
        docs,
        weights,
        total_tokens,
        text_col=text_col,
        source_col=source_col,
    )
    return _apply_mix_table(docs, sized, mix, source_col, id_col, salt)


def token_budget_mix_table(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    *,
    text_col: str = "text",
    source_col: str = "source",
    totals: dict | None = None,
) -> DataFrame:
    """The (source, _thresh, target_tokens) mix table
    :func:`token_budget_mix` broadcasts — exposed so a caller merging
    several mix variants into ONE conditional aggregate (r15, the
    pipeline's sampled-family fusion) can apply the identical
    selection predicate ``mix_hash(id, salt) < _thresh`` itself. Must
    stay the exact table token_budget_mix builds: the float sequence
    (literal weight arithmetic, least(1, target/tot), trunc(frac*mod))
    is oracle-pinned.

    ``totals``: per-source ``sum(token_count(text_col))`` precollected
    (e.g. :func:`mix_source_totals` on a background thread). The table
    is then LITERAL rows with zero in-plan dependency — a caller whose
    scan the lazy aggregate would otherwise gate (the fused pipeline
    branch: the totals broadcast serialized the CPU-dense projection
    behind an extra pass, measured +1.4 s at sf0.1) gets the same
    thresholds from the same IEEE sequence: Python ``min(1.0,
    target/tot)`` / ``int(frac*mod)`` are bit-identical to the plan's
    ``least``/``cast('long')`` on the same doubles."""
    from big_ann_spark.functions.text import token_count

    w_sum = sum(weights.values())
    src_type = docs.schema[source_col].dataType.simpleString()
    if totals is not None:
        return docs.sparkSession.createDataFrame(
            token_budget_mix_rows(weights, total_tokens, totals),
            f"{source_col} {src_type}, _thresh long, target_tokens long",
        )
    sized = docs.withColumn("_toks", token_count(text_col))
    # literal per-source targets: pure weight arithmetic, data-free —
    # the exact floats the old driver loop computed
    wrows = []
    for src, w in weights.items():
        target = total_tokens * (w / w_sum)
        wrows.append((src, target, int(target)))
    wtab = docs.sparkSession.createDataFrame(
        wrows, f"{source_col} {src_type}, _target double, target_tokens long"
    )
    totals_df = sized.groupBy(source_col).agg(F.sum("_toks").alias("_tot"))
    # totals can be NEGATIVE when every doc of a source has NULL text
    # (size(null) = -1 per token_count) — treated like absent (> 0)
    frac = F.least(F.lit(1.0), F.col("_target") / F.col("_tot"))
    return (
        totals_df.join(F.broadcast(wtab), source_col)
        .filter(F.col("_tot") > 0)
        .select(
            source_col,
            (frac * F.lit(MINHASH_P)).cast("long").alias("_thresh"),
            "target_tokens",
        )
    )


def mix_hash(id_col: str = "doc_id", salt: int = 0):
    """The content-stable selection hash the mix family filters on
    (``mix_hash(id, salt) < _thresh``) — exposed alongside the
    ``*_mix_table`` builders so merged conditional aggregates select
    bit-identically to :func:`_apply_mix_table`."""
    return _stable_hash(id_col, salt, 2654435761, MINHASH_P)


def token_budget_mix_rows(
    weights: dict[str, float], total_tokens: int, totals: dict
) -> list[tuple]:
    """(source, _thresh, target_tokens) rows from PRECOLLECTED totals —
    pure driver arithmetic with the oracle-pinned float sequence
    (Python ``min(1.0, target/tot)`` / ``int(frac*mod)`` are
    bit-identical to the lazy plan's ``least``/``cast('long')`` on the
    same doubles). The mix contract keeps sources driver-tiny, so
    callers may inline these rows as literal ``when()`` lookups — zero
    broadcast/join stages on the selection scan (r15)."""
    w_sum = sum(weights.values())
    mix_rows = []
    for src, w in weights.items():
        tot = totals.get(src)
        if tot is None or tot <= 0:
            continue
        target = total_tokens * (w / w_sum)
        frac = min(1.0, target / tot)
        mix_rows.append((src, int(frac * MINHASH_P), int(target)))
    return mix_rows


def temperature_mix_rows(
    total_tokens: int, *, alpha: float = 0.5, totals: dict
) -> list[tuple]:
    """(source, _thresh, target_tokens) rows for the temperature mix —
    the exact driver-side pow()/w_sum sequence
    :func:`temperature_mix_table` persists (sorted-source w_sum
    accumulation; libm pow parity with the oracle)."""
    srcs = sorted(
        s for s, n in totals.items() if s is not None and n is not None and n > 0
    )
    w = {s: float(totals[s]) ** alpha for s in srcs}
    w_sum = 0.0
    for s in srcs:
        w_sum += w[s]
    mix_rows = []
    for s in srcs:
        target = total_tokens * (w[s] / w_sum)
        frac = min(1.0, target / totals[s])
        mix_rows.append((s, int(frac * MINHASH_P), int(target)))
    return mix_rows


def _apply_mix_table(
    docs: DataFrame,
    sized: DataFrame,
    mix: DataFrame,
    source_col: str,
    id_col: str,
    salt: int,
) -> DataFrame:
    """One-scan sampling shared by the mix family: the ``mix`` table —
    (source, _thresh, target_tokens), literal rows or a lazy aggregate,
    tiny either way — is broadcast and a single content-stable
    ``hash < threshold`` predicate samples every source at once."""
    a, mod = 2654435761, MINHASH_P
    return (
        sized.join(F.broadcast(mix), source_col)
        .filter(_stable_hash(id_col, salt, a, mod) < F.col("_thresh"))
        .select(*docs.columns, "target_tokens")
    )


def mix_source_totals(
    docs: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
) -> dict:
    """The per-source token-count sums :func:`temperature_mix` derives
    its weights from — exposed so a caller can run this one collect on
    a background thread (guide §2.6 overlap) and pass the dict via
    ``totals=``. Must stay the exact aggregate temperature_mix would
    compute itself."""
    from big_ann_spark.functions.text import token_count

    sized = docs.withColumn("_toks", token_count(text_col))
    return {
        r[source_col]: r["_n"]
        for r in sized.groupBy(source_col).agg(F.sum("_toks").alias("_n")).collect()
    }


def temperature_mix(
    docs: DataFrame,
    total_tokens: int,
    *,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt: int = 0,
    totals: dict | None = None,
) -> DataFrame:
    """Temperature-based data mixing (the T5 / XLM-R / UNIMAX
    multilingual-sampling rule): source weights are DATA-DERIVED as
    ``w_i = n_i^alpha`` over each source's token count ``n_i``, so
    ``alpha = 1`` reproduces the corpus's natural proportions and
    ``alpha -> 0`` flattens toward a uniform per-source budget —
    lower temperature up-weights small (tail-language / rare-domain)
    sources relative to their natural share. Everything downstream of
    the weight derivation is :func:`token_budget_mix`'s single-scan,
    content-stable machinery (broadcast mix table + one hash
    predicate); like there, an under-budget source contributes all it
    has (no upsampling).

    Determinism contract (oracle parity): w_sum is accumulated in
    sorted-source order and each fraction is the literal expression
    ``min(1, (total * (w/w_sum)) / n_i)`` — the SQL oracle computes
    the identical float sequence via pow()/least(). The totals collect
    stays DRIVER-SIDE here (unlike the r14-lazified token_budget_mix):
    ``n ** alpha`` must match the oracle's libm pow bit-for-bit, which
    Python guarantees (both call libm) and JVM ``Math.pow`` does not,
    and w_sum must accumulate in sorted-source order. ``totals`` lets
    a caller pass the per-source token sums precollected (e.g. off a
    shared background job — guide §2.6 overlap); the dict must equal
    ``{source: sum(token_count(text_col))}`` over ``docs`` exactly."""
    from big_ann_spark.functions.text import token_count

    sized = docs.withColumn("_toks", token_count(text_col))
    mix = temperature_mix_table(
        docs,
        total_tokens,
        alpha=alpha,
        text_col=text_col,
        source_col=source_col,
        totals=totals,
    )
    return _apply_mix_table(docs, sized, mix, source_col, id_col, salt)


def temperature_mix_table(
    docs: DataFrame,
    total_tokens: int,
    *,
    alpha: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
    totals: dict | None = None,
) -> DataFrame:
    """The literal (source, _thresh, target_tokens) mix table
    :func:`temperature_mix` broadcasts — exposed for merged
    conditional aggregates (see :func:`token_budget_mix_table`). The
    driver-side pow()/w_sum float sequence is oracle-pinned; do not
    move it into the plan."""
    if totals is None:
        totals = mix_source_totals(docs, text_col=text_col, source_col=source_col)
    # NULL sources and non-positive totals (all-NULL-text sources
    # aggregate to a NEGATIVE total: size(null) = -1) are dropped by
    # the rows helper — like token_budget_mix, such sources contribute
    # nothing to the output
    mix_rows = temperature_mix_rows(total_tokens, alpha=alpha, totals=totals)
    # the mix table's source column must carry the CORPUS's source
    # type (ADVICE r7: hardcoding string broke int-sourced corpora at
    # createDataFrame where the old per-source loop handled any type)
    src_type = docs.schema[source_col].dataType.simpleString()
    return docs.sparkSession.createDataFrame(
        mix_rows, f"{source_col} {src_type}, _thresh long, target_tokens long"
    )
