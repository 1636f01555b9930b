"""Dedup operator semantics: MinHash-LSH recall vs exact Jaccard,
SimHash properties, exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.operators import dedup as D


def _corpus(spark):
    """12 docs: 4 near-dup pairs (small edits), 4 unrelated."""
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "a stitch in time saves nine and a penny saved is a penny earned now",
        "to be or not to be that is the question whether tis nobler in mind",
        "all that glitters is not gold and all who wander are not lost here",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
        # near-dup: change the final word
        rows.append((100 + i, " ".join(t.split()[:-1] + ["zzz"])))
    rows += [
        (200, "completely different content about spark query engines and shuffles"),
        (201, "vector search with hnsw graphs and product quantization methods"),
        (202, "interval trees support point stabbing and envelopment queries fast"),
        (203, "kolmogorov smirnov tests compare empirical distribution functions"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc dd")], "doc_id long, text string"
    )
    out = {r["kept_doc_id"]: r["n_copies"] for r in D.exact_dedup(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_jaccard_pairs_find_near_dups(spark):
    pairs = D.jaccard_similarity_pairs(_corpus(spark)).collect()
    strong = {(r["doc_a"], r["doc_b"]) for r in pairs if r["jaccard"] >= 0.5}
    assert {(0, 100), (1, 101), (2, 102), (3, 103)} <= strong


def test_minhash_lsh_recall(spark):
    corpus = _corpus(spark)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_similarity_pairs(corpus).collect()
        if r["jaccard"] >= 0.5
    }
    found = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_dedup_pairs(corpus, threshold=0.5).collect()
    }
    # LSH with 8x4 bands at J>=0.5: candidate prob ≈ 1-(1-0.5^4)^8 ≈ 0.4
    # per band config — but our true pairs have J≈0.8 (prob ≈ 0.97);
    # require full recall on these strong pairs and no false positives
    assert exact and found >= exact
    assert all(p in {r for r in found} or True for p in exact)
    # verification step guarantees precision: every found pair is a true pair
    assert found <= {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_similarity_pairs(corpus).collect()
        if r["jaccard"] >= 0.5
    }


def test_simhash_near_dups_closer_than_random(spark):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash64(_corpus(spark)).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [ham(sh[i], sh[100 + i]) for i in range(4)]
    far = [ham(sh[200], sh[201]), ham(sh[202], sh[203]), ham(sh[0], sh[202])]
    assert max(near) < min(far), (near, far)


def test_simhash_plan_has_single_explode(spark):
    """VERDICT r3 #5: the per-(token, bit) explode multiplied pre-agg
    rows ×62. The fingerprint must now reach its one aggregation
    straight from the token explode — exactly one Generate in the
    physical plan, and one hash aggregation pair (partial+final), not
    two."""
    plan = D.simhash64(_corpus(spark))._jdf.queryExecution().executedPlan().toString()
    # node-substring counts, robust to aggregate-impl fallbacks
    # (Hash/ObjectHash/SortAggregate) and version renames (ADVICE r4):
    # exactly one explode, and at most one partial+final aggregation
    # pair — a second aggregation round-trip would betray the x62 row
    # inflation regressing.
    n_generate = sum(line.count("Generate") for line in plan.splitlines())
    n_agg = sum(
        1
        for line in plan.splitlines()
        for marker in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
        if marker in line
    )
    assert n_generate == 1, plan
    assert n_agg <= 2, plan


def test_simhash_near_pairs_blocking(spark):
    out = D.simhash_near_pairs(_corpus(spark), max_hamming=10)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert {(0, 100), (1, 101), (2, 102), (3, 103)} <= got


def test_embedding_lsh_near_dup_matches_brute_force(spark, sf_dir):
    """Banded hyperplane-LSH near-dup (the bucketed 100 TB path,
    VERDICT r2 #3): at 16 bands x 3 rows the candidate pass recovers
    every brute-force pair on the fixture, verification is exact, and
    the plan joins by hash — no nested-loop cross product."""
    from big_ann_spark.catalog import load_table
    from big_ann_spark.plans import executed_plan as _plan

    e = load_table(spark, sf_dir, "embeddings")
    brute = {(r[0], r[1]) for r in D.embedding_near_dup_pairs(e, threshold=0.45).collect()}
    lsh_df = D.embedding_lsh_near_dup_pairs(e, threshold=0.45)
    lsh = {(r[0], r[1]) for r in lsh_df.collect()}
    assert lsh == brute and len(brute) > 0
    plan = _plan(lsh_df)
    assert "NestedLoop" not in plan
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)


def test_embedding_lsh_band_signatures_shape(spark, sf_dir):
    from big_ann_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    sigs = D.embedding_lsh_band_signatures(e, n_bands=4, rows_per_band=2)
    assert sigs.count() == 4 * n
    rng = sigs.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert 0 <= rng[0] and rng[1] <= 3  # 2 rows/band -> buckets in [0, 3]


def test_prefix_filtered_equals_naive_threshold(spark, sf_dir):
    """Prefix filtering is EXACT: df-ordered prefix indexing must
    reproduce the naive full-inverted-index answer at the threshold —
    no missed pairs (the theorem), no extras (verification)."""
    from big_ann_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
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
    corpus = d.union(mutated)
    naive = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in D.jaccard_similarity_pairs(corpus)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    pf = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in D.prefix_filtered_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    assert pf == naive and len(naive) > 0


def test_prefix_max_df_equals_naive_on_capped_universe(spark):
    """With max_df set, the prefix path must equal the naive inverted
    index computed over the SAME capped shingle universe (consistent
    set semantics on both sides), and must drop pairs whose similarity
    rode only on the hot boilerplate."""
    boiler = "subscribe to our newsletter for updates "
    rows = []
    for i in range(40):
        # unique body + shared boilerplate: boilerplate shingles hit
        # df=40, body shingles df<=2
        body = f"doc number {i} talks about topic {i % 20} in detail "
        rows.append((i, boiler + body))
        if i < 10:  # 10 genuine near-dup partners (body shared)
            rows.append((1000 + i, boiler + body + "extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.doc_shingles(docs)
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    capped_sh = sh.join(
        df_counts.filter(F.col("_df") <= 5).select("shingle"), "shingle"
    )
    naive = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in D.jaccard_similarity_pairs(docs, shingles=capped_sh)
        .filter(F.col("jaccard") >= 0.4)
        .collect()
    }
    pf = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in D.prefix_filtered_jaccard_pairs(
            docs, threshold=0.4, max_df=5
        ).collect()
    }
    assert pf == naive and len(pf) > 0
    # genuine (body-sharing) partners survive the cap
    got_pairs = {(a, b) for a, b, _ in pf}
    assert (0, 1000) in got_pairs
    # boilerplate-only pairs do NOT (uncapped they can pass 0.4)
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in D.prefix_filtered_jaccard_pairs(docs, threshold=0.4).collect()
    }
    boiler_only = uncapped - got_pairs
    assert boiler_only, "fixture should have boilerplate-driven pairs"
    # in particular, pairs of DISTINCT base docs (no shared body at all)
    # passed 0.4 only through boilerplate and are gone under the cap
    assert any(a < 1000 and b < 1000 for a, b in boiler_only)


def test_lsh_max_bucket_size_drops_hot_bucket(spark):
    """A clone clique lands every band in one bucket of clique size; a
    cap below it kills the b^2/2 straggler pairs while pairs meeting in
    small buckets survive (SCALE.md hot-key cap, VERDICT r6 #3)."""
    rows = [(i, "identical boilerplate page content " * 3) for i in range(60)]
    rows += [
        (1000, "a unique document about spark adaptive query execution today"),
        (1001, "a unique document about spark adaptive query execution now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = D.minhash_signatures(docs)
    uncapped = D.lsh_candidate_pairs(sigs)
    capped = D.lsh_candidate_pairs(sigs, max_bucket_size=10)
    assert uncapped.count() >= 60 * 59 // 2  # clique blowup present
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (1000, 1001) in got  # small-bucket pair survives
    assert not any(a < 1000 and b < 1000 for a, b in got)  # clique gone
    # end-to-end knob: verified pipeline exposes it
    out = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_dedup_pairs(
            docs, threshold=0.5, max_bucket_size=10
        ).collect()
    }
    assert out == {(1000, 1001)}


def test_incremental_minhash_max_bucket_size(spark):
    """The incremental screen's hot-bucket cap: a history clique above
    the cap stops producing |new| x |hist| candidate pairs, while a
    genuine near-dup of a non-hot history doc is still caught."""
    hist_rows = [(i, "identical boilerplate page content " * 3) for i in range(50)]
    hist_rows.append((500, "a unique history document about interval trees and joins"))
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (9000, "identical boilerplate page content " * 3),
            (9001, "a unique history document about interval trees and queries"),
            (9002, "totally novel content with no partner in the landed corpus"),
        ],
        "doc_id long, text string",
    )
    dups = {
        r.doc_id
        for r in D.incremental_minhash_dedup(
            new, hist, threshold=0.4, mode="duplicates", max_bucket_size=10
        ).collect()
    }
    assert 9001 in dups  # small-bucket match survives the cap
    assert 9000 not in dups  # clique match suppressed (documented recall cost)
    surv = {
        r.doc_id
        for r in D.incremental_minhash_dedup(
            new, hist, threshold=0.4, mode="survivors", max_bucket_size=10
        ).collect()
    }
    assert surv == {9000, 9002}


def test_min_label_components_hand_graph(spark):
    """Chain 1-2-3, pair 10-11, singleton 99: labels converge to the
    component min; the chain needs >1 propagation round."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "id long")
    got = {
        (r.doc_id, r.cluster_rep)
        for r in D.min_label_components(edges, nodes).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)}


def test_minhash_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """Cluster labels must be exactly the connected components of the
    verified near-dup pairs: both endpoints of every pair share a
    label, every label is its component's min id, and docs in no pair
    are their own representative (recall of the pair stage itself is
    covered by test_minhash_lsh_recall)."""
    from big_ann_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
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
    corpus = d.union(mutated)
    pairs = [
        (r.doc_a, r.doc_b)
        for r in D.minhash_dedup_pairs(corpus, threshold=0.3).collect()
    ]
    labels = {
        r.doc_id: r.cluster_rep
        for r in D.minhash_dedup_clusters(corpus, threshold=0.3).collect()
    }
    assert len(labels) == corpus.count() and len(pairs) > 0
    assert all(labels[a] == labels[b] for a, b in pairs)
    # reference components via union-find over the same edges
    parent = {i: i for i in labels}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert all(labels[i] == find(i) for i in labels)


def test_embedding_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    """SemDeDup-shape clusters must be the connected components of the
    LSH-verified cosine pairs: endpoints share a label, labels are the
    component min id (union-find reference), singletons keep
    themselves; every input vector gets exactly one row."""
    from big_ann_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(200)
    pairs = [
        (r.id_a, r.id_b)
        for r in D.embedding_lsh_near_dup_pairs(e, threshold=0.45).collect()
    ]
    labels = {
        r.doc_id: r.cluster_rep
        for r in D.embedding_dedup_clusters(e, threshold=0.45).collect()
    }
    assert len(labels) == e.count()
    assert all(labels[a] == labels[b] for a, b in pairs)
    parent = {i: i for i in labels}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert all(labels[i] == find(i) for i in labels)


def test_duplicate_ngram_spans_hand_case(spark):
    """Two docs share an 8-token phrase; one doc also self-repeats a
    gram. Spans must cover exactly the duplicated token ranges and
    touching grams must merge into one maximal span."""
    shared = "a b c d e f g h"  # 8 tokens, present in docs 1 and 2
    d1 = f"x1 x2 {shared} y1 y2"
    d2 = f"z1 {shared} z2 z3 z4"
    d3 = "p q r s t u v w p q r s t u v w"  # self-repeat: 2 occurrences
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.begin, r.end)
        for r in D.duplicate_ngram_spans(docs, n=8).collect()
    }
    # d1: tokens 2..9 dup; d2: tokens 1..8 dup; d3: both copies (plus the
    # wrap-around grams bridging them) -> one span covering all 16 tokens
    assert got == {(1, 2, 10), (2, 1, 9), (3, 0, 16)}


def test_ngram_dedup_clusters_exact_components(spark):
    """Exact-threshold clusters: components of the brute-force J>=t
    pair graph, singletons as own rep (no LSH recall caveat)."""
    corpus = _corpus(spark)
    pairs = [
        (r.doc_a, r.doc_b)
        for r in D.jaccard_similarity_pairs(corpus)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    ]
    labels = {
        r.doc_id: r.cluster_rep
        for r in D.ngram_dedup_clusters(corpus, threshold=0.5).collect()
    }
    assert len(labels) == corpus.count()
    parent = {i: i for i in labels}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert labels == {i: find(i) for i in labels}
    # the four seeded near-dup pairs actually cluster
    assert all(labels[100 + i] == i for i in range(4))


def test_pii_redaction(spark):
    from big_ann_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@site.org or visit https://a.b/c?q=1 now"),
            (2, "call 12345678 from 10.0.0.1 ok"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        T.redact_pii("text").alias("red"),
        *[v.alias(k) for k, v in T.pii_counts("text").items()],
    ).collect()
    by = {r.doc_id: r for r in out}
    assert by[1].email == 1 and by[1].url == 1
    assert "<EMAIL>" in by[1].red and "<URL>" in by[1].red
    assert "jo.doe" not in by[1].red and "a.b" not in by[1].red
    assert by[2].digits == 1 and by[2].ipv4 == 1
    assert "<DIGITS>" in by[2].red and "<IPV4>" in by[2].red
    assert by[3].red == "clean text with no pii at all"
    assert by[3].email == by[3].url == by[3].ipv4 == by[3].digits == 0


def test_c4_clean_rules(spark):
    """Every C4 rule exercised on hand-built pages: line retention
    (terminal punctuation, >=5 words, no 'javascript'), page drops
    (<3 sentences, 'lorem ipsum', '{', pinned bad word)."""
    from big_ann_spark.functions import text as T

    docs = spark.createDataFrame(
        [
            (
                1,
                "this line has enough words here.\n"
                "too short.\n"
                "no terminal punctuation despite its many fine words\n"
                "a javascript line with plenty of words.\n"
                "  padded line with five good words!  \n"
                'quoted line has exactly six words?"',
            ),
            (2, "good first sentence with five words.\nmentions Lorem Ipsum dolor sit amet.\nthird fine sentence with many words."),
            (3, "curly brace pages are code dumps.\nsecond valid sentence right here okay.\nthird valid sentence right here too { x }."),
            (4, "a BadWord page gets dropped entirely.\nsecond valid sentence right here okay.\nthird valid sentence right here too."),
            (5, "only two valid sentences on page.\nsecond valid sentence right here okay"),
        ],
        "doc_id long, text string",
    )
    c4 = T.c4_clean("text")
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", *[v.alias(k) for k, v in c4.items()]
        ).collect()
    }
    assert out[1].kept_text == (
        "this line has enough words here.\n"
        "padded line with five good words!\n"
        'quoted line has exactly six words?"'
    )
    assert out[1].n_lines == 6 and out[1].n_lines_kept == 3
    assert out[1].n_sentences == 4  # . ! ? " — mid-line marks count
    assert not out[1].drop_page
    assert out[2].drop_page  # lorem ipsum, case-insensitive
    assert out[3].drop_page  # curly brace
    assert out[4].drop_page  # bad word, case-insensitive
    assert out[5].drop_page and out[5].n_sentences == 1  # < 3 sentences


def test_hash_sample_deterministic_and_proportional(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], "doc_id long, text string"
    )
    a = {r.doc_id for r in D.hash_sample(docs, 0.3).collect()}
    b = {r.doc_id for r in D.hash_sample(docs, 0.3).collect()}
    assert a == b  # rerun-stable
    assert 0.25 < len(a) / 2000 < 0.35
    # nested fractions: a 0.1 sample is a subset of the 0.3 sample
    c = {r.doc_id for r in D.hash_sample(docs, 0.1).collect()}
    assert c <= a
    # salt decorrelates
    d = {r.doc_id for r in D.hash_sample(docs, 0.3, salt=7).collect()}
    assert d != a


def test_hash_sample_extreme_salts_respect_fraction(spark):
    # ADVICE r5: salts beyond ~1.3e9 used to overflow int64 and make
    # the predicate silently always-true (fraction ignored). Pinned:
    # any salt, including negative, still samples ~fraction.
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], "doc_id long, text string"
    )
    for salt in (10**18, -10**18, 2**62, -7):
        got = D.hash_sample(docs, 0.3, salt=salt).count()
        assert 0.2 < got / 2000 < 0.4, f"salt={salt} kept {got}/2000"


def test_token_budget_mix_empty_path_schema(spark):
    # ADVICE r5: the no-matching-source branch must return the SAME
    # schema as the normal path (no leaked _toks column).
    docs = spark.createDataFrame(
        [(1, "a b c", "web")], "doc_id long, text string, source string"
    )
    normal = D.token_budget_mix(docs, {"web": 1.0}, total_tokens=100)
    empty = D.token_budget_mix(docs, {"nosuch": 1.0}, total_tokens=100)
    assert empty.schema == normal.schema
    assert empty.count() == 0
    # unionByName across the two branches must not raise
    assert normal.unionByName(empty).count() == normal.count()


def test_min_label_components_warns_on_non_convergence(spark):
    import warnings as W

    # a 40-node chain has diameter >> max_iter=2 -> labels are not a
    # fixpoint; ADVICE r5: that must be surfaced, not silent.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        D.min_label_components(edges, max_iter=2).collect()
    assert any("did not converge" in str(w.message) for w in rec)


def test_min_label_components_raise_mode(spark):
    """on_nonconverge='raise': a chain longer than max_iter must raise
    instead of returning silently over-split labels (ADVICE r6 — the
    recursive-CTE oracle computes exact components, so a non-fixpoint
    return would hash-mismatch undiagnosably)."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.min_label_components(edges, max_iter=2, on_nonconverge="raise").collect()
    # converged runs are unaffected
    out = {
        (r.doc_id, r.cluster_rep)
        for r in D.min_label_components(
            edges, max_iter=10, on_nonconverge="raise"
        ).collect()
    }
    assert out == {(i, 0) for i in range(7)}


def test_token_budget_mix(spark):
    rows = []
    for i in range(300):
        rows.append((i, "w " * 9 + "w", "web"))        # 10 tokens each
    for i in range(300, 400):
        rows.append((i, "b " * 9 + "b", "books"))      # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = D.token_budget_mix(
        docs, {"web": 1.0, "books": 1.0}, total_tokens=2000
    )
    got = out.groupBy("source").count().collect()
    by = {r.source: r["count"] for r in got}
    # each source targets 1000 tokens = 100 docs; hash sampling is
    # approximate for web (300 docs -> frac 1/3), exact-ish bounds
    assert 70 <= by["web"] <= 130
    # books has exactly its target (frac capped at 1.0 -> all 100 docs)
    assert by["books"] == 100
    # deterministic across reruns
    again = {r.doc_id for r in D.token_budget_mix(
        docs, {"web": 1.0, "books": 1.0}, total_tokens=2000).select("doc_id").collect()}
    first = {r.doc_id for r in out.select("doc_id").collect()}
    assert first == again

    # non-string source columns work: the mix table derives the corpus
    # column's type (ADVICE r7 — hardcoded string broke int sources)
    int_docs = spark.createDataFrame(
        [(i, "w " * 9 + "w", i % 2) for i in range(200)],
        "doc_id long, text string, source int",
    )
    int_out = D.token_budget_mix(int_docs, {0: 1.0, 1: 1.0}, total_tokens=1000)
    assert int_out.count() > 0
    assert {r.source for r in int_out.select("source").distinct().collect()} <= {0, 1}


def test_benchmark_contamination_brute_force(spark):
    """Census equals a pure-Python distinct-n-gram overlap, zero-gram
    docs included, and the bench side arrives broadcast."""
    n = 3
    train_rows = [
        (1, "a b c d e f"),          # shares the c-d-e window with bench
        (2, "x y z q r s"),          # clean
        (3, "a b"),                  # shorter than n -> zero grams
        (4, "c d e c d e c d e"),    # only bench-matched grams
    ]
    bench_rows = [(100, "c d e c d e"), (101, "p q r")]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")

    def grams(t):
        toks = t.split(" ")
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_set = set().union(*(grams(t) for _, t in bench_rows))
    expect = {}
    for i, t in train_rows:
        g = grams(t) if len(t.split(" ")) >= n else set()
        expect[i] = (len(g), len(g & bench_set))

    out = D.benchmark_contamination(train, bench, n=n)
    got = {
        r.doc_id: (r.n_grams, r.n_matched, r.contam_frac)
        for r in out.collect()
    }
    assert set(got) == set(expect)
    for i, (ng, nm) in expect.items():
        assert got[i][0] == ng and got[i][1] == nm
        assert got[i][2] == (nm / ng if ng else 0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_repetition_metrics_hand_case(spark):
    from big_ann_spark.functions import text as T

    d = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, "p q p q p q")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.max_word_frac, r.top_bigram_frac)
        for r in T.repetition_metrics(d).collect()
    }
    # doc1: 'a'x3 of 4 tokens; bigrams 'a a'x2, 'a b'x1 -> 2/3
    assert got[1] == (0.75, 2 / 3)
    # single-token doc: no bigrams -> 0.0
    assert got[2] == (1.0, 0.0)
    # doc3: p/q each 3 of 6; 'p q'x3 of 5 bigrams
    assert got[3] == (0.5, 0.6)


def test_incremental_exact_dedup(spark):
    hist = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(20)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1000 + i, f"doc {i} text") for i in range(10)]     # dups of history
        + [(2000 + i, f"fresh {i} text") for i in range(5)]  # genuinely new
        + [(3000, "fresh 0 text")],                          # within-batch dup
        "doc_id long, text string",
    )
    surv = {r.kept_doc_id: r.n_copies
            for r in D.incremental_exact_dedup(new, hist).collect()}
    assert len(surv) == 5 and surv[2000] == 2  # min-id winner, copy count
    assert all(k >= 2000 for k in surv)
    dups = {r.kept_doc_id for r in
            D.incremental_exact_dedup(new, hist, mode="duplicates").collect()}
    assert dups == {1000 + i for i in range(10)}


def test_incremental_dedup_duplicates_gets_runtime_bloom(spark):
    """The 'duplicates' semi-join shape must stay eligible for Spark's
    runtime Bloom-filter injection: raw hash projections on both sides,
    no Aggregate below the join (the injection rule declines those).
    Pin it so a refactor that re-introduces a pre-join distinct is
    caught here, not in a 100 TB run."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big_new = spark.range(0, 100000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id")).alias("text"),
        )
        small_hist = (
            spark.range(0, 100000)
            .filter(F.col("id") % 101 == 0)
            .select(F.concat(F.lit("t"), F.col("id")).alias("text"))
        )
        q = D.incremental_exact_dedup(big_new, small_hist, mode="duplicates")
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_unigram_logprob_hand_case(spark):
    import math

    from big_ann_spark.functions import text as T

    d = spark.createDataFrame(
        [(1, "a a b"), (2, "z q")], "doc_id long, text string"
    )
    got = {r.doc_id: r.lp_per_token for r in T.unigram_logprob(d).collect()}
    # corpus counts: a=2 b=1 z=1 q=1; T=5, V=4, smoothing +1/(T+V)
    exp1 = (2 * math.log(3 / 9) + math.log(2 / 9)) / 3
    exp2 = math.log(2 / 9)
    assert abs(got[1] - exp1) < 1e-12 and abs(got[2] - exp2) < 1e-12
    # external LM: token unseen by the LM gets the smoothed floor
    lm = spark.createDataFrame([(9, "a a")], "doc_id long, text string")
    got2 = {r.doc_id: r.lp_per_token
            for r in T.unigram_logprob(d, lm_docs=lm).collect()}
    # LM: a=2, T=2, V=1 -> p(a)=3/3, p(unseen)=1/3
    assert abs(got2[1] - (2 * math.log(1.0) + math.log(1 / 3)) / 3) < 1e-12
    assert abs(got2[2] - math.log(1 / 3)) < 1e-12


def test_incremental_minhash_matches_batch_cross_pairs(spark, sf_dir):
    """The incremental screen must flag exactly the (new x history)
    pairs the full-corpus batch pipeline verifies; survivors mode is
    the anti-join of duplicates; and running from persisted
    band/shingle stores (no history text) is identical."""
    from big_ann_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    new = d.select(
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
    hist = d.filter(F.col("doc_id") % 2 == 0)

    batch_pairs = {
        (r.doc_b, r.doc_a, round(r.jaccard, 6))
        for r in D.minhash_dedup_pairs(hist.union(new), threshold=0.3).collect()
        if r.doc_a < 100000 and r.doc_b >= 100000
    }
    dup = D.incremental_minhash_dedup(
        new, hist, threshold=0.3, mode="duplicates"
    )
    incr_pairs = {
        (r.doc_id, r.dup_of, round(r.jaccard, 6)) for r in dup.collect()
    }
    assert incr_pairs == batch_pairs and incr_pairs

    surv = {
        r.doc_id
        for r in D.incremental_minhash_dedup(
            new, hist, threshold=0.3, mode="survivors"
        ).collect()
    }
    flagged = {p[0] for p in incr_pairs}
    all_new = {r.doc_id for r in new.select("doc_id").collect()}
    assert surv == all_new - flagged

    # store-based path: persisted band table + shingle store, history
    # text never touched
    sigs_hist = D.minhash_signatures(hist)
    stores = D.incremental_minhash_dedup(
        new,
        history_bands=D.band_table(sigs_hist),
        history_shingles=D.doc_shingles(hist),
        threshold=0.3,
        mode="duplicates",
    )
    assert {
        (r.doc_id, r.dup_of, round(r.jaccard, 6)) for r in stores.collect()
    } == incr_pairs


def test_incremental_minhash_side_tagged_on_reused_id(spark):
    """A doc_id present on BOTH sides (re-crawled page, stable id) must
    be verified new-text-vs-stored-text — never against itself. The
    emitted jaccard equals the true cross-side value (one row, not a
    union-join fanout with a spurious 1.0)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    trunc = " ".join(base.split()[:-2])
    hist = spark.createDataFrame([(7, base)], "doc_id long, text string")
    new = spark.createDataFrame([(7, trunc)], "doc_id long, text string")
    rows = D.incremental_minhash_dedup(
        new, hist, threshold=0.3, mode="duplicates"
    ).collect()
    assert len(rows) == 1 and rows[0].doc_id == 7 and rows[0].dup_of == 7

    def shingles(t):
        w = t.split()
        return {tuple(w[i : i + 3]) for i in range(len(w) - 2)}

    a, b = shingles(trunc), shingles(base)
    want = len(a & b) / len(a | b)
    assert abs(rows[0].jaccard - want) < 1e-9, (rows[0].jaccard, want)


def test_cap_per_source(spark):
    """Per-source cap: counts == min(cap, source size); survivors are
    deterministic, repartition-stable, and nested (cap-20 survivors ⊂
    cap-50 survivors — rank order is cap-independent)."""
    rows = [(i, f"t{i}", f"src{i % 3}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    c50 = {r.doc_id for r in D.cap_per_source(docs, 50).collect()}
    c50b = {r.doc_id for r in D.cap_per_source(docs.repartition(7), 50).collect()}
    assert c50 == c50b and len(c50) == 150
    from collections import Counter

    per_src = Counter(i % 3 for i in c50)
    assert all(per_src[s] == 50 for s in range(3))
    c20 = {r.doc_id for r in D.cap_per_source(docs, 20).collect()}
    assert c20 < c50
    # a source smaller than the cap passes through whole
    tiny = spark.createDataFrame(
        rows[:10], "doc_id long, text string, source string"
    )
    assert D.cap_per_source(tiny, 50).count() == 10


def test_normalize_url_and_url_dedup(spark):
    from big_ann_spark.functions import text as T

    cases = [
        # (raw, canonical)
        ("https://WWW.Example.COM/Path/Page/", "example.com/Path/Page"),
        ("http://example.com/Path/Page", "example.com/Path/Page"),
        ("https://example.com/a?utm_source=x&utm_medium=y", "example.com/a"),
        ("https://example.com/a?id=7&utm_source=x", "example.com/a?id=7"),
        ("https://example.com/a?utm_source=x&id=7", "example.com/a?id=7"),
        ("https://example.com/a#frag", "example.com/a"),
        ("example.com/a/", "example.com/a"),
        # path case is SIGNIFICANT and must survive; host case must not
        ("HTTP://EXAMPLE.com/CaseSensitivePath", "example.com/CaseSensitivePath"),
        ("https://example.com/b?gclid=123&fbclid=9", "example.com/b"),
        # a slash ending a query VALUE is content-addressing: preserved
        ("https://example.com/login?next=/admin/", "example.com/login?next=/admin/"),
        ("https://example.com/login/?next=/admin/", "example.com/login?next=/admin/"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i long, url string"
    )
    got = {r.i: r.n for r in df.select("i", T.normalize_url("url").alias("n")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)

    # URL-keyed dedup: all variants of /Path/Page collapse to one key
    keys = df.select(T.normalize_url("url").alias("n")).filter(
        F.col("n") == "example.com/Path/Page"
    )
    assert keys.count() == 2


def test_temperature_mix(spark):
    rows = []
    for i in range(900):
        rows.append((i, "w " * 9 + "w", "web"))        # 9000 tokens
    for i in range(900, 1000):
        rows.append((i, "b " * 9 + "b", "books"))      # 1000 tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # alpha=1 is the natural mix: budgets proportional to size, which
    # with total == corpus size keeps (approximately) everything
    nat = D.temperature_mix(docs, 10_000, alpha=1.0)
    tgt = {r.source: r.target_tokens for r in
           nat.select("source", "target_tokens").distinct().collect()}
    assert tgt == {"web": 9000, "books": 1000}

    # alpha=0 is the uniform mix: equal budgets regardless of size
    uni = D.temperature_mix(docs, 2000, alpha=0.0)
    tgt0 = {r.source: r.target_tokens for r in
            uni.select("source", "target_tokens").distinct().collect()}
    assert tgt0 == {"web": 1000, "books": 1000}

    # 0 < alpha < 1 up-weights the small source relative to natural:
    # books' share of the budget strictly between natural 10% and 50%
    mid = D.temperature_mix(docs, 2000, alpha=0.5)
    tgtm = {r.source: r.target_tokens for r in
            mid.select("source", "target_tokens").distinct().collect()}
    assert 200 < tgtm["books"] < 1000 and tgtm["web"] + tgtm["books"] <= 2000

    # content-stable: reruns select identical documents
    a = {r.doc_id for r in mid.select("doc_id").collect()}
    b = {r.doc_id for r in
         D.temperature_mix(docs, 2000, alpha=0.5).select("doc_id").collect()}
    assert a == b and len(a) > 0

    # alpha=1 equals token_budget_mix with natural-share weights
    w = {"web": 9000.0, "books": 1000.0}
    tb = D.token_budget_mix(docs, w, 2000)
    # same budgets -> same thresholds -> same selected ids at salt=0
    tb_ids = {r.doc_id for r in tb.select("doc_id").collect()}
    tm_sel = D.temperature_mix(docs, 2000, alpha=1.0)
    assert {r.doc_id for r in tm_sel.select("doc_id").collect()} == tb_ids


def test_stable_hash_salt_minus_one_still_mixes(spark):
    """salt=-1 would hit a^(p-1) ≡ 1 (Fermat) — the degeneracy guard
    must keep it a real multiplicative hash, not the identity map."""
    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), F.lit("w x").alias("text")
    )
    out = D.hash_sample(docs, 0.1, salt=-1)
    ids = sorted(r.doc_id for r in out.collect())
    assert 250 <= len(ids) <= 550            # ~10%, not 0% and not a prefix
    # NOT the contiguous low-id prefix the identity map would keep
    assert ids != list(range(len(ids)))


def test_temperature_mix_null_text_and_null_source(spark):
    """All-NULL-text sources aggregate to a NEGATIVE token total
    (size(null) = -1) and NULL sources can't join the mix table —
    both must be excluded cleanly, not crash with a complex-number
    TypeError."""
    rows = [(i, "w " * 9 + "w", "web") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string").unionByName(
        spark.createDataFrame(
            [(100, None, "ghost"), (101, None, "ghost"), (102, "w x y", None)],
            "doc_id long, text string, source string",
        )
    )
    out = D.temperature_mix(docs, 10_000, alpha=0.5)
    got = {r.source for r in out.select("source").distinct().collect()}
    assert got == {"web"}
    assert out.count() == 50  # budget covers all of web; ghost/null dropped
