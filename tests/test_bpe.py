"""Distributed BPE trainer vs an independent pure-Python model of the
same algorithm (overlap-counted pair statistics, deterministic
(count desc, pair asc) tie-break, greedy-leftmost merge application)."""

from __future__ import annotations

from collections import Counter

from big_ann_spark.operators import bpe as B

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


def _py_bpe_train(texts, n_merges, min_freq=2):
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    vocab = {tuple(list(w) + [B.END]): f for w, f in vocab.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:  # greedy-leftmost, identical to the fold
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_model(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    got = B.bpe_train(docs, 12)  # auto -> driver-local path
    want = _py_bpe_train(CORPUS, 12)
    assert got == want and len(got) >= 8


def test_bpe_distributed_batched_parity_interleaved_sweeps(spark):
    # VERDICT r5 #3: the batched distributed loop must produce the
    # bit-identical merge table at ANY sweep size (the batch selector
    # is exactness-preserving, not heuristic).
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    want = _py_bpe_train(CORPUS, 12)
    for sweep_top in (1, 2, 3, 8, 64):
        got = B.bpe_train(docs, 12, mode="distributed", sweep_top=sweep_top)
        assert got == want, f"sweep_top={sweep_top}: {got} != {want}"


def test_bpe_batched_parity_randomized_corpora(spark):
    # adversarial-ish corpora (tiny alphabet -> many count ties and
    # symbol-sharing pairs) stress the batch-selector's stop/truncate
    # rules; both paths must match the python model exactly.
    import random

    rng = random.Random(42)
    for trial in range(4):
        corpus = [
            " ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(30)
        ]
        docs = spark.createDataFrame(
            list(enumerate(corpus)), "doc_id long, text string"
        )
        want = _py_bpe_train(corpus, 15)
        assert B.bpe_train(docs, 15, mode="driver") == want, f"trial {trial}"
        assert (
            B.bpe_train(docs, 15, mode="distributed", sweep_top=16) == want
        ), f"trial {trial}"


def test_pinned_fold_segmentation_equals_bpe_segment(spark):
    # pipeline_clean_corpus applies the pinned merge table as rank-order
    # codegen folds; that must equal bpe_segment's priority encoder
    # (the classic rank-order/priority equivalence for trained tables).
    from pyspark.sql import functions as F

    from big_ann_spark.queries.text_queries import _PIN_MERGES

    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    end_arr = F.array(F.lit(B.END))

    def seg_count(w):
        expr = F.concat(F.split(w, ""), end_arr)
        for a, b in _PIN_MERGES:
            expr = B._merge_fold(a, b)(expr)
        return F.size(expr)

    words = F.filter(F.split("text", " "), lambda w: w != "")
    n_fold = F.aggregate(
        F.transform(words, seg_count), F.lit(0), lambda acc, x: acc + x
    )
    fold_counts = {
        r.doc_id: r.n for r in docs.select("doc_id", n_fold.alias("n")).collect()
    }
    seg_counts = {
        r.doc_id: r.n_tokens
        for r in B.bpe_segment(docs, list(_PIN_MERGES)).collect()
    }
    assert fold_counts == seg_counts


def test_bpe_auto_mode_job_count(spark):
    # the SCALE contract: auto-mode training is O(1) Spark jobs total,
    # not O(merges) — a 32k-merge tokenizer must not be 64k jobs.
    docs = spark.createDataFrame(
        list(enumerate(CORPUS * 5)), "doc_id long, text string"
    )
    sc = spark.sparkContext
    sc.setJobGroup("bpe-jobcount", "bpe train job census")
    try:
        merges = B.bpe_train(docs, 20)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-jobcount")
    assert len(merges) >= 8
    # AQE splits the vocab-bound count + collect into a few jobs; the
    # contract is O(1) total, independent of merge count
    assert len(jobs) <= 8, f"auto-mode bpe_train ran {len(jobs)} jobs"


def test_bpe_segment_roundtrip(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    merges = B.bpe_train(docs, 10)
    seg = {r.doc_id: list(r.tokens) for r in B.bpe_segment(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(CORPUS):
        want = [s for w in t.split(" ") if w for s in B._apply_merges(w, ranks)]
        assert seg[i] == want
    # frequent words compress to few symbols; tokens rebuild the text
    joined = "".join(seg[0]).replace(B.END, " ").strip()
    assert joined == CORPUS[0]


def test_bpe_learns_frequent_words(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    merges = B.bpe_train(docs, 20)
    built = {a + b for a, b in merges}
    # 'low</w>' appears 6x and 'newest</w>' 6x — both should become
    # single tokens within 20 merges
    assert "low" + B.END in built or "low" in built
    assert any(s.startswith("newest") for s in built)
