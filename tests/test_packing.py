"""Sequence packing (concat-and-chunk): brute-force parity and the
no-global-window plan contract."""

from __future__ import annotations

import re

from big_ann_spark.operators.packing import pack_sequences


def _rows():
    return [(i, " ".join(["w"] * (7 + (i * 3) % 11))) for i in range(200)]


def test_pack_sequences_matches_sequential_scan(spark):
    rows = _rows()
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.offset, r.window_start, r.window_end)
        for r in pack_sequences(d, 32, n_bins=8).collect()
    }
    off = 0
    for i, t in rows:
        n = len(t.split())
        assert out[i] == (n, off, off // 32, (off + n - 1) // 32)
        off += n
    # repartition-stable (deterministic on any layout)
    again = {
        r.doc_id: (r.n_tokens, r.offset, r.window_start, r.window_end)
        for r in pack_sequences(d.repartition(13), 32, n_bins=8).collect()
    }
    assert again == out


def test_pack_sequences_no_single_partition_window(spark):
    d = spark.createDataFrame(_rows(), "doc_id long, text string")
    plan = (
        pack_sequences(d, 32, n_bins=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.search(r"Window .*SinglePartition", plan)


def test_pack_sequences_precomputed_tokens_col(spark):
    d = spark.createDataFrame(
        [(1, 10), (2, 300), (3, 5)], "doc_id long, ntok long"
    )
    out = {
        r.doc_id: (r.offset, r.window_start, r.window_end)
        for r in pack_sequences(d, 256, tokens_col="ntok", n_bins=2).collect()
    }
    # doc2 spans windows 0->1 (offset 10, len 300 -> last token 309)
    assert out == {1: (0, 0, 0), 2: (10, 0, 1), 3: (310, 1, 1)}


def test_pack_sequences_exact_past_2_53(spark):
    """Window assignment must stay exact when cumulative offsets exceed
    2^53 (double-division would misplace windows silently)."""
    big = 2**53  # one giant doc pushes every later offset past 2^53
    d = spark.createDataFrame(
        [(0, big + 1), (1, 3), (2, 5)], "doc_id long, ntok long"
    )
    ctx = 7
    got = {
        r.doc_id: (r.offset, r.window_start, r.window_end)
        for r in pack_sequences(d, ctx, tokens_col="ntok", n_bins=2).collect()
    }
    off = 0
    for i, n in [(0, big + 1), (1, 3), (2, 5)]:
        assert got[i] == (off, off // ctx, (off + n - 1) // ctx)
        off += n


def test_chunk_documents_invariants(spark):
    """Coverage + overlap + determinism of the token-window chunker:
    every token lands in >=1 chunk, consecutive full chunks share
    exactly `overlap` tokens, no chunk is overlap-only (zero new
    tokens), short docs yield exactly one chunk, ids are stable."""
    from pyspark.sql import functions as F

    from big_ann_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),  # several chunks
            (2, " ".join(f"x{i}" for i in range(24))),   # exactly one chunk
            (3, "lone"),                                 # n < overlap
            (4, " ".join(f"y{i}" for i in range(25))),   # one token past
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=24, overlap=8).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_index"])
    # chunk counts: ceil((n-8)/16) -> 100:6, 24:1, 1:1, 25:2
    assert {d: len(rs) for d, rs in by_doc.items()} == {1: 6, 2: 1, 3: 1, 4: 2}
    # doc 1: full coverage, exact overlap, last chunk short
    toks = [f"w{i}" for i in range(100)]
    seen = []
    prev = None
    for r in by_doc[1]:
        ct = r["chunk_text"].split(" ")
        start = r["chunk_index"] * 16
        assert ct == toks[start : start + 24]
        assert r["n_tokens"] == len(ct)
        if prev is not None and len(prev) == 24:
            assert prev[-8:] == ct[:8]  # exactly `overlap` shared
        seen.extend(ct[8:] if r["chunk_index"] else ct)
        prev = ct
    assert seen == toks  # every token exactly once beyond the overlaps
    # short doc: the single chunk IS the doc
    assert by_doc[3][0]["chunk_text"] == "lone"
    assert by_doc[3][0]["n_tokens"] == 1
    # deterministic ids (re-run equality)
    again = {
        (r["doc_id"], r["chunk_index"]): r["chunk_id"]
        for r in chunk_documents(docs, chunk_tokens=24, overlap=8).collect()
    }
    assert {(r["doc_id"], r["chunk_index"]): r["chunk_id"] for r in out} == again
    # no UDF, no shuffle: the plan is a single projection + explode
    plan = (
        chunk_documents(docs, chunk_tokens=24, overlap=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_chunk_documents_literal_separator(spark):
    """sep is a LITERAL, not a regex: '.' must split on dots."""
    from big_ann_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a.b.c.d.e")], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=3, overlap=1, sep=".").collect()
    out.sort(key=lambda r: r["chunk_index"])
    assert [r["chunk_text"] for r in out] == ["a.b.c", "c.d.e"]
