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
