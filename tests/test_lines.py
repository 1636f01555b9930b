"""Line-level dedup: boilerplate strip + keep-first, vs hand-computed
expectations and a pure-Python model."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from big_ann_spark.operators.lines import (
    dedup_lines_keep_first,
    docs_to_lines,
    line_counts,
    strip_boilerplate_lines,
    windowed_lines,
)

DOCS = [
    (0, "accept cookies\nreal content zero\nfollow us"),
    (1, "accept cookies\nreal content one\nfollow us"),
    (2, "accept cookies\nreal content two"),
    (3, "unique document three\nwith two lines"),
    (4, "accept cookies\naccept cookies\nreal content four"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_lines():
    return [
        (i, ln + 1, line)
        for i, t in DOCS
        for ln, line in enumerate(t.split("\n"))
    ]


def test_docs_to_lines(spark, corpus):
    got = {(r.id, r.ln, r.line) for r in docs_to_lines(corpus).collect()}
    assert got == set(_py_lines())


def test_line_counts(spark, corpus):
    got = {r.line: r.c for r in line_counts(docs_to_lines(corpus)).collect()}
    want = Counter(line for _, _, line in _py_lines())
    assert got == dict(want)


def test_strip_boilerplate(spark, corpus):
    # 'accept cookies' occurs 5x, 'follow us' 2x -> cap at 2 drops
    # only 'accept cookies' (strictly greater-than semantics)
    out = {
        r.id: (r.text, r.n_kept, r.n_removed)
        for r in strip_boilerplate_lines(
            docs_to_lines(corpus), max_count=2
        ).collect()
    }
    assert out[0] == ("real content zero\nfollow us", 2, 1)
    assert out[3] == ("unique document three\nwith two lines", 2, 0)
    assert out[4] == ("real content four", 1, 2)
    assert len(out) == 5


def test_strip_can_empty_a_doc(spark):
    docs = spark.createDataFrame(
        [(0, "x\nx"), (1, "x"), (2, "y")], "doc_id long, text string"
    )
    out = {
        r.id: (r.text, r.n_kept, r.n_removed)
        for r in strip_boilerplate_lines(docs_to_lines(docs), max_count=1).collect()
    }
    assert out[0] == ("", 0, 2)
    assert out[1] == ("", 0, 1)
    assert out[2] == ("y", 1, 0)


def test_keep_first(spark, corpus):
    out = {
        r.id: (r.text, r.n_kept, r.n_removed)
        for r in dedup_lines_keep_first(docs_to_lines(corpus)).collect()
    }
    # doc 0 is first for 'accept cookies' and 'follow us'
    assert out[0] == ("accept cookies\nreal content zero\nfollow us", 3, 0)
    assert out[1] == ("real content one", 1, 2)
    assert out[2] == ("real content two", 1, 1)
    assert out[4] == ("real content four", 1, 2)
    # global invariant: every distinct line survives exactly once
    kept_lines = [
        ln for _, (t, _, _) in out.items() if t for ln in t.split("\n")
    ]
    assert len(kept_lines) == len(set(kept_lines))
    assert set(kept_lines) == {line for _, _, line in _py_lines()}


def test_windowed_lines(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(23))), (1, "a b")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.id, r.ln, r.line) for r in windowed_lines(docs, words_per_line=10).collect()
    )
    assert got == [
        (0, 1, " ".join(f"w{i}" for i in range(10))),
        (0, 2, " ".join(f"w{i}" for i in range(10, 20))),
        (0, 3, "w20 w21 w22"),
        (1, 1, "a b"),
    ]


def test_strip_plan_hot_set_broadcast_anti(spark, corpus):
    from big_ann_spark.plans import executed_plan

    plan = executed_plan(
        strip_boilerplate_lines(docs_to_lines(corpus), max_count=2)
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_docs_to_lines_sep_is_literal(spark):
    """A '.' separator must split on periods only — F.split takes a
    regex, so the operator escapes the separator."""
    from big_ann_spark.operators.lines import docs_to_lines

    df = spark.createDataFrame([(1, "ab.cd.ef")], "doc_id long, text string")
    got = [r.line for r in docs_to_lines(df, sep=".").orderBy("ln").collect()]
    assert got == ["ab", "cd", "ef"]
