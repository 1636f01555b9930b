"""Property test for the persisted-BM25 op protocol: ANY sequence of
merges, deletes, crashed attempts and replays must leave the logical
index equal to a from-scratch build of the net corpus — the same
randomized-runbook style that certifies the streaming vector index.

Hypothesis drives the op sequence; crashes are injected by patching the
commit-marker write (the protocol's last step), so every crash leaves
maximal on-disk garbage for the recovery path to handle.
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_ann_spark.operators import bm25 as BM

_SCHEMA = "doc_id long, text string"

# tiny fixed vocabulary so merges/deletes collide on terms constantly
_WORDS = ["alpha", "beta", "gamma", "delta", "echo"]


def _doc_text(doc_id: int) -> str:
    # deterministic text per id: 3 words drawn by simple arithmetic
    return " ".join(
        _WORDS[(doc_id * m + k) % len(_WORDS)] for k, m in ((0, 1), (1, 2), (2, 3))
    )


# an op script: each step merges a fresh id-range or deletes a previous
# range; booleans mark which steps crash first (and are then replayed)
_steps = st.lists(
    st.tuples(st.sampled_from(["merge", "delete"]), st.booleans()),
    min_size=1,
    max_size=5,
)


@given(script=_steps, seed=st.integers(min_value=0, max_value=10**6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_any_op_sequence_equals_rebuild(spark, script, seed, monkeypatch):
    rng_state = seed
    path = tempfile.mkdtemp(prefix="bm25_prop_") + "/idx"

    def docs_df(ids):
        return spark.createDataFrame(
            [(i, _doc_text(i)) for i in ids], _SCHEMA
        )

    live: set[int] = set(range(4))
    BM.write_bm25_index(BM.bm25_index(docs_df(sorted(live))), path, n_term_buckets=4)

    next_id = 100
    merged_batches: list[list[int]] = [sorted(live)]
    for kind, crash in script:
        rng_state = (rng_state * 1103515245 + 12345) % (2**31)
        if kind == "merge" or not live:
            ids = list(range(next_id, next_id + 2 + rng_state % 3))
            next_id += 10
            batch, fn = docs_df(ids), BM.merge_bm25_index
            merged_batches.append(ids)
            live |= set(ids)
        else:
            pool = sorted(live)
            take = 1 + rng_state % min(3, len(pool))
            ids = pool[:take]
            batch, fn = docs_df(ids), BM.delete_from_bm25_index
            live -= set(ids)

        if crash:
            # crash before the marker: maximal on-disk garbage
            with monkeypatch.context() as mp:
                mp.setattr(BM, "_mark_committed", lambda *a: 1 / 0)
                with pytest.raises(ZeroDivisionError):
                    fn(spark, path, batch)
            # recovery contract: re-run the SAME batch (auto-id reuses
            # and purges the crashed id)
        fn(spark, path, batch)

    want_idx = BM.bm25_index(docs_df(sorted(live)))
    got_idx = BM.read_bm25_index(spark, path)

    got_p = sorted(
        map(tuple, got_idx.postings.select("doc", "term", "tf", "dl").collect())
    )
    want_p = sorted(map(tuple, want_idx.postings.collect()))
    assert got_p == want_p

    assert sorted(map(tuple, got_idx.dfs.collect())) == sorted(
        map(tuple, want_idx.dfs.collect())
    )

    g = got_idx.stats.collect()[0]
    w = want_idx.stats.collect()[0]
    assert g.n_docs == w.n_docs
    if w.n_docs:
        assert g.avgdl == pytest.approx(w.avgdl)

    # the serving path agrees too (rounded-score contract)
    if live:
        q = docs_df(sorted(live)[:2])
        got_q = BM.bm25_topk_from_disk(spark, path, q, k=5, score_round=6)
        want_q = BM.bm25_topk(q, want_idx, k=5, score_round=6)
        assert sorted(map(tuple, got_q.collect())) == sorted(
            map(tuple, want_q.collect())
        )
