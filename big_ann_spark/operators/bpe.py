"""Distributed Byte-Pair-Encoding tokenizer training — the canonical
training-data-pipeline op the regex census (functions.text) approximates.

``bpe_train`` is the Sennrich et al. (ACL 2016) merge loop re-expressed
Spark-first: the corpus collapses once to the DISTINCT-WORD vocabulary
with frequencies (the classic trick — pair statistics are a function of
the vocab, not the corpus), then each round is

    adjacent-pair explode  →  groupBy(pair) weighted count (map-side
    partial)  →  argmax with deterministic tie-break (one tiny collect)
    →  broadcast merge applied as a codegen ``aggregate`` fold

so a round costs two narrow jobs over |vocab| rows regardless of corpus
size; the vocab table is localCheckpointed per round (constant plan
depth — the KANNDI pattern for inherently sequential algorithms).

Greedy-leftmost application and overlap-counted pair statistics mirror
the reference algorithm exactly; the unit tests pin merge-table
equality against an independent pure-Python implementation.

``bpe_segment`` is the inference side: the trained merge list applies
per word inside an Arrow-batched mapInPandas (tokenizer inference is a
per-row dictionary machine — Python-side like every real tokenizer,
Arrow-batched like every codec stage here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_vocab(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(symbols: array<string>, freq: long) distinct-word vocabulary:
    each word split to character symbols plus the end-of-word marker."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("freq"))
    return vocab.select(
        F.concat(F.split("w", ""), F.array(F.lit(END))).alias("symbols"),
        "freq",
    )


def _merge_fold(a: str, b: str):
    """Greedy-leftmost application of merge (a, b) over a symbol array
    as one codegen ``aggregate`` fold: append each symbol unless it
    completes the pair with the accumulator's last element."""
    merged = a + b

    def step(acc, s):
        last = F.element_at(acc, -1)
        return F.when(
            (F.size(acc) > 0) & (last == a) & (s == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s)))

    return lambda col: F.aggregate(
        col, F.array().cast("array<string>"), step
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list. Stops early when the best pair's corpus frequency drops
    below ``min_freq``."""
    vocab = word_vocab(docs, text_col=text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # guard fully-merged single-symbol words: sequence(1, 0) would
        # DESCEND in Spark, producing out-of-range element_at indices
        pair_arr = F.when(
            F.size("symbols") > 1,
            F.transform(
                F.sequence(F.lit(1), F.size("symbols") - 1),
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("a"),
                    F.element_at("symbols", i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        pairs = vocab.select("freq", F.explode(pair_arr).alias("p"))
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_fold(a, b)("symbols").alias("symbols"), "freq"
        ).localCheckpoint()
    return merges


def _apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference-order application for inference: repeatedly merge the
    lowest-rank adjacent pair (the standard BPE encoder)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        ranked = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — encode each doc with
    the trained merge table (Arrow-batched; the merge list ships in the
    task closure — merge tables are KBs)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches):
        for pdf in batches:
            toks = [
                [
                    s
                    for w in str(t).split(" ")
                    if w
                    for s in _apply_merges(w, ranks)
                ]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return docs.mapInPandas(
        run, schema="doc_id long, tokens array<string>, n_tokens int"
    )
