"""Line-level (paragraph-level) deduplication — CCNet's first pipeline
stage (Wenzek et al. 2020 dedup crawled text BY LINE against shard-wide
hash counts before anything else runs; boilerplate nav/cookie lines are
the bulk of raw crawl bytes) and the RefinedWeb/Dolma "paragraph
dedup" shape.

Reference context: the reference repo has no text surface at all —
this extends the training-data-pipeline side next to the document-level
families in operators/dedup.py (exact / MinHash / SimHash / spans).

Spark-first design, two actions over one exploded line table:

- **Boilerplate strip** (CCNet): corpus-wide line counts → the hot set
  (count > max_count) is SMALL by construction (it's boilerplate —
  a vocabulary, not a corpus), so membership is a broadcast ANTI-join;
  the line table never shuffles for the filter. One corpus shuffle for
  the counts, one doc-keyed shuffle to rebuild texts.
- **Keep-first dedup** (RefinedWeb paragraph dedup): every distinct
  line survives exactly once, at its globally-first (doc_id, line_no)
  occurrence — a map-side-combinable ``min(struct(id, ln))`` per line
  (NOT a row_number window: the aggregate pre-combines before the
  shuffle, the window cannot), then an equi-join back on the line key,
  which reuses the aggregate's hash partitioning (no extra exchange).

Rebuilt text is deterministic: kept lines re-joined in line order via
``sort_array(collect_list(struct(ln, line)))`` — no collect_list order
dependence.

The driver fixture's documents are single-line, so the registered
query adapts with :func:`windowed_lines` (fixed 10-token windows as
"lines") — the operators themselves are separator-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_ann_spark.functions.text import tokens


def docs_to_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(id, ln, line) — one row per line, ``ln`` the 1-based position.
    ``sep`` is a LITERAL separator (escaped before it reaches
    ``F.split``'s regex argument — a '.' or '|' separator must not
    split on every character)."""
    import re

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(c, re.escape(sep), -1)).alias("_p", "line"),
    ).select("id", (F.col("_p") + 1).alias("ln"), "line")


def windowed_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 10,
) -> DataFrame:
    """(id, ln, line) — fixed ``words_per_line``-token windows as
    synthetic lines, for corpora without newlines (the driver
    fixture). Built as one array expression + posexplode, no UDF."""
    from big_ann_spark.functions.text import bind_once

    w = words_per_line
    toks = tokens(F.col(text_col) if isinstance(text_col, str) else text_col)
    # bind the token array once per row — referencing it from inside
    # the HOF lambda would re-split the text per window (no CSE)
    arr = bind_once(
        toks,
        lambda t: F.transform(
            # ceil(size/w) windows, via integer floor((size+w-1)/w)
            F.sequence(F.lit(1), ((F.size(t) + F.lit(w - 1)) / F.lit(w)).cast("int")),
            lambda i: F.array_join(F.slice(t, (i - 1) * w + 1, w), " "),
        ),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.posexplode(arr).alias("_p", "line")
    ).select("id", (F.col("_p") + 1).alias("ln"), "line")


def line_counts(lines: DataFrame) -> DataFrame:
    """(line, c) — corpus-wide occurrence counts (map-side combined)."""
    return lines.groupBy("line").agg(F.count("*").alias("c"))


def _rebuild(kept: DataFrame, all_ids: DataFrame, sep: str) -> DataFrame:
    """(id, text, n_kept) per doc from kept (id, ln, line) rows; docs
    whose every line was dropped come back with empty text."""
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ln", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    return all_ids.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def strip_boilerplate_lines(
    lines: DataFrame, *, max_count: int = 3, sep: str = "\n"
) -> DataFrame:
    """(id, text, n_kept, n_removed) — drop every occurrence of lines
    appearing more than ``max_count`` times corpus-wide (the CCNet
    boilerplate filter), rebuild each doc from its surviving lines.
    The hot-line set is broadcast (small by construction — raise
    ``max_count`` if a corpus ever inflates it)."""
    hot = line_counts(lines).filter(F.col("c") > max_count).select("line")
    kept = lines.join(F.broadcast(hot), "line", "left_anti")
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    return (
        _rebuild(kept, totals.select("id"), sep)
        .join(totals, "id")
        .select(
            "id", "text", "n_kept", (F.col("n_lines") - F.col("n_kept")).alias("n_removed")
        )
    )


def dedup_lines_keep_first(
    lines: DataFrame, *, sep: str = "\n"
) -> DataFrame:
    """(id, text, n_kept, n_removed) — keep each distinct line only at
    its globally-first (id, ln) occurrence (RefinedWeb paragraph
    dedup), rebuild docs. ``min(struct(id, ln))`` aggregates with
    map-side partials and the join back reuses its partitioning."""
    first = lines.groupBy("line").agg(F.min(F.struct("id", "ln")).alias("_k"))
    kept = (
        lines.join(first, "line")
        .filter((F.col("id") == F.col("_k.id")) & (F.col("ln") == F.col("_k.ln")))
        .select("id", "ln", "line")
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("n_lines"))
    return (
        _rebuild(kept, totals.select("id"), sep)
        .join(totals, "id")
        .select(
            "id", "text", "n_kept", (F.col("n_lines") - F.col("n_kept")).alias("n_removed")
        )
    )
