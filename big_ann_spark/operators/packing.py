"""Sequence packing — the final stage of a pretraining data pipeline:
lay the cleaned corpus end-to-end in a deterministic document order and
slice the token stream into fixed-length training windows
(concat-and-chunk, the standard GPT-style packing; documents may span
window boundaries, separated by an EOS the tokenizer adds downstream).

The core quantity is each document's OFFSET in the concatenated
stream = the exclusive prefix sum of token counts in doc-id order — a
global running total, which a naive ``Window.orderBy(doc_id)`` would
compute on ONE task. Here it runs as the ranged two-pass pattern
(operators/ranged.py): per-bin local prefix windows in parallel + an
O(n_bins) driver-side carry table broadcast back. Value-identical to
the global window, no single-partition WindowExec anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_ann_spark.functions.text import token_count
from big_ann_spark.operators.dedup import MINHASH_P, _stable_hash
from big_ann_spark.operators.ranged import add_value_bins, bin_prefix_table


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_bins: int = 64,
) -> DataFrame:
    """Per-document placement in the packed token stream: (doc_id,
    n_tokens, offset, window_start, window_end) where ``offset`` is the
    exclusive prefix sum of token counts in ``id_col`` order and
    ``window_start``/``window_end`` are the first/last ``ctx_len``-token
    training windows the document touches (equal unless the doc spans a
    boundary). Deterministic: same corpus + order → same packing, on
    any partitioning.

    Pass ``tokens_col`` to reuse a precomputed token count (e.g. real
    tokenizer lengths from ``bpe_segment``); otherwise whitespace
    ``token_count(text_col)`` is used.

    Scale shape: one tiny min/max job to bin ids, per-bin local prefix
    windows (parallel, bounded state), one O(n_bins) carry collect,
    broadcast join back — the two-pass ranged prefix; nothing global.
    Window ids are exact: offsets are int64 and window assignment uses
    TRUE integer division (``div``), never a double round-trip.

    ``id_col`` values must be unique — they are the packing order, and
    ties would make offsets depend on physical row order (the corpus
    contract everywhere in this engine: ids are primary keys)."""
    n = (
        F.col(tokens_col)
        if tokens_col is not None
        else token_count(text_col)
    ).cast("long")
    d = docs.select(F.col(id_col).alias("doc_id"), n.alias("n_tokens"))
    binned = add_value_bins(d, "doc_id", n_bins)
    w = (
        Window.partitionBy("_bin")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = binned.withColumn(
        "_local_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    )
    pfx = bin_prefix_table(binned, {"tok": (F.sum("n_tokens"), "sum")})
    placed = local.join(F.broadcast(pfx), "_bin").select(
        "doc_id",
        "n_tokens",
        (F.col("_local_off") + F.col("_pfx_tok")).alias("offset"),
    )
    # TRUE integer division (`div`) — Spark's `/` casts longs to double,
    # which silently misplaces windows once offsets pass 2^53 (the exact
    # domain the ranged prefix machinery preserves)
    ctx = int(ctx_len)
    last = F.col("offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return placed.withColumn("_last", last).selectExpr(
        "doc_id",
        "n_tokens",
        "offset",
        f"offset div {ctx} as window_start",
        f"_last div {ctx} as window_end",
    )


def assign_training_shards(
    docs: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """``docs`` plus (``shard``, ``shard_order``): the deterministic
    global-shuffle layout for training output. ``shard`` is the
    content-stable multiplicative hash (the exact hash_sample mixing)
    mod ``n_shards`` — a pseudo-random, ≈equal-count assignment that is
    reproducible across runs/engines/partitionings; ``shard_order`` is
    the same hash, the within-shard read order (so concatenating shards
    0..n-1 in shard_order IS the corpus in one global pseudo-random
    permutation — what a training run wants instead of crawl order).
    Pure column arithmetic, no shuffle here; the shuffle happens once,
    in the writer."""
    h = _stable_hash(id_col, salt, 2654435761, MINHASH_P)
    return docs.withColumn("_h", h).select(
        *docs.columns,
        (F.col("_h") % n_shards).cast("int").alias("shard"),
        F.col("_h").alias("shard_order"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Write the corpus as ``n_shards`` shard=K/ parquet partitions in
    deterministic pseudo-random order and return the audit manifest
    (shard, n_docs, n_tokens) read back FROM the written layout — the
    manifest certifies what landed on disk, not what the plan intended.

    Plan shape: ONE shuffle — ``repartition(n_shards, shard)`` routes
    each shard to exactly one task, ``sortWithinPartitions(shard_order,
    id)`` fixes the in-file row order (a local sort, no exchange), and
    the partitionBy(shard) write emits one file per shard. At 100 TB
    pick n_shards so a shard ≈ executor-memory-sized (e.g. 100k shards
    of ~1 GB); the hash assignment is balanced by construction, so no
    shard straggles. Training jobs then stream shard files in shard
    order and get a reshuffled corpus with zero runtime shuffle."""
    tok = (
        F.col(token_col) if token_col is not None else token_count(text_col)
    ).cast("long")
    assigned = assign_training_shards(
        docs, n_shards, id_col=id_col, salt=salt
    ).withColumn("n_tokens_out", tok)
    # the sort leads with `shard`: the partitioned write REQUIRES an
    # ordering on its partition column and would otherwise insert its
    # own (unstable) Sort(shard), destroying the shard_order layout
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_order", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    written = docs.sparkSession.read.parquet(path)
    return written.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens_out").alias("n_tokens")
    )


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Overlapping token-window chunking — the RAG-ingest / context-
    window prep primitive (the unit between a document and a packed
    training sequence; see ``pack_sequences`` for the non-overlapping
    packing of whole docs). Tokens are ``sep``-split words; chunk i
    covers tokens ``[i·stride, i·stride + chunk_tokens)`` with
    ``stride = chunk_tokens − overlap``, and the chunk count is
    ``max(1, ceil((n − overlap) / stride))`` — every token belongs to
    at least one chunk, consecutive chunks share exactly ``overlap``
    tokens, and no trailing chunk contributes ZERO new tokens.

    Returns (id_col, chunk_index, chunk_id, chunk_text, n_tokens):
    ``chunk_id = pmod(xxhash64(id, index), 2⁶²)`` is deterministic
    (crash replays regenerate identical rows — the WARC-ingest
    convention) and NON-NEGATIVE with a bounded range, so downstream
    id arithmetic (the ranged prefix-sum packers bin by id spans)
    never overflows a long under ANSI mode. HONEST BOUND: chunk_id is
    a hash — expected birthday collisions ≈ n²/2⁶³ (negligible below
    ~10⁹ chunks, ~10 expected at 10¹⁰); ``(id, chunk_index)`` is the
    EXACT composite key, so joins that must be collision-free at that
    scale should key on the pair, and a pipeline packing >10⁹ chunks
    should verify ``chunk_id`` uniqueness (one distinct-count) before
    trusting it as the packing key. Pure
    column expressions: one projection + one explode, no UDF, no
    shuffle — chunking 100 TB is a map-only pass."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    # F.split takes a REGEX but array_join takes a literal — quote the
    # separator (\Q…\E) so sep="." or "|" splits literally instead of
    # match-anything garbage
    toks = F.split(F.col(text_col), "\\Q" + sep + "\\E")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast(
            "int"
        ),
    )
    # Build the per-chunk structs INSIDE a transform and explode the
    # struct array — each output row then carries only its own chunk
    # text. (The first cut exploded chunk_index while carrying the full
    # _toks array, so the generator copied the whole token array once
    # per chunk row: O(n_chunks × doc_len) intermediate bytes per
    # document, ~10× amplification at default sizes.) The one-element
    # outer transform binds the token array / counts as lambda
    # variables so the split is computed ONCE per document, not once
    # per chunk (the r6 HOF-inlining lesson, SCALE.md "Measured
    # pitfalls").
    chunks = F.transform(
        F.array(F.struct(toks.alias("t"), n.alias("n"), n_chunks.alias("c"))),
        lambda s: F.transform(
            F.sequence(F.lit(0), s["c"] - 1),
            lambda i: F.struct(
                i.alias("chunk_index"),
                F.array_join(
                    F.slice(s["t"], i * F.lit(stride) + 1, F.lit(chunk_tokens)),
                    sep,
                ).alias("chunk_text"),
                F.least(
                    F.lit(chunk_tokens), s["n"] - i * F.lit(stride)
                ).alias("n_tokens"),
            ),
        ),
    )[0]
    exploded = docs.select(F.col(id_col), F.explode(chunks).alias("_c"))
    return exploded.select(
        id_col,
        F.col("_c.chunk_index").alias("chunk_index"),
        F.pmod(
            F.xxhash64(F.col(id_col), F.col("_c.chunk_index")), F.lit(1 << 62)
        ).alias("chunk_id"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )
