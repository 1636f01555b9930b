"""Readers/writers for the reference's binary vector formats
(S1-S5): ``.fbin`` (float32), ``.u8bin`` (uint8), ``.ibin`` (int32),
all with an 8-byte ``(nvecs:int32, dim:int32)`` little-endian header
(reference ``src/util/utils.py:77-193``).

Spark-first ingest: ``spark.read.format("binaryFile")`` lists the
files as a DataFrame, an Arrow-batched ``mapInPandas`` slices each
file's bytes with ``np.frombuffer`` and emits (id, vec) rows — ids are
the in-file row ordinals (the reference's point identity,
``shard_by_distance.py:197-199``), offset by a per-file base when
ingesting a multi-file dataset. One pass, no driver materialization;
at 100 TB the dataset is many fbin files and each becomes one task.

Known reference quirks documented in SURVEY (appendix) and NOT
replicated: ``read_ibin``'s missing ``*4`` offset multiplier
(``utils.py:146-147``) — our chunked reads are correctly aligned for
every dtype.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_DTYPES = {
    "fbin": (np.float32, 4),
    "u8bin": (np.uint8, 1),
    "ibin": (np.int32, 4),
    # int8: the reference ADVERTISES this dtype in its CLI help but
    # never implements an ingest branch (shard_by_distance.py:483,
    # 494-502 — only uint8/float32 are handled); we out-cover it. The
    # .i8bin suffix is the big-ann-benchmarks convention (SpaceV).
    "i8bin": (np.int8, 1),
}


def _suffix_of(path: str) -> str:
    for suf in _DTYPES:
        if path.endswith("." + suf):
            return suf
    raise ValueError(f"unknown vector-file suffix: {path}")


def read_header(path: str) -> tuple[int, int]:
    """(nvecs, dim) from the 8-byte header — S4
    (``utils.py:77-88``)."""
    with open(path, "rb") as f:
        nvecs, dim = struct.unpack("<ii", f.read(8))
    return nvecs, dim


def read_vectors_local(path: str, start_idx: int = 0, chunk_size: int | None = None) -> np.ndarray:
    """Chunked local read — S1/S2/S3 (``utils.py:91-148``) with correct
    offset arithmetic for every dtype."""
    dtype, itemsize = _DTYPES[_suffix_of(path)]
    nvecs, dim = read_header(path)
    n = min(chunk_size, nvecs - start_idx) if chunk_size is not None else nvecs - start_idx
    offset = 8 + start_idx * dim * itemsize
    with open(path, "rb") as f:
        f.seek(offset)
        arr = np.frombuffer(f.read(n * dim * itemsize), dtype=dtype)
    return arr.reshape(n, dim)


def write_vectors_local(path: str, mat: np.ndarray) -> None:
    """S5 sink (``utils.py:151-193``): header + row-major matrix."""
    suf = _suffix_of(path)
    dtype, _ = _DTYPES[suf]
    if mat.ndim != 2:
        raise ValueError("input must be 2-D (reference asserts the same)")
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", mat.shape[0], mat.shape[1]))
        f.write(np.ascontiguousarray(mat, dtype=dtype).tobytes())


def read_ground_truth_local(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a big-ann-benchmarks ground-truth file: 8-byte
    ``(nq:int32, k:int32)`` header, then ``nq·k`` int32 neighbor ids,
    then ``nq·k`` float32 distances (the public GT format shipped with
    every track dataset the reference targets; the reference itself
    computes recall only against its own brute force, ``recall.py:34``,
    so this reader out-covers it). Returns ``(ids (nq,k) int64,
    dists (nq,k) float32)``.

    Ids are stored UNSIGNED 32-bit in the public format and widened to
    int64 here (ADVICE r7): an int32 read would wrap ids >= 2^31
    negative and silently never match predictions — latent until a
    >2B-point track, but a correctness cliff when it lands."""
    nq, k = read_header(path)
    with open(path, "rb") as f:
        f.seek(8)
        ids = (
            np.frombuffer(f.read(nq * k * 4), dtype=np.uint32)
            .reshape(nq, k)
            .astype(np.int64)
        )
        dists = np.frombuffer(f.read(nq * k * 4), dtype=np.float32).reshape(nq, k)
    return ids, dists


def write_ground_truth_local(path: str, ids: np.ndarray, dists: np.ndarray) -> None:
    """Write the big-ann GT format (see ``read_ground_truth_local``) —
    ids land as the format's uint32 (negatives rejected: they have no
    representation and would round-trip as huge positives)."""
    if ids.shape != dists.shape or ids.ndim != 2:
        raise ValueError("ids and dists must be identically-shaped (nq, k)")
    if ids.size and int(ids.min()) < 0:
        raise ValueError("GT neighbor ids must be non-negative (uint32 format)")
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", ids.shape[0], ids.shape[1]))
        f.write(np.ascontiguousarray(ids, dtype=np.uint32).tobytes())
        f.write(np.ascontiguousarray(dists, dtype=np.float32).tobytes())


def ground_truth_df(
    spark: SparkSession, path: str, k: int | None = None
) -> DataFrame:
    """GT file → ``(qid, neighbor_id, rank)`` DataFrame, truncated to
    the first ``k`` columns — the shape ``operators/knn.recall_at_k``
    expects for its exact side. GT files are small by contract (nq ≤
    10k in every public track), so a driver-side parse is the honest
    path; the searchable BASE is the big side, never the GT."""
    ids, _ = read_ground_truth_local(path)
    kk = ids.shape[1] if k is None else min(k, ids.shape[1])
    rows = [
        (int(q), int(ids[q, r]), r + 1)
        for q in range(ids.shape[0])
        for r in range(kk)
    ]
    return spark.createDataFrame(rows, "qid long, neighbor_id long, rank int")


def read_fbin_spark(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed fbin/u8bin/ibin → DataFrame(id long, vec
    array<float>) ingest. Ids are file-row ordinals offset by the
    cumulative row count of lexically-earlier files, matching the
    reference's implicit concatenated ordering."""
    files = spark.read.format("binaryFile").load(path_glob)
    paths = [r[0] for r in files.select("path").collect()]
    paths.sort()
    bases: dict[str, int] = {}
    running = 0
    for p in paths:
        local = p.removeprefix("file:")
        nvecs, _dim = read_header(local)
        bases[p] = running
        running += nvecs

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                path, content = row["path"], row["content"]
                suf = _suffix_of(path)
                dtype, itemsize = _DTYPES[suf]
                nvecs, dim = struct.unpack("<ii", content[:8])
                arr = np.frombuffer(content, dtype=dtype, offset=8, count=nvecs * dim)
                mat = arr.reshape(nvecs, dim).astype(np.float32)
                base = bases[path]
                yield pd.DataFrame(
                    {
                        "id": np.arange(base, base + nvecs, dtype=np.int64),
                        "vec": list(mat),
                    }
                )

    return files.select("path", "content").mapInPandas(
        parse, schema="id long, vec array<float>"
    )


def write_fbin_from_df(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    max_rows: int = 1_000_000,
) -> None:
    """Export a vector DataFrame to one local fbin/u8bin/i8bin/ibin
    file (interop sink — driver-side BY CONTRACT; the at-scale sink is
    parquet). ``max_rows`` guards the driver collect: exceeding it
    raises instead of OOMing — raise the cap explicitly if you really
    want a bigger single-file export. The guard and the export share
    ONE execution: collecting ``limit(max_rows + 1)`` both bounds
    driver memory and detects overflow without a separate count() pass
    re-running the full upstream lineage."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_fbin_from_df collects to the driver: > "
            f"max_rows={max_rows} rows. Use parquet for at-scale sinks, "
            "or raise max_rows explicitly."
        )
    mat = np.array([r[1] for r in rows])
    write_vectors_local(path, mat)


def fbin_to_tsv(df: DataFrame, path: str, *, vec_col: str = "vec") -> None:
    """S6 (``utils.py:179-182``): tab-separated text export, one vector
    per line — distributed text sink."""
    from pyspark.sql import functions as F

    df.select(
        F.array_join(F.transform(F.col(vec_col), lambda x: x.cast("string")), "\t").alias("line")
    ).write.mode("overwrite").text(path)
