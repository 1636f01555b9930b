"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages (decode → feature-extract → resize / frame-sample).

The container ships no image/audio libraries, so the *codec* step is
stubbed two ways (per the build contract):
- a deterministic fake decoder (bytes → pseudo-pixels) so the whole
  pipeline — schema, batch shapes, partitioning, UDF signatures — runs
  and is tested end-to-end;
- real-codec entry points gated behind import-try that raise a
  clearly-marked NotImplementedError when PIL/librosa are absent.

At scale: binaries stay columnar in parquet (or are pointers into an
object store resolved inside the batch fn); each mapInPandas batch is
one Arrow record batch, so memory per task is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def attach_media(
    docs: DataFrame, *, text_col: str = "text", media_type: str = "application/fake"
) -> DataFrame:
    """Build a multimodal table from the documents fixture: the text
    bytes stand in for an encoded media payload. Schema:
    (doc_id, media binary, media_type string, media_len long)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.length(F.col(text_col)).cast("long").alias("media_len"),
    )


def fake_decode_features(
    media: bytes, dim: int = FEATURE_DIM, *, normalize: bool = True
) -> np.ndarray:
    """Deterministic fake decoder: bytes → ``dim`` float features
    (byte-bucket histogram, L1-normalized; ``normalize=False`` keeps
    raw integer counts — exact in float32 below 2^24, which is what
    lets the SQL oracle hash-match the whole Arrow pipeline). Stands in
    for a real decode→embed stage; same signature, same batch shape."""
    arr = np.frombuffer(media, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    if not normalize:
        return hist.astype(np.float32)
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float32)


def extract_features(
    media_df: DataFrame,
    *,
    media_col: str = "media",
    dim: int = FEATURE_DIM,
    normalize: bool = True,
) -> DataFrame:
    """mapInPandas feature extraction: (doc_id, media, ...) →
    (doc_id, features array<float>, media_len long). The real pipeline
    swaps ``fake_decode_features`` for a codec + model call; the Spark
    plumbing (Arrow batches, schema, per-partition batching) is what
    this operator actually provides."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(m, dim, normalize=normalize)
                for m in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "features": feats,
                    "media_len": pdf[media_col].map(len).to_numpy(),
                }
            )

    return media_df.mapInPandas(
        run, schema="doc_id long, features array<float>, media_len long"
    )


def decode_image(media_df: DataFrame, *, media_col: str = "media") -> DataFrame:
    """Real image decode (width/height/mode metadata). Requires PIL —
    absent in this container, so this raises until a codec is
    installed; ``extract_features`` is the testable path."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "environment; use extract_features (deterministic fake codec) "
            "for pipeline testing"
        ) from e

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import PIL.Image as Image

        for pdf in batches:
            out = []
            for m in pdf[media_col]:
                img = Image.open(io.BytesIO(m))
                out.append((img.width, img.height, img.mode))
            w, h, mode = zip(*out)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": w, "height": h, "mode": mode}
            )

    return media_df.mapInPandas(
        run, schema="doc_id long, width int, height int, mode string"
    )


def frame_sample(
    media_df: DataFrame, *, every_n_bytes: int = 64, media_col: str = "media"
) -> DataFrame:
    """Frame-sampling plumbing: explode each payload into fixed-stride
    "frames" (binary slices) — the video path's shape (doc_id,
    frame_idx, frame binary) without a real demuxer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, m in zip(pdf["doc_id"], pdf[media_col]):
                for i in range(0, len(m), every_n_bytes):
                    ids.append(doc_id)
                    idxs.append(i // every_n_bytes)
                    frames.append(m[i : i + every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media_df.mapInPandas(
        run, schema="doc_id long, frame_idx int, frame binary"
    )
