"""Arrow ↔ numpy bridges for the BLAS hot paths.

``mapInPandas`` pays a per-element tax on vector columns in BOTH
directions: Arrow list arrays become pandas object-Series of numpy
arrays (then ``np.array(list(...))`` re-stacks them row by row), and
object-Series convert back to Arrow element-wise. ``mapInArrow``
exposes the raw ``list<float>`` buffers instead — the (n, d) matrix is
one ``flatten().reshape`` and pass-through columns are zero-copy.
Measured on 2M × 64-d (local[32], warm): identity-with-matrix pass
1.37 s → 0.99 s, with the vector column also in the OUTPUT
2.65 s → 1.5 s. Semantics are unchanged — the same numpy kernels run
on the same values; only the boundary serialization differs.
"""

from __future__ import annotations

import numpy as np


def list_col_matrix(batch, col: str, dtype=np.float64) -> np.ndarray:
    """A ``list<float|double>`` column of a RecordBatch/Table as an
    (n, d) ndarray. ``flatten()`` honors offsets/slices (a raw
    ``.values`` would leak neighboring rows on sliced arrays). Nulls
    and ragged lengths fail loudly — vector columns admit neither."""
    import pyarrow as pa

    c = batch.column(col)
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    if arr.null_count:
        raise ValueError(f"{col}: null vectors are not supported")
    n = len(arr)
    flat = np.asarray(arr.flatten())
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if flat.size % n:
        raise ValueError(f"{col}: ragged vector lengths (expected fixed dim)")
    return flat.reshape(n, flat.size // n).astype(dtype, copy=False)


def int_col(batch, col: str) -> np.ndarray:
    """An integer column as int64 ndarray (nulls fail loudly)."""
    import pyarrow as pa

    c = batch.column(col)
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    if arr.null_count:
        raise ValueError(f"{col}: null ids are not supported")
    return np.asarray(arr).astype(np.int64, copy=False)
