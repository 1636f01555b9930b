"""The exactly-once OP-LEDGER protocol shared by every persisted
mutable layout in the repo (BM25 batch index, sharded vector layout).

One mutation = one op id:

- every op writes ONLY its own ``_mb=<id>`` partitions via dynamic
  partition overwrite (re-running a crashed op with the same id is a
  pure self-overwrite — idempotent by construction), then drops a
  commit marker file under ``{path}/_ops/<id>``;
- readers exclude any on-disk op id with no marker (a NOT-IN over the
  tiny in-flight set — never an ``isin(committed)`` whose literal list
  grows per op), so a half-written op is invisible;
- the base build lands under ``_mb = BASE_EPOCH = -1`` (op ids start
  at 0, so the base can never collide with an op), and ``as_of=N``
  snapshot reads are a RANGE predicate on the ``_mb`` partition
  column — time travel with no replay and no extra storage.

Everything here is metadata-only filesystem work (listings, globs,
marker files) through the Hadoop FS API, so it behaves identically on
local paths and object-store URIs, and NEVER runs a Spark job just to
learn what's on disk (ADVICE r8).

**Single-writer contract**: the ledger assumes AT MOST ONE mutator per
layout at a time — auto-allocated op ids plus purge-before-write mean
two concurrent mutators (e.g. parallel ``index-upsert`` CLI runs) can
claim the same id and purge each other's in-flight partitions,
corrupting an op the other writer then marks committed. Concurrent
READERS are always safe (committed ops are immutable; a half-written
op is invisible). Mutation entry points guard the contract with
``writer_lock`` — a best-effort atomic-create lock file under
``{path}/_ops`` that turns a same-layout write race into a loud
``ConcurrentWriterError`` instead of silent corruption. Best-effort
because create-no-overwrite is atomic on local FS and HDFS but only
advisory on eventual-consistency object stores, and a kill -9'd
writer leaves a stale lock (the error message says which file to
remove). Serialize mutations externally (one orchestrator per layout)
rather than leaning on the lock as a scheduler.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_EPOCH = -1


def fs_path(spark, p: str):
    """Hadoop FileSystem + Path for ``p`` — works on local paths and
    object-store URIs alike."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def path_exists(spark, p: str) -> bool:
    fs, jp = fs_path(spark, p)
    return fs.exists(jp)


def glob_op_ids(spark, pattern: str) -> set[int]:
    """Op ids named by ``_mb=<id>`` partition dirs matching a glob —
    a directory listing, not a Spark job."""
    fs, jp = fs_path(spark, pattern)
    out: set[int] = set()
    for st in fs.globStatus(jp) or []:
        name = st.getPath().getName()
        out.add(int(name.split("=", 1)[1]))
    return out


def committed_ops(spark, path: str) -> set[int]:
    """Ids with a commit marker under ``{path}/_ops``."""
    fs, jp = fs_path(spark, f"{path}/_ops")
    if not fs.exists(jp):
        return set()
    return {
        int(st.getPath().getName())
        for st in fs.listStatus(jp)
        if st.getPath().getName().isdigit()  # skip _writer.lock etc.
    }


def mark_committed(spark, path: str, op_id: int) -> None:
    fs, jp = fs_path(spark, f"{path}/_ops/{op_id}")
    fs.mkdirs(jp.getParent())
    fs.create(jp, True).close()


class ConcurrentWriterError(RuntimeError):
    """A second mutator raced the op ledger's single-writer contract."""


WRITER_LOCK = "_writer.lock"


@contextlib.contextmanager
def writer_lock(spark, path: str, *, owner: str = ""):
    """Best-effort single-writer guard for one mutation (see module
    docstring): atomically create ``{path}/_ops/_writer.lock``
    (create-no-overwrite — atomic on local FS and HDFS), yield, delete
    on exit (including on exception — only a hard process kill leaves
    the lock behind). A held lock raises ``ConcurrentWriterError``
    naming the file so an operator can remove a stale one."""
    fs, jp = fs_path(spark, f"{path}/_ops/{WRITER_LOCK}")
    fs.mkdirs(jp.getParent())
    try:
        out = fs.create(jp, False)
        if owner:
            out.writeBytes(owner)
        out.close()
    except Exception:
        if fs.exists(jp):
            raise ConcurrentWriterError(
                f"another writer holds {path}/_ops/{WRITER_LOCK} — the op "
                "ledger is single-writer per layout; wait for it to finish "
                "(or remove the lock file if that writer crashed hard)"
            ) from None
        raise
    try:
        yield
    finally:
        fs.delete(jp, False)


def next_op_id(on_disk: set[int], committed: set[int]) -> int:
    """Auto-allocate: the LOWEST uncommitted id if one exists (a
    crashed op's partitions are purged before the new op writes, so
    reuse is safe and reclaims the orphaned bytes), else max+1.
    Pure function of the two ledger sets (caller supplies them — which
    table is the op-id ledger is layout-specific)."""
    crashed = sorted(set(on_disk) - set(committed))
    if crashed:
        return crashed[0]
    seen = set(on_disk) | set(committed)
    return max(seen) + 1 if seen else 0


def purge_op_dirs(spark, patterns: list[str]) -> None:
    """Remove every partition dir matching the given globs — run
    before an op (re)writes, so landing at a previously-crashed id can
    never leave the old attempt's partitions mixed under a
    now-committed id. Metadata-only FS ops."""
    for pattern in patterns:
        fs, jp = fs_path(spark, pattern)
        for st in fs.globStatus(jp) or []:
            fs.delete(st.getPath(), True)


def write_op_partitions(df: DataFrame, target: str, cols: list[str]) -> None:
    """Land one op's rows via DYNAMIC partition overwrite: only the
    partitions present in ``df`` (its own ``_mb``, plus any secondary
    partition dirs it touches) are replaced — a re-run of the same op
    id is a pure overwrite of itself, never an append-duplicate.

    Rows are REPARTITIONED onto the partition columns first: without
    it, every upstream task writes its own file into every dir it has
    rows for — a 100k-row upsert over 1000 shard dirs from 32 shuffle
    partitions landed 32,000 one-row files, and every later ledger
    read paid ~12 s of listing + footer opens (measured, 2M campaign).
    With the repartition each partition dir holds ONE file per op;
    write parallelism = number of touched dirs, which is exactly the
    op's fan-out."""
    (
        df.repartition(*[F.col(c) for c in cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*cols)
        .parquet(target)
    )
