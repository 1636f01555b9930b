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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
    return {int(st.getPath().getName()) for st in fs.listStatus(jp)}


def mark_committed(spark, path: str, op_id: int) -> None:
    fs, jp = fs_path(spark, f"{path}/_ops/{op_id}")
    fs.mkdirs(jp.getParent())
    fs.create(jp, True).close()


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
    id is a pure overwrite of itself, never an append-duplicate."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*cols)
        .parquet(target)
    )
