"""WARC (Web ARChive, ISO 28500) source + sink — the Common Crawl
on-ramp for LLM training-data pipelines.

The reference engine ingests fbin/ibin vector blocks
(``src/util/utils.py`` readers); the text side of a 100 TB corpus
arrives as WARC — Common Crawl publishes ~90k ``.warc.gz`` files of
~1 GB per monthly snapshot — so the engine carries a WARC reader the
same way it carries fbin: parse in executors, land as a documents
table, never a driver-side loop.

Format (public spec, ISO 28500 / WARC 1.0): a file is a concatenation
of records; each record is a header block (``WARC/1.0`` version line
then ``Name: Value`` lines, CRLF-terminated, blank-line ended) plus
exactly ``Content-Length`` payload bytes, followed by two CRLFs.
Compressed WARCs are a concatenation of GZIP MEMBERS (conventionally
one per record) — decompression must iterate members, not stop at the
first stream end.

Scale shape:

- **read**: ``binaryFile`` source → ``mapInArrow`` record parser.
  Parallelism is FILE-granular — the industry-standard unit for WARC
  (gzip members are not splittable without a cdx index); at ~1 GB per
  file a Common Crawl snapshot is ~90k tasks, far beyond any cluster
  width. Per-task memory is one file's bytes — the same contract as
  warcio-on-Spark pipelines.
- **write**: one WARC file per partition via an Arrow sink that
  returns a manifest (file, records, bytes); ``repartition(n)``
  controls file count/size. Gzip mode writes one member per record
  (the Common Crawl convention, keeps records individually seekable).
- Record framing is ``Content-Length``-driven, so payloads containing
  ``WARC/1.0`` or CRLF-CRLF byte sequences round-trip exactly (no
  delimiter scanning — the reason a ``lineSep``-based text reader is
  NOT used despite being splittable).
"""

from __future__ import annotations

import io
import uuid
import zlib
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
# fixed default date: WARC-Date is mandatory per spec; a deterministic
# default keeps written archives byte-reproducible (oracle + dedup
# friendly). Real crawls pass their fetch time.
DEFAULT_DATE = "2026-01-01T00:00:00Z"


class WarcRecord(NamedTuple):
    offset: int  # byte offset in the (decompressed) stream
    warc_type: str
    record_id: str
    target_uri: str | None
    warc_date: str | None
    content_type: str | None
    content: bytes


def warc_record_bytes(
    payload: bytes,
    *,
    warc_type: str = "conversion",
    target_uri: str | None = None,
    warc_date: str = DEFAULT_DATE,
    content_type: str = "text/plain; charset=utf-8",
    record_id: str | None = None,
) -> bytes:
    """One spec-complete WARC record. ``record_id`` defaults to a
    DETERMINISTIC urn:uuid (uuid5 of payload+uri) so identical inputs
    produce identical archives — reproducible fixtures and
    content-addressable dedup; pass a real uuid4 for live crawls."""
    if record_id is None:
        ns = uuid.uuid5(uuid.NAMESPACE_URL, target_uri or "")
        record_id = str(uuid.uuid5(ns, payload.decode("latin-1")))
    head = [
        WARC_VERSION.decode(),
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{record_id}>",
        f"WARC-Date: {warc_date}",
    ]
    if target_uri is not None:
        head.append(f"WARC-Target-URI: {target_uri}")
    head += [
        f"Content-Type: {content_type}",
        f"Content-Length: {len(payload)}",
    ]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


_GUNZIP_CHUNK = 1 << 20


def _iter_gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Walk a CONCATENATION of gzip members, yielding
    ``(compressed_offset, compressed_length, decompressed_bytes)`` per
    member — the coordinates a CDX index records.

    Each member is fed BOUNDED chunks off a memoryview: feeding the
    whole remaining buffer per member would copy ``data[pos:]`` and
    materialize ``unused_data`` once per member — O(n²) bytes over a
    ~10⁵-member 1 GB Common Crawl file (effectively a hang). Here
    every input byte is copied O(1) times regardless of member count."""
    view = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        start = pos
        out = io.BytesIO()
        try:
            while pos < n and not d.eof:
                chunk = view[pos : pos + _GUNZIP_CHUNK]
                out.write(d.decompress(chunk))
                pos += len(chunk)
        except zlib.error:
            # trailing garbage that is not a member
            raise ValueError(f"bad gzip member at byte {start}") from None
        if not d.eof:
            raise ValueError(f"truncated gzip member at byte {start}")
        out.write(d.flush())
        # back up over the tail of the last chunk the member didn't use
        pos -= len(d.unused_data)
        if pos <= start:  # defensive: a member must consume bytes
            raise ValueError(f"bad gzip member at byte {start}")
        yield start, pos - start, out.getvalue()


def _iter_gzip_members_from(fh, *, start_at: int = 0) -> Iterator[tuple[int, int, bytes]]:
    """Like :func:`_iter_gzip_members` but reading CHUNK-at-a-time from
    an open file object — memory is one decompressed member + one
    input chunk, so a multi-GB ``.warc.gz`` walks in O(record) space
    instead of materializing the file. ``start_at``: the absolute
    offset ``fh`` is positioned at (coordinates in the yielded tuples
    are absolute)."""
    base = start_at
    buf = b""
    while True:
        if not buf:
            buf = fh.read(_GUNZIP_CHUNK)
            if not buf:
                return  # clean EOF at a member boundary
        d = zlib.decompressobj(wbits=31)
        start = base
        out = io.BytesIO()
        try:
            while not d.eof:
                if not buf:
                    buf = fh.read(_GUNZIP_CHUNK)
                    if not buf:
                        raise ValueError(
                            f"truncated gzip member at byte {start}"
                        )
                out.write(d.decompress(buf))
                base += len(buf)
                buf = b""
        except zlib.error:
            raise ValueError(f"bad gzip member at byte {start}") from None
        out.write(d.flush())
        tail = d.unused_data
        base -= len(tail)
        buf = tail
        if base <= start:
            raise ValueError(f"bad gzip member at byte {start}")
        yield start, base - start, out.getvalue()


def _iter_plain_records_from(
    fh, *, start_at: int = 0, with_content: bool = False
) -> Iterator[tuple[int, int, "WarcRecord"]]:
    """Byte-offset record walk of an UNCOMPRESSED ``.warc`` stream —
    O(header) memory per record (O(record) with ``with_content``):
    headers are read incrementally and bodies are SKIPPED by seek when
    the caller only indexes (build_cdx), so multi-GB plain files walk
    without ever materializing a record, the plain-file analog of
    ``_iter_gzip_members_from``. Yields ``(offset, length, record)``
    with the SAME length convention as the buffered parse (a record's
    length runs to the next record's first byte, trailing CRLF
    separators included — byte-identical cdx rows). Malformed or
    truncated input dies loudly with the failing offset."""
    fh.seek(0, 2)
    size = fh.tell()
    pos = start_at
    fh.seek(pos)
    while pos < size:
        # tolerate extra record separators / trailing CRLFs
        sep = fh.read(2)
        while sep == b"\r\n":
            pos += 2
            sep = fh.read(2)
        if not sep:
            return
        fh.seek(pos)
        head = b""
        while b"\r\n\r\n" not in head:
            chunk = fh.read(65536)
            if not chunk:
                raise ValueError(f"unterminated WARC header at byte {pos}")
            head += chunk
            if len(head) > (1 << 20):
                raise ValueError(f"WARC header block > 1 MiB at byte {pos}")
        if not head.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at byte {pos}")
        head_end = head.index(b"\r\n\r\n")
        headers: dict[str, str] = {}
        for line in head[:head_end].split(b"\r\n")[1:]:
            name, _, value = line.partition(b":")
            headers[name.strip().lower().decode()] = value.strip().decode()
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError(f"record at byte {pos} has no Content-Length")
        body_start = pos + head_end + 4
        end = body_start + clen
        if end > size:
            raise ValueError(
                f"record at byte {pos} truncated: needs {clen} payload bytes"
            )
        content = b""
        if with_content:
            fh.seek(body_start)
            content = fh.read(clen)
        # consume trailing record separators NOW so the yielded length
        # matches the buffered parse's next-record-offset convention
        fh.seek(end)
        while True:
            two = fh.read(2)
            if two == b"\r\n":
                end += 2
            else:
                break
        rec = WarcRecord(
            offset=pos,
            warc_type=headers.get("warc-type", ""),
            record_id=headers.get("warc-record-id", ""),
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            content_type=headers.get("content-type"),
            content=content,
        )
        yield pos, end - pos, rec
        pos = end
        fh.seek(pos)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the compressed-WARC
    convention: one member per record). A naive single-stream gunzip
    silently returns only the first record."""
    out = io.BytesIO()
    for _, _, member in _iter_gzip_members(data):
        out.write(member)
    return out.getvalue()


def parse_warc(data: bytes) -> Iterator[WarcRecord]:
    """Iterate every record of a WARC file's bytes (gzip-sniffed:
    ``1f 8b`` magic → multi-member decompression first). Framing is
    Content-Length-driven per spec; malformed input raises ValueError
    with the failing offset (a truncated 100 TB crawl file should die
    loudly in its task, not vanish rows)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra record separators / trailing CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at byte {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC header at byte {pos}")
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            name, _, value = line.partition(b":")
            headers[name.strip().lower().decode()] = value.strip().decode()
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError(f"record at byte {pos} has no Content-Length")
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError(
                f"record at byte {pos} truncated: needs {clen} payload bytes"
            )
        yield WarcRecord(
            offset=pos,
            warc_type=headers.get("warc-type", ""),
            record_id=headers.get("warc-record-id", ""),
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            content_type=headers.get("content-type"),
            content=data[body_start : body_start + clen],
        )
        pos = body_start + clen


def split_http_payload(content: bytes) -> tuple[int | None, bytes]:
    """A ``response`` record's payload is an HTTP message
    (``application/http``): status line + headers + CRLF-CRLF + body.
    Returns (status code, body); non-HTTP payloads come back
    ``(None, content)`` unchanged."""
    if not content.startswith(b"HTTP/"):
        return None, content
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return None, content
    status_line = content[: content.find(b"\r\n")].split(b" ")
    try:
        # crawl data: a mangled status line must not kill the task —
        # an unparseable status reads as None (kept, like non-HTTP)
        status = int(status_line[1]) if len(status_line) > 1 else None
    except ValueError:
        status = None
    return status, content[sep + 4 :]


def read_warc(spark, path: str, *, blob_cap_bytes: int = 1 << 30) -> DataFrame:
    """Distributed WARC scan: every record of every file matching
    ``path`` (plain or ``.gz``) as
    ``(file, record_index, offset, warc_type, record_id, target_uri,
    warc_date, content_type, content binary)``. One task per file
    (gzip members are not splittable by inspection) — the standard
    WARC parallelism unit; use :func:`build_cdx` +
    :func:`read_warc_split` for sub-file splits.

    LOCAL files at or under ``blob_cap_bytes`` ride the ``binaryFile``
    source (one blob row per file; the length predicate is PUSHED so
    big files never materialize there). BIGGER local files ship as
    PATHS and stream through the O(record)-memory walks — the gzip
    member walk / plain byte-offset walk — so ``binaryFile``'s 2 GB
    hard cap and whole-file executor memory no longer bound the
    readable file size. Both routes emit identical rows
    (equality-tested). The streaming route opens files POSIX-side on
    the executor, so it applies to ``file:`` paths only — non-local
    stores (object-store URIs) keep the binaryFile route at every
    size, with its documented 2 GB limit (an executor-side Hadoop
    stream would need a JVM handle the Arrow worker doesn't have)."""
    fs, jp = _hadoop_fs(spark, path)
    big = [
        p for p, sz in _list_warc_files_sized(fs, jp, spark, path)
        if sz > blob_cap_bytes and p.startswith("file:")
    ]
    src = spark.read.format("binaryFile").load(path)
    # size-partitioned routing. The blob-route filter must be a PURE
    # length predicate: binaryFile pushes `length <= cap` down to the
    # file listing, but an Or containing a path predicate degrades to
    # keep-everything (createFilterFunction), and then an over-2GiB
    # local file still materializes and throws "exceeds the max length
    # allowed". `big` is non-empty only for file: paths, and a listing
    # has one scheme — so when `big` is non-empty every over-cap file
    # is local and on the paths walk, and the pure length filter is
    # exactly the complement; when it's empty no filter is needed (an
    # over-cap non-local file must keep the binaryFile route at its
    # documented 2 GB limit — no POSIX stream for object stores).
    if big:
        src = src.filter(F.col("length") <= int(blob_cap_bytes))
    parts = [_records_of(src.select("path", "content"))]
    if big:
        bsrc = (
            spark.createDataFrame([(p,) for p in big], "path string")
            # explicit count: AQE coalesces a tiny fan-out table to ONE
            # partition otherwise (the split-table lesson)
            .repartition(len(big))
        )
        parts.append(_records_of_paths(bsrc))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_warc_stream(
    spark, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """STREAMING WARC scan — the continuous-crawl on-ramp: new
    ``.warc[.gz]`` files landing under ``path`` become record rows as
    they arrive (file-granular exactly-once via the file-source
    checkpoint). Same schema as :func:`read_warc`; feed through
    :func:`warc_to_documents` into ``streaming/corpus`` for the
    deduped-corpus ingest.

    LOCAL paths take the streaming record walks (VERDICT r12 #5): the
    binaryFile source is used for DISCOVERY ONLY — the ``content``
    column is never selected, so the format's 2 GB materialization cap
    never applies — and each file's bytes stream through the same
    O(record)-memory walks the batch big-file route uses
    (:func:`_records_of_paths`, a stateless mapInArrow — legal on
    streaming DataFrames; file-granular exactly-once is unchanged
    because the file-source checkpoint still tracks whole files).
    Non-local stores keep the blob route with its documented 2 GB
    limit (no POSIX handle for object-store URIs — same contract as
    :func:`read_warc`)."""
    reader = spark.readStream.schema(
        "path string, modificationTime timestamp, length long, content binary"
    ).format("binaryFile")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    src = reader.load(path)
    # route by the RESOLVED FileSystem scheme, exactly as read_warc
    # does — a scheme-less path resolves against fs.defaultFS, which
    # is the local FS only by deployment accident (ADVICE r13: on an
    # hdfs/s3a defaultFS, string-sniffing for '://' would take the
    # POSIX walk over paths the executors cannot open(2))
    if _resolved_scheme(spark, path) == "file":
        return _records_of_paths(src.select("path"))
    return _records_of(src.select("path", "content"))


def _resolved_scheme(spark, p: str) -> str:
    """The scheme of ``p`` AFTER Hadoop qualification against
    ``fs.defaultFS`` — the routing authority for local-vs-blob
    decisions (a bare string sniff mis-routes scheme-less paths
    whenever the default FS is not local). Pure URI work — Hadoop's
    own qualification rule (explicit scheme wins, else the default
    FS's) WITHOUT instantiating the FileSystem, so routing never
    needs the remote FS class on the classpath just to decide."""
    jvm = spark.sparkContext._jvm
    scheme = jvm.org.apache.hadoop.fs.Path(p).toUri().getScheme()
    if scheme:
        return scheme
    dfs = spark.sparkContext._jsc.hadoopConfiguration().get(
        "fs.defaultFS", "file:///"
    )
    return jvm.java.net.URI(dfs).getScheme() or "file"


def _records_of(src: DataFrame) -> DataFrame:
    """(path, content-blob) rows → parsed WARC record rows; works on
    batch and streaming DataFrames alike (one Arrow pass)."""

    def run(batches):
        import pyarrow as pa

        for rb in batches:
            paths = rb.column("path").to_pylist()
            blobs = rb.column("content").to_pylist()
            cols: dict[str, list] = {k: [] for k in (
                "file", "record_index", "offset", "warc_type", "record_id",
                "target_uri", "warc_date", "content_type", "content",
            )}
            for p, blob in zip(paths, blobs):
                for i, rec in enumerate(parse_warc(bytes(blob))):
                    cols["file"].append(p)
                    cols["record_index"].append(i)
                    cols["offset"].append(rec.offset)
                    cols["warc_type"].append(rec.warc_type)
                    cols["record_id"].append(rec.record_id)
                    cols["target_uri"].append(rec.target_uri)
                    cols["warc_date"].append(rec.warc_date)
                    cols["content_type"].append(rec.content_type)
                    cols["content"].append(rec.content)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["file"], pa.string()),
                    pa.array(cols["record_index"], pa.int64()),
                    pa.array(cols["offset"], pa.int64()),
                    pa.array(cols["warc_type"], pa.string()),
                    pa.array(cols["record_id"], pa.string()),
                    pa.array(cols["target_uri"], pa.string()),
                    pa.array(cols["warc_date"], pa.string()),
                    pa.array(cols["content_type"], pa.string()),
                    pa.array(cols["content"], pa.binary()),
                ],
                names=list(cols),
            )

    return src.mapInArrow(
        run,
        schema=(
            "file string, record_index long, offset long, warc_type string, "
            "record_id string, target_uri string, warc_date string, "
            "content_type string, content binary"
        ),
    )


def _records_of_paths(src: DataFrame) -> DataFrame:
    """(path) rows → parsed record rows by STREAMING local reads — the
    big-file route of :func:`read_warc`. Gzip files walk member by
    member with a cumulative decompressed base, so offsets are
    byte-identical to ``parse_warc`` over the whole gunzipped stream;
    plain files walk record by record with one body in memory at a
    time."""

    FLUSH_BYTES = 64 << 20  # bound per-batch payload — NEVER O(file)

    def run(batches):
        import pyarrow as pa

        names = (
            "file", "record_index", "offset", "warc_type", "record_id",
            "target_uri", "warc_date", "content_type", "content",
        )
        cols: dict[str, list] = {k: [] for k in names}
        pending = 0

        def flush():
            nonlocal cols, pending
            rb = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["file"], pa.string()),
                    pa.array(cols["record_index"], pa.int64()),
                    pa.array(cols["offset"], pa.int64()),
                    pa.array(cols["warc_type"], pa.string()),
                    pa.array(cols["record_id"], pa.string()),
                    pa.array(cols["target_uri"], pa.string()),
                    pa.array(cols["warc_date"], pa.string()),
                    pa.array(cols["content_type"], pa.string()),
                    pa.array(cols["content"], pa.binary()),
                ],
                names=list(names),
            )
            cols = {k: [] for k in names}
            pending = 0
            return rb

        for rb_in in batches:
            for p in rb_in.column("path").to_pylist():
                i = 0
                with open(_local_path(p), "rb") as fh:
                    head = fh.read(2)
                    fh.seek(0)
                    if head == b"\x1f\x8b":
                        units = (
                            (base_rec[1].offset + base_rec[0], base_rec[1])
                            for base_rec in _walk_gz_with_base(fh)
                        )
                    else:
                        units = (
                            (rec.offset, rec)
                            for _o, _l, rec in _iter_plain_records_from(
                                fh, with_content=True
                            )
                        )
                    for off, rec in units:
                        cols["file"].append(p)
                        cols["record_index"].append(i)
                        cols["offset"].append(off)
                        cols["warc_type"].append(rec.warc_type)
                        cols["record_id"].append(rec.record_id)
                        cols["target_uri"].append(rec.target_uri)
                        cols["warc_date"].append(rec.warc_date)
                        cols["content_type"].append(rec.content_type)
                        cols["content"].append(rec.content)
                        pending += len(rec.content)
                        i += 1
                        # flush WITHIN a file: one multi-GB file must
                        # not accumulate into one Arrow batch (the
                        # binary-array offset cap is 2 GiB — the very
                        # limit this route exists to lift)
                        if pending >= FLUSH_BYTES:
                            yield flush()
        if cols["file"]:
            yield flush()

    def _walk_gz_with_base(fh):
        base = 0
        for _off, _ln, member in _iter_gzip_members_from(fh):
            for rec in parse_warc(member):
                yield base, rec
            base += len(member)

    return src.mapInArrow(
        run,
        schema=(
            "file string, record_index long, offset long, warc_type string, "
            "record_id string, target_uri string, warc_date string, "
            "content_type string, content binary"
        ),
    )


def _local_path(p: str) -> str:
    """binaryFile emits Hadoop URIs (``file:/x`` or ``file:///x``);
    executor-side ``open()`` needs the bare path."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


def _hadoop_fs(spark, p: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    return (
        jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()),
        jpath,
    )


def _list_warc_files(fs, jp, spark, path: str) -> list[str]:
    """Resolve a file/dir/glob into concrete file paths (one level of
    dir expansion — the write_warc layout shape), through the Hadoop
    FS API so listings behave the same on object-store URIs. Hidden
    files (``_``/``.`` prefixes) are skipped like every Spark file
    source does."""
    return [p for p, _ in _list_warc_files_sized(fs, jp, spark, path)]


def _list_warc_files_sized(fs, jp, spark, path: str) -> list[tuple[str, int]]:
    """Like :func:`_list_warc_files` but carrying each file's byte
    size (one FS listing — sizes ride the same FileStatus), so
    :func:`read_warc` can route oversized files off the binaryFile
    source without a second walk."""
    statuses = fs.globStatus(jp)
    if not statuses:
        raise FileNotFoundError(path)
    out: list[tuple[str, int]] = []
    for st in statuses:
        if st.isDirectory():
            for child in fs.listStatus(st.getPath()):
                name = child.getPath().getName()
                if child.isFile() and not name.startswith(("_", ".")):
                    out.append((str(child.getPath()), int(child.getLen())))
        elif st.isFile():
            name = st.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append((str(st.getPath()), int(st.getLen())))
    return sorted(out)


def build_cdx(spark, path: str) -> DataFrame:
    """Distributed CDX-style index of WARC files: one row per gzip
    member (or per record of a plain file) with its COMPRESSED byte
    coordinates — ``(file, offset, length, n_records, warc_type,
    target_uri, record_id)``. This is the public Common Crawl pattern
    (the cdx/cluster.idx files published next to every crawl): gzip
    members are not splittable by inspection, but an offset index
    makes them randomly addressable, so ONE multi-GB ``.warc.gz``
    stops being one task (``read_warc``'s file-granular limit) and
    becomes as many as you want (:func:`read_warc_split`).

    One full pass (the same cost read_warc pays); persist the result
    next to the files (CLI: ``warc-index``) and every later read
    splits for free. Lazy — the caller writes it.

    Files ship as PATHS, not contents: the ``binaryFile`` source
    materializes each whole file as one row — a 2 GB hard cap and
    full-file executor memory, on exactly the multi-GB files the index
    exists for. Gzipped files stream through the chunked member walk
    in O(record) memory; plain ``.warc`` files through the byte-offset
    record walk in O(header) memory (bodies are seek-skipped — the
    index never needs them)."""
    fs, jp = _hadoop_fs(spark, path)
    paths = _list_warc_files(fs, jp, spark, path)

    src = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(max(1, len(paths)))

    def run(batches):
        import pyarrow as pa

        for rb in batches:
            out: dict[str, list] = {k: [] for k in (
                "file", "offset", "length", "n_records",
                "warc_type", "target_uri", "record_id",
            )}
            def emit(p, off, ln, recs):
                # a member may legally decompress to ZERO WARC records
                # (an empty gzip member is valid gzip) — index it with
                # n_records=0 so its offsets stay addressable instead
                # of crashing the task on recs[0]
                first = recs[0] if recs else None
                out["file"].append(p)
                out["offset"].append(off)
                out["length"].append(ln)
                out["n_records"].append(len(recs))
                out["warc_type"].append(first.warc_type if first else None)
                out["target_uri"].append(first.target_uri if first else None)
                out["record_id"].append(first.record_id if first else None)

            for p in rb.column("path").to_pylist():
                lp = _local_path(p)
                with open(lp, "rb") as fh:
                    head = fh.read(2)
                    fh.seek(0)
                    if head == b"\x1f\x8b":
                        # streaming walk: one member in memory at a
                        # time, emitted as it is parsed
                        for off, ln, member in _iter_gzip_members_from(fh):
                            emit(p, off, ln, list(parse_warc(member)))
                    else:
                        # byte-offset record walk: headers only,
                        # bodies seek-skipped — O(header) memory no
                        # matter the file size (the plain analog of
                        # the gzip member walk)
                        for off, ln, rec in _iter_plain_records_from(fh):
                            emit(p, off, ln, [rec])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["file"], pa.string()),
                    pa.array(out["offset"], pa.int64()),
                    pa.array(out["length"], pa.int64()),
                    pa.array(out["n_records"], pa.int64()),
                    pa.array(out["warc_type"], pa.string()),
                    pa.array(out["target_uri"], pa.string()),
                    pa.array(out["record_id"], pa.string()),
                ],
                names=list(out),
            )

    return src.mapInArrow(
        run,
        schema=(
            "file string, offset long, length long, n_records long, "
            "warc_type string, target_uri string, record_id string"
        ),
    )


def read_warc_split(
    spark,
    cdx,
    *,
    split_bytes: int = 32 << 20,
) -> DataFrame:
    """WARC records via a CDX index (:func:`build_cdx`), split into
    ~``split_bytes`` byte-range tasks REGARDLESS of file count — the
    cdx-driven random access that makes multi-GB ``.warc.gz`` files
    splittable (each task seeks to a member boundary and reads only
    its range; total IO equals one plain pass). ``cdx``: the index
    DataFrame or its parquet path. The cdx can also be PRE-FILTERED
    (by url, type, offset…) — only the matching members' bytes are
    ever read, the point-lookup pattern of Common Crawl's index
    servers.

    Schema matches :func:`read_warc` except ``record_index`` is the
    record's ordinal within its member and ``offset``/``length`` are
    the member's COMPRESSED coordinates (the CDX convention)."""
    if isinstance(cdx, str):
        cdx = spark.read.parquet(cdx)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("file")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    splits = (
        cdx.select("file", "offset", "length")
        .withColumn(
            "_split",
            F.floor((F.sum("length").over(w) - F.col("length")) / int(split_bytes)),
        )
        .groupBy("file", "_split")
        .agg(
            F.sort_array(F.collect_list(F.struct("offset", "length"))).alias(
                "members"
            )
        )
    )

    def run(batches):
        import pyarrow as pa

        for rb in batches:
            files = rb.column("file").to_pylist()
            member_lists = rb.column("members").to_pylist()
            cols: dict[str, list] = {k: [] for k in (
                "file", "record_index", "offset", "length", "warc_type",
                "record_id", "target_uri", "warc_date", "content_type",
                "content",
            )}
            for f, mems in zip(files, member_lists):
                # merge only ADJACENT members into single reads: a
                # PRE-FILTERED cdx holds non-contiguous members, and
                # the bytes between them must never be read or parsed
                # (a min/sum range over a filtered set would read the
                # unselected middle — wrong records or a mid-member
                # truncation error)
                ranges: list[list[int]] = []
                for m in mems:
                    off, ln = int(m["offset"]), int(m["length"])
                    if ranges and ranges[-1][0] + ranges[-1][1] == off:
                        ranges[-1][1] += ln
                    else:
                        ranges.append([off, ln])
                with open(_local_path(f), "rb") as fh:
                    for start, nb in ranges:
                        fh.seek(start)
                        data = fh.read(nb)
                        if data[:2] == b"\x1f\x8b":
                            units = (
                                (start + off, ln, list(parse_warc(member)))
                                for off, ln, member in _iter_gzip_members(data)
                            )
                        else:
                            recs = list(parse_warc(data))
                            ends = [r.offset for r in recs[1:]] + [len(data)]
                            units = (
                                (start + r.offset, end - r.offset, [r])
                                for r, end in zip(recs, ends)
                            )
                        for off, ln, recs in units:
                            for i, rec in enumerate(recs):
                                cols["file"].append(f)
                                cols["record_index"].append(i)
                                cols["offset"].append(off)
                                cols["length"].append(ln)
                                cols["warc_type"].append(rec.warc_type)
                                cols["record_id"].append(rec.record_id)
                                cols["target_uri"].append(rec.target_uri)
                                cols["warc_date"].append(rec.warc_date)
                                cols["content_type"].append(rec.content_type)
                                cols["content"].append(rec.content)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols["file"], pa.string()),
                    pa.array(cols["record_index"], pa.int64()),
                    pa.array(cols["offset"], pa.int64()),
                    pa.array(cols["length"], pa.int64()),
                    pa.array(cols["warc_type"], pa.string()),
                    pa.array(cols["record_id"], pa.string()),
                    pa.array(cols["target_uri"], pa.string()),
                    pa.array(cols["warc_date"], pa.string()),
                    pa.array(cols["content_type"], pa.string()),
                    pa.array(cols["content"], pa.binary()),
                ],
                names=list(cols),
            )

    # spread the split tasks across the cluster with an EXPLICIT
    # partition count: the split table is a few KB, so a plain
    # column repartition gets AQE-coalesced into ONE partition and the
    # whole point of splitting is lost (measured: 15 splits → 1 task).
    # One split per partition. Pin the tiny split table FIRST: when
    # ``cdx`` arrives as an unpersisted DataFrame (e.g. the build_cdx
    # result), the explicit count below would otherwise re-run the
    # entire index lineage — a second full parse of every WARC file —
    # before the real read even starts.
    splits = splits.localCheckpoint()
    n_splits = max(1, splits.count())
    return splits.repartition(n_splits, "file", "_split").mapInArrow(
        run,
        schema=(
            "file string, record_index long, offset long, length long, "
            "warc_type string, record_id string, target_uri string, "
            "warc_date string, content_type string, content binary"
        ),
    )


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Records → documents-table shape ``(url, text, source,
    n_chars)``: keeps ``conversion``/``resource`` records (already
    extracted text) and ``response`` records' HTTP bodies; utf-8
    decodes with replacement (crawl bytes are never clean). Pure
    column expressions except the HTTP split, which rides the same
    Arrow pass as the parse."""
    keep = records.filter(
        F.col("warc_type").isin("conversion", "resource", "response")
    )
    # response payloads need the HTTP envelope stripped — do it in one
    # pandas-UDF-free projection: non-HTTP payloads pass through.
    def strip(batches):
        import pyarrow as pa

        for rb in batches:
            uris = rb.column("target_uri").to_pylist()
            types = rb.column("warc_type").to_pylist()
            blobs = rb.column("content").to_pylist()
            files = rb.column("file").to_pylist()
            url, text, source = [], [], []
            for u, t, blob, f in zip(uris, types, blobs, files):
                body = bytes(blob)
                if t == "response":
                    status, body = split_http_payload(body)
                    if status is not None and status != 200:
                        continue
                url.append(u)
                text.append(body.decode("utf-8", errors="replace"))
                source.append(f)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(url, pa.string()),
                    pa.array(text, pa.string()),
                    pa.array(source, pa.string()),
                ],
                names=["url", "text", "source"],
            )

    out = keep.select("target_uri", "warc_type", "content", "file").mapInArrow(
        strip, schema="url string, text string, source string"
    )
    return out.withColumn("n_chars", F.length("text"))


def write_warc(
    docs: DataFrame,
    dst: str,
    *,
    text_col: str = "text",
    uri_col: str | None = None,
    warc_type: str = "conversion",
    gzip_records: bool = False,
    files: int | None = None,
    mode: str = "error",
) -> list[tuple[str, int, int]]:
    """Write a document table as WARC files, one per partition
    (``files`` repartitions first to control file size — target ~1 GB
    like Common Crawl). ``gzip_records``: one gzip member PER RECORD
    (the CC convention — members stay individually addressable).
    Eager; returns the manifest [(file, n_records, n_bytes)].

    ``mode`` mirrors parquet's save-mode semantics for the part files:
    ``"error"`` (default) refuses a ``dst`` that already holds
    ``part-*.warc[.gz]`` files; ``"overwrite"`` deletes them first.
    Without this, a re-run with fewer partitions would leave the old
    run's higher-numbered part files in place and a later read_warc
    over ``dst`` would silently mix records from both runs.

    Executors write via plain file IO — local/NFS destinations (the
    test/export path); object-store destinations should write plain
    files and upload, or wrap this sink's manifest in their uploader."""
    import glob as _glob
    import os

    if mode not in ("error", "overwrite"):
        raise ValueError(f"mode must be 'error' or 'overwrite', got {mode!r}")
    os.makedirs(dst, exist_ok=True)
    stale = sorted(
        _glob.glob(os.path.join(dst, "part-*.warc"))
        + _glob.glob(os.path.join(dst, "part-*.warc.gz"))
    )
    if stale:
        if mode == "error":
            raise FileExistsError(
                f"write_warc: {dst} already holds {len(stale)} part file(s) "
                f"(e.g. {os.path.basename(stale[0])}); pass mode='overwrite' "
                "to replace them"
            )
        for f in stale:
            os.remove(f)
    if files:
        docs = docs.repartition(files)
    cols = [text_col] + ([uri_col] if uri_col else [])
    ext = ".warc.gz" if gzip_records else ".warc"

    def sink(batches):
        import gzip as _gzip

        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(dst, f"part-{pid:05d}{ext}")
        n = 0
        # temp name carries the task ATTEMPT id: a speculative or
        # zombie second attempt must never interleave bytes into the
        # first attempt's temp file — each attempt writes its own and
        # the atomic os.replace makes whichever finishes last win with
        # a CONSISTENT file (attempts of one partition write identical
        # content)
        tmp = f"{fname}.{ctx.taskAttemptId()}.inprogress"
        with open(tmp, "wb") as fh:
            for rb in batches:
                texts = rb.column(text_col).to_pylist()
                uris = (
                    rb.column(uri_col).to_pylist() if uri_col else [None] * rb.num_rows
                )
                for t, u in zip(texts, uris):
                    rec = warc_record_bytes(
                        (t or "").encode("utf-8"),
                        warc_type=warc_type,
                        target_uri=u,
                    )
                    fh.write(
                        _gzip.compress(rec, 6, mtime=0) if gzip_records else rec
                    )
                    n += 1
        if n:
            os.replace(tmp, fname)  # atomic: readers never see partials
            size = os.path.getsize(fname)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([fname], pa.string()),
                    pa.array([n], pa.int64()),
                    pa.array([size], pa.int64()),
                ],
                names=["file", "n_records", "n_bytes"],
            )
        else:
            os.remove(tmp)

    manifest = docs.select(*cols).mapInArrow(
        sink, schema="file string, n_records long, n_bytes long"
    ).collect()
    return [(r["file"], r["n_records"], r["n_bytes"]) for r in manifest]
