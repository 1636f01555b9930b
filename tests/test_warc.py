"""WARC source/sink (sources/warc.py): framing, gzip members, HTTP
payload split, the distributed read path, and the write→read identity
— the fbin-style round-trip contract applied to the Common Crawl
container format."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.sources import warc as W


def test_record_roundtrip_hostile_payload():
    """Content-Length framing must survive payloads that CONTAIN the
    record separator and a version line — delimiter-scanning parsers
    break exactly here."""
    payload = (
        b"x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
        + "य𝄞".encode("utf-8")
        + b"\xff\x00tail"
    )
    blob = W.warc_record_bytes(payload, target_uri="http://a.example/p")
    recs = list(W.parse_warc(blob * 3))
    assert len(recs) == 3
    assert all(r.content == payload for r in recs)
    assert recs[0].target_uri == "http://a.example/p"
    assert recs[0].warc_type == "conversion"
    assert recs[1].offset > 0


def test_deterministic_record_ids():
    a = W.warc_record_bytes(b"same", target_uri="u")
    b = W.warc_record_bytes(b"same", target_uri="u")
    c = W.warc_record_bytes(b"other", target_uri="u")
    assert a == b and a != c


def test_gzip_multi_member():
    """One gzip member per record (the Common Crawl convention): a
    single-stream gunzip would see only the first record."""
    r1 = W.warc_record_bytes(b"alpha")
    r2 = W.warc_record_bytes(b"beta", warc_type="resource")
    blob = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    recs = list(W.parse_warc(blob))
    assert [r.content for r in recs] == [b"alpha", b"beta"]
    assert recs[1].warc_type == "resource"


def test_malformed_raises_with_offset():
    good = W.warc_record_bytes(b"ok")
    with pytest.raises(ValueError, match="truncated"):
        list(W.parse_warc(good[:-6]))
    with pytest.raises(ValueError, match="version line"):
        list(W.parse_warc(good + b"JUNK"))


def test_http_payload_split():
    body = b"<html>hi</html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    assert W.split_http_payload(http) == (200, body)
    assert W.split_http_payload(b"not http") == (None, b"not http")


def test_write_read_identity(spark, sf_dir, tmp_path):
    """documents → WARC files (plain AND per-record-gzip) → read_warc
    → warc_to_documents must reproduce the text column exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    for gz in (False, True):
        dst = str(tmp_path / ("gz" if gz else "plain"))
        manifest = W.write_warc(
            tagged, dst, uri_col="url", gzip_records=gz, files=3
        )
        assert sum(m[1] for m in manifest) == 50
        back = W.warc_to_documents(W.read_warc(spark, dst)).select("url", "text")
        got = {
            int(r["url"].removeprefix("urn:doc:")): r["text"]
            for r in back.collect()
        }
        assert got == want


def test_response_records_http_stripped(spark, tmp_path):
    recs = [
        W.warc_record_bytes(
            b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\nbody-one",
            warc_type="response", target_uri="http://a/1",
            content_type="application/http; msgtype=response",
        ),
        W.warc_record_bytes(
            b"HTTP/1.1 404 Not Found\r\n\r\ngone",
            warc_type="response", target_uri="http://a/2",
            content_type="application/http; msgtype=response",
        ),
        W.warc_record_bytes(b"meta", warc_type="warcinfo"),
    ]
    p = tmp_path / "f.warc"
    p.write_bytes(b"".join(recs))
    docs = W.warc_to_documents(W.read_warc(spark, str(tmp_path))).collect()
    # 404 dropped, warcinfo dropped, 200 body kept
    assert [(d["url"], d["text"]) for d in docs] == [("http://a/1", "body-one")]


def test_streaming_warc_ingest(spark, sf_dir, tmp_path):
    """Continuous-crawl shape: WARC files land in a dir, the streaming
    ingest parses them and dedups into the corpus — including an
    exact duplicate planted across two files (must land once)."""
    from big_ann_spark.cli import main
    from big_ann_spark.streaming.corpus import read_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    crawl = str(tmp_path / "crawl")
    W.write_warc(tagged, crawl, uri_col="url", gzip_records=True, files=2)
    # plant a duplicate text under a NEW url in a third file
    dup_text = docs.orderBy("doc_id").first()["text"]
    extra = spark.createDataFrame([("urn:doc:999999", dup_text)], "url string, text string")
    manifest = W.write_warc(extra, str(tmp_path / "extra"), uri_col="url")
    import shutil

    shutil.copy(manifest[0][0], str(tmp_path / "crawl" / "extra.warc"))

    dst = str(tmp_path / "corpus")
    assert main(["ingest", crawl, dst, "--format", "warc"]) == 0
    landed = read_corpus(spark, dst)
    n_unique_texts = docs.select("text").distinct().count()
    assert landed.count() == n_unique_texts  # the planted dup deduped
    assert landed.select("text").distinct().count() == n_unique_texts


def test_cli_warc_roundtrip(spark, sf_dir, tmp_path):
    from big_ann_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    warc_dir = str(tmp_path / "warc")
    out = str(tmp_path / "docs.parquet")
    assert main(["parquet-to-warc", src, warc_dir, "--uri-col", "doc_id",
                 "--gzip", "--files", "2"]) == 0
    assert main(["warc-to-parquet", warc_dir, out]) == 0
    n_src = spark.read.parquet(src).count()
    back = spark.read.parquet(out)
    assert back.count() == n_src
    joined = (
        back.withColumn("doc_id", F.col("url").cast("long"))
        .join(
            spark.read.parquet(src).select("doc_id", F.col("text").alias("t0")),
            "doc_id",
        )
        .filter(F.col("text") != F.col("t0"))
    )
    assert joined.count() == 0


def test_gunzip_many_members_linear():
    """~20k tiny members (the one-member-per-record Common Crawl
    shape): the member walk must be linear in total bytes — the old
    whole-remaining-buffer feed copied O(n²) bytes (ADVICE r10), which
    on this fixture alone was ~30 GB of memmoves."""
    import time

    recs = [W.warc_record_bytes(f"doc {i}".encode()) for i in range(20_000)]
    blob = b"".join(gzip.compress(r, mtime=0) for r in recs)
    t0 = time.perf_counter()
    out = list(W.parse_warc(blob))
    dt = time.perf_counter() - t0
    assert len(out) == 20_000
    assert out[0].content == b"doc 0" and out[-1].content == b"doc 19999"
    assert dt < 10.0  # linear runs in well under a second; O(n²) is minutes


def test_gunzip_member_spanning_chunks_and_errors():
    """A member whose COMPRESSED size spans several feed chunks must
    decompress exactly and hand the unused tail to the next member;
    truncation and non-gzip garbage die loudly with the offset."""
    import random

    payload = random.Random(0).randbytes(3 << 20)  # incompressible
    big = W.warc_record_bytes(payload)
    small = W.warc_record_bytes(b"tail")
    blob = gzip.compress(big, mtime=0) + gzip.compress(small, mtime=0)
    out = list(W.parse_warc(blob))
    assert [r.content for r in out] == [payload, b"tail"]
    with pytest.raises(ValueError, match="truncated gzip member"):
        W._gunzip_members(blob[:-20])
    with pytest.raises(ValueError, match="bad gzip member"):
        W._gunzip_members(gzip.compress(small, mtime=0) + b"\x1f\x8bGARBAGE")


def test_write_warc_refuses_then_overwrites_stale_parts(spark, tmp_path):
    """Re-running into a dst with FEWER partitions must not leave the
    old run's higher-numbered part files for read_warc to silently mix
    in (ADVICE r10): default mode refuses, overwrite clears."""
    docs = spark.createDataFrame([(f"d{i}",) for i in range(8)], "text string")
    dst = str(tmp_path / "w")
    first = W.write_warc(docs, dst, files=4)
    assert len(first) == 4
    with pytest.raises(FileExistsError, match="overwrite"):
        W.write_warc(docs, dst, files=1)
    second = W.write_warc(docs, dst, files=1, mode="overwrite")
    assert len(second) == 1
    back = W.warc_to_documents(W.read_warc(spark, dst))
    assert back.count() == 8  # 8 + any stale part would be >8


def test_cdx_split_read_equals_file_read(spark, sf_dir, tmp_path):
    """CDX-indexed byte-range reads must reproduce read_warc exactly
    AND actually split: one gz file becomes multiple range tasks when
    split_bytes is small (the multi-GB Common Crawl file case)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(60)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    for gz in (True, False):
        dst = str(tmp_path / ("gz" if gz else "plain"))
        W.write_warc(tagged, dst, uri_col="url", gzip_records=gz, files=2)
        cdx = W.build_cdx(spark, dst).localCheckpoint()
        assert cdx.count() == 60  # one member/record per row
        # force several splits per file
        got = W.read_warc_split(spark, cdx, split_bytes=2048)
        want = W.read_warc(spark, dst)
        key = lambda df: sorted(
            (r["file"], r["target_uri"], r["warc_type"], bytes(r["content"]))
            for r in df.select("file", "target_uri", "warc_type", "content").collect()
        )
        assert key(got) == key(want)
        # the split table is genuinely wider than the file count
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy("file").orderBy("offset")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        n_splits = (
            cdx.withColumn(
                "_s", F.floor((F.sum("length").over(w) - F.col("length")) / 2048)
            ).select("file", "_s").distinct().count()
        )
        assert n_splits > 2


def test_cdx_indexes_empty_gzip_members(spark, sf_dir, tmp_path):
    """An empty gzip member (legal gzip, zero WARC records) must be
    INDEXED (n_records=0, NULL headers) rather than crash the task —
    and the cdx-driven read must still serve every real record."""
    import glob
    import gzip
    import os

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(6)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    dst = str(tmp_path / "gz")
    W.write_warc(tagged, dst, uri_col="url", gzip_records=True, files=1)
    f = sorted(glob.glob(os.path.join(dst, "*.warc.gz")))[0]
    with open(f, "rb") as fh:
        data = fh.read()
    empty = gzip.compress(b"")
    # splice an empty member into the middle AND append one at the end
    mid = next(off for off, _, _ in W._iter_gzip_members(data) if off > 0)
    with open(f, "wb") as fh:
        fh.write(data[:mid] + empty + data[mid:] + empty)
    cdx = W.build_cdx(spark, dst).localCheckpoint()
    rows = cdx.collect()
    assert len(rows) == 8
    empties = [r for r in rows if r["n_records"] == 0]
    assert len(empties) == 2
    assert all(r["warc_type"] is None and r["target_uri"] is None for r in empties)
    got = {
        r["target_uri"]
        for r in W.read_warc_split(spark, cdx, split_bytes=2048).collect()
    }
    assert got == {f"urn:doc:{r['doc_id']}" for r in docs.collect()}


def test_cdx_prefiltered_point_lookup(spark, sf_dir, tmp_path):
    """A pre-filtered cdx reads ONLY the matching members — the
    Common Crawl index-server point-lookup pattern."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    dst = str(tmp_path / "gz")
    W.write_warc(tagged, dst, uri_col="url", gzip_records=True, files=1)
    cdx = W.build_cdx(spark, dst)
    one = cdx.filter(F.col("target_uri") == "urn:doc:3")
    got = W.read_warc_split(spark, one).collect()
    assert len(got) == 1 and got[0]["target_uri"] == "urn:doc:3"
    want = {
        r["doc_id"]: r["text"] for r in docs.collect()
    }[3]
    assert bytes(got[0]["content"]).decode("utf-8") == want


def test_cli_warc_index_split_roundtrip(spark, sf_dir, tmp_path):
    from big_ann_spark.cli import main

    src = f"{sf_dir}/documents.parquet"
    warc_dir = str(tmp_path / "warc")
    cdx = str(tmp_path / "cdx.parquet")
    out = str(tmp_path / "docs.parquet")
    assert main(["parquet-to-warc", src, warc_dir, "--uri-col", "doc_id",
                 "--gzip", "--files", "2"]) == 0
    assert main(["warc-index", warc_dir, cdx]) == 0
    assert main(["warc-to-parquet", warc_dir, out, "--cdx", cdx,
                 "--split-mb", "1"]) == 0
    n_src = spark.read.parquet(src).count()
    back = spark.read.parquet(out)
    assert back.count() == n_src
    joined = (
        back.withColumn("doc_id", F.col("url").cast("long"))
        .join(
            spark.read.parquet(src).select("doc_id", F.col("text").alias("t0")),
            "doc_id",
        )
        .filter(F.col("text") != F.col("t0"))
    )
    assert joined.count() == 0


def test_cdx_noncontiguous_prefilter_reads_only_selected(spark, sf_dir, tmp_path):
    """A pre-filtered cdx with NON-ADJACENT members must return exactly
    the selected records — only adjacent members may merge into one
    read; the bytes between selections are never read or parsed."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    for gz in (True, False):
        dst = str(tmp_path / ("g" if gz else "p"))
        W.write_warc(tagged, dst, uri_col="url", gzip_records=gz, files=1)
        cdx = W.build_cdx(spark, dst)
        picked = cdx.filter(
            F.col("target_uri").isin("urn:doc:3", "urn:doc:7", "urn:doc:19")
        )
        got = sorted(
            r["target_uri"] for r in W.read_warc_split(spark, picked).collect()
        )
        assert got == ["urn:doc:19", "urn:doc:3", "urn:doc:7"]


def test_streaming_member_walk_equals_buffered(tmp_path):
    """_iter_gzip_members_from (the O(record)-memory path build_cdx
    streams multi-GB files through) must yield identical
    (offset, length, bytes) as the buffered walk — including members
    whose compressed size spans several read chunks."""
    import random

    payloads = [random.Random(i).randbytes(3 << 20) for i in range(2)] + [b"t"]
    blob = b"".join(
        gzip.compress(W.warc_record_bytes(p), mtime=0) for p in payloads
    )
    f = tmp_path / "x.warc.gz"
    f.write_bytes(blob)
    with open(f, "rb") as fh:
        streamed = list(W._iter_gzip_members_from(fh))
    buffered = list(W._iter_gzip_members(blob))
    assert streamed == buffered and len(streamed) == 3
    with open(f, "rb") as fh:
        fh.truncate  # noqa: B018
    with open(f, "rb") as fh:
        data = fh.read()[:-15]
    f.write_bytes(data)
    with open(f, "rb") as fh:
        with pytest.raises(ValueError, match="truncated gzip member"):
            list(W._iter_gzip_members_from(fh))


def test_plain_record_walk_equals_buffered(tmp_path):
    """_iter_plain_records_from (the O(header)-memory walk build_cdx
    uses for uncompressed .warc, bodies seek-skipped) must yield the
    buffered parse's exact (offset, length-to-next-record) rows —
    including a record whose header spans read chunks, payloads
    containing the record separator, and trailing CRLFs; truncation
    dies loudly with the offset."""
    import random

    payloads = [
        random.Random(7).randbytes(200_000),
        b"tiny",
        b"contains\r\n\r\nWARC/1.0 lookalike" * 3,
    ]
    blob = b"".join(
        W.warc_record_bytes(
            p,
            target_uri=f"urn:x:{i}",
            # a >64 KiB header forces the incremental header read to
            # cross chunk boundaries
            record_id=("urn:uuid:" + "h" * (70_000 if i == 0 else 8)),
        )
        for i, p in enumerate(payloads)
    )
    f = tmp_path / "x.warc"
    f.write_bytes(blob)
    buffered = list(W.parse_warc(blob))
    ends = [r.offset for r in buffered[1:]] + [len(blob)]
    want = [
        (r.offset, end - r.offset, r.warc_type, r.record_id, r.target_uri)
        for r, end in zip(buffered, ends)
    ]
    with open(f, "rb") as fh:
        got = [
            (off, ln, rec.warc_type, rec.record_id, rec.target_uri)
            for off, ln, rec in W._iter_plain_records_from(fh)
        ]
    assert got == want and len(got) == 3
    # with_content=True also carries the exact bodies
    with open(f, "rb") as fh:
        bodies = [
            rec.content for _, _, rec in W._iter_plain_records_from(
                fh, with_content=True
            )
        ]
    assert bodies == payloads
    f.write_bytes(blob[:-10])
    with open(f, "rb") as fh:
        with pytest.raises(ValueError, match="truncated"):
            list(W._iter_plain_records_from(fh))


def _drain_stream(df, tmp_path, name):
    rows = []
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = df.sparkSession.sql(f"SELECT * FROM {name}").collect()
    q.stop()
    return rows


def test_read_warc_stream_local_walk_equals_batch(spark, sf_dir, tmp_path):
    """VERDICT r12 #5 — the STREAMING reader's local route: content is
    parsed by the record walks (binaryFile used for discovery only),
    and rows must equal the batch read_warc exactly, for plain AND
    gzip files."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    for gz in (True, False):
        dst = str(tmp_path / ("sgz" if gz else "splain"))
        W.write_warc(tagged, dst, uri_col="url", gzip_records=gz, files=2)

        def key(rows):
            return sorted(
                (
                    r["file"].split("/")[-1], r["record_index"], r["offset"],
                    r["warc_type"], r["record_id"], r["target_uri"],
                    r["warc_date"], r["content_type"], bytes(r["content"]),
                )
                for r in rows
            )

        got = key(
            _drain_stream(
                W.read_warc_stream(spark, dst), tmp_path, f"wstream_{gz}"
            )
        )
        want = key(W.read_warc(spark, dst).collect())
        assert got == want and len(got) == 20


def test_read_warc_stream_over_2gib_local_file(spark, tmp_path):
    """VERDICT r12 #5 — the streaming route must ingest a >2 GiB local
    file (binaryFile's content cap never applies: content is walked
    POSIX-side, never materialized as a blob row)."""
    d = tmp_path / "bigstream"
    d.mkdir()
    f = d / "huge.warc"
    n, body = 9, 256 << 20
    with open(f, "wb") as fh:
        for i in range(n):
            fh.write(
                b"WARC/1.0\r\n"
                b"WARC-Type: resource\r\n"
                + f"WARC-Record-ID: <urn:shuge:{i}>\r\n".encode()
                + f"Content-Length: {body}\r\n\r\n".encode()
            )
            fh.seek(body, 1)
            fh.write(b"\r\n\r\n")
    assert f.stat().st_size > (1 << 31)
    got = _drain_stream(
        W.read_warc_stream(spark, str(d)).select(
            "record_index", "warc_type", "record_id"
        ),
        tmp_path,
        "wstream_big",
    )
    assert sorted(r["record_index"] for r in got) == list(range(n))
    assert {r["record_id"] for r in got} == {f"<urn:shuge:{i}>" for i in range(n)}


def test_read_warc_over_2gib_local_file_routes(spark, tmp_path):
    """REGRESSION (ADVICE r12): the blob-route filter must be a PURE
    length predicate. The old disjunction (length <= cap) | ~file:
    was not file-level pushable — binaryFile's createFilterFunction
    degrades an Or with a path predicate to keep-everything — so a
    >2 GiB local file still materialized on the blob route and threw
    'exceeds the max length allowed'. A sparse >2 GiB plain WARC must
    now route through the paths walk without error."""
    f = tmp_path / "huge.warc"
    n, body = 9, 256 << 20  # 9 × 256 MiB bodies → ~2.25 GiB file
    with open(f, "wb") as fh:
        for i in range(n):
            fh.write(
                b"WARC/1.0\r\n"
                b"WARC-Type: resource\r\n"
                + f"WARC-Record-ID: <urn:huge:{i}>\r\n".encode()
                + f"Content-Length: {body}\r\n\r\n".encode()
            )
            fh.seek(body, 1)  # sparse hole = a body of zeros
            fh.write(b"\r\n\r\n")
    assert f.stat().st_size > (1 << 31)
    got = (
        W.read_warc(spark, str(f))
        .select("record_index", "warc_type", "record_id")
        .collect()
    )
    assert sorted(r["record_index"] for r in got) == list(range(n))
    assert {r["warc_type"] for r in got} == {"resource"}
    assert {r["record_id"] for r in got} == {f"<urn:huge:{i}>" for i in range(n)}


def test_read_warc_big_file_path_route_equals_binaryfile(spark, sf_dir, tmp_path):
    """Files above blob_cap_bytes ship as paths and stream through the
    record walks — rows must be identical to the binaryFile route (the
    multi-GB shape exercised with a tiny cap, no giant file needed),
    for BOTH plain and gzip files."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    tagged = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("url"), "text"
    )
    for gz in (True, False):
        dst = str(tmp_path / ("gz" if gz else "plain"))
        W.write_warc(tagged, dst, uri_col="url", gzip_records=gz, files=2)

        def key(df):
            return sorted(
                (
                    r["file"].split("/")[-1], r["record_index"], r["offset"],
                    r["warc_type"], r["record_id"], r["target_uri"],
                    r["warc_date"], r["content_type"], bytes(r["content"]),
                )
                for r in df.collect()
            )

        via_blob = key(W.read_warc(spark, dst))
        via_path = key(W.read_warc(spark, dst, blob_cap_bytes=1))
        assert via_path == via_blob and len(via_path) == 30


def test_stream_routing_uses_resolved_scheme(spark, tmp_path):
    """ADVICE r13: read_warc_stream's local-vs-blob routing must come
    from Hadoop FileSystem qualification, not string sniffing — a
    scheme-less path is local only when fs.defaultFS says so."""
    assert W._resolved_scheme(spark, str(tmp_path)) == "file"
    assert W._resolved_scheme(spark, f"file:{tmp_path}") == "file"
    # explicit remote scheme stays remote (no server contact needed:
    # qualification is pure URI work)
    assert W._resolved_scheme(spark, "s3a://bucket/crawl") == "s3a"
    # a scheme-less path under a REMOTE defaultFS resolves remote —
    # the case the old "'://' not in p" sniff mis-routed to POSIX
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("fs.defaultFS")
    hconf.set("fs.defaultFS", "hdfs://nn.example:8020")
    try:
        assert W._resolved_scheme(spark, "/crawl/warcs") == "hdfs"
    finally:
        hconf.set("fs.defaultFS", old or "file:///")
