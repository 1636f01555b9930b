"""Multimodal-column queries.

multimodal_pipeline runs binary payloads built deterministically from
the documents table through the frame sampler and the (deterministic
fake) feature extractor — the Spark plumbing under test, byte-exact
against DuckDB. multimodal_codec_roundtrip runs the REAL codecs (PNG,
baseline JPEG, WAV, AVI/MJPEG — all the engine's own, no
Pillow/librosa/ffmpeg) plus the area-resize kernel, oracle-exact by
construction. The fbin round-trip
check lives in sharding_queries.pipeline_invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_ann_spark.catalog import load_table
from big_ann_spark.operators import multimodal as MM
from big_ann_spark.queries import register


@register(
    "multimodal_pipeline",
    sql="""
WITH frames AS (
  SELECT 'frames' AS variant, doc_id,
         length(text)::BIGINT AS k,
         CAST(ceil(length(text) / 64.0) AS BIGINT) AS n
  FROM documents
),
chars AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
feat AS (
  SELECT 'feature_hist' AS variant, doc_id,
         (ascii(c) // 16)::BIGINT AS k, COUNT(*)::BIGINT AS n
  FROM chars GROUP BY 1, 2, 3
)
SELECT * FROM frames UNION ALL SELECT * FROM feat
""",
)
def multimodal_pipeline(spark, sf_dir):
    """Binary-column plumbing, oracle-checked end to end:
    - ``frames``: text bytes → binary media column → mapInPandas
      64-byte frame sampler → per-doc frame counts (= ceil(len/64));
    - ``feature_hist``: Arrow-batched feature extraction (deterministic
      fake codec, 16 byte-buckets, raw counts) → posexplode to
      (doc_id, bucket, count) scalar rows — integer-exact, so the
      driver hashes the actual mapInPandas output against DuckDB's
      character-class counts. Zero-count buckets are dropped to match
      the SQL group-by."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_media(docs)

    frames = (
        MM.frame_sample(media, every_n_bytes=64)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .join(media.select("doc_id", "media_len"), "doc_id")
        .select(
            F.lit("frames").alias("variant"),
            "doc_id",
            F.col("media_len").cast("long").alias("k"),
            F.col("n").cast("long").alias("n"),
        )
    )

    feats = MM.extract_features(media, normalize=False)
    hist = (
        feats.select(
            "doc_id", F.posexplode(F.col("features")).alias("bucket", "cnt")
        )
        .filter(F.col("cnt") > 0)
        .select(
            F.lit("feature_hist").alias("variant"),
            "doc_id",
            F.col("bucket").cast("long").alias("k"),
            F.col("cnt").cast("long").alias("n"),
        )
    )
    return frames.unionByName(hist)


@register(
    "multimodal_codec_roundtrip",
    sql="""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200),
q AS (SELECT vec_id, i,
             least(greatest(floor(v[i] * 40 + 128), 0), 255)::BIGINT AS px,
             least(greatest(floor(v[i] * 1000), -32768), 32767)::BIGINT AS smp
      FROM e, range(1, 65) t(i)),
png AS (SELECT 'png' AS variant, vec_id AS id, 8 AS d1, 8 AS d2,
               SUM(px)::BIGINT AS v_sum, MIN(px) AS v_min, MAX(px) AS v_max
        FROM q GROUP BY vec_id),
wav AS (SELECT 'wav' AS variant, vec_id AS id, 8000 AS d1, 64 AS d2,
               SUM(smp)::BIGINT AS v_sum, MIN(smp) AS v_min, MAX(smp) AS v_max
        FROM q GROUP BY vec_id),
-- jpeg: block-uniform even-valued 16x16 images are EXACT through the
-- lossy baseline codec at quality 50 (DC-only blocks; quant step 16
-- divides 8*(v-128)), so the oracle certifies the real decode output
jq AS (SELECT vec_id, i,
              b - (b % 2) AS b
       FROM (SELECT vec_id, i,
                    least(greatest(floor(v[i] * 40 + 128), 0), 254)::BIGINT AS b
             FROM e, range(1, 5) t(i))),
jpg AS (SELECT 'jpeg' AS variant, vec_id AS id, 16 AS d1, 16 AS d2,
               (64 * SUM(b))::BIGINT AS v_sum, MIN(b) AS v_min, MAX(b) AS v_max
        FROM jq GROUP BY vec_id),
-- thumb: the same image through decode -> 2x2 area resize -> PNG
-- re-encode -> decode; box means of uniform quadrants are exact
thumb AS (SELECT 'thumb' AS variant, vec_id AS id, 8 AS d1, 8 AS d2,
                 (16 * SUM(b))::BIGINT AS v_sum, MIN(b) AS v_min, MAX(b) AS v_max
          FROM jq GROUP BY vec_id),
-- video: two lossless-subspace frames muxed into an AVI/MJPEG
-- container, demuxed, and decoded per frame: d1 = demuxed frame
-- count, pixel stats summed over both frames (frame 1 reverses the
-- block order, which leaves sum/min/max invariant)
video AS (SELECT 'video' AS variant, vec_id AS id, 2 AS d1, 16 AS d2,
                 (2 * 64 * SUM(b))::BIGINT AS v_sum, MIN(b) AS v_min, MAX(b) AS v_max
          FROM jq GROUP BY vec_id),
-- audio_feat: integer-exact audio features of the decoded PCM —
-- zero-crossing rate as a lag-product sign test, energy as the
-- int64 sum of squares (the FFT features have no SQL form and are
-- numpy-parity tested instead)
afeat AS (SELECT 'audio_feat' AS variant, vec_id AS id,
                 COALESCE(SUM(CASE WHEN smp * prev < 0 THEN 1 END), 0)::INT AS d1,
                 64 AS d2,
                 SUM(smp * smp)::BIGINT AS v_sum,
                 MIN(smp) AS v_min, MAX(smp) AS v_max
          FROM (SELECT vec_id, smp,
                       lag(smp) OVER (PARTITION BY vec_id ORDER BY i) AS prev
                FROM q)
          GROUP BY vec_id),
-- warc: encode->parse identity over the real container reader; the
-- decoded text's codepoint stats and the per-file record count are
-- pure SQL over the source table
wrc AS (SELECT 'warc' AS variant, doc_id AS id,
               COUNT(*) OVER (PARTITION BY doc_id % 8)::INT AS d1,
               (doc_id % 8 % 2)::INT AS d2,
               CASE WHEN length(text) = 0 THEN 0 ELSE
                 list_aggregate(list_transform(string_split(text, ''), c -> ord(c)), 'sum')
               END::BIGINT AS v_sum,
               CASE WHEN length(text) = 0 THEN 0 ELSE
                 list_aggregate(list_transform(string_split(text, ''), c -> ord(c)), 'min')
               END::BIGINT AS v_min,
               CASE WHEN length(text) = 0 THEN 0 ELSE
                 list_aggregate(list_transform(string_split(text, ''), c -> ord(c)), 'max')
               END::BIGINT AS v_max
        FROM documents)
SELECT * FROM png UNION ALL SELECT * FROM wav UNION ALL SELECT * FROM jpg
UNION ALL SELECT * FROM thumb UNION ALL SELECT * FROM video
UNION ALL SELECT * FROM afeat UNION ALL SELECT * FROM wrc
""",
)
def multimodal_codec_roundtrip(spark, sf_dir):
    """REAL codecs, oracle-checked end to end (no Pillow/librosa — the
    engine's own stdlib codecs):
    - ``png``: each embedding quantized to an 8x8 grayscale image,
      PNG-encoded (zlib, sources/png.py) then DECODED back inside the
      same Arrow batch; pixel sum/min/max come from the decoded bytes,
      so the hash match against DuckDB's direct quantization proves
      encode→decode is the identity.
    - ``wav``: the same values quantized to int16 PCM, WAV-encoded
      (stdlib wave) and decoded; d1/d2 carry the decoded sample rate
      and frame count.
    - ``jpeg``: the engine's own baseline JPEG codec (sources/jpeg.py
      — Huffman entropy coding, DCT, restart markers; no Pillow).
      JPEG is lossy, so the oracle-exact construction picks the
      subspace where it is NOT: a 16×16 image of four uniform 8×8
      blocks with even pixel values round-trips bit-exactly at
      quality 50 (each block is DC-only and the luminance DC quant
      step 16 divides 8·(v−128)). Encoded with restart_interval=1 so
      the oracle also certifies the decoder's restart-resync path.
      Stats come from the DECODED pixels — a codec bug anywhere in
      the marker/Huffman/DCT chain breaks the hash.
    - ``thumb``: decode → 2×2 area resize (operators/multimodal.
      resize_area) → PNG re-encode → decode, chaining all four image
      codec stages plus the thumbnailing kernel through one oracle
      row (box means of uniform quadrants stay exact).
    - ``video``: the same lossless-subspace image and its
      block-reversed twin JPEG-encoded, muxed into an AVI/MJPEG
      container (sources/avi.py), demuxed, and decoded frame by
      frame — container walk + per-frame codec certified in one row
      (d1 carries the demuxed frame count; stats sum over frames).
    - ``audio_feat``: the integer-exact half of
      ``operators/multimodal.audio_feature_vector`` run on the
      DECODED WAV samples — zero-crossing count (d1) and sum-of-
      squares energy (v_sum) against DuckDB's lag-product/sum forms;
      a decoder bug that shifted, dropped, or re-scaled one sample
      breaks the hash.
    - ``warc``: the documents table serialized into real WARC
      container files (sources/warc.py; odd groups compressed one
      gzip member per record, the Common Crawl convention) and parsed
      back with the engine's reader — per-doc codepoint sum/min/max
      of the DECODED text certify Content-Length framing, the gzip
      member walk, and utf-8 round-trip against DuckDB reading the
      source table directly.
    All codec variants run in ONE mapInPandas pass over the embeddings
    — the decode→feature shape every multimodal training pipeline
    uses, with real bytes instead of the deterministic fake."""
    import numpy as np
    import pandas as pd

    from big_ann_spark.operators.multimodal import (
        audio_feature_vector,
        decode_wav,
        encode_wav_pcm16,
    )
    from big_ann_spark.operators.multimodal import resize_area
    from big_ann_spark.sources.avi import demux_avi, encode_avi_mjpeg
    from big_ann_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from big_ann_spark.sources.png import decode_png, encode_png

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200).select(
        "vec_id", "embedding"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for vid, v in zip(pdf["vec_id"], pdf["embedding"]):
                arr = np.asarray(v, dtype=np.float64)
                px = np.clip(np.floor(arr * 40 + 128), 0, 255).astype(np.uint8)
                dec = decode_png(encode_png(px.reshape(8, 8)))[:, :, 0].astype(np.int64)
                rows.append(
                    ("png", vid, dec.shape[1], dec.shape[0],
                     int(dec.sum()), int(dec.min()), int(dec.max()))
                )
                smp = np.clip(np.floor(arr * 1000), -32768, 32767).astype(np.int16)
                rate, _ch, n, ds = decode_wav(encode_wav_pcm16(smp))
                ds = ds.astype(np.int64)
                rows.append(
                    ("wav", vid, rate, n, int(ds.sum()), int(ds.min()), int(ds.max()))
                )
                b = np.clip(np.floor(arr[:4] * 40 + 128), 0, 254).astype(np.int64)
                b -= b % 2
                img = np.zeros((16, 16), dtype=np.uint8)
                img[:8, :8], img[:8, 8:] = b[0], b[1]
                img[8:, :8], img[8:, 8:] = b[2], b[3]
                jd = decode_jpeg(
                    encode_jpeg(img, quality=50, restart_interval=1)
                ).astype(np.int64)
                rows.append(
                    ("jpeg", vid, jd.shape[1], jd.shape[0],
                     int(jd.sum()), int(jd.min()), int(jd.max()))
                )
                td = decode_png(
                    encode_png(resize_area(jd.astype(np.uint8), 2))
                )[:, :, 0].astype(np.int64)
                rows.append(
                    ("thumb", vid, td.shape[1], td.shape[0],
                     int(td.sum()), int(td.min()), int(td.max()))
                )
                img2 = np.zeros((16, 16), dtype=np.uint8)
                img2[:8, :8], img2[:8, 8:] = b[3], b[2]
                img2[8:, :8], img2[8:, 8:] = b[1], b[0]
                clip = demux_avi(encode_avi_mjpeg(
                    [encode_jpeg(fr, quality=50, restart_interval=1)
                     for fr in (img, img2)],
                    16, 16, fps=25,
                ))
                fd = np.stack([decode_jpeg(f) for f in clip.frames]).astype(np.int64)
                rows.append(
                    ("video", vid, len(clip.frames), clip.height,
                     int(fd.sum()), int(fd.min()), int(fd.max()))
                )
                af = audio_feature_vector(ds, rate)
                rows.append(
                    ("audio_feat", vid, af["zcr"], n, af["energy"],
                     int(ds.min()), int(ds.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=["variant", "id", "d1", "d2", "v_sum", "v_min", "v_max"],
            )

    codecs = emb.mapInPandas(
        run,
        schema="variant string, id long, d1 int, d2 int, v_sum long, v_min long, v_max long",
    )

    # warc: the documents table serialized into real WARC files (one
    # blob per doc_id % 8 group; odd groups get one gzip member per
    # record, the Common Crawl convention) and parsed back with the
    # REAL reader — per-doc codepoint sum/min/max of the decoded text
    # prove framing + gzip-member walk + utf-8 round-trip exactly
    def warc_group(key, pdf):
        import gzip

        import pandas as pd

        from big_ann_spark.sources.warc import parse_warc, warc_record_bytes

        g = int(key[0])
        pdf = pdf.sort_values("doc_id")
        recs = [
            warc_record_bytes(
                (t or "").encode("utf-8"), target_uri=f"urn:doc:{int(d)}"
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        if g % 2:
            blob = b"".join(gzip.compress(r, 6, mtime=0) for r in recs)
        else:
            blob = b"".join(recs)
        parsed = list(parse_warc(blob))
        rows = []
        for rec in parsed:
            did = int(rec.target_uri.split(":")[-1])
            cps = [ord(c) for c in rec.content.decode("utf-8")]
            rows.append(
                ("warc", did, len(parsed), g % 2,
                 sum(cps), min(cps, default=0), max(cps, default=0))
            )
        return pd.DataFrame(
            rows, columns=["variant", "id", "d1", "d2", "v_sum", "v_min", "v_max"]
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    warc = (
        docs.withColumn("_g", F.pmod(F.col("doc_id"), F.lit(8)).cast("int"))
        .groupBy("_g")
        .applyInPandas(
            warc_group,
            schema="variant string, id long, d1 int, d2 int, "
            "v_sum long, v_min long, v_max long",
        )
    )
    return codecs.unionByName(warc)
