"""Multimodal columns: image/audio/video as opaque BinaryType payloads
with typed metadata, processed via Arrow-batched pandas iterators.

The container has no image/audio codecs, so the decode step is STUBBED:
`decode_payload` raises NotImplementedError for real media types unless
`fake=True`, in which case a deterministic fake decoder (byte statistics)
runs instead.  Everything around the stub — schema, binary handling,
mapInPandas batch shape, partitioning — is real and tested
(tests/test_multimodal.py).

100 TB posture: payloads dominate bytes; metadata-only queries must
never deserialize them (columnar parquet gives that for free — the
payload column is simply not read; check ReadSchema).  Feature
extraction runs as mapInPandas so payload bytes stream through Arrow in
batches, never materializing a full partition of media in Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_MIMES = ("image/png", "audio/wav", "video/mp4")


def with_payload(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal shape from documents: utf-8 bytes of the
    text stand in for the media payload; mime derived from source id."""
    # sources without a digit run default to bucket 0 (both engines; the
    # oracle mirrors with coalesce(try_cast(...), 0))
    src_num = F.coalesce(
        F.regexp_extract("source", r"(\d+)", 1).cast("int"), F.lit(0)
    )
    mime = (
        F.when(src_num % 3 == 0, _MIMES[0])
        .when(src_num % 3 == 1, _MIMES[1])
        .otherwise(_MIMES[2])
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def decode_payload(payload: bytes, mime: str, fake: bool = False) -> dict:
    """Decode one media payload.  Real codecs are not available in this
    environment — callers must opt into the deterministic fake."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/librosa/av) not installed; pass fake=True "
            "for the deterministic byte-statistics decoder"
        )
    n = len(payload)
    return {
        "byte_len": n,
        "mean_byte": (sum(payload) / n) if n else 0.0,
        "n_frames": (n + 255) // 256,
        "head_hex": payload[:4].hex(),
    }


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_frames", LongType()),
        StructField("head_hex", StringType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (payload, media_meta) — the
    Arrow batch shape a real decoder plugs into."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, m, fake=True)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "mime", pdf["mime"].values)
            yield out[[f.name for f in _FEATURE_SCHEMA.fields]]

    flat = df.select(
        "doc_id", F.col("media_meta.mime").alias("mime"), "payload"
    )
    return flat.mapInPandas(_extract, schema=_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# certified queries
# --------------------------------------------------------------------------

_META_ORACLE = """
SELECT
  doc_id,
  CASE coalesce(TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER), 0) % 3
    WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4'
  END AS mime,
  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
FROM documents
"""


@register("multimodal_meta", _META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pass over multimodal rows: typed mime, exact payload
    byte length, chunk count.  Must not touch payload bytes beyond the
    length (and doesn't: length is computed at encode time)."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    m = with_payload(docs)
    return m.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.byte_len").alias("byte_len"),
        ((F.col("media_meta.byte_len") + 255) / 256)
        .cast("bigint")
        .alias("n_chunks"),
    )


@register("multimodal_features")  # rows-only: blob byte math isn't SQL-friendly
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode-stub pipeline: payload -> mapInPandas -> per-item
    features (deterministic fake decoder).  Rows-only certification; the
    deterministic values themselves are asserted in tests."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    return extract_features(with_payload(docs))


# --------------------------------------------------------------------------
# frame sampling (video/audio-shaped: fixed-size frames, strided sample)
# --------------------------------------------------------------------------

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)


def sample_frames(df: DataFrame, frame_size: int = 256, stride: int = 2) -> DataFrame:
    """Split each payload into fixed-size frames and keep every
    `stride`-th one — the video keyframe-sampling shape.  Runs as
    mapInPandas so a 4 GB video row streams through Arrow without
    being exploded JVM-side first; emitted rows are only the sampled
    frames (1/stride of the bytes)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for k, off in enumerate(range(0, n, frame_size)):
                    if k % stride:
                        continue
                    out_doc.append(doc_id)
                    out_idx.append(k)
                    out_frame.append(bytes(payload[off:off + frame_size]))
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "frame": out_frame,
                    "frame_len": [len(f) for f in out_frame],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_frames, schema=_FRAME_SCHEMA)


_FRAME_ORACLE = """
SELECT
  doc_id,
  CAST(((octet_length(encode(text)) + 255) // 256 + 1) // 2 AS BIGINT) AS n_sampled,
  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
FROM documents
"""


@register("multimodal_frame_sample", _FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling certified by counts: every 2nd 256-byte frame per
    payload; the oracle computes the expected sampled-frame count from
    the byte length (ceil(ceil(n/256)/2)).  Byte-level frame contents
    are asserted in tests/test_multimodal.py."""
    tune(spark)
    docs = t(spark, sf_dir, "documents")
    frames = sample_frames(with_payload(docs))
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("n_sampled"))
    # byte_len recomputed independently of the frame path so the oracle
    # cross-checks the sampling arithmetic, not a shared subexpression
    lens = docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("byte_len"),
    )
    # left join from lens: a zero-length payload yields no frames but must
    # still report n_sampled=0 (the oracle emits the row)
    return lens.join(counts, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        "byte_len",
    )


# --------------------------------------------------------------------------
# multimodal_byte_stats — REAL byte-level payload analysis, hash-certified
# (unlike multimodal_features, whose media decode is an honest stub, the
# byte domain needs no codec: histogram facts are exact integers/strings)
# --------------------------------------------------------------------------

_BYTE_STATS_ORACLE = """
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents WHERE length(text) > 0
), bytes AS (
  SELECT doc_id, substr(hx, 2 * i + 1, 2) AS bh
  FROM (SELECT doc_id, hx, unnest(range(0, length(hx) // 2)) AS i FROM p)
), counts AS (
  SELECT doc_id, bh, COUNT(*) AS c FROM bytes GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, bh, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bh ASC) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct,
         SUM(c) OVER (PARTITION BY doc_id) AS total
  FROM counts
)
SELECT doc_id,
       CAST(total AS BIGINT) AS byte_len,
       CAST(n_distinct AS BIGINT) AS n_distinct_bytes,
       bh AS top_byte_hex,
       CAST(c AS BIGINT) AS top_byte_count
FROM ranked WHERE rn = 1
"""


@register("multimodal_byte_stats", _BYTE_STATS_ORACLE)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level payload statistics over the binary media column:
    length, distinct byte values, and the dominant byte (hex, lowest
    value on ties) with its count — the container-agnostic screening a
    multimodal pipeline runs BEFORE any codec (truncated files, filler
    padding, and format anomalies all show up in the byte histogram).
    One numpy bincount per payload inside Arrow batches; all outputs
    are exact integers/strings, so unlike the decode stub this is
    hash-certified against the oracle."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    tune(spark)
    docs = t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    payloads = with_payload(docs).select("doc_id", "payload")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                cnt = np.bincount(b, minlength=256)
                top = int(cnt.argmax())  # first max = lowest byte value
                rows.append(
                    (
                        int(doc_id),
                        int(b.size),
                        int((cnt > 0).sum()),
                        format(top, "02X"),
                        int(cnt[top]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "byte_len", "n_distinct_bytes",
                    "top_byte_hex", "top_byte_count",
                ],
            )

    return payloads.mapInPandas(
        stats,
        "doc_id long, byte_len long, n_distinct_bytes long, "
        "top_byte_hex string, top_byte_count long",
    )
