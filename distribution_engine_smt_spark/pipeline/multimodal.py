"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extract step is STUBBED (no image/audio libraries in
this container) with a deterministic fake decoder; everything Spark-side —
schema, batching, partition discipline, UDF signature — is real and tested.
Swap ``_decode_stub`` for a PIL/ffmpeg call and nothing else changes.

Scale notes: binary payloads ride in their own column so column pruning
keeps metadata-only queries payload-free; decode fan-out is mapInPandas
(no shuffle), so throughput scales linearly with executors; batch size is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch to cap executor
memory per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..driver_queries import _t, register

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("status", StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Model the documents table as a media table: text bytes become the
    opaque binary payload (stand-in for image/audio bytes)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas, no shuffle, executor-parallel.

    The stub derives deterministic fake dimensions from the payload bytes;
    a real decoder (PIL.Image.open, soundfile, pyav frame sampling) drops in
    at the marked line with the same signature.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def decode_one(payload: bytes, media_type: str):
            if payload is None:
                return 0, None, None, "error:empty"
            # --- real decoder goes here; deterministic stub below ---
            digest = hashlib.md5(payload).digest()
            width = 64 + digest[0] % 192
            height = 64 + digest[1] % 192
            return len(payload), int(width), int(height), "ok:stub"

        for pdf in batches:
            rows = [
                (row.doc_id, row.media_type, *decode_one(row.payload, row.media_type))
                for row in pdf.itertuples()
            ]
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "width", "height", "status",
                ],
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


# The decode STUB is deterministic md5 math, so — unusually for a
# mapInPandas operator — it has a full SQL oracle: width/height re-derive
# the first two md5 digest bytes digit-wise. (DuckDB's md5(VARCHAR) hashes
# the UTF-8 bytes, which is exactly Spark's md5(encode(text,'utf-8')).)
_BYTE = (
    "((strpos('0123456789abcdef', substr(md5(text), {a}, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(text), {b}, 1)) - 1)"
)

_DECODE_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CASE WHEN text IS NULL THEN 0
                ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(64 + {_BYTE.format(a=1, b=2)} % 192 AS INT) END AS width,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(64 + {_BYTE.format(a=3, b=4)} % 192 AS INT) END AS height,
           CASE WHEN text IS NULL THEN 'error:empty' ELSE 'ok:stub' END AS status
    FROM documents
    ORDER BY doc_id ASC
"""


@register("multimodal_decode", _DECODE_SQL)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    media = documents_as_media(t["documents"])
    return decode_media(media).orderBy(F.col("doc_id").asc())


@register(
    "multimodal_metadata_stats",
    """
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    ORDER BY media_type ASC
    """,
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregate over the media table: column pruning drops
    the binary payload from the scan entirely (ReadSchema excludes it)."""
    t = _t(spark, sf_dir)
    media = documents_as_media(t["documents"])
    return (
        media.groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.octet_length(F.col("payload"))).cast("bigint").alias("total_bytes"),
        )
        .orderBy(F.col("media_type").asc())
    )


# ---------------------------------------------------------------------------
# resize: 1→1 transform over the decoded frame, payload-aware
# ---------------------------------------------------------------------------

TARGET_W = 224  # the classic vision-model input square
TARGET_H = 224

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("scale_num", IntegerType()),  # min(tw*h0, th*w0) numerator
        StructField("out_bytes", LongType()),
        StructField("status", StringType()),
    ]
)


def resize_media(media: DataFrame, tw: int = TARGET_W, th: int = TARGET_H) -> DataFrame:
    """Arrow-batched resize plumbing: decode dims (stub), compute the
    aspect-preserving scale, emit the resized-frame byte count. A real
    implementation replaces the marked line with PIL ``Image.resize`` and
    writes the resized payload; the schema/batching/no-shuffle shape is
    identical. Integer-only math so the oracle is exact.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def one(payload: bytes):
            if payload is None:
                return None, None, None, 0, "error:empty"
            digest = hashlib.md5(payload).digest()
            w0 = 64 + digest[0] % 192
            h0 = 64 + digest[1] % 192
            # aspect-preserving: scale = min(tw/w0, th/h0), kept as the
            # integer numerator min(tw*h0, th*w0) over the common w0*h0
            # denominator so no float enters the plumbing
            # --- real resample (PIL/ffmpeg) goes here ---
            scale_num = min(tw * h0, th * w0)
            out_bytes = tw * th * 3  # RGB target frame
            return int(w0), int(h0), int(scale_num), int(out_bytes), "ok:stub"

        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                w0, h0, sn, ob, st = one(row.payload)
                rows.append((row.doc_id, row.media_type, w0, h0, sn, ob, st))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height",
                    "scale_num", "out_bytes", "status",
                ],
            )

    return media.mapInPandas(resize_batches, RESIZED_SCHEMA)


@register(
    "multimodal_resize",
    f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(64 + {_BYTE.format(a=1, b=2)} % 192 AS INT) END AS width,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(64 + {_BYTE.format(a=3, b=4)} % 192 AS INT) END AS height,
           CASE WHEN text IS NULL THEN NULL
                ELSE CAST(least({TARGET_W} * (64 + {_BYTE.format(a=3, b=4)} % 192),
                               {TARGET_H} * (64 + {_BYTE.format(a=1, b=2)} % 192))
                     AS INT) END AS scale_num,
           CASE WHEN text IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST({TARGET_W} * {TARGET_H} * 3 AS BIGINT) END AS out_bytes,
           CASE WHEN text IS NULL THEN 'error:empty' ELSE 'ok:stub' END AS status
    FROM documents
    ORDER BY doc_id ASC
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass over the media table: decode dims, aspect-preserving
    integer scale toward {tw}x{th}, resized byte budget. mapInPandas,
    no shuffle — throughput scales linearly with executors, and at 100 TB
    the resized payloads write straight back out partition-local."""
    t = _t(spark, sf_dir)
    media = documents_as_media(t["documents"])
    return resize_media(media).orderBy(F.col("doc_id").asc())


multimodal_resize.__doc__ = multimodal_resize.__doc__.format(
    tw=TARGET_W, th=TARGET_H
)


# ---------------------------------------------------------------------------
# frame sampling: 1→N expansion for video payloads
# ---------------------------------------------------------------------------

FRAME_BYTES = 256  # stub: one fake frame per 256 payload bytes
FRAME_HOP = 4  # sample every 4th frame
FRAME_CAP = 8  # at most 8 sampled frames per video

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """1→N frame sampling over video payloads via mapInPandas: each input
    row yields a bounded set of frame rows (every {hop}th frame, capped at
    {cap}). The stub derives the frame count from payload length and each
    frame's content hash from (payload, index); a real sampler (pyav) emits
    decoded frame bytes with the identical 1→N batch discipline — the Arrow
    batch size bounds executor memory, NOT the video length, because the
    cap applies per row before the batch is materialized.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def frames_of(doc_id: int, payload: bytes):
            if payload is None:
                return
            n_frames = 1 + len(payload) // FRAME_BYTES
            emitted = 0
            for idx in range(0, n_frames, FRAME_HOP):
                if emitted >= FRAME_CAP:
                    break
                # --- real decoder: yield the frame's pixel bytes here ---
                h = hashlib.md5(payload + b":" + str(idx).encode()).hexdigest()
                yield (doc_id, idx, h)
                emitted += 1

        for pdf in batches:
            rows = []
            for row in pdf.itertuples():
                rows.extend(frames_of(row.doc_id, row.payload))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5"]
            )

    return media.mapInPandas(frame_batches, FRAMES_SCHEMA)


sample_frames.__doc__ = sample_frames.__doc__.format(hop=FRAME_HOP, cap=FRAME_CAP)


@register(
    "multimodal_frame_sample",
    f"""
    WITH v AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS n_bytes
      FROM documents
      WHERE doc_id % 3 = 2 AND text IS NOT NULL
    )
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(text || ':' || CAST(i AS VARCHAR)) AS frame_md5
    FROM v,
         unnest(generate_series(0,
                least(n_bytes // {FRAME_BYTES},
                      ({FRAME_CAP} - 1) * {FRAME_HOP}),
                {FRAME_HOP})) t(i)
    ORDER BY doc_id ASC, frame_idx ASC
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling restricted to the video payloads (doc_id % 3 = 2):
    the canonical video→training-frames expansion. See ``sample_frames``
    for the 1→N batch discipline; the stub's md5 frame hash makes the whole
    pipeline SQL-oracle-checkable (frame count, stride, cap, and per-frame
    content all re-derived relationally in DuckDB)."""
    t = _t(spark, sf_dir)
    media = documents_as_media(t["documents"]).where(
        F.col("media_type") == "video/mp4"
    )
    return sample_frames(media).orderBy(
        F.col("doc_id").asc(), F.col("frame_idx").asc()
    )


# ---------------------------------------------------------------------------
# streaming twin: decode media as it arrives
# ---------------------------------------------------------------------------


def run_media_decode_stream(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "media_decode",
):
    """Streaming ingest-time decode: file source → documents_as_media →
    Arrow-batched decode → memory sink (append mode; the decode is
    STATELESS, so no watermark/state store is involved and each
    micro-batch's throughput is the batch operator's).

    This is the deployment shape for media preprocessing: payloads are
    decoded once on arrival and the decoded metadata lands in the feature
    table; the batch operator (multimodal_decode) is the backfill. The
    drain-equals-batch test proves the two paths agree row-for-row."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    decoded = decode_media(documents_as_media(raw))
    return (
        decoded.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
