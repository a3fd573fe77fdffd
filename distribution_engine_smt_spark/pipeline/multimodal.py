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
