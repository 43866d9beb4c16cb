"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads + typed metadata, processed with Arrow-batched ``mapInPandas``.

The decode kernels themselves need codec libraries (PIL/ffmpeg/soundfile)
that are NOT in this container — they are stubbed behind import guards with
a clearly-marked deterministic fake, while everything Spark-side is real and
tested: the schema contract, the mapInPandas batch shape, partition-level
parallelism, and the metadata pushdown (filters on the struct fields prune
before any payload ever moves).

Scale notes: payloads ride in parquet binary columns; decode is a map-only
pass (no shuffle); ``spark.sql.files.maxPartitionBytes`` bounds the bytes a
task holds; feature extraction emits small fixed-size vectors so the wide
binary column is pruned immediately after the map stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the media table contract: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_KINDS = ["image", "audio", "video"]
_FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}

try:  # real decoder path — not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic fake media table from ``documents``: payload
    bytes are the doc text (stand-in for real codec bytes), metadata derived
    from doc_id. The *plumbing* — binary column, struct metadata, parquet
    round-trip — is exactly what a real ingest produces."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    fmt = F.element_at(F.array(*[F.lit(_FORMATS[k]) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            fmt.alias("format"),
            ((F.col("doc_id") % 64 + 1) * 16).cast("int").alias("width"),
            ((F.col("doc_id") % 48 + 1) * 16).cast("int").alias("height"),
            ((F.col("doc_id") % 300 + 1) * 100).cast("int").alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: byte
    histogram moments. Replaced wholesale when a real codec is present."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [round(a / n, 4) for a in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes via mapInPandas.

    With a codec library installed this is where decode+embed runs; here the
    kernel is the deterministic fake (clearly marked). The Spark contract —
    batch iterator in, batch iterator out, fixed output schema — is real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_PIL:  # pragma: no cover - codec libs absent in container
                raise NotImplementedError(
                    "real decode path requires codec kernels; plug in here"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(lambda p: _fake_features(bytes(p), dim)),
                }
            )
            yield out

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: metadata-only fast path computes the target
    geometry JVM-side (no payload touched, column-pruned scan); the payload
    re-encode is the stubbed kernel."""
    scale = F.least(
        F.lit(max_side) / F.col("meta.width"), F.lit(max_side) / F.col("meta.height"), F.lit(1.0)
    )
    return media.where(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        # floor, not round: identical across engines (no half-way ties)
        F.floor(F.col("meta.width") * scale).cast("int").alias("new_width"),
        F.floor(F.col("meta.height") * scale).cast("int").alias("new_height"),
    )


def chunk_audio(media: DataFrame, window_ms: int = 500) -> DataFrame:
    """Audio windowing plan: fixed windows over the clip duration with the
    sample count each window holds at the clip's sample rate (JVM sequence
    explode; the waveform decode is the stubbed kernel). Completes the
    per-modality preprocessing trio: image→resize, video→frames,
    audio→windows."""
    return (
        media.where(F.col("kind") == "audio")
        .select(
            "media_id",
            F.col("meta.sample_rate").alias("sample_rate"),
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(window_ms))
            ).alias("start_ms"),
            F.col("meta.duration_ms").alias("duration_ms"),
        )
        .select(
            "media_id",
            "start_ms",
            F.least(F.col("start_ms") + window_ms, F.col("duration_ms")).alias("end_ms"),
            (
                (F.least(F.col("start_ms") + window_ms, F.col("duration_ms"))
                 - F.col("start_ms"))
                * F.col("sample_rate") / 1000
            ).cast("long").alias("n_samples"),
        )
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode frame timestamps from duration
    metadata (JVM-side sequence); actual frame decode is the stubbed kernel."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


#: DuckDB twins for the metadata-plane queries (payload-plane ops are
#: mapInPandas → rows-only). The CTE mirrors synth_media's derivation.
SQL_MEDIA_CTE = """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         CAST((doc_id % 64 + 1) * 16 AS INTEGER) AS width,
         CAST((doc_id % 48 + 1) * 16 AS INTEGER) AS height,
         CAST((doc_id % 300 + 1) * 100 AS INTEGER) AS duration_ms
  FROM documents
)
"""

SQL_MEDIA_CATALOG = SQL_MEDIA_CTE + """
SELECT media_id, kind, n_bytes, width, height, duration_ms FROM media
"""

SQL_RESIZE_PLAN = SQL_MEDIA_CTE + """
SELECT media_id, width, height,
       CAST(FLOOR(width * LEAST(256.0 / width, 256.0 / height, 1.0)) AS INTEGER) AS new_width,
       CAST(FLOOR(height * LEAST(256.0 / width, 256.0 / height, 1.0)) AS INTEGER) AS new_height
FROM media WHERE kind = 'image'
"""

SQL_FRAME_PLAN = SQL_MEDIA_CTE + """
SELECT media_id, UNNEST(generate_series(0, duration_ms - 1, 1000)) AS frame_ts_ms
FROM media WHERE kind = 'video'
"""

SQL_AUDIO_PLAN = SQL_MEDIA_CTE + """
SELECT media_id, start_ms,
       LEAST(start_ms + 500, duration_ms) AS end_ms,
       CAST((LEAST(start_ms + 500, duration_ms) - start_ms) * 16000 / 1000 AS BIGINT) AS n_samples
FROM (
  SELECT media_id, duration_ms,
         UNNEST(generate_series(0, duration_ms - 1, 500)) AS start_ms
  FROM media WHERE kind = 'audio'
)
"""


def media_catalog(media: DataFrame) -> DataFrame:
    """Metadata-plane view: payload size + struct fields, payload pruned."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
