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


# --------------------------------------- perceptual-hash image near-dup

#: dHash grid: 9 columns × 8 rows; each row yields 8 horizontal-gradient
#: bits (cell > right neighbour) → a 64-bit signature.
PHASH_GRID_W, PHASH_GRID_H = 9, 8
_PHASH_CELLS = PHASH_GRID_W * PHASH_GRID_H  # 72


def phash_signatures(media: DataFrame) -> DataFrame:
    """dHash perceptual signatures over the payload column:
    ``(doc_id, bits array<int>[64], band0..band3)`` — the exact frame shape
    :func:`dedup.hamming_band_near_dups` consumes, so image near-dedup
    reuses the SimHash 4×16-bit pigeonhole banding unchanged.

    The real pipeline computes the grayscale grid inside the Arrow decode
    kernel (codec libs absent here — see module docstring); the
    deterministic fake "decode" treats the payload byte stream as the pixel
    stream: bytes fold into a 9×8 grid by position mod 72 (cell value =
    mean byte), then dHash compares each cell to its right neighbour —
    real dHash math over a stubbed decode, JVM-side and oracle-checkable.

    Cell means are compared EXACTLY as cross-multiplied integer rationals
    (sum_a·cnt_b > sum_b·cnt_a) — no float averaging, so Spark and the
    DuckDB twin agree bit-for-bit. Payloads shorter than 72 bytes are
    right-padded with byte 0x01 so every cell is populated.

    Scale shape: one posexplode (map-only), one (id, cell) partial-agg
    shuffle that combiner-compresses to ≤72 rows per doc, one per-doc agg;
    the wide payload column is pruned after the explode projection.
    """
    # fold RAW BYTES via the hex encoding (2 hex chars per byte): a UTF-8
    # decode would throw MALFORMED_CHARACTER_CODING under ANSI mode on any
    # genuine binary payload (real image/audio bytes are not valid UTF-8)
    # and would collapse high bytes to U+FFFD otherwise — hex() is total.
    # Pad ONLY when shorter (rpad truncates longer strings, which would
    # silently hash just the first 72 bytes): pad bytes are 0x01 ("01"
    # cycled, always byte-aligned since hex strings have even length).
    hx = F.hex(F.col("payload"))
    hex_len = 2 * _PHASH_CELLS
    t = F.when(F.length(hx) < hex_len, F.rpad(hx, hex_len, "01")).otherwise(hx)
    # Explicit spread before the per-byte explode, same discipline as
    # simhash_signatures: the hex fold + posexplode is CPU-dense on
    # byte-light input, and a single-file parquet scan otherwise
    # serializes the whole signing into one task (r9 stage audit:
    # phash_band_stats 76% single-task). Re-measured r9 at sf0.1: signing
    # 3.2→1.3 s, signing+pair join 5.4→4.2 s — the earlier A/B that
    # recorded the repartition HURTING (8.9→10.3 s) predated the shared
    # band-join barrier and no longer reproduces. (The explode_outer
    # variant stays banned: measured 26× total-CPU blowup — it disables
    # generator codegen; plain posexplode + the session-level
    # InferFiltersFromGenerate exclusion is the fast shape.)
    media = media.repartition(
        media.sparkSession.sparkContext.defaultParallelism, "media_id"
    )
    chars = media.select(
        F.col("media_id"),
        F.posexplode(F.regexp_extract_all(t, F.lit(".."), 0)).alias("pos", "ch"),
    )
    cells = chars.groupBy(
        "media_id", (F.col("pos") % _PHASH_CELLS).alias("cell")
    ).agg(
        F.sum(F.conv(F.col("ch"), 16, 10).cast("int")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    grids = cells.groupBy("media_id").agg(
        F.array_sort(F.collect_list(F.struct("cell", "s", "c"))).alias("g")
    )

    def cell(idx: int):  # 0-based grid cell → (sum, count) columns
        e = F.element_at(F.col("g"), idx + 1)
        return e["s"], e["c"]

    bit_exprs = []
    for i in range(64):
        r, c = divmod(i, PHASH_GRID_H)
        left = r * PHASH_GRID_W + c
        sa, ca = cell(left)
        sb, cb = cell(left + 1)
        bit_exprs.append((sa * cb > sb * ca).cast("int"))
    out = grids.select(
        F.col("media_id").alias("doc_id"), F.array(*bit_exprs).alias("bits")
    )
    for band in range(4):
        band_val = F.aggregate(
            F.slice(F.col("bits"), band * 16 + 1, 16),
            F.lit(0).cast("long"),
            lambda acc, bit: acc * 2 + bit,
        )
        out = out.withColumn(f"band{band}", band_val)
    return out


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bits", ArrayType(IntegerType())),
        StructField("band0", LongType()),
        StructField("band1", LongType()),
        StructField("band2", LongType()),
        StructField("band3", LongType()),
    ]
)


def phash_signatures_kernel(media: DataFrame) -> DataFrame:
    """Arrow-batched twin of :func:`phash_signatures`: the SAME dHash math
    computed inside a ``mapInPandas`` kernel over the raw payload bytes —
    the slot where a real codec decode (PIL downsample → grayscale grid)
    plugs in; with the stubbed decode the byte stream IS the pixel stream,
    so this must be bit-identical to the JVM formulation (pinned in tests).
    Map-only: no shuffle; each task hashes its own payload batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                # REAL-DECODE PLUG POINT: with a codec present, downsample
                # the decoded image to the 9x8 grayscale grid here and feed
                # it to the dHash below unchanged. The deterministic stub
                # (byte stream AS the pixel stream) stays the default even
                # when PIL is importable — these synthetic payloads are not
                # images, and the JVM twin computes the same stub.
                if len(b) < _PHASH_CELLS:
                    b = b + b"\x01" * (_PHASH_CELLS - len(b))
                s = [0] * _PHASH_CELLS
                c = [0] * _PHASH_CELLS
                for i, v in enumerate(b):
                    s[i % _PHASH_CELLS] += v
                    c[i % _PHASH_CELLS] += 1
                bits = []
                for i in range(64):
                    r, col = divmod(i, 8)
                    left = r * PHASH_GRID_W + col
                    bits.append(
                        int(s[left] * c[left + 1] > s[left + 1] * c[left])
                    )
                bands = []
                for band in range(4):
                    acc = 0
                    for bit in bits[band * 16 : band * 16 + 16]:
                        acc = acc * 2 + bit
                    bands.append(acc)
                rows.append((int(mid), bits, *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id", "bits", "band0", "band1", "band2", "band3"]
            )

    return media.mapInPandas(kernel, PHASH_SCHEMA)


def phash_near_dups(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate pairs over the media payload column:
    dHash signatures banded 4×16 bits, candidates from the shared pigeonhole
    equi-join (lossless for max_hamming ≤ 3), exact Hamming verify.
    Returns (doc_a, doc_b, hamming) — doc ids are media_ids."""
    from magiceye_spark.llmops.dedup import hamming_band_near_dups

    return hamming_band_near_dups(phash_signatures(media), max_hamming).orderBy(
        "doc_a", "doc_b"
    )


#: DuckDB twin: same grid folding, exact cross-multiplied mean compares,
#: bit-string Hamming (the banding is lossless for the ≤3 threshold, so the
#: oracle is the plain all-pairs formulation over the same signatures).
_SQL_PHASH_CTES = """
WITH padded AS (
  -- pad only when shorter: rpad truncates longer strings
  SELECT doc_id AS media_id,
         CASE WHEN length(text) < 72 THEN rpad(text, 72, chr(1)) ELSE text END AS t
  FROM documents
),
chars AS (
  SELECT media_id, (i - 1) % 72 AS cell, unicode(substr(t, i, 1)) AS v
  FROM padded, UNNEST(generate_series(1, length(t))) AS u(i)
),
cells AS (
  SELECT media_id, cell, SUM(v) AS s, COUNT(*) AS c FROM chars GROUP BY 1, 2
),
bits AS (
  SELECT a.media_id, (a.cell // 9) * 8 + (a.cell % 9) AS bit,
         CASE WHEN a.s * b.c > b.s * a.c THEN '1' ELSE '0' END AS bv
  FROM cells a JOIN cells b ON a.media_id = b.media_id AND b.cell = a.cell + 1
  WHERE a.cell % 9 < 8
),
hs AS (SELECT media_id, string_agg(bv, '' ORDER BY bit) AS h FROM bits GROUP BY 1)
"""

SQL_PHASH_NEAR_DUPS = _SQL_PHASH_CTES + """
SELECT a.media_id AS doc_a, b.media_id AS doc_b,
       CAST(hamming(a.h, b.h) AS INTEGER) AS hamming
FROM hs a JOIN hs b ON a.media_id < b.media_id
WHERE hamming(a.h, b.h) <= 3
ORDER BY doc_a, doc_b
"""

#: band-bucket occupancy oracle: fold each 16-bit slice of the signature
#: bit string to the SAME integer Spark's band fold produces (acc*2+bit in
#: bit-index order == Σ bit_j << (16-j)), then aggregate occupancy per band
SQL_PHASH_BAND_STATS = _SQL_PHASH_CTES + """,
bands AS (
  SELECT media_id, b.band AS band_id,
         SUM(CAST(substr(h, b.band * 16 + u.j, 1) AS BIGINT) << (16 - u.j)) AS bucket
  FROM hs,
       UNNEST(generate_series(0, 3)) AS b(band),
       UNNEST(generate_series(1, 16)) AS u(j)
  GROUP BY 1, 2
),
per AS (
  SELECT band_id, bucket, COUNT(*) AS n FROM bands GROUP BY 1, 2
)
SELECT CAST(band_id AS INTEGER) AS band_id,
       CAST(SUM(n) AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(MAX(n) AS BIGINT) AS max_bucket,
       CAST(SUM(CASE WHEN n > 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_buckets
FROM per
GROUP BY 1
ORDER BY 1
"""

#: stored-Hamming-index delta ADMISSION oracle (r9): unlike the MinHash
#: family (where LSH banding is itself the approximation, so admission
#: rows stay rows-only), the 4×16-bit pigeonhole banding is LOSSLESS for
#: Hamming ≤ 3 — the indexed path's delta pair set is exact, so the full
#: closure-admission verdict is hash-checkable: delta-touching pairs →
#: recursive min-label components → reject incoming docs whose component
#: holds a stored doc or that are not their all-incoming component's
#: minimum. Store = media_id < 350, batch = the rest (the registry
#: query's split).
_SQL_PHASH_ADMIT_BODY = """,
pairs AS (
  SELECT a.media_id AS pa, b.media_id AS pb
  FROM hs a JOIN hs b ON a.media_id < b.media_id
  WHERE hamming(a.h, b.h) <= 3
    AND (a.media_id >= 350 OR b.media_id >= 350)
),
edges AS (SELECT pa AS a, pb AS b FROM pairs UNION SELECT pb, pa FROM pairs),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
),
comps AS (SELECT node, MIN(comp) AS comp_id FROM reach GROUP BY node),
labeled AS (SELECT node, comp_id, (node < 350) AS stored FROM comps),
verdicts AS (
  SELECT comp_id,
         MAX(CASE WHEN stored THEN 1 ELSE 0 END) AS has_existing,
         MIN(CASE WHEN NOT stored THEN node END) AS min_incoming
  FROM labeled GROUP BY comp_id
),
rejected AS (
  SELECT l.node FROM labeled l JOIN verdicts v USING (comp_id)
  WHERE NOT l.stored AND (v.has_existing = 1 OR l.node <> v.min_incoming)
)
"""

SQL_PHASH_ADMIT_EXACT = _SQL_PHASH_CTES.replace(
    "WITH padded", "WITH RECURSIVE padded", 1
) + _SQL_PHASH_ADMIT_BODY + """
SELECT CAST(h.media_id AS BIGINT) AS doc_id
FROM hs h LEFT JOIN rejected r ON h.media_id = r.node
WHERE h.media_id >= 350 AND r.node IS NULL
"""


def _sql_band_fold(col: str, band: int) -> str:
    """16-bit band fold of the dHash bit string — the same integer
    Spark's fold produces (acc*2+bit in bit-index order == Σ bit_j <<
    (16-j)); the scalar-expression form of SQL_PHASH_BAND_STATS' fold."""
    return " + ".join(
        f"(CAST(substr({col}, {band * 16 + j}, 1) AS BIGINT) << {16 - j})"
        for j in range(1, 17)
    )


#: the delta-admission oracle extended with the admitted docs' band
#: values (r12): attests the full signature frame the store appends —
#: doc_id AND the four pigeonhole band keys — not just the verdict set.
SQL_PHASH_DELTA_ADMIT_EXACT = _SQL_PHASH_CTES.replace(
    "WITH padded", "WITH RECURSIVE padded", 1
).replace("hs AS (", "hs AS MATERIALIZED (", 1) + _SQL_PHASH_ADMIT_BODY + f"""
SELECT CAST(h.media_id AS BIGINT) AS doc_id,
       {_sql_band_fold('h.h', 0)} AS band0,
       {_sql_band_fold('h.h', 1)} AS band1,
       {_sql_band_fold('h.h', 2)} AS band2,
       {_sql_band_fold('h.h', 3)} AS band3
FROM hs h LEFT JOIN rejected r ON h.media_id = r.node
WHERE h.media_id >= 350 AND r.node IS NULL
"""

#: keep-set oracle for the near-dup admission gate's batch twin: drop
#: every doc_b of a pair, keep the catalog view of the rest
SQL_PHASH_DEDUP_KEEP = _SQL_PHASH_CTES + """,
rejects AS (
  SELECT DISTINCT b.media_id AS doc_id
  FROM hs a JOIN hs b ON a.media_id < b.media_id
  WHERE hamming(a.h, b.h) <= 3
),
media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT m.media_id AS doc_id, m.kind, m.n_bytes
FROM media m ANTI JOIN rejects r ON m.media_id = r.doc_id
ORDER BY doc_id
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
