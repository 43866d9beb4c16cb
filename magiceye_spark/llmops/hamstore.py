"""Persistent 64-bit Hamming signature store: build-once / admit-many
near-dup for the SimHash (text) and perceptual-dHash (image) families —
the third store in the lifecycle triad (MinHash text sets:
:mod:`~magiceye_spark.llmops.sigstore`; embeddings:
:mod:`~magiceye_spark.llmops.annindex`). The reference has no dedup
surface (schema-diff CLI — `/root/reference/src/action/check.rs`); this
is the §2.4 LLM-pipeline mandate's delta-ingest lifecycle for the
Hamming modality: at 100 TB the catalog's signatures (8 bytes of bits +
4 band shorts per item) are computed ONCE at ingest — only each new
batch ever pays the text pass / image decode — and every later batch is
deduplicated against the store with the one-sided salted band join
(candidate cost linear in the batch at fixed store bucket occupancy,
the same cost model measured flat at 100× store growth for the MinHash
store in BASELINE.md).

Storage layout under ``path`` (parquet):
- ``params``      one row: version, kind ('simhash' | 'phash' | ...),
                  max_hamming. ``kind`` guards against probing a text
                  store with image signatures — the frames are
                  shape-identical, so only the tag can catch the mixup.
- ``signatures``  (doc_id, bits array<int>[64], band0..band3) — exactly
                  the frame :func:`dedup.hamming_band_near_dups`
                  consumes, so stored == fresh is structural.

Determinism: SimHash bits are xxhash64 votes and dHash bits are exact
integer-rational comparisons (both seed-free pure functions of content),
and int arrays round-trip parquet exactly — so pairs computed from
stored signatures are BIT-identical to pairs computed fresh (pinned in
tests; the ``phash_indexed_pairs`` registry row runs the store against
the fresh path's DuckDB oracle).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magiceye_spark.fsops import fs_count_files, fs_swap_dirs
from magiceye_spark.llmops.dedup import (
    _banded_from_bits,
    _salted_band_cands_one_sided,
    _verify_hamming,
    hamming_band_near_dups,
)

_VERSION = "hamming-v1"


@dataclass
class HammingIndex:
    params: dict
    signatures: DataFrame  # lazy parquet scan when read from disk


def write_hamming_index(
    sigs: DataFrame, path: str, *, kind: str, max_hamming: int = 3
) -> HammingIndex:
    """Persist a signature frame ``(doc_id, bits, band0..band3)`` — the
    output of :func:`dedup.simhash_signatures` or
    :func:`multimodal.phash_signatures`. The store takes SIGNATURES, not
    raw content: the caller signs each batch, so the expensive pass
    (tokenization / image decode) happens exactly once per item ever."""
    spark = sigs.sparkSession
    params = {"version": _VERSION, "kind": kind, "max_hamming": int(max_hamming)}
    spark.createDataFrame([params]).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "params")
    )
    sigs.select(
        "doc_id", "bits", "band0", "band1", "band2", "band3"
    ).write.mode("overwrite").parquet(os.path.join(path, "signatures"))
    return read_hamming_index(spark, path, kind=kind)


def read_hamming_index(
    spark: SparkSession, path: str, kind: str | None = None
) -> HammingIndex:
    params = spark.read.parquet(os.path.join(path, "params")).first().asDict()
    if params["version"] != _VERSION:
        raise ValueError(f"unsupported index version {params['version']!r}")
    if kind is not None and params["kind"] != kind:
        raise ValueError(
            f"signature kind mismatch: store holds {params['kind']!r}, "
            f"caller expects {kind!r} — Hamming frames are shape-identical "
            "across modalities, so only this tag catches a text-store/"
            "image-batch mixup"
        )
    return HammingIndex(
        params=params,
        signatures=spark.read.parquet(os.path.join(path, "signatures")),
    )


def hamming_index_add(
    spark: SparkSession,
    path: str,
    new_sigs: DataFrame,
    kind: str | None = None,
    dedupe_ids: bool = True,
) -> int:
    """Append a signed batch. Same contract as the sibling stores'
    ``*_index_add``: ``dedupe_ids`` anti-joins the batch against stored
    doc_ids (re-ingest is a no-op; pruned id-column store scan, skippable
    when ids are new by construction), and the returned count rides the
    write job via ``Observation`` — one pass over the batch."""
    from pyspark.sql import Observation

    idx = read_hamming_index(spark, path, kind=kind)
    delta = new_sigs.select(
        "doc_id", "bits", "band0", "band1", "band2", "band3"
    )
    if dedupe_ids:
        delta = delta.join(idx.signatures.select("doc_id"), "doc_id", "left_anti")
    obs = Observation()
    delta.observe(obs, F.count(F.lit(1)).alias("n")).write.mode("append").parquet(
        os.path.join(path, "signatures")
    )
    return int(obs.get["n"])


def hamming_index_compact(spark: SparkSession, path: str) -> tuple[int, int]:
    """Coalesce append-accumulated small files; rename-aside swap through
    the Hadoop FileSystem API (guarantees in :mod:`magiceye_spark.fsops`).
    Returns (files_before, files_after); rows untouched."""
    sig_dir = os.path.join(path, "signatures")
    tmp_dir = os.path.join(path, "signatures_compact")
    before = fs_count_files(spark, sig_dir)
    sigs = spark.read.parquet(sig_dir)
    n_out = max(1, min(spark.sparkContext.defaultParallelism, before))
    sigs.repartition(n_out, "doc_id").write.mode("overwrite").parquet(tmp_dir)
    fs_swap_dirs(spark, tmp_dir, sig_dir)
    return before, fs_count_files(spark, sig_dir)


def hamming_pairs_from_index(
    index: HammingIndex, max_hamming: int | None = None
) -> DataFrame:
    """Near-dup pairs over the WHOLE store — identical output to
    :func:`dedup.hamming_band_near_dups` on fresh signatures (same bits,
    same banding, same verify) without re-signing anything."""
    mh = int(max_hamming if max_hamming is not None else index.params["max_hamming"])
    return hamming_band_near_dups(index.signatures, mh)


def band_bucket_stats(
    index: HammingIndex, bucket_cap: int = 2000
) -> DataFrame:
    """Store-health diagnostic, the Hamming analogue of
    :func:`annindex.ivf_index_stats`: per band, the bucket-occupancy
    distribution that sizes the hot-bucket salt guard — an operator
    checks ``max_bucket``/``n_hot_buckets`` before trusting per-batch
    admission latency, because one near-constant corpus region (template
    farm, solid-color images) can drop thousands of items into a single
    (band, bucket) and every batch then pays ceil(b/cap) salted tasks on
    it. Output: (band_id, n_items, n_buckets, max_bucket, n_hot_buckets)
    — one groupBy over the banded store, four rows."""
    per = (
        _banded_from_bits(index.signatures)
        .groupBy("band_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per.groupBy("band_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_items"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.max("n").cast("bigint").alias("max_bucket"),
            F.sum(F.when(F.col("n") > bucket_cap, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hot_buckets"),
        )
        .orderBy("band_id")
    )


def delta_pairs_from_hamming_index(
    index: HammingIndex, new_sigs: DataFrame, max_hamming: int | None = None
) -> DataFrame:
    """Near-dup pairs TOUCHING the delta (delta×stored and delta×delta) —
    the one-sided salted band join of
    :func:`dedup._salted_band_cands_one_sided`: candidates are generated
    delta-vs-union, never stored×stored, so per-batch cost is linear in
    the batch at fixed store bucket occupancy (the sigstore cost model;
    store-growth sweep in BASELINE.md). Output (doc_a, doc_b, hamming)
    with doc_a < doc_b."""
    mh = int(max_hamming if max_hamming is not None else index.params["max_hamming"])
    delta = new_sigs.select(
        "doc_id", "bits", "band0", "band1", "band2", "band3"
    )
    union_banded = _banded_from_bits(index.signatures.unionByName(delta))
    delta_banded = _banded_from_bits(delta)
    cands = _salted_band_cands_one_sided(
        delta_banded, union_banded, 2000, "bits", "bits_a", "bits_b"
    )
    return _verify_hamming(cands, mh)


def delta_hamming_admit_indexed(
    index: HammingIndex, new_sigs: DataFrame, max_hamming: int | None = None
) -> DataFrame:
    """Delta-ingest admission against the store, closure semantics
    identical to :func:`sigstore.delta_dedup_admit_indexed`: an incoming
    item is admitted iff its near-dup component over the union graph
    contains no stored item AND it is the minimum-id incoming member —
    decided entirely by delta-touching edges (stored×stored edges cannot
    change a delta verdict). Returns the admitted rows of ``new_sigs``
    with the caller's columns."""
    from magiceye_spark.llmops.graph import connected_components

    pairs = delta_pairs_from_hamming_index(index, new_sigs, max_hamming)
    comps = connected_components(
        pairs.select("doc_a", "doc_b"), src="doc_a", dst="doc_b"
    ).select(F.col("node").alias("doc_id"), "comp_id")
    stored_ids = index.signatures.select("doc_id").withColumn("_stored", F.lit(1))
    labeled = comps.join(stored_ids, "doc_id", "left").withColumn(
        "is_incoming", F.col("_stored").isNull()
    )
    verdicts = labeled.groupBy("comp_id").agg(
        F.max(F.when(~F.col("is_incoming"), 1).otherwise(0)).alias("has_existing"),
        F.min(F.when(F.col("is_incoming"), F.col("doc_id"))).alias("min_incoming"),
    )
    rejected = (
        labeled.where(F.col("is_incoming"))
        .join(verdicts, "comp_id")
        .where(
            (F.col("has_existing") == 1)
            | (F.col("doc_id") != F.col("min_incoming"))
        )
        .select("doc_id")
    )
    return new_sigs.join(rejected, "doc_id", "left_anti")
