"""Round-13 regression tests for the r12 advice findings: the legacy-PQ
resume guard's batch-id-collision blind spot (a fresh checkpoint replays
batch ids from 0, so prior sink partitions at colliding ingest_batch
values are excluded from rerank assembly and then overwritten — they must
NOT count as coverage), and local_frame's observable fallback."""

import logging
import os
import shutil

from pyspark.sql import functions as F

from magiceye_spark import io as meio
from magiceye_spark.llmops import annindex


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _forge_legacy_pq_store(spark, sf_dir, tmp_path):
    """Legacy (pre-r11) PQ store: 200 stored vectors, no in-store rerank
    table, plus a single-file src dir of 60 new vectors."""
    emb = _embs(spark, sf_dir)
    store = str(tmp_path / "store")
    idx = annindex.write_ivf_index(
        emb.where(F.col("vec_id") < 200), store, pq=True, n_centroids=4
    )
    assert idx.rerank is not None
    shutil.rmtree(os.path.join(store, "rerank"))
    src = str(tmp_path / "src")
    emb.where((F.col("vec_id") >= 200) & (F.col("vec_id") < 260)).coalesce(
        1
    ).write.parquet(src)
    return emb, store, src


def test_cli_legacy_pq_resume_guard_rejects_colliding_sink(
    spark, sf_dir, tmp_path
):
    """A prior sink whose originals live at ingest_batch=0 must NOT pass
    the coverage guard on a fresh checkpoint: batch 0 of the new drain
    excludes (then overwrites) that exact partition, so counting it would
    green-light the mid-stream raise_error the guard exists to prevent
    (r12 advice — the r12 test sidestepped this by forging the sink at
    ingest_batch=999)."""
    from magiceye_spark import cli

    emb, store, src = _forge_legacy_pq_store(spark, sf_dir, tmp_path)
    out = str(tmp_path / "out")
    emb.where(F.col("vec_id") < 200).write.mode("overwrite").parquet(
        os.path.join(out, "ingest_batch=0")
    )
    base = [
        "ingest", src, store, "--store", "ivf", "--pq",
        "--checkpoint", str(tmp_path / "ck"), "--out", out,
    ]
    # full coverage by row count, zero coverage by collision-aware count
    assert cli.main(base) == 2
    # the same sink parked above the replay window passes and drains
    # (src is one file, maxFilesPerTrigger=1 -> only batch id 0 replays)
    safe = str(tmp_path / "safe_out")
    emb.where(F.col("vec_id") < 200).write.mode("overwrite").parquet(
        os.path.join(safe, "ingest_batch=999")
    )
    assert cli.main(base[:-1] + [safe]) == 0


def test_cli_legacy_pq_resume_guard_follow_fresh_ckpt_ignores_sink(
    spark, sf_dir, tmp_path
):
    """--follow on a fresh checkpoint replays an unbounded range of batch
    ids, so NO prior sink partition is collision-safe: the guard must
    refuse even a sink parked at a high ingest_batch."""
    from magiceye_spark import cli

    emb, store, src = _forge_legacy_pq_store(spark, sf_dir, tmp_path)
    out = str(tmp_path / "out")
    emb.where(F.col("vec_id") < 200).write.mode("overwrite").parquet(
        os.path.join(out, "ingest_batch=999")
    )
    assert cli.main([
        "ingest", src, store, "--store", "ivf", "--pq",
        "--checkpoint", str(tmp_path / "ck"), "--out", out,
        "--follow", "1 second",
    ]) == 2


def test_driver_window_structural_invariants():
    """The seat rules the rotation depends on, pinned without a session:
    exactly 50 seats, no duplicates, every seat registered, every seat
    oracle-backed (a rows-only seat would burn a driver row — the
    embedding_normalize lesson), and the registry facade re-exports the
    split modules' back-compat names."""
    from magiceye_spark import registry

    w = registry._DRIVER_WINDOW
    assert len(w) == 50
    assert len(set(w)) == 50
    missing = set(w) - set(registry.queries())
    assert not missing, f"window names not registered: {sorted(missing)}"
    rows_only = [n for n in w if n not in registry.oracles()]
    assert not rows_only, f"rows-only seats burn driver rows: {rows_only}"
    assert list(registry.queries())[:50] == w
    for name in ("schema_diff_full", "_perturbed_lineitem",
                 "_loop_batches_to_stream"):
        assert callable(getattr(registry, name))


def test_embedding_normalize_matches_oracle(spark, sf_dir):
    """Array-level value check for normalize_embeddings vs the DuckDB
    oracle. The registry row is rows-only by STRUCTURE (Array output is
    driver-unhashable — r10's only red seat), so the full array compare
    lives here: same SQL the registry used to carry, arrays stringified
    element-wise at the oracle's own 6-decimal rounding."""
    import duckdb

    from magiceye_spark.llmops import simsearch

    out = simsearch.normalize_embeddings(
        _embs(spark, sf_dir)
    ).collect()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet'"
    )
    want = con.sql(simsearch.SQL_NORMALIZE).fetchall()

    def canon(rows):
        return sorted(
            (r[0], tuple(round(float(x), 6) for x in r[1])) for r in rows
        )

    got = canon((r["vec_id"], r["embedding"]) for r in out)
    assert got == canon(want)
    # the unit-norm property the digest sibling pins, here on the arrays
    assert all(
        abs(sum(x * x for x in vec) - 1.0) < 1e-4
        for _, vec in got
        if any(vec)
    )


def test_hard_negatives_indexed_recall_vs_exact_twin(spark, sf_dir):
    """The IVF-probed mining path must recover most of the exact all-pairs
    twin's (anchor, negative) pairs. Measured 0.67-0.68 at the 32-cell
    regime on both sf0.001/sf0.01 (the documented 8/32 IVF recall curve);
    pinned at >=0.6 with the same auto-sizing the registry row uses. Both
    paths are deterministic for a fixed corpus, so this is a regression
    pin, not a statistical bound."""
    from magiceye_spark.llmops import simsearch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["anchor_id"], r["negative_id"])
        for r in simsearch.hard_negatives(emb).collect()
    }
    mined = {
        (r["anchor_id"], r["negative_id"])
        for r in simsearch.hard_negatives_indexed(emb).collect()
    }
    assert exact, "twin produced no pairs — vacuous"
    assert len(exact & mined) / len(exact) >= 0.6
    # every anchor still gets k negatives (probed cells always contain
    # candidates of another label on this corpus)
    from collections import Counter

    per_anchor = Counter(a for a, _ in mined)
    assert min(per_anchor.values()) >= 1


def test_hard_negatives_indexed_planted_geometry(spark):
    """Exactness when the true hardest negative shares the anchor's cell:
    two tight clusters far apart, labels split within each cluster — the
    top different-label neighbor is intra-cluster, so even a 1-probe scan
    of the anchor's own cell must find exactly the all-pairs answer."""
    from magiceye_spark.llmops import simsearch

    rows = []
    # cluster A around (1, 0, ...), cluster B around (0, 1, ...)
    for i in range(8):
        rows.append((i, [1.0, 0.001 * i, 0.0, 0.0], "a" if i % 2 else "b"))
    for i in range(8, 16):
        rows.append((i, [0.0, 1.0, 0.001 * i, 0.0], "a" if i % 2 else "b"))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    exact = {
        (r["anchor_id"], r["rank"], r["negative_id"])
        for r in simsearch.hard_negatives(emb, k=2).collect()
    }
    mined = {
        (r["anchor_id"], r["rank"], r["negative_id"])
        for r in simsearch.hard_negatives_indexed(
            emb, k=2, n_centroids=2, n_probe=1, kmeans_iters=8
        ).collect()
    }
    assert mined == exact


def test_local_frame_fallback_is_logged_and_narrow(spark, caplog):
    """local_frame's pandas/Arrow fallback must be observable (a silent
    revert costs ~6 s per consuming action) and must not swallow
    unexpected exception classes (r12 advice)."""
    # rows pandas can frame but Arrow/Spark cannot type: object cells
    rows = [{"a": object()}]
    with caplog.at_level(logging.WARNING, logger="magiceye_spark.io"):
        try:
            meio.local_frame(spark, rows)
        except Exception:
            # the plain-path fallback also rejects object cells — fine;
            # the contract under test is the log line, not a rescue
            pass
    assert any("falling back" in r.message for r in caplog.records)


def test_quality_score_half_boundary_engine_identical(spark):
    """Row-local decimal-half regression (caught by the r13 sf0.1 window
    run): a doc whose weighted quality terms are all exact short decimals
    can put the TRUE score exactly on a 4-dp half, where double arithmetic
    rounds differently per engine. Plant the sf0.1 offender shape —
    16 tokens, 13 unique, exactly one en-stopword, zero punctuation —
    whose terms are 0.032 + 0.09375 + 0.2 + 0.1625 = 0.48825: both the
    Spark query and the DuckDB oracle must round it to 0.4883 (decimal
    half-away-from-zero), not whichever side of the half the double fell."""
    import duckdb

    from magiceye_spark.llmops import textstats

    # 16 whitespace tokens: 1 stopword ("the"), 12 other distinct, 3 repeats
    # of one of them -> n_uniq = 13, no punctuation characters
    words = ["the"] + [f"w{i}" for i in range(12)] + ["w0", "w0", "w0"]
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = textstats.quality_score(docs).collect()[0]
    assert got["quality_score"] == 0.4883

    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT 1 AS doc_id, '" + text + "' AS text")
    oracle = con.sql(textstats.SQL_QUALITY).fetchone()
    assert oracle[1] == 0.4883


def test_pq_local_query_side_matches_in_plan(spark, tmp_path):
    """r13 optimization: bounded query batches get their probe cells and
    ADC LUTs computed driver-side (LocalRelation) instead of via the
    in-plan centroid/codebook literal expressions. The two paths must be
    BIT-identical — the driver replica runs the same IEEE fold orders —
    including the probed-cell set that prunes the postings scan."""
    from magiceye_spark.llmops import annindex, simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    idx = annindex.write_ivf_index(
        emb, str(tmp_path / "pqidx"), pq=True, n_centroids=8
    )
    q = emb.where(F.col("vec_id") < 6)
    fast = sorted(
        tuple(r)
        for r in annindex.ivf_pq_index_topk(idx, q, None, k=5, n_probe=3).collect()
    )
    cap = simsearch._LOCAL_QUERY_CAP
    simsearch._LOCAL_QUERY_CAP = 0  # force the in-plan query side
    try:
        slow = sorted(
            tuple(r)
            for r in annindex.ivf_pq_index_topk(
                idx, q, None, k=5, n_probe=3
            ).collect()
        )
    finally:
        simsearch._LOCAL_QUERY_CAP = cap
    assert fast == slow and len(fast) > 0


def test_flat_local_probe_rows_match_in_plan(spark, tmp_path):
    """Flat-probe sibling of the PQ local-query-side parity pin."""
    from magiceye_spark.llmops import annindex, simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    idx = annindex.write_ivf_index(emb, str(tmp_path / "flatidx"), n_centroids=8)
    q = emb.where(F.col("vec_id") < 6)
    fast = sorted(
        tuple(r)
        for r in annindex.ivf_index_topk(idx, q, k=5, n_probe=3).collect()
    )
    cap = simsearch._LOCAL_QUERY_CAP
    simsearch._LOCAL_QUERY_CAP = 0
    try:
        slow = sorted(
            tuple(r)
            for r in annindex.ivf_index_topk(idx, q, k=5, n_probe=3).collect()
        )
    finally:
        simsearch._LOCAL_QUERY_CAP = cap
    assert fast == slow and len(fast) > 0
