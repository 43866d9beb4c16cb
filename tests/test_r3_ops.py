"""Semantic pins for the round-3 operators (oracle parity is covered by the
registry sweep in test_oracle_parity; these check the semantics on planted
fixtures where parity alone proves too little)."""

from pyspark.sql import functions as F

from magiceye_spark.llmops.dedup import boilerplate_ngrams, cross_source_overlap
from magiceye_spark.llmops.simsearch import (
    embedding_cluster_sizes,
    embedding_kmeans,
)
from magiceye_spark.llmops.textstats import gopher_quality_flags, length_buckets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_gopher_flags_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again", "s"),
            (2, "too short", "s"),  # <5 words
            (3, "the " + "!!!! " * 30, "s"),  # symbol-heavy
            (4, "zz qq ww rr tt yy uu ii", "s"),  # no stopwords
        ],
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert got[1]["passes_gopher"] is True
    assert got[2]["flag_word_count"] is False and got[2]["passes_gopher"] is False
    assert got[3]["flag_symbol_ratio"] is False
    assert got[4]["flag_stopwords"] is False


def test_length_buckets_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c", "s"),  # 3 tokens -> bucket 2
            (2, "a b c d e", "s"),  # 5 -> bucket 4
            (3, "a b c d e f g", "s"),  # 7 -> bucket 4
            (4, " ".join(["w"] * 17), "s"),  # 17 -> bucket 16
        ],
    )
    rows = {r["bucket"]: r for r in length_buckets(docs, budget=8).collect()}
    assert set(rows) == {2, 4, 16}
    assert rows[4]["n_docs"] == 2 and rows[4]["total_tokens"] == 12
    # 12 tokens into ceil(12/8)=2 contexts of 8 -> 12/16
    assert rows[4]["packing_efficiency"] == 0.75


def test_cross_source_overlap_detects_mirror(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma", "srcA"),
            (2, "beta alpha gamma gamma", "srcB"),  # same bag -> mirror
            (3, "delta epsilon", "srcB"),
            (4, "zeta eta", "srcC"),  # unique content
        ],
    )
    got = [tuple(r) for r in cross_source_overlap(docs).collect()]
    assert got == [("srcA", "srcB", 1)]


def test_boilerplate_ngrams_planted(spark):
    boiler = "click here now"
    docs = _docs(
        spark,
        [(i, f"{boiler} unique{i} words{i} vary{i}", "s") for i in range(10)]
        + [(99, "nothing shared at all here", "s")],
    )
    got = {r["gram"]: r for r in boilerplate_ngrams(docs, n=3, min_doc_frac=0.5).collect()}
    assert "click here now" in got
    assert got["click here now"]["doc_freq"] == 10
    # the unique grams never cross the 50% df cut
    assert all(g.startswith("click") or g.startswith("here") for g in got)


def test_embedding_kmeans_assignment(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = embs.count()
    assign = embedding_kmeans(embs, k=8)
    rows = assign.collect()
    assert len(rows) == n  # every vector assigned exactly once
    assert {r["cluster"] for r in rows} <= set(range(8))
    # deterministic: same fit sample + same corpus -> identical assignment
    again = embedding_kmeans(embs, k=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    sizes = embedding_cluster_sizes(embs, k=8).collect()
    assert sum(r["n_vectors"] for r in sizes) == n
    # coherence: assignments should be positively aligned with their
    # centroid on average, and no single cluster may swallow the corpus
    weighted = sum(r["n_vectors"] * r["mean_cosine"] for r in sizes) / n
    assert weighted > 0.0
    assert max(r["n_vectors"] for r in sizes) < n


def test_referential_audit_planted_orphans(spark):
    from magiceye_spark.dq import referential_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], "id long, parent_id long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    got = {
        r["relation"]: r
        for r in referential_audit(
            [("child.parent_id->parent", child, "parent_id", parent, "pid")]
        ).collect()
    }
    r = got["child.parent_id->parent"]
    assert r["n_child_rows"] == 3 and r["n_orphans"] == 1 and r["pass"] is False


def test_incremental_datadiff_prunes_and_matches(spark):
    """One changed day out of three: changed_partitions flags exactly it,
    diff_data_incremental equals the full diff, and the pruned plan filters
    both sides with the broadcast partition set."""
    from magiceye_spark.datadiff import (
        changed_partitions,
        diff_data,
        diff_data_incremental,
    )

    rows = [(d, i, f"v{i}") for d in ("d1", "d2", "d3") for i in range(50)]
    base = spark.createDataFrame(rows, "day string, id long, val string")
    # target: d2 gets one update and one delete; d1/d3 untouched
    target = (
        base.where(~((F.col("day") == "d2") & (F.col("id") == 7)))
        .withColumn(
            "val",
            F.when(
                (F.col("day") == "d2") & (F.col("id") == 3), F.lit("CHANGED")
            ).otherwise(F.col("val")),
        )
    )
    ch = changed_partitions(base, target, "day")
    assert [tuple(r) for r in ch.collect()] == [("d2", "changed")]

    inc = diff_data_incremental(base, target, keys=["day", "id"], partition_col="day")
    full = diff_data(base, target, keys=["day", "id"])
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    got = {(r["day"], r["id"]): r["diff_status"] for r in inc.collect()}
    assert got == {("d2", 3): "changed", ("d2", 7): "removed"}


def test_edit_distance_near_dups_planted(spark):
    from magiceye_spark.llmops.dedup import edit_distance_near_dups

    docs = _docs(
        spark,
        [
            (1, "hello world this is a test document", "s"),
            (2, "hello world this is a text document", "s"),  # 1 edit
            (3, "hello completely different content here now", "s"),  # same block, far
            (4, "goodbye world this is a test document", "s"),  # different first word
        ],
    )
    got = [tuple(r) for r in edit_distance_near_dups(docs, max_dist=3).collect()]
    assert got == [(1, 2, 1)]


def test_resample_to_mix_deterministic_and_shaped(spark, sf_dir):
    from magiceye_spark.llmops.pipeline import resample_to_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mix = {"src0": 0.5, "src1": 0.5}
    out = resample_to_mix(docs, mix)
    rows = out.collect()
    # only targeted sources survive
    assert {r["source"] for r in rows} <= {"src0", "src1"}
    # deterministic: identical kept set across runs
    again = resample_to_mix(docs, mix).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)
    # equal targets over equal-sized sources -> weight > 1 -> kept whole
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert sum(1 for r in rows if r["source"] == "src0") == n_src0
    # a fractional rate actually downsamples
    skew = {"src0": 0.02, "src1": 0.98}
    kept = resample_to_mix(docs, skew).where(F.col("source") == "src0").count()
    assert 0 < kept < n_src0


def test_ohlc_and_latest_planted(spark):
    from datetime import datetime

    from magiceye_spark.events_ops import latest_per_user_day, ohlc_daily

    rows = [
        (1, datetime(2026, 1, 1, 9), 7, "trade", 10.0),
        (2, datetime(2026, 1, 1, 12), 7, "trade", 99.0),   # high
        (3, datetime(2026, 1, 1, 15), 8, "trade", 1.0),    # low
        (4, datetime(2026, 1, 1, 17), 8, "trade", 42.0),   # close
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    (bar,) = ohlc_daily(e).collect()
    assert (bar["open"], bar["high"], bar["low"], bar["close"], bar["n_events"]) == (
        10.0, 99.0, 1.0, 42.0, 4,
    )
    latest = {(r["user_id"]): r["event_id"] for r in latest_per_user_day(e).collect()}
    assert latest == {7: 2, 8: 4}


def test_anomalous_days_planted(spark, tmp_path):
    """29 quiet days + one 10x spike day: exactly the spike crosses z>1.5."""
    from datetime import datetime, timedelta

    from magiceye_spark.analytics import events_anomalous_days

    rows = []
    eid = 0
    for d in range(30):
        n = 100 if d != 17 else 1000
        day = datetime(2026, 3, 1) + timedelta(days=d)
        for i in range(n):
            rows.append((eid, day + timedelta(seconds=i), i % 7, "click", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = events_anomalous_days(spark, str(tmp_path), z_cut=1.5).collect()
    assert len(got) == 1
    assert got[0]["day"] == datetime(2026, 3, 18) and got[0]["n_events"] == 1000
    assert got[0]["z"] > 5
