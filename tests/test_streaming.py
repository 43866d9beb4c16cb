"""Streaming drift monitor: file-stream snapshot deltas diffed against a
baseline catalog inside foreachBatch, plus the watermarked rollup."""

import datetime as dt

from pyspark.sql import functions as F

from magiceye_spark.streaming import drain
from magiceye_spark.streaming import drift as drift_mod
from magiceye_spark.streaming.drift import (
    STREAM_COLUMNS_SCHEMA,
    column_drift,
    drift_rate_rollup,
    monitor_schema_drift,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _baseline(spark):
    rows = [
        ("users", "id", "integer", "", False, "", False),
        ("users", "email", "varchar(255)", "", False, "", False),
    ]
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, data_type string, "
        "column_default string, is_nullable boolean, comment string, "
        "is_auto_increment boolean",
    )


def _delta(spark, ts):
    rows = [
        ("users", "id", "bigint", "", False, "", False, ts),          # type drift
        ("users", "email", "varchar(255)", "", True, "", False, ts),  # nullable drift
        ("users", "phone", "varchar(32)", "", True, "", False, ts),   # new column
    ]
    return spark.createDataFrame(rows, STREAM_COLUMNS_SCHEMA)


def test_column_drift_batch(spark):
    findings = column_drift(_delta(spark, T0), _baseline(spark)).collect()
    kinds = {(r["column_name"], r["drift_kind"]) for r in findings}
    assert kinds == {("id", "type_drift"), ("email", "nullable_drift"), ("phone", "new_column")}


def test_streaming_end_to_end(spark, tmp_path):
    snap_dir = str(tmp_path / "snaps")
    _delta(spark, T0).write.parquet(snap_dir)
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = monitor_schema_drift(spark, snap_dir, _baseline(spark), sink)
    drain(q, 60)
    assert {r["drift_kind"] for r in collected} == {
        "type_drift", "nullable_drift", "new_column"
    }


def test_stream_hourly_rollup_matches_batch(spark, sf_dir, tmp_path):
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_stream")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    batch.repartition(3).write.parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=2)
    q = sev.run_to_memory(
        sev.stream_hourly_rollup(stream), "hourly_t", str(tmp_path / "chk1")
    )
    drain(q, 120)
    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in spark.table("hourly_t").collect()
    }
    want = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n_events")).collect()
    }
    assert got == want


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    from magiceye_spark.analytics import _events
    from magiceye_spark.events_ops import sessionize
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_stream2")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    batch.repartition(3).write.parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=2)
    q = sev.run_to_memory(
        sev.stream_sessionize(stream, gap="30 minutes"),
        "sessions_t",
        str(tmp_path / "chk2"),
    )
    drain(q, 120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table("sessions_t").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessionize(batch, gap_minutes=30).collect()
    }
    assert got == want


def test_state_store_metrics_surface(spark, sf_dir, tmp_path):
    """A stateful streaming aggregate must report per-operator state-store
    metrics (row counts, memory) through state_store_metrics — the
    bounded-state observability hook."""
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_metrics")
    _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).repartition(2).write.parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=2)
    q = sev.run_to_memory(
        sev.stream_hourly_rollup(stream), "metrics_t", str(tmp_path / "chk_m")
    )
    drain(q, 120)
    metrics = sev.state_store_metrics(q)
    assert metrics, "stateful query must expose at least one state operator"
    m = metrics[0]
    assert m["state_rows"] > 0
    assert m["memory_bytes"] > 0
    assert {"operator", "rows_updated", "rows_removed"} <= set(m)


def test_row_drift_stream_matches_batch_diff(spark, sf_dir, tmp_path):
    """Streamed row-drift findings over the perturbed lineitem must match
    the batch diff restricted to arriving keys (added→new_row, changed)."""
    from magiceye_spark.datadiff import diff_data
    from magiceye_spark.registry import _perturbed_lineitem
    from magiceye_spark.streaming.drift import monitor_row_drift

    base, target = _perturbed_lineitem(spark, sf_dir)
    keys = ["l_orderkey", "l_linenumber"]
    src = str(tmp_path / "rows")
    target.repartition(3).write.parquet(src)

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = monitor_row_drift(
        spark, src, base, keys, schema=target.schema, sink=sink
    )
    drain(q, 120)
    # multiset compare: the synthetic lineitem has a few duplicate PKs, so
    # joins legitimately emit one finding per duplicate pairing
    from collections import Counter

    got = Counter(
        (r["l_orderkey"], r["l_linenumber"], r["drift_status"], r["changed_columns"])
        for r in collected
    )
    batch_diff = diff_data(base, target, keys=keys).collect()
    want = Counter(
        (
            r["l_orderkey"],
            r["l_linenumber"],
            "new_row" if r["diff_status"] == "added" else "changed",
            r["changed_columns"],
        )
        for r in batch_diff
        if r["diff_status"] in ("added", "changed")  # removed rows never arrive
    )
    assert got == want


def test_stateful_sessionize_matches_reference(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization (gap=30min, error-terminated)
    must equal a directly-computed reference over the same events."""
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev
    from magiceye_spark.streaming.stateful import sessionize_stateful

    src = str(tmp_path / "events_state")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    batch.coalesce(1).write.parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=16)
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_state"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 120)
    got = {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["closed_by_error"])
        for r in spark.table("stateful_sessions").collect()
    }

    # reference: fold each user's time-sorted events in plain Python
    gap_us = 30 * 60 * 1_000_000
    rows = sorted(
        (
            (
                r["user_id"],
                int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
                r["event_type"],
            )
            for r in batch.collect()
        ),
        key=lambda x: (x[0], x[1]),
    )
    want = {}
    cur = {}  # user -> (start, last, n)
    for uid, ts_us, etype in rows:
        if uid in cur and ts_us - cur[uid][1] > gap_us:
            s, l, n = cur.pop(uid)
            want[(uid, s)] = (n, 0)
        if uid not in cur:
            cur[uid] = (ts_us, ts_us, 0)
        s, _, n = cur[uid]
        cur[uid] = (s, ts_us, n + 1)
        if etype == "error":
            s, l, n = cur.pop(uid)
            want[(uid, s)] = (n, 1)
    # trailing open sessions are retained in state, not emitted
    assert got == want


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_enrich")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).limit(300)
    batch.coalesce(2).write.parquet(src)
    dim = spark.createDataFrame(
        [(i, f"tier_{i % 3}") for i in range(150)], "user_id long, tier string"
    )

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=16)
    q = (
        sev.stream_enrich(stream, dim, ["user_id"])
        .writeStream.format("memory")
        .queryName("enriched_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 120)
    got = {(r["event_id"], r["tier"]) for r in spark.table("enriched_t").collect()}
    want = {(r["event_id"], r["tier"]) for r in batch.join(dim, "user_id", "left").collect()}
    assert got == want


def test_stream_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_dup")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).limit(500)
    # deliver everything twice (two files) — at-least-once semantics
    batch.coalesce(1).write.parquet(src)
    batch.coalesce(1).write.mode("append").parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=16)
    q = (
        sev.stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 120)
    out = spark.table("dedup_t")
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == batch.count()


def test_drift_rate_rollup(spark):
    d1 = column_drift(_delta(spark, T0), _baseline(spark))
    d2 = column_drift(_delta(spark, T0 + dt.timedelta(minutes=15)), _baseline(spark))
    rolled = drift_rate_rollup(d1.unionByName(d2)).collect()
    by_window = {(r["window_start"].minute, r["drift_kind"]): r["n_findings"] for r in rolled}
    assert by_window[(0, "type_drift")] == 1
    assert by_window[(10, "type_drift")] == 1
    assert len(rolled) == 6  # 3 kinds × 2 windows


def test_parse_event_json_round_trip(spark, sf_dir):
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev

    # to_json renders timestamps at millisecond precision — truncate the
    # fixture so the round-trip is exact (real Kafka producers emit millis)
    batch = (
        _events(spark, sf_dir)
        .withColumn("ts", F.date_trunc("millisecond", F.col("ts")))
        .limit(100)
    )
    kafka_shaped = batch.select(
        F.to_json(F.struct(*batch.columns)).cast("binary").alias("value")
    )
    parsed = sev.parse_event_json(kafka_shaped)
    assert parsed.schema == sev.EVENTS_SCHEMA
    got = {tuple(r) for r in parsed.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_rocksdb_state_store_sessionize(spark, sf_dir, tmp_path):
    """The RocksDB state store must produce the same sessions as the
    default HDFS-backed store (state backend is an execution detail)."""
    from magiceye_spark.analytics import _events
    from magiceye_spark.events_ops import sessionize
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_rocks")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    batch.repartition(3).write.parquet(src)

    old = {k: spark.conf.get(k, None) for k in sev.ROCKSDB_STATE_CONF}
    sev.enable_rocksdb_state(spark)
    try:
        stream = sev.read_event_stream(spark, src, max_files_per_trigger=2)
        q = sev.run_to_memory(
            sev.stream_sessionize(stream, gap="30 minutes"),
            "sessions_rocks",
            str(tmp_path / "chk_rocks"),
        )
        drain(q, 120)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table("sessions_rocks").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in sessionize(batch, gap_minutes=30).collect()
    }
    assert got == want


def test_stream_ohlc_matches_batch(spark, sf_dir, tmp_path):
    """Streaming daily OHLC bars must equal the batch ohlc_daily over the
    same events once the stream drains."""
    from magiceye_spark.analytics import _events
    from magiceye_spark.events_ops import ohlc_daily
    from magiceye_spark.streaming import events as sev

    src = str(tmp_path / "events_ohlc_stream")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    batch.repartition(3).write.parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=2)
    q = sev.run_to_memory(
        sev.stream_ohlc_daily(stream), "ohlc_t", str(tmp_path / "chk_ohlc")
    )
    drain(q, 120)
    got = {
        (r["day"], r["event_type"]): (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in spark.table("ohlc_t").collect()
    }
    want = {
        (r["day"], r["event_type"]): (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in ohlc_daily(batch).collect()
    }
    assert got == want


def test_quota_admit_matches_batch(spark, sf_dir, tmp_path):
    """Streaming admission gate (transformWithStateInPandas when protobuf
    is present, applyInPandasWithState fallback otherwise — identical
    semantics): with a time-ordered single-batch arrival, the admitted
    set equals the batch row_number() twin; every (user, day) admits at
    most cap events."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev
    from magiceye_spark.streaming.stateful import quota_admit

    cap = 5
    src = str(tmp_path / "events_quota")
    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    batch.coalesce(1).write.parquet(src)

    old = {k: spark.conf.get(k, None) for k in sev.ROCKSDB_STATE_CONF}
    sev.enable_rocksdb_state(spark)
    try:
        stream = sev.read_event_stream(spark, src, max_files_per_trigger=16)
        q = (
            quota_admit(stream, cap=cap)
            .writeStream.format("memory")
            .queryName("quota_admitted")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "chk_quota"))
            .trigger(availableNow=True)
            .start()
        )
        drain(q, 120)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    got = {(r["user_id"], r["event_id"]): r["admit_idx"]
           for r in spark.table("quota_admitted").collect()}
    # the SAME batch twin the driver checks against its DuckDB oracle
    # (registry events_quota_batch_twin) — stream == batch == oracle
    from magiceye_spark.streaming.stateful import quota_admit_batch

    want = {(r["user_id"], r["event_id"]): r["admit_idx"]
            for r in quota_admit_batch(batch, cap=cap).collect()}
    assert got == want
    assert max(got.values()) <= cap and len(got) > 0


def test_monitor_value_psi_stream(spark, tmp_path):
    """Per-micro-batch PSI vs a frozen baseline: a batch drawn from the
    baseline distribution scores ~0; a shifted batch alarms (>0.2); and
    the streamed value equals the batch value_psi_drift on the same
    rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    from magiceye_spark.streaming.drift import (
        fit_psi_baseline,
        monitor_value_psi,
        value_psi_drift,
    )

    # frozen baseline: uniform over [0, 100) in 10 bins of 200 each
    baseline_bins = [(b, 200) for b in range(10)]
    mn, mx = 0.0, 100.0
    schema = StructType([StructField("value", DoubleType())])

    # the deploy-time fit (the function the registry twin events_psi_stream_twin
    # uses) reproduces the hand-written baseline exactly, mx landing in bin 9
    fit_src = spark.range(2000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    assert fit_psi_baseline(fit_src, "value") == (baseline_bins, 0.0, 99.0)

    src = str(tmp_path / "vals")
    same = spark.range(2000).select((F.col("id") % 100).cast("double").alias("value"))
    shifted = spark.range(2000).select(
        (50 + F.col("id") % 50).cast("double").alias("value")
    )
    same.coalesce(1).write.mode("append").parquet(src)

    got = {}
    q = monitor_value_psi(
        spark, src, baseline_bins, "value", mn, mx, schema,
        sink=lambda df, bid: got.update({bid: df.collect()[0]}),
    )
    drain(q, 120)
    (first,) = got.values()
    assert first["n_rows"] == 2000 and abs(first["psi"]) < 1e-6

    batch_same = value_psi_drift(same, baseline_bins, "value", mn, mx).collect()[0]
    assert batch_same["psi"] == first["psi"]
    batch_shift = value_psi_drift(shifted, baseline_bins, "value", mn, mx).collect()[0]
    assert batch_shift["psi"] > 0.2


def test_stream_stream_attribution_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join (clicks × purchases, both unbounded):
    with availableNow over the full history, the matched pairs equal the
    batch interval join exactly."""
    from pyspark.sql import functions as F

    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev
    from magiceye_spark.streaming.events import stream_stream_attribution

    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = str(tmp_path / "events_ss")
    batch.coalesce(2).write.parquet(src)

    stream = sev.read_event_stream(spark, src, max_files_per_trigger=16)
    clicks_s = stream.where(F.col("event_type") == "click")
    purch_s = stream.where(F.col("event_type") == "purchase")
    q = (
        stream_stream_attribution(clicks_s, purch_s, within="1 hour")
        .writeStream.format("memory")
        .queryName("ss_attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_ss"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("ss_attrib").collect()
    }

    c = batch.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    p = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_monitor_corpus_quality_stream(spark, sf_dir, tmp_path):
    """Streaming corpus-quality snapshots equal the batch twin on the same
    files, and deltas vs a frozen baseline carry the planted degradation's
    sign (duplicate flood -> dup_frac up, entropy down)."""
    from magiceye_spark.streaming.drift import (
        corpus_quality_snapshot,
        monitor_corpus_quality,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    baseline = corpus_quality_snapshot(docs).first().asDict()

    # planted bad batch: one doc repeated (dup flood) with low entropy
    bad = spark.createDataFrame(
        [(10_000 + i, "spam spam spam spam spam spam", "de", "srcX", 29)
         for i in range(50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "stream_docs")
    bad.coalesce(1).write.mode("overwrite").parquet(path)

    got = []
    q = monitor_corpus_quality(
        spark, path, baseline, bad.schema,
        sink=lambda df, bid: got.append(df.collect()[0].asDict()),
    )
    drain(q, 120)
    assert got, "no micro-batch arrived"
    snap = got[0]
    twin = corpus_quality_snapshot(spark.read.parquet(path)).first().asDict()
    for k in ("n_docs", "avg_tokens", "en_frac", "dup_frac", "avg_token_entropy"):
        assert snap[k] == twin[k], k
    assert snap["dup_frac"] > 0.9
    assert snap["delta_dup_frac"] > 0.5
    assert snap["delta_avg_token_entropy"] < 0
    assert snap["delta_en_frac"] < 0


def test_near_dup_admit_stream_matches_batch(spark, tmp_path):
    """Streaming near-dup admission gate (dedup at ingest): with
    doc_id-ordered arrival across TWO micro-batches (state carries the
    first batch's signatures into the second), the distinct rejected
    doc_ids equal the batch rule "reject every doc_b of a banded pair" —
    the same reject set the registry's phash_dedup_keep anti-joins
    away."""
    from magiceye_spark.llmops import multimodal
    from magiceye_spark.streaming import events as sev
    from magiceye_spark.streaming.stateful import (
        NEAR_DUP_REJECT_SCHEMA,
        banded_signature_rows,
        near_dup_admit,
        near_dup_rejects_batch,
    )

    media = multimodal.synth_media(spark, "/root/testdata/sf0.001")
    sigs = multimodal.phash_signatures(media)
    banded = banded_signature_rows(sigs)
    src = str(tmp_path / "banded")
    # two id-ordered files -> two micro-batches with maxFilesPerTrigger=1
    banded.where(F.col("doc_id") < 250).coalesce(1).write.parquet(src)
    banded.where(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(src)

    old = {k: spark.conf.get(k, None) for k in sev.ROCKSDB_STATE_CONF}
    sev.enable_rocksdb_state(spark)
    try:
        stream = (
            spark.readStream.schema(banded.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            near_dup_admit(stream, max_hamming=3)
            .writeStream.format("memory")
            .queryName("near_dup_rejects")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "chk_nd"))
            .trigger(availableNow=True)
            .start()
        )
        drain(q, 120)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    got = {r["doc_id"] for r in spark.table("near_dup_rejects").collect()}
    want = {r["doc_id"] for r in near_dup_rejects_batch(sigs, 3).collect()}
    assert got == want and len(want) > 0


def test_near_dup_admit_survives_chunked_arrow_batches(spark, tmp_path):
    """Regression (review finding): with arrow.maxRecordsPerBatch forced
    tiny so one (band, bucket)'s micro-batch spans MANY pandas chunks,
    the gate must still process rows in doc_id order — a per-chunk sort
    would let a later chunk's lower id see an earlier chunk's higher id
    as already seen and flip the reject set."""
    from magiceye_spark.llmops import multimodal
    from magiceye_spark.streaming import events as sev
    from magiceye_spark.streaming.stateful import (
        banded_signature_rows,
        near_dup_admit,
        near_dup_rejects_batch,
    )

    media = multimodal.synth_media(spark, "/root/testdata/sf0.001")
    sigs = multimodal.phash_signatures(media)
    banded = banded_signature_rows(sigs)
    src = str(tmp_path / "banded_chunked")
    # one file, descending-id row order inside it: chunk splits then land
    # mid-key and unsorted, exercising the concat-before-sort path
    banded.orderBy(F.desc("doc_id")).coalesce(1).write.parquet(src)

    old_chunk = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    old_state = {k: spark.conf.get(k, None) for k in sev.ROCKSDB_STATE_CONF}
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    sev.enable_rocksdb_state(spark)
    try:
        stream = (
            spark.readStream.schema(banded.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            near_dup_admit(stream, max_hamming=3)
            .writeStream.format("memory")
            .queryName("near_dup_rejects_chunked")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "chk_ndc"))
            .trigger(availableNow=True)
            .start()
        )
        drain(q, 120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_chunk)
        for k, v in old_state.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    got = {r["doc_id"] for r in spark.table("near_dup_rejects_chunked").collect()}
    want = {r["doc_id"] for r in near_dup_rejects_batch(sigs, 3).collect()}
    assert got == want and len(want) > 0


def test_cusum_alarm_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming one-sided CUSUM monitor: the final per-type summary row
    (cumulative n/alarms/max_s/first alarm) after consuming the corpus in
    micro-batches equals the closed-form batch twin (the registry's
    oracle row) — recurrence state (P, min P) made mergeable."""
    from magiceye_spark.analytics import _events
    from magiceye_spark.streaming import events as sev
    from magiceye_spark.streaming.stateful import (
        cusum_alarm_batch,
        cusum_alarm_stream,
        fit_cusum_baseline,
    )

    batch = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    baseline = fit_cusum_baseline(batch, split_day=15)
    assert baseline  # every type has a first-half sample at sf0.001+

    src = str(tmp_path / "events_cusum")
    # time-ordered arrival split across files -> multiple micro-batches
    batch.orderBy("ts").coalesce(4).write.parquet(src)
    stream = sev.read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        cusum_alarm_stream(stream, baseline)
        .writeStream.format("memory")
        .queryName("cusum_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    drain(q, 120)

    rows = spark.table("cusum_monitor").collect()
    final = {}
    for r in rows:  # update mode: keep the row with the largest n per type
        cur = final.get(r["event_type"])
        if cur is None or r["n_rows"] > cur["n_rows"]:
            final[r["event_type"]] = r
    want = {r["event_type"]: r for r in cusum_alarm_batch(batch, baseline).collect()}
    assert set(final) == set(want)
    for t, w in want.items():
        g = final[t]
        assert g["n_rows"] == w["n_rows"], t
        assert g["n_alarms"] == w["n_alarms"], t
        assert abs(g["max_s"] - w["max_s"]) < 1e-9, t
        assert g["first_alarm_us"] == w["first_alarm_us"], t
