"""Custom stateful streaming sessionization via ``applyInPandasWithState``.

``session_window`` (streaming/events.py) covers plain gap sessions; this is
the escape hatch for session semantics the built-in window can't express —
here: sessions also CLOSE on an explicit terminal event (an ``error``),
the kind of custom rule real clickstream pipelines need.

State model (per user): the open session's ``(start_us, last_us, n_events,
sum_value)``. Each micro-batch folds its (time-sorted) events into that
state; sessions that close — by gap or terminal event — are emitted
downstream, the trailing still-open session stays in the state store. State
size is O(active users), independent of history length: the 100 TB/day
property. Arrow moves each group's rows as pandas — no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("closed_by_error", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _fold_user_events(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events, sum_value = state.get
    else:
        start_us = last_us = None
        n_events, sum_value = 0, 0.0

    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_us")
        for ts_us, value, is_error in zip(
            pdf["ts_us"], pdf["value"], pdf["is_error"]
        ):
            ts_us = int(ts_us)
            if start_us is not None and ts_us - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n_events, sum_value, 0))
                start_us = None
            if start_us is None:
                start_us, n_events, sum_value = ts_us, 0, 0.0
            last_us = ts_us
            n_events += 1
            sum_value += float(value)
            if is_error:  # terminal event closes the session immediately
                closed.append((user_id, start_us, last_us, n_events, sum_value, 1))
                start_us = None

    if start_us is not None:
        state.update((start_us, last_us, n_events, sum_value))
    elif state.exists:
        state.remove()

    yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])


QUOTA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("day", LongType()),
        StructField("event_id", LongType()),
        StructField("admit_idx", LongType()),
    ]
)


def _make_quota_processor(cap: int):
    """Build the StatefulProcessor class lazily so importing this module
    never requires the transformWithState surface (Spark ≥4.0)."""
    from pyspark.sql.streaming import StatefulProcessor

    class _QuotaProcessor(StatefulProcessor):
        """Per-(user, day) admission counter: ValueState holds the count
        of events already admitted; rows past ``cap`` are dropped. State
        is one long per active key — the 100 TB/day ingestion-control
        shape — and the per-key grouping means a hot user never blocks
        other keys' tasks."""

        def init(self, handle) -> None:
            self._n = handle.getValueState("n", "n LONG")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            user_id, day = key
            out = []
            # concatenate Arrow chunks before sorting: a hot key's batch
            # can span chunks, and a per-chunk sort would admit events out
            # of (ts, event_id) order across the chunk boundary
            chunks = [pdf for pdf in rows]
            for pdf in ([pd.concat(chunks).sort_values(["ts_us", "event_id"])] if chunks else []):
                for eid in pdf["event_id"]:
                    if n < cap:
                        n += 1
                        out.append((int(user_id), int(day), int(eid), n))
            self._n.update((n,))
            yield pd.DataFrame(out, columns=[f.name for f in QUOTA_SCHEMA.fields])

        def close(self) -> None:
            pass

    return _QuotaProcessor()


def _transform_with_state_available() -> bool:
    """transformWithStateInPandas ships a protobuf-based Python state
    server; without the protobuf package the driver worker crashes at
    init. Detect up front so callers get the working fallback instead of
    a mid-query STREAM_FAILED."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _fold_quota(cap: int):
    def fold(key, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        user_id, day = key
        out = []
        # concatenate Arrow chunks before sorting (see _QuotaProcessor)
        chunks = [pdf for pdf in pdfs]
        for pdf in ([pd.concat(chunks).sort_values(["ts_us", "event_id"])] if chunks else []):
            for eid in pdf["event_id"]:
                if n < cap:
                    n += 1
                    out.append((int(user_id), int(day), int(eid), n))
        state.update((n,))
        yield pd.DataFrame(out, columns=[f.name for f in QUOTA_SCHEMA.fields])

    return fold


def quota_admit(
    events: DataFrame, cap: int = 5, use_transform_with_state: bool | None = None
) -> DataFrame:
    """Streaming per-(user, day) admission control: admit the first
    ``cap`` events per user per day, drop the rest — the ingestion-gate
    shape whose state is ONE long per active key at any corpus size.

    Two engines, same semantics: the Spark 4
    ``transformWithStateInPandas`` API (StatefulProcessor + typed
    ValueState; requires the RocksDB state store and the protobuf
    package its Python state server imports) and an
    ``applyInPandasWithState`` fallback for environments without
    protobuf. ``use_transform_with_state=None`` auto-detects.

    The batch twin is ``row_number() OVER (PARTITION BY user_id, day
    ORDER BY ts, event_id) <= cap`` — pinned equal in tests when the
    stream arrives time-ordered; under out-of-order arrival the stream
    admits by arrival order, which is what an ingestion gate means."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    if use_transform_with_state is None:
        use_transform_with_state = _transform_with_state_available()
    grouped = prepared.groupBy("user_id", "day")
    if use_transform_with_state:
        return grouped.transformWithStateInPandas(
            _make_quota_processor(cap),
            outputStructType=QUOTA_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    return grouped.applyInPandasWithState(
        _fold_quota(cap),
        outputStructType=QUOTA_SCHEMA,
        stateStructType="n LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events (streaming, cols ts/user_id/event_type/value) → closed
    sessions. Gap 30 min; an 'error' event force-closes its session."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        (F.col("event_type") == "error").alias("is_error"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _fold_user_events,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quota_admit_batch(events: DataFrame, cap: int = 5) -> DataFrame:
    """The batch twin of :func:`quota_admit` — the EXACT admission
    expression the streaming processors implement, as one partitioned
    window: ``row_number() OVER (PARTITION BY user_id, day ORDER BY ts,
    event_id) <= cap``. Same prepared projection (micros day key, micros
    event time), same output schema (``QUOTA_SCHEMA``), so
    stream-equals-batch is checkable column-for-column; registered with a
    DuckDB oracle so the streaming family's shared expression gets a
    deterministic correctness row, not just an equality pin.

    The window partitions on (user_id, day) — admission state is per-key,
    so this parallelizes at any scale exactly like the streaming state
    store shards by key."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    prepared = events.select(
        "user_id",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    return (
        prepared.withColumn("admit_idx", F.row_number().over(w).cast("long"))
        .where(F.col("admit_idx") <= cap)
        .select("user_id", "day", "event_id", "admit_idx")
        .orderBy("user_id", "day", "admit_idx")
    )


def sql_quota_admit_batch(cap: int = 5) -> str:
    """DuckDB oracle for :func:`quota_admit_batch` (nanos ts cast to
    micros timestamp, day key as epoch micros — mirroring the Spark
    prepared projection)."""
    return f"""
WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
r AS (
  SELECT user_id,
         CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day,
         event_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                 ORDER BY ts, event_id) AS BIGINT) AS admit_idx
  FROM e)
SELECT user_id, day, event_id, admit_idx
FROM r
WHERE admit_idx <= {cap}
ORDER BY user_id, day, admit_idx
"""


# ----------------------------------------- streaming near-dup admission

#: reject signals from the streaming near-dup gate: one row per (doc,
#: band) collision with an earlier-seen doc; consumers dedupe on doc_id
NEAR_DUP_REJECT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band_id", IntegerType()),
        StructField("bucket", LongType()),
        StructField("near_doc", LongType()),
        StructField("hamming", IntegerType()),
    ]
)


def banded_signature_rows(sigs: DataFrame) -> DataFrame:
    """Flatten a 64-bit signature frame ``(doc_id, bits, band0..band3)``
    (SimHash or perceptual dHash — same shape) into per-band rows
    ``(doc_id, band_id, bucket, sig)`` with the bit vector packed as a
    64-char '0'/'1' string, the grouping key shape the streaming gate's
    state store shards on. Works on batch and streaming frames alike."""
    from pyspark.sql import functions as F

    sig_str = F.array_join(F.transform("bits", lambda b: b.cast("string")), "")
    return sigs.select(
        "doc_id",
        sig_str.alias("sig"),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_id"), F.col(f"band{i}").alias("bucket"))
                for i in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.bucket", "sig")


def _make_near_dup_processor(max_hamming: int):
    """transformWithStateInPandas engine for :func:`near_dup_admit` —
    same semantics as the applyInPandasWithState fold, with the bucket's
    seen signatures in a typed ListState (appended incrementally instead
    of rewriting one big tuple each batch — the state-shape win of the
    Spark 4 API). Built lazily so importing this module never requires
    the transformWithState surface."""
    from pyspark.sql.streaming import StatefulProcessor

    class _NearDupProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._seen = handle.getListState("seen", "doc_id LONG, sig STRING")

        def handleInputRows(self, key, rows, timerValues):
            band_id, bucket = key
            seen = [(r[0], r[1]) for r in self._seen.get()] if self._seen.exists() else []
            new = []
            out = []
            # concatenate ALL Arrow chunks before sorting: a key's
            # micro-batch rows arrive as an iterator of pandas chunks, and
            # a per-chunk sort would let a later chunk's lower doc_id see
            # an earlier chunk's higher doc_id as "already seen"
            chunks = [pdf for pdf in rows]
            if chunks:
                pdf = pd.concat(chunks).sort_values("doc_id")
                for did, sig in zip(pdf["doc_id"], pdf["sig"]):
                    best = None
                    for pid, psig in seen:
                        d = sum(a != b for a, b in zip(sig, psig))
                        if d <= max_hamming and (best is None or d < best[1]):
                            best = (pid, d)
                    if best is not None:
                        out.append((int(did), int(band_id), int(bucket), int(best[0]), int(best[1])))
                    seen.append((int(did), sig))
                    new.append((int(did), sig))
            if new:
                self._seen.appendList(new)
            yield pd.DataFrame(out, columns=[f.name for f in NEAR_DUP_REJECT_SCHEMA.fields])

        def close(self) -> None:
            pass

    return _NearDupProcessor()


def _fold_near_dup(max_hamming: int):
    def fold(key, pdfs, state: GroupState):
        ids, sigs = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        band_id, bucket = key
        out = []
        # concatenate ALL Arrow chunks before sorting (same reason as the
        # transformWithState engine: a per-chunk sort breaks first-arrival
        # ordering when one key's batch spans multiple pandas chunks)
        chunks = [pdf for pdf in pdfs]
        for pdf in ([pd.concat(chunks).sort_values("doc_id")] if chunks else []):
            for did, sig in zip(pdf["doc_id"], pdf["sig"]):
                best = None
                for pid, psig in zip(ids, sigs):
                    d = sum(a != b for a, b in zip(sig, psig))
                    if d <= max_hamming and (best is None or d < best[1]):
                        best = (pid, d)
                if best is not None:
                    out.append((int(did), int(band_id), int(bucket), int(best[0]), int(best[1])))
                ids.append(int(did))
                sigs.append(sig)
        state.update((ids, sigs))
        yield pd.DataFrame(out, columns=[f.name for f in NEAR_DUP_REJECT_SCHEMA.fields])

    return fold


def near_dup_admit(
    banded: DataFrame,
    max_hamming: int = 3,
    use_transform_with_state: bool | None = None,
) -> DataFrame:
    """Streaming near-duplicate ADMISSION GATE — dedup at ingest, the
    missing online sibling of the batch near-dup family: every arriving
    document's banded signature (from :func:`banded_signature_rows` over
    SimHash or perceptual-dHash signatures) probes per-(band, bucket)
    state holding every signature seen so far in that bucket; a doc
    within ``max_hamming`` of ANY earlier-seen doc in a shared band emits
    a reject signal (dedupe signals on doc_id downstream; admitted = all
    − rejects). First-arrival-wins, exactly what an ingest gate means;
    when arrival order follows doc_id order this equals the batch rule
    "reject every doc_b of a (doc_a < doc_b, hamming ≤ t) pair" — pinned
    against :func:`near_dup_rejects_batch` in tests/test_streaming.py.

    100 TB posture: state IS the banded LSH inverted index, sharded by
    (band, bucket) across the state store — per-bucket lists stay
    catalog-sized under the same df reasoning as the batch band join, and
    a production deployment caps hot buckets (the stopgram df cut) and
    ages state with a TTL; a hot bucket never blocks other keys' tasks.
    Arrow moves each bucket's rows as pandas; the Hamming probe is
    64-char compares against an in-memory list, no shuffle.

    Engine selection mirrors :func:`quota_admit`: the Spark 4
    ``transformWithStateInPandas`` path (ListState appends, requires the
    protobuf state server) when available, the
    ``applyInPandasWithState`` fold otherwise — identical semantics."""
    if use_transform_with_state is None:
        use_transform_with_state = _transform_with_state_available()
    grouped = banded.groupBy("band_id", "bucket")
    if use_transform_with_state:
        return grouped.transformWithStateInPandas(
            _make_near_dup_processor(max_hamming),
            outputStructType=NEAR_DUP_REJECT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    return grouped.applyInPandasWithState(
        _fold_near_dup(max_hamming),
        outputStructType=NEAR_DUP_REJECT_SCHEMA,
        stateStructType="ids ARRAY<BIGINT>, sigs ARRAY<STRING>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dup_rejects_batch(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Batch twin of the streaming gate's reject set under doc_id-ordered
    arrival: the doc_b side of every banded near-dup pair. One row per
    rejected doc, witnessed by its CLOSEST earlier neighbor (minimum
    hamming, ties broken on lowest doc_a) — the same best-match rule the
    streaming processors apply."""
    from pyspark.sql import functions as F

    from magiceye_spark.llmops.dedup import hamming_band_near_dups

    pairs = hamming_band_near_dups(sigs, max_hamming)
    # no orderBy here: the keep-set consumer anti-joins this (order would
    # cost a wasted range exchange); sort at the edge if displaying
    return (
        pairs.groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min(F.struct("hamming", "doc_a")).alias("w"))
        .select("doc_id", F.col("w.doc_a").alias("near_doc"), F.col("w.hamming").alias("hamming"))
    )


# ----------------------------------------- streaming CUSUM drift alarm

#: one summary row per event_type per micro-batch (update semantics):
#: cumulative rows seen, alarms fired, the peak CUSUM statistic, and the
#: event time of the first alarm (NULL until one fires)
CUSUM_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_rows", LongType()),
        StructField("n_alarms", LongType()),
        StructField("max_s", DoubleType()),
        StructField("first_alarm_us", LongType()),
    ]
)


def fit_cusum_baseline(
    events: DataFrame, split_day: int = 15
) -> dict[str, tuple[float, float]]:
    """Freeze a per-type CUSUM calibration from the baseline window
    (days before ``split_day``): target = mean(value), sigma = sample
    stddev — computed from EXACT decimal moments so the floats are
    engine-identical (same discipline as fit_psi_baseline). Returns
    {event_type: (target, sigma)}; KB-sized driver state at any corpus
    scale (one row per type)."""
    from pyspark.sql import functions as F

    rows = (
        events.where(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")) < split_day
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)")).alias("s"),
            F.sum(
                (
                    F.round(F.col("value"), 4).cast("decimal(18,4)")
                    * F.round(F.col("value"), 4).cast("decimal(18,4)")
                ).cast("decimal(38,8)")
            ).alias("ssq"),
        )
        .collect()
    )
    out = {}
    for r in rows:
        n, s, ssq = r["n"], float(r["s"]), float(r["ssq"])
        if n < 2:
            continue
        import math

        var = (ssq - s * s / n) / (n - 1)
        out[r["event_type"]] = (s / n, math.sqrt(var) if var > 0 else 0.0)
    return out


def cusum_alarm_batch(
    events: DataFrame,
    baseline: dict[str, tuple[float, float]],
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Batch twin of :func:`cusum_alarm_stream`: the one-sided CUSUM
    S_i = max(0, S_{i−1} + (x_i − target − k·σ)) in closed window form —
    S_i = P_i − least(0, running_min(P_i)) with P the ordered prefix sum
    of the drift term — so the sequential recurrence becomes two
    per-type ordered windows (partitioned by type, never a global sort).
    Alarm when S > h·σ. One summary row per type: (n_rows, n_alarms,
    max_s, first_alarm_us). Doubles accumulate in the (ts, event_id)
    window order on every engine — bit-identical to the streaming fold's
    arithmetic."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = events.sparkSession
    bl = spark.createDataFrame(
        [(t, tg, sg) for t, (tg, sg) in sorted(baseline.items())],
        "event_type string, target double, sigma double",
    )
    prepared = events.join(F.broadcast(bl), "event_type").select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        (
            F.col("value") - F.col("target") - F.lit(k_sigma) * F.col("sigma")
        ).alias("d"),
        (F.lit(h_sigma) * F.col("sigma")).alias("h"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = prepared.withColumn("p", F.sum("d").over(wcum)).withColumn(
        "s", F.col("p") - F.least(F.lit(0.0), F.min(F.col("p")).over(wcum))
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("s") > F.col("h"), 1).otherwise(0))
            .cast("long")
            .alias("n_alarms"),
            F.max("s").alias("max_s"),
            F.min(F.when(F.col("s") > F.col("h"), F.col("ts_us"))).alias(
                "first_alarm_us"
            ),
        )
        .orderBy("event_type")
    )


def sql_cusum_alarm_batch(
    split_day: int = 15, k_sigma: float = 0.5, h_sigma: float = 4.0
) -> str:
    """DuckDB oracle computing the SAME frozen baseline from the same
    exact decimal moments, then the same closed-form CUSUM windows."""
    return f"""
WITH e AS (
  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
bl AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / n AS target,
         CASE WHEN (CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) > 0
              THEN SQRT((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))
              ELSE 0.0 END AS sigma
  FROM (SELECT event_type, COUNT(*) AS n,
               SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS s,
               SUM(CAST(CAST(ROUND(value, 4) AS DECIMAL(18,4))
                        * CAST(ROUND(value, 4) AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS ssq
        FROM e WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) < {split_day}
        GROUP BY 1)
  WHERE n >= 2),
prepared AS (
  SELECT e.event_type, epoch_us(e.ts) AS ts_us, e.event_id,
         e.value - bl.target - {k_sigma} * bl.sigma AS d,
         {h_sigma} * bl.sigma AS h
  FROM e JOIN bl ON e.event_type = bl.event_type),
stepped AS (
  SELECT *, p - LEAST(0.0, MIN(p) OVER w2) AS s
  FROM (SELECT *, SUM(d) OVER w AS p FROM prepared
        WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       MAX(s) AS max_s,
       MIN(CASE WHEN s > h THEN ts_us END) AS first_alarm_us
FROM stepped
GROUP BY event_type
ORDER BY event_type
"""


def _fold_cusum(baseline: dict[str, tuple[float, float]], k_sigma: float, h_sigma: float):
    def fold(key, pdfs, state: GroupState):
        (typ,) = key
        if typ not in baseline:
            yield pd.DataFrame([], columns=[f.name for f in CUSUM_SCHEMA.fields])
            return
        target, sigma = baseline[typ]
        h = h_sigma * sigma
        if state.exists:
            p, minp, n, n_alarms, max_s, first_alarm = state.get
        else:
            p, minp, n, n_alarms, max_s, first_alarm = 0.0, 0.0, 0, 0, 0.0, None
        chunks = [pdf for pdf in pdfs]
        for pdf in ([pd.concat(chunks).sort_values(["ts_us", "event_id"])] if chunks else []):
            for ts_us, v in zip(pdf["ts_us"], pdf["value"]):
                # identical arithmetic to the batch twin's window form:
                # P accumulates the drift term, S = P - min(0, running min P)
                p = p + (float(v) - target - k_sigma * sigma)
                if p < minp:
                    minp = p
                s = p - (minp if minp < 0.0 else 0.0)
                n += 1
                if s > max_s:
                    max_s = s
                if s > h:
                    n_alarms += 1
                    if first_alarm is None:
                        first_alarm = int(ts_us)
        state.update((p, minp, n, n_alarms, max_s, first_alarm))
        yield pd.DataFrame(
            [(typ, n, n_alarms, max_s, first_alarm)],
            columns=[f.name for f in CUSUM_SCHEMA.fields],
        )

    return fold


def cusum_alarm_stream(
    stream: DataFrame,
    baseline: dict[str, tuple[float, float]],
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Streaming one-sided CUSUM drift alarm: per-type state is three
    scalars (prefix sum, its running minimum, counters) — the canonical
    sequential monitor made mergeable by the P − min(P) closed form, so
    a 100 TB/day stream holds ONE tiny state row per metric. Baseline is
    frozen by :func:`fit_cusum_baseline` (same discipline as the PSI
    monitor). Emits the cumulative summary row per type each micro-batch
    (update semantics); the final row equals :func:`cusum_alarm_batch`
    on the same data — pinned in tests.

    ORDERING ASSUMPTION: CUSUM is order-sensitive, and the fold sorts by
    (ts_us, event_id) only WITHIN each micro-batch — an event arriving in
    a later micro-batch than a chronologically later event is folded out
    of order, and the (p, minp) trajectory (hence alarm count/position)
    can differ from the batch twin. The stream==batch equality pinned in
    tests therefore holds under in-order arrival (true for the replayed
    file source used here). Production use over out-of-order transports
    needs event-time ordering upstream — e.g. a watermark-delayed
    sort-within-window stage — or tolerance for alarm-position jitter
    bounded by the reordering window."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        _fold_cusum(baseline, k_sigma, h_sigma),
        outputStructType=CUSUM_SCHEMA,
        stateStructType=(
            "p DOUBLE, minp DOUBLE, n LONG, n_alarms LONG, max_s DOUBLE, first_alarm LONG"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
