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
            for pdf in rows:
                pdf = pdf.sort_values(["ts_us", "event_id"])
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
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
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
