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
