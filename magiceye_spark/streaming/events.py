"""Structured Streaming over the events table: watermarked rollups and
session windows.

Streaming twins of the batch operators in ``analytics``/``events_ops`` —
same aggregation logic, incremental execution with state bounded by the
watermark horizon:

- :func:`stream_hourly_rollup` ≙ ``analytics.events_hourly_rollup`` (tumbling
  window instead of ``date_trunc``; late rows beyond the watermark dropped).
- :func:`stream_sessionize` ≙ ``events_ops.sessionize`` via Spark's native
  ``session_window`` — per-user gap sessions maintained as streaming state,
  emitted when the watermark passes the session close. At 100 TB/day the
  state store only holds OPEN sessions (bounded by active users × gap), not
  history — the property the batch window formulation can't give you.
- :func:`stream_ohlc_daily` ≙ ``events_ops.ohlc_daily`` — min_by/max_by are
  mergeable, so each open bar is a handful of scalars of state.

Input is a file stream (new parquet files in a directory), the usual shape
of an events lake ingested by a loader; swap `readStream.parquet` for a
Kafka source in production without touching the aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: micros-timestamp view of the events table (nanos truncated upstream)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 16,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream. ``maxFilesPerTrigger`` caps batch size by
    file COUNT; ``max_bytes_per_trigger`` (bytes) caps by VOLUME —
    the right backpressure knob when file sizes vary wildly (a loader that
    emits both 1 MB trickle files and 10 GB backfill files would otherwise
    produce micro-batches 4 orders of magnitude apart). Spark's file source
    rejects setting both, so a byte cap replaces the file cap here."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_bytes_per_trigger is not None:
        r = r.option("maxBytesPerTrigger", str(int(max_bytes_per_trigger)))
    else:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def stream_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event counts/sums per type. Append-mode capable:
    windows finalize once the watermark passes their end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions as streaming state via ``session_window``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_enrich(stream: DataFrame, dim: DataFrame, keys: list[str]) -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    columns to each arriving event. Spark re-plans the static side per
    micro-batch (so dimension updates between batches are picked up) and
    broadcasts it when small — no state store involved, unlike
    stream-stream joins."""
    return stream.join(dim, keys, "left")


def stream_dedup(
    events: DataFrame, watermark: str = "2 hours", id_col: str = "event_id"
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event id within
    the watermark horizon (``dropDuplicatesWithinWatermark``) — state holds
    one entry per id only until the watermark passes, so at-least-once
    sources (Kafka, file redelivery) become effectively-once with bounded
    state. The streaming twin of ``dedup.dedup_exact``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


def run_to_memory(
    df: DataFrame, name: str, checkpoint: str, output_mode: str = "complete"
):
    """Drive a streaming aggregate into an in-memory table with
    availableNow (process-everything-then-stop) — the test/debug harness."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------------------ kafka wiring

def parse_event_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode a Kafka-shaped payload (binary ``value`` holding one JSON
    event per record) into EVENTS_SCHEMA rows. Pure transform — identical
    for batch replay and the live stream, so it is unit-testable without a
    broker."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), EVENTS_SCHEMA).alias("e")
    ).select("e.*")


def read_event_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
    min_offsets_per_trigger: int | None = None,
    max_trigger_delay: str = "15m",
    min_partitions: int | None = None,
) -> DataFrame:
    """The production source: Kafka topic → parsed event stream.

    Rate control, both directions:

    - ``maxOffsetsPerTrigger`` bounds per-micro-batch intake so a backlog
      replay cannot blow executor memory — the streaming analogue of
      ``maxFilesPerTrigger``.
    - ``min_offsets_per_trigger`` holds a trigger BACK until that many
      offsets accumulate (batched commits beat thousands of near-empty
      micro-batches on a trickling topic); ``max_trigger_delay`` caps the
      wait so a quiet topic still flushes. Only meaningful together.
    - ``min_partitions`` over-splits Kafka partitions across more Spark
      tasks than the topic has partitions — the fix when a hot topic has
      fewer partitions than the cluster has cores.

    Requires the spark-sql-kafka connector on the cluster classpath (not
    present in this container; the parse transform is tested via
    :func:`parse_event_json`, the wiring is exercised against a real
    broker)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        raw = raw.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_offsets_per_trigger is not None:
        raw = raw.option("minOffsetsPerTrigger", str(min_offsets_per_trigger))
        raw = raw.option("maxTriggerDelay", max_trigger_delay)
    if min_partitions is not None:
        raw = raw.option("minPartitions", str(min_partitions))
    return parse_event_json(raw.load())


#: state-store configuration for large stateful streams (sessionization,
#: dedup): RocksDB keeps state off-heap and on local disk with incremental
#: (changelog) checkpoints — JVM-heap state OOMs once open-session state
#: outgrows executor memory, RocksDB spills instead. Built into Spark 4.
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def enable_rocksdb_state(spark: SparkSession) -> None:
    """Switch stateful streaming queries in this session to the RocksDB
    state store (applies to queries started AFTER the call)."""
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)


def state_store_metrics(query) -> list[dict]:
    """State-store health from a running (or finished) streaming query's
    last progress: one dict per stateful operator with the numbers that
    predict trouble BEFORE it hits — state rows growing without bound
    (watermark not advancing), memory used approaching executor limits
    (switch to RocksDB), rows removed = 0 forever (eviction never firing).

    Keys: operator, state_rows, rows_updated, rows_removed, memory_bytes,
    plus any provider-specific customMetrics (RocksDB compaction/ SST
    sizes) flattened in. Returns [] when no progress has been reported yet.
    """
    p = query.lastProgress
    if not p:
        return []
    out = []
    for op in p.get("stateOperators", []):
        row = {
            "operator": op.get("operatorName", ""),
            "state_rows": op.get("numRowsTotal", 0),
            "rows_updated": op.get("numRowsUpdated", 0),
            "rows_removed": op.get("numRowsRemoved", 0),
            "memory_bytes": op.get("memoryUsedBytes", 0),
        }
        row.update(op.get("customMetrics", {}))
        out.append(row)
    return out


def stream_ohlc_daily(events: DataFrame, watermark: str = "25 hours") -> DataFrame:
    """Streaming OHLC bars: per (1-day tumbling window, event_type), open/
    high/low/close of ``value`` with (ts, event_id) as the event order —
    the streaming twin of ``events_ops.ohlc_daily``.

    min_by/max_by over the order struct are mergeable aggregates, so the
    state per open window is a handful of scalars (no event buffering) and
    the bar finalizes in append mode once the watermark passes the day."""
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("day"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join: each purchase matched to the same
    user's clicks in the preceding ``within`` window — both sides arrive
    as unbounded streams, so Spark buffers each side in state until the
    other side's watermark proves no more matches can arrive. The
    watermark + the time-bound join condition are what make the state
    BOUNDED (state evicts rows older than watermark + interval); without
    the interval bound this join is rejected by the engine at any scale.
    Inner join: purchases with no prior click drop out (the outer
    variant needs both-side watermarks too, which this already sets).

    Batch twin: the inner interval join of events_ops.range_join_count /
    asof machinery — equality pinned in tests."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
