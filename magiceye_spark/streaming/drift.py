"""Streaming schema-drift monitor + watermarked event rollups.

The reference is strictly batch (its only 'stream' is a process-internal
progress channel, ``src/action/run.rs:44-57``); this is the §7 extension:
watch a directory of catalog-snapshot deltas and emit diff findings
continuously, reusing the batch diff operators inside ``foreachBatch`` —
the canonical Spark pattern for incrementally applying a batch transform.

Scale notes: each micro-batch carries only the *changed* catalog rows (a
snapshot delta), the baseline side is a small broadcast join, and the
windowed rollup holds state bounded by the watermark horizon.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructField, StructType, TimestampType

from magiceye_spark.schema import COLUMNS_SCHEMA

#: streamed snapshot-delta record: a column-catalog row + capture timestamp
STREAM_COLUMNS_SCHEMA = StructType(
    list(COLUMNS_SCHEMA.fields) + [StructField("snapshot_ts", TimestampType())]
)


def column_drift(batch: DataFrame, baseline_columns: DataFrame) -> DataFrame:
    """Diff a batch of streamed column records against the baseline catalog:
    new columns, dropped-at-source markers aside, property drift. Pure
    batch transform — reused by foreachBatch below and unit-testable alone."""
    b = baseline_columns.select(
        "table_name",
        "column_name",
        F.col("data_type").alias("data_type_base"),
        F.col("is_nullable").alias("is_nullable_base"),
        F.col("column_default").alias("default_base"),
    )
    j = batch.join(F.broadcast(b), ["table_name", "column_name"], "left")
    drift_kind = (
        F.when(F.col("data_type_base").isNull(), F.lit("new_column"))
        .when(F.col("data_type") != F.col("data_type_base"), F.lit("type_drift"))
        .when(F.col("is_nullable") != F.col("is_nullable_base"), F.lit("nullable_drift"))
        .when(F.col("column_default") != F.col("default_base"), F.lit("default_drift"))
    )
    return (
        j.withColumn("drift_kind", drift_kind)
        .where(F.col("drift_kind").isNotNull())
        .select(
            "snapshot_ts",
            "table_name",
            "column_name",
            "drift_kind",
            F.coalesce("data_type_base", F.lit("")).alias("base_value"),
            F.col("data_type").alias("observed_value"),
        )
    )


def monitor_schema_drift(
    spark: SparkSession,
    snapshots_path: str,
    baseline_columns: DataFrame,
    sink: Callable[[DataFrame, int], None],
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``snapshots_path`` for parquet snapshot deltas and feed drift
    findings to ``sink(batch_df, batch_id)`` via foreachBatch."""
    stream = (
        spark.readStream.schema(STREAM_COLUMNS_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(snapshots_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(column_drift(batch_df, baseline_columns), batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", snapshots_path.rstrip("/") + "_chk"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def row_drift(
    batch: DataFrame,
    baseline: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level drift for one micro-batch of arriving rows: each row is
    'new_row' (key absent from baseline) or 'changed' (key present, some
    compared column differs); unchanged rows drop out. The arriving batch
    is small → joins as the broadcast side against the (large) baseline;
    at lake scale the baseline side stays partitioned on the key so the
    probe is shuffle-free for it. Batch twin of datadiff.diff_data driven
    from the target side."""
    if compare_cols is None:
        compare_cols = [
            c for c in batch.columns if c in set(baseline.columns) and c not in set(keys)
        ]
    b = baseline.select(
        *keys,
        *[F.col(c).alias(f"{c}__b") for c in compare_cols],
        F.lit(True).alias("_b_present"),
    )
    j = F.broadcast(batch).join(b, keys, "left")
    changed_arr = F.filter(
        F.array(
            *[
                F.when(~F.col(c).eqNullSafe(F.col(f"{c}__b")), F.lit(c))
                for c in compare_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = F.when(F.col("_b_present").isNull(), F.lit("new_row")).when(
        F.size(changed_arr) > 0, F.lit("changed")
    )
    return (
        j.withColumn("drift_status", status)
        .where(F.col("drift_status").isNotNull())
        .select(
            *keys,
            "drift_status",
            F.when(
                F.col("drift_status") == "changed",
                F.array_join(F.array_sort(changed_arr), ","),
            ).otherwise(F.lit("")).alias("changed_columns"),
        )
    )


def monitor_row_drift(
    spark: SparkSession,
    rows_path: str,
    baseline: DataFrame,
    keys: list[str],
    schema: StructType,
    sink: Callable[[DataFrame, int], None],
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``rows_path`` for arriving row files and feed row-drift
    findings to ``sink(batch_df, batch_id)`` — the data-plane sibling of
    :func:`monitor_schema_drift`."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16")
        .parquet(rows_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(row_drift(batch_df, baseline, keys), batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", rows_path.rstrip("/") + "_chk"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_rate_rollup(
    drift: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window drift counts with late-data watermark: the
    alert-feed aggregation (state bounded by the watermark horizon)."""
    return (
        drift.withWatermark("snapshot_ts", watermark)
        .groupBy(F.window("snapshot_ts", window).alias("w"), F.col("drift_kind"))
        .agg(F.count(F.lit(1)).alias("n_findings"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "drift_kind",
            "n_findings",
        )
    )


def fit_psi_baseline(
    df: DataFrame, col: str, n_bins: int = 10
) -> tuple[list[tuple[int, int]], float, float]:
    """Deploy-time frozen-baseline fit for :func:`value_psi_drift`:
    min/max of ``col`` plus a dense ``n_bins`` histogram over the baseline
    frame. Driver materialization is bounded and documented: two scalars +
    ``n_bins`` count rows — the fit runs ONCE when the monitor deploys,
    never per micro-batch. Returns (baseline_bins, mn, mx) ready to pass
    to the monitor and its batch twin."""
    v = F.col(col).cast("double")
    srow = df.agg(F.min(v).alias("_mn"), F.max(v).alias("_mx")).collect()[0]
    if srow["_mn"] is None:
        raise ValueError(
            f"fit_psi_baseline: baseline frame has no non-null '{col}' values"
        )
    mn, mx = float(srow["_mn"]), float(srow["_mx"])
    # constant column: width 0 would divide by zero (ANSI cast overflow on
    # Infinity); width 1.0 puts the whole baseline in bin 0, and the same
    # convention in value_psi_drift / the SQL twin keeps scoring aligned
    width = (mx - mn) or 1.0
    binned = df.select(
        F.least(
            F.floor((v - F.lit(mn)) * n_bins / F.lit(width)).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin")
    )
    counts = {
        r["bin"]: r["n"]
        for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return [(b, counts.get(b, 0)) for b in range(n_bins)], mn, mx


def value_psi_drift(
    batch: DataFrame,
    baseline_bins: list[tuple[int, int]],
    col: str,
    mn: float,
    mx: float,
) -> DataFrame:
    """PSI of one micro-batch's ``col`` distribution against a FROZEN
    baseline histogram (``baseline_bins`` = [(bin, n), …] with the bin
    edges implied by ``mn``/``mx`` and the bin count): one row
    (n_rows, psi). The baseline is fitted once at deploy time
    (:func:`magiceye_spark.profile.psi_histogram_drift` machinery);
    per batch this is a map-side bin assignment + one tiny aggregate —
    the distribution monitor that runs on every micro-batch at stream
    rates. Same Laplace smoothing as the batch twin."""
    import math

    n_bins = len(baseline_bins)
    tb = sum(n for _, n in baseline_bins)
    p = {b: (n + 0.5) / (tb + 0.5 * n_bins) for b, n in baseline_bins}
    v = F.col(col).cast("double")
    width = (mx - mn) or 1.0  # constant-baseline convention, see fit
    binned = batch.select(
        F.least(
            F.floor((v - F.lit(mn)) * n_bins / F.lit(width)).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin")
    ).where(F.col("bin") >= 0)
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    # KB-sized: close the PSI sum driver-side so the output is one row
    got = {r["bin"]: r["n"] for r in counts.collect()}
    tt = sum(got.values())
    psi = 0.0
    for b in range(n_bins):
        q = (got.get(b, 0) + 0.5) / (tt + 0.5 * n_bins) if tt else p[b]
        psi += (p[b] - q) * math.log(p[b] / q)
    spark = batch.sparkSession
    return spark.createDataFrame([(tt, round(psi, 6))], "n_rows long, psi double")


def sql_value_psi_stream_twin(
    base_where: str, target_where: str, col: str, n_bins: int = 10
) -> str:
    """DuckDB twin of ``value_psi_drift(target, *fit_psi_baseline(base))``
    end-to-end: fit the frozen baseline on one WHERE-slice of events, score
    the other slice as the 'micro-batch'. The PSI terms are summed in
    explicit bin order so both engines add the 10 doubles in the same IEEE
    order (harness gotcha)."""
    smooth = f"0.5 * {n_bins}"
    return f"""
WITH base AS (SELECT CAST({col} AS DOUBLE) AS v FROM events WHERE {base_where}),
stats AS (SELECT MIN(v) AS mn,
                 CASE WHEN MAX(v) = MIN(v) THEN 1.0 ELSE MAX(v) - MIN(v) END AS width
          FROM base),
bbin AS (
  SELECT LEAST(CAST(FLOOR((v - mn) * {n_bins} / width) AS INT), {n_bins - 1}) AS bin
  FROM base, stats),
bh AS (SELECT bin, COUNT(*) AS n FROM bbin GROUP BY bin),
bdense AS (SELECT i.range AS b, COALESCE(n, 0) AS n
           FROM range({n_bins}) i LEFT JOIN bh ON bh.bin = i.range),
btot AS (SELECT SUM(n) AS tb FROM bdense),
tgt AS (SELECT CAST({col} AS DOUBLE) AS v FROM events WHERE {target_where}),
tbin AS (
  SELECT LEAST(CAST(FLOOR((v - mn) * {n_bins} / width) AS INT), {n_bins - 1}) AS bin
  FROM tgt, stats),
th AS (SELECT bin, COUNT(*) AS n FROM tbin WHERE bin >= 0 GROUP BY bin),
tdense AS (SELECT i.range AS b, COALESCE(n, 0) AS n
           FROM range({n_bins}) i LEFT JOIN th ON th.bin = i.range),
ttot AS (SELECT SUM(n) AS tt FROM tdense),
terms AS (
  SELECT bdense.b,
         (bdense.n + 0.5) / (tb + {smooth}) AS p,
         (tdense.n + 0.5) / (tt + {smooth}) AS q
  FROM bdense JOIN tdense ON bdense.b = tdense.b, btot, ttot)
SELECT CAST((SELECT tt FROM ttot) AS BIGINT) AS n_rows,
       CASE WHEN (SELECT tt FROM ttot) = 0 THEN 0.0
            ELSE ROUND(SUM((p - q) * LN(p / q) ORDER BY b), 6) END AS psi
FROM terms
"""


def monitor_value_psi(
    spark: SparkSession,
    rows_path: str,
    baseline_bins: list[tuple[int, int]],
    col: str,
    mn: float,
    mx: float,
    schema: StructType,
    sink: Callable[[DataFrame, int], None],
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``rows_path`` and feed per-micro-batch PSI rows to ``sink`` —
    the distribution-drift sibling of :func:`monitor_row_drift`."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16")
        .parquet(rows_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(value_psi_drift(batch_df, baseline_bins, col, mn, mx), batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", rows_path.rstrip("/") + "_psi_chk"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def corpus_quality_snapshot(batch: DataFrame, text_col: str = "text") -> DataFrame:
    """One quality row for a document micro-batch: volume, mean token
    count, English share, within-batch exact-dup fraction, mean token
    entropy. Row-local signals + one tiny aggregate — runs at stream
    rates; the batch twin of the per-source report card collapsed to the
    batch grain."""
    from magiceye_spark.llmops.textstats import _tokens, entropy_from_tokens  # noqa: SLF001

    canon = F.md5(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "))
    base = batch.select(
        "lang", canon.alias("c"), _tokens(F.col(text_col)).alias("toks")
    ).repartition(batch.sparkSession.sparkContext.defaultParallelism)
    toks = F.col("toks")
    return base.select(
        F.size(toks).alias("n_tokens"),
        (F.col("lang") == "en").cast("int").alias("is_en"),
        entropy_from_tokens(toks).alias("entropy"),
        "c",
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("is_en"), 4).alias("en_frac"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("c")) / F.count(F.lit(1)), 4
        ).alias("dup_frac"),
        F.round(F.avg("entropy"), 4).alias("avg_token_entropy"),
    )


def monitor_corpus_quality(
    spark: SparkSession,
    docs_path: str,
    baseline: dict,
    schema: StructType,
    sink: Callable[[DataFrame, int], None],
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Per-micro-batch corpus-quality monitor for a streaming ingest of
    documents: each batch's :func:`corpus_quality_snapshot` is extended
    with deltas against a FROZEN baseline snapshot (fit once on the
    accepted corpus) and fed to ``sink`` — the content-quality sibling of
    :func:`monitor_value_psi` (drop in ingest quality, language mix
    shift, or a duplicate flood shows up within one batch).

    ``baseline``: dict with keys avg_tokens / en_frac / dup_frac /
    avg_token_entropy (e.g. ``corpus_quality_snapshot(corpus).first().
    asDict()``)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16")
        .parquet(docs_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        snap = corpus_quality_snapshot(batch_df)
        out = snap.select(
            "*",
            *[
                F.round(F.col(k) - F.lit(float(baseline[k])), 4).alias(f"delta_{k}")
                for k in ("avg_tokens", "en_frac", "dup_frac", "avg_token_entropy")
            ],
        )
        sink(out, batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", docs_path.rstrip("/") + "_quality_chk"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
