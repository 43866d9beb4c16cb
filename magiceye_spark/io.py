"""Table scan layer.

``read_table`` fixes the one local-bench pathology that also appears in real
lakes: a table whose file/row-group layout yields fewer input splits than the
cluster has cores (the driver-generated testdata is one row group per file,
so a naive scan decodes 600 k rows in ONE task). When the scan is both
non-trivially sized and under-split, insert a round-robin repartition up to
the session's default parallelism — Catalyst still pushes filters and prunes
columns below the exchange, so `PushedFilters`/`ReadSchema` are unaffected
(pinned by tests/test_plans.py).

On a real 100 TB table the split count vastly exceeds the core count, the
condition is false, and this is a pure pass-through — no extra shuffle.
Dimension-sized tables stay un-repartitioned so broadcast planning sees
their true (small) size.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)

#: below this total size a table is dimension-like: never worth a shuffle
_MIN_BYTES = 4 * 1024 * 1024

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(raw: str) -> int:
    """Spark size strings: '134217728', '134217728b', '128m', '128MB'."""
    s = raw.strip().lower().removesuffix("b")
    if s and s[-1] in _UNITS:
        return int(s[:-1]) * _UNITS[s[-1]]
    return int(s)


def read_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Read one testdata table. ``parallelize=True`` is for queries whose
    expensive work (decimal partial aggregation, broadcast-join probe) runs
    BEFORE their first shuffle — without it that pipeline executes in as few
    tasks as the file has row groups. Queries that immediately shuffle for a
    join/window gain nothing and would pay an extra exchange — they keep the
    default."""
    # testdata events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects outright. The session-factory (session.py) sets this,
    # but callers may hand us an externally-built SparkSession (the
    # correctness harness does) — set it at runtime so every entry point
    # reads nanos as long; _events() converts long → timestamp downstream.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # config not recognized / not settable: fall through to read
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    return parallelize_scan(spark, df, path) if parallelize else df


def local_frame(spark: SparkSession, rows, schema=None) -> DataFrame:
    """Small driver-side table as a JVM LocalRelation via the Arrow/pandas
    path. ``createDataFrame`` over a plain Python list routes through
    ``parallelize`` — an RDD whose every consuming JOB launches a Python
    worker to re-serialize the rows, a FIXED ~1.5-6 s cost per action
    (measured: a one-row store-params write paid 6.8 s on local[32]; the
    same write through pandas/Arrow is ~0.3 s, 20×). The pandas path
    Arrow-encodes once on the driver and plans a LocalRelation — no
    Python worker, no RDD — so model-table writes (store params,
    centroids, codebooks) and bounded driver-computed frames (union-find
    labels) stop dominating index-build wall.

    Callers own the type discipline: rows must be non-None scalars /
    float lists (pandas would silently promote an int column with Nones
    to float). Falls back to the plain path when pandas/Arrow can't
    express the rows (and for empty input, where pandas has no dtypes
    for schema-less inference)."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame(rows)
        return (
            spark.createDataFrame(pdf, schema)
            if schema is not None
            else spark.createDataFrame(pdf)
        )
    except (ImportError, ValueError, TypeError, KeyError, OverflowError) as e:
        # Expected conversion gaps only (r12 advice: a blanket except hid
        # Arrow regressions as an unexplained ~6 s/action perf cliff). Any
        # OTHER exception class now propagates; the fallback itself is
        # logged so a silent revert to the parallelize path is observable.
        _log.warning(
            "local_frame: pandas/Arrow path failed (%s: %s); falling back "
            "to the slow parallelize path", type(e).__name__, e
        )
        return spark.createDataFrame(rows, schema)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout: one directory per distinct
    partition-column value. Queries filtering on those columns prune whole
    directories at PLANNING time (PartitionFilters in the scan — pinned in
    tests/test_plans.py), the cheapest possible data skipping at 100 TB.
    Choose low-cardinality columns (event_type, date) — high-cardinality
    partitioning produces a small-file explosion."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 32
) -> None:
    """Persist a table bucketed (and sorted) by ``keys``: subsequent equi-
    joins and aggregations on those keys read co-located buckets and skip
    the shuffle entirely — the right physical layout for snapshot tables
    that get diffed repeatedly (write once, diff many times shuffle-free).
    The no-Exchange property is pinned in tests/test_plans.py.

    Idempotent across sessions: with an in-memory metastore a managed
    table's directory can outlive its catalog entry, and saveAsTable then
    fails with LOCATION_ALREADY_EXISTS — drop the entry and clear a stale
    managed location before writing."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if warehouse.startswith(("file:", "/")) and os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 512,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Rewrite a table into ≈``target_mb``-sized files; returns the file
    count written.

    Small-file proliferation is the chronic lake disease (every streaming
    micro-batch and every over-parallel writer leaves hundreds of KB-sized
    files; at 100 TB the NameNode/listing and per-file open costs dominate
    scans). Sizing uses one ``getContentSummary`` call against the input's
    FileSystem — no listing loop, works on any Hadoop-supported scheme.

    Without ``sort_by``: round-robin ``repartition(n)`` — even output
    sizes, one shuffle. With ``sort_by``: ``repartitionByRange`` +
    ``sortWithinPartitions`` — same shuffle count, but files carry
    non-overlapping min/max column stats, so later range filters skip
    whole files (poor-man's clustering; the right default for time-keyed
    tables).
    """
    import math

    df = getattr(spark.read, fmt)(in_path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    out = (
        df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
        if sort_by
        else df.repartition(n)
    )
    getattr(out.write.mode("overwrite"), fmt)(out_path)
    return n


def parallelize_scan(
    spark: SparkSession, df: DataFrame, path: str | None = None
) -> DataFrame:
    """Insert a round-robin repartition when a LOCAL table would scan in
    fewer splits than the session has cores (see module docstring).

    Explicitly gated on a local-filesystem ``path``: remote schemes
    (s3://, hdfs://, ...) pass through untouched — on a real lake the split
    count exceeds the core count anyway, and neither a driver-side listing
    (``inputFiles()`` materializes a million-file index on the driver) nor
    an RDD conversion belongs in the read path. Sizing walks the local
    directory with ``os.scandir`` and estimates Spark's split count from
    ``spark.sql.files.maxPartitionBytes`` — no JVM round-trip at all."""
    if path is None:
        return df
    local = path.removeprefix("file:")
    if "://" in local or not os.path.exists(local):
        return df
    sizes = []
    if os.path.isdir(local):
        for entry in os.scandir(local):
            if entry.is_file() and not entry.name.startswith(("_", ".")):
                sizes.append(entry.stat().st_size)
    else:
        sizes.append(os.path.getsize(local))
    total_bytes = sum(sizes)
    try:
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        mpb = _parse_bytes(raw)
    except Exception:
        mpb = 134217728
    cores = spark.sparkContext.defaultParallelism
    est_splits = sum(-(-s // mpb) for s in sizes)
    if total_bytes >= _MIN_BYTES and est_splits < cores // 2:
        return df.repartition(cores)
    return df


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "global_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 0-based global IDs in ``order_cols`` order WITHOUT a
    single-task global sort — the stable-sample-ID / shard-offset op a
    training pipeline needs at corpus scale.

    The naive ``row_number() OVER (ORDER BY …)`` range-partitions into ONE
    partition: every row flows through a single task. This is the classic
    two-phase formulation instead: range-partition on the order columns
    (parallel), rank WITHIN each partition, then add per-partition offsets
    (a partition-count-sized prefix sum joined back broadcast). IDs are
    identical to the naive formulation for any UNIQUE total order —
    required of ``order_cols``; ties would make both formulations
    nondeterministic anyway.

    The partition id is materialized once and the frame persisted so the
    offset table and the rank pass see the SAME partitioning even if the
    two jobs would otherwise re-execute the exchange. The cache entry
    lives until the result is garbage-collected or the session ends;
    callers assigning IDs to MANY tables in one session should
    ``spark.catalog.clearCache()`` between batches (the result itself
    never needs the cache again once materialized to a sink).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    part = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *order_cols
    ).withColumn("_pid", F.spark_partition_id())
    part.persist()
    sizes = part.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.select(
        "_pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn("_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def two_phase_window(
    df: DataFrame,
    order_exprs: list,
    rank_col: str | None = None,
    cumsum: dict[str, str] | None = None,
    cummax_excl: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ROW_NUMBER and/or running SUMs over a total order WITHOUT the
    single-task sort of an unpartitioned ``Window.orderBy`` — the general
    form of :func:`assign_global_ids` for arbitrary sort directions and
    running aggregates.

    ``ROW_NUMBER() OVER (ORDER BY …)`` / ``SUM(x) OVER (ORDER BY … ROWS
    UNBOUNDED PRECEDING)`` range-partition into ONE partition: every row
    flows through a single core — the classic 100 TB scale-killer even
    when the input is an aggregated rollup (hundreds of millions of
    customers / vocabulary-pair rows). Two-phase instead: range-partition
    on the order expressions (parallel), rank / running-sum WITHIN each
    partition, then add per-partition offsets (a partition-count-sized
    prefix table joined back broadcast). Results are identical to the
    naive formulation for any UNIQUE total order — required of
    ``order_exprs``; ties would make both formulations nondeterministic.

    Args:
        order_exprs: sort ``Column`` expressions (``F.desc("freq")``,
            ``F.asc("term")``) — passed to both ``repartitionByRange`` and
            the within-partition window so the two phases agree.
        rank_col: if set, appended 1-based global row number (long).
        cumsum: ``{out_col: value_col_name}`` — each appended as the
            inclusive global running sum of that column over the order.
        cummax_excl: ``{out_col: value_col_name}`` — each appended as the
            EXCLUSIVE (strictly-preceding rows) global running max over
            the order; NULL on the global first row. Max is associative,
            so the same partition-prefix trick applies: per-partition
            maxes feed a broadcast prefix table, ``greatest`` (null-
            skipping) combines prefix and within-partition frames. The
            strict frame is what dominance tests need (Pareto frontier:
            "best value among rows strictly before me").

    The range-partitioned frame is persisted so the offset table and the
    rank pass see the SAME partitioning (same caveat as
    :func:`assign_global_ids`). The tiny offsets window (one row per
    shuffle partition, keyed ``_pid``) is the ONLY single-partition window
    this engine permits — bounded by partition count, never by data.

    Cache lifetime: each call leaves one persisted frame behind (a query
    chaining three ranks, e.g. customer_rfm, leaves three). The entries
    are input-sized and die with the session, but a long driver session
    running many such queries should ``spark.catalog.clearCache()``
    between batches — bench.py does so per family, and the repo-wide
    plan-gate test does so per query — the same caveat as
    :func:`assign_global_ids`.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    cumsum = cumsum or {}
    cummax_excl = cummax_excl or {}
    part = df.repartitionByRange(
        *([num_partitions] if num_partitions else []), *order_exprs
    ).withColumn("_pid", F.spark_partition_id())
    part.persist()
    sizes = part.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(src).alias(f"_ps_{out}") for out, src in cumsum.items()],
        *[F.max(src).alias(f"_pm_{out}") for out, src in cummax_excl.items()],
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        *[
            F.coalesce(F.sum(f"_ps_{out}").over(w_off), F.lit(0)).alias(f"_po_{out}")
            for out in cumsum
        ],
        *[
            F.max(f"_pm_{out}").over(w_off).alias(f"_pmo_{out}")
            for out in cummax_excl
        ],
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_exprs)
    w_run = w_in.rowsBetween(Window.unboundedPreceding, 0)
    w_excl = w_in.rowsBetween(Window.unboundedPreceding, -1)
    out = part.withColumn("_rn", F.row_number().over(w_in))
    for out_col, src in cumsum.items():
        out = out.withColumn(f"_pc_{out_col}", F.sum(src).over(w_run))
    for out_col, src in cummax_excl.items():
        out = out.withColumn(f"_pe_{out_col}", F.max(src).over(w_excl))
    out = out.join(F.broadcast(offsets), "_pid")
    if rank_col:
        out = out.withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
    for out_col in cumsum:
        out = out.withColumn(
            out_col, F.col(f"_po_{out_col}") + F.col(f"_pc_{out_col}")
        ).drop(f"_pc_{out_col}", f"_po_{out_col}")
    for out_col in cummax_excl:
        # greatest() skips NULLs: global-first row (no prefix, no within
        # frame) stays NULL — "no strictly-preceding element"
        out = out.withColumn(
            out_col, F.greatest(F.col(f"_pmo_{out_col}"), F.col(f"_pe_{out_col}"))
        ).drop(f"_pe_{out_col}", f"_pmo_{out_col}")
    return out.drop("_pid", "_rn", "_off")
