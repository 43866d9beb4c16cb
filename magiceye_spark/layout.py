"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

At 100 TB the dominant query cost is the scan, and the dominant scan
lever after partition pruning is ROW-GROUP pruning — parquet min/max
statistics skipping whole row groups. A table sorted on one column prunes
predicates on that column only; a table written along a Z-order curve
interleaves the bits of several columns so that files/row groups are
simultaneously narrow in ALL of them, and predicates on any subset prune.
This is the same layout optimization Delta Lake's OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite apply; here it is expressed with plain
DataFrame ops so it works on any parquet lake:

1. one tiny stats job computes per-column min/max (a single partial agg);
2. each column is bucketized to ``bits``-bit integers MAP-SIDE by pure
   integer arithmetic (no window, no sort, no shuffle);
3. bits are interleaved into the Morton code with shift/or chains that
   stay inside whole-stage codegen;
4. ``repartitionByRange`` on the code (one range shuffle — the same cost
   any global sort pays) + ``sortWithinPartitions`` → write.

The curve math is engine-exact integer arithmetic, so `zorder_histogram`
is oracle-checked against DuckDB computing the identical interleave.
"""

from __future__ import annotations

import functools
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_CURVE_DTYPES = ("tinyint", "smallint", "int", "bigint", "float", "double",
                 "decimal", "date", "timestamp", "timestamp_ntz")


def _to_int(col: Column, dtype: str) -> Column:
    """Normalize a column to a non-negative BIGINT domain value. Only
    numeric/temporal columns have a meaningful linear order for the
    curve — reject anything else loudly instead of CAST-to-NULL silently
    collapsing the whole dimension to one bucket."""
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        return F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    if not dtype.startswith(_CURVE_DTYPES):
        raise ValueError(
            f"z-order curve columns must be numeric or date/timestamp, got {dtype!r}"
            " — hash or dictionary-encode string keys first"
        )
    return col.cast("bigint")


def _bucket_shift(cmin: int, cmax: int, bits: int) -> int:
    """Signed shift that maps [0, cmax-cmin] onto EXACTLY ``bits`` bits:
    positive → shift right (large domain compressed), negative → shift
    LEFT (small domain scaled up). Using the full width for every column
    matters — with lopsided bit usage the interleave degenerates toward a
    plain sort on the wider column and the narrow column stops
    clustering. Pure bit arithmetic — no division, no doubles — so the
    bucket id is bit-identical on every engine at any domain size
    (floor-division via doubles loses bits past 2^53)."""
    top = max(int(cmax) - int(cmin), 1)  # largest value to be shifted
    return top.bit_length() - bits


def interleave_bits(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton code: bit j of column c lands at position j*k + c (k = number
    of columns). A chain of shift/and/or expressions — all JVM-side,
    whole-stage-codegen friendly; 2-col × 16-bit = 32 terms."""
    k = len(cols)
    terms = []
    for c_idx, col in enumerate(cols):
        for j in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, j).bitwiseAND(F.lit(1)), j * k + c_idx
                )
            )
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zvalue")


def zorder_code(
    df: DataFrame, cols: Sequence[str], stats: dict[str, tuple[int, int]], bits: int = 16
) -> Column:
    """The Z-value column for ``cols`` given precomputed per-column
    (min, max) stats. Map-side only."""
    dtypes = dict(df.dtypes)
    bucketed = []
    for c in cols:
        v = _to_int(F.col(c), dtypes[c])
        cmin, cmax = stats[c]
        shift = _bucket_shift(cmin, cmax, bits)
        shifted = v - F.lit(int(cmin))
        bucketed.append(
            F.shiftright(shifted, shift) if shift >= 0 else F.shiftleft(shifted, -shift)
        )
    return interleave_bits(bucketed, bits)


def column_stats(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[int, int]]:
    """One partial-aggregate job for all mins/maxes (KB-sized result)."""
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        v = _to_int(F.col(c), dtypes[c])
        aggs += [F.min(v).alias(f"_min_{c}"), F.max(v).alias(f"_max_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_min_{c}"], row[f"_max_{c}"]) for c in cols}


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 32,
    bits: int = 16,
) -> dict[str, tuple[int, int]]:
    """Rewrite ``df`` clustered along the Z-order curve of ``cols``:
    range-partition by Morton code (one shuffle, the cost of any global
    sort) and sort within partitions so parquet row-group min/max stats
    are tight in EVERY curve dimension. Returns the stats used (persist
    them to bucketize future appends identically)."""
    stats = column_stats(df, cols)
    z = zorder_code(df, cols, stats, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return stats


def file_span_profile(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file (min, max, span) of each layout column — the observable a
    layout rewrite moves: tight per-file spans ⇒ row-group/file pruning
    for predicates on those columns. Reads only the columns profiled."""
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        v = _to_int(F.col(c), dtypes[c])
        aggs += [
            (F.max(v) - F.min(v)).alias(f"span_{c}"),
        ]
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )


def sql_zorder_histogram(bits: int = 8, top_bits: int = 6) -> str:
    """DuckDB twin of :func:`zorder_histogram` — the identical integer
    bucketize + interleave, aggregated by the curve's top bits."""
    k = 2
    terms_a = " | ".join(f"(((ba >> {j}) & 1) << {j * k})" for j in range(bits))
    terms_b = " | ".join(f"(((bb >> {j}) & 1) << {j * k + 1})" for j in range(bits))
    shift = 2 * bits - top_bits
    # bit_length(x) == LENGTH(FORMAT('{{:b}}', x)) — exact integer math,
    # mirroring layout._bucket_shift (no doubles anywhere)
    return f"""
WITH ints AS (
  SELECT CAST(l_partkey AS BIGINT) AS a,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS b
  FROM lineitem
),
stats AS (
  SELECT MIN(a) AS amin, MAX(a) AS amax, MIN(b) AS bmin, MAX(b) AS bmax FROM ints
),
shifts AS (
  SELECT amin, bmin,
         LENGTH(FORMAT('{{:b}}', GREATEST(amax - amin, 1))) - {bits} AS sa,
         LENGTH(FORMAT('{{:b}}', GREATEST(bmax - bmin, 1))) - {bits} AS sb
  FROM stats
),
bucketed AS (
  SELECT CASE WHEN sa >= 0 THEN (a - amin) >> sa ELSE (a - amin) << (-sa) END AS ba,
         CASE WHEN sb >= 0 THEN (b - bmin) >> sb ELSE (b - bmin) << (-sb) END AS bb
  FROM ints, shifts
),
z AS (SELECT ({terms_a}) | ({terms_b}) AS zvalue FROM bucketed)
SELECT CAST(zvalue >> {shift} AS BIGINT) AS z_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM z GROUP BY 1 ORDER BY 1
"""


def zorder_histogram(
    spark, sf_dir: str, bits: int = 8, top_bits: int = 6
) -> DataFrame:
    """Row counts per top-``top_bits`` Z-curve prefix of lineitem
    (l_partkey × l_shipdate) — the balance diagnostic a layout job reads
    before choosing file counts (a skewed curve prefix means a skewed
    rewrite task). Deterministic integer math, oracle-checked."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stats = column_stats(l, ["l_partkey", "l_shipdate"])
    z = zorder_code(l, ["l_partkey", "l_shipdate"], stats, bits)
    shift = 2 * bits - top_bits
    return (
        l.select(z)
        .groupBy(F.shiftright("zvalue", shift).cast("bigint").alias("z_prefix"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("z_prefix")
    )


def build_zonemap(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file zone map: (file, <col>_min, <col>_max per column) — the
    vanilla-parquet equivalent of Delta/Iceberg file statistics, built
    with one column-pruned scan and persisted KB-sized. Pair with
    :func:`zorder_write` (tight per-file spans in every curve dimension)
    and :func:`pruned_read` to skip files at PLANNING time — vanilla
    Spark only skips parquet row groups inside tasks; this skips whole
    files before tasks are even scheduled."""
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        v = _to_int(F.col(c), dtypes[c])
        aggs += [F.min(v).alias(f"{c}_min"), F.max(v).alias(f"{c}_max")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read(
    spark,
    zonemap: DataFrame,
    predicates: dict[str, tuple[int, int]],
) -> DataFrame:
    """Read ONLY the files whose zone-map interval intersects every
    ``col: (lo, hi)`` predicate box (bounds in the zone map's integer
    domain — days since epoch for date/timestamp columns). Returns the
    union of surviving files as a DataFrame; apply the exact row filter
    on top (zone pruning is conservative, never wrong). The zonemap is
    catalog-sized, so the intersection runs driver-side — the same
    planning-time file skipping a lakehouse table format does from its
    transaction log."""
    cond = None
    for c, (lo, hi) in predicates.items():
        k = (F.col(f"{c}_max") >= F.lit(int(lo))) & (F.col(f"{c}_min") <= F.lit(int(hi)))
        cond = k if cond is None else (cond & k)
    files = [r["file"] for r in zonemap.where(cond).select("file").collect()]
    if not files:
        empty = spark.read.parquet(*[r["file"] for r in zonemap.select("file").limit(1).collect()])
        return empty.where(F.lit(False))
    return spark.read.parquet(*files)


def quantile_cuts(
    df: DataFrame, cols: Sequence[str], bits: int = 8, rel_err: float = 0.001
) -> dict[str, list[float]]:
    """Per-column quantile cut points (2**bits − 1 interior cuts) from the
    Greenwald-Khanna sketch (``approxQuantile`` — one pass, bounded driver
    result). The skew-robust alternative to min/max stats: an equi-width
    curve collapses when a column is power-law (most buckets empty, one
    bucket holds everything); quantile buckets hold ~equal row counts by
    construction, so the curve — and the file sizes of the rewrite —
    stay balanced under any marginal distribution."""
    nb = 1 << bits
    qs = [i / nb for i in range(1, nb)]
    dtypes = dict(df.dtypes)
    tmp = df.select(
        *[_to_int(F.col(c), dtypes[c]).cast("double").alias(c) for c in cols]
    )
    return {c: tmp.approxQuantile(c, qs, rel_err) for c in cols}


def zorder_code_quantile(
    df: DataFrame, cols: Sequence[str], cuts: dict[str, list[float]], bits: int = 8
) -> Column:
    """Z-value with QUANTILE buckets: bucket(v) = #cuts ≤ v, computed as a
    size(filter(literal_array)) expression — per-row O(2**bits) JVM ops,
    no join, no UDF. Same Morton interleave as the equi-width path."""
    dtypes = dict(df.dtypes)
    bucketed = []
    for c in cols:
        v = _to_int(F.col(c), dtypes[c]).cast("double")
        arr = F.array(*[F.lit(float(x)) for x in cuts[c]])
        bucketed.append(F.size(F.filter(arr, lambda x: x <= v)).cast("bigint"))
    return interleave_bits(bucketed, bits)


def zorder_write_quantile(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 32,
    bits: int = 8,
) -> dict[str, list[float]]:
    """:func:`zorder_write` with quantile buckets — use when a curve
    column is skewed. Returns the cut points (persist them to bucketize
    future appends identically)."""
    cuts = quantile_cuts(df, cols, bits)
    z = zorder_code_quantile(df, cols, cuts, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return cuts


def sql_zorder_histogram_k(
    col_exprs: Sequence[str], bits: int = 6, top_bits: int = 6
) -> str:
    """k-column DuckDB twin of the curve histogram: same shift-based
    buckets and interleave for any column count (bit j of column c lands
    at position j·k + c)."""
    k = len(col_exprs)
    names = [f"c{i}" for i in range(k)]
    ints = ", ".join(f"CAST({e} AS BIGINT) AS {n}" for e, n in zip(col_exprs, names))
    stats = ", ".join(
        f"MIN({n}) AS {n}_mn, MAX({n}) AS {n}_mx" for n in names
    )
    shifts = ", ".join(
        f"LENGTH(FORMAT('{{:b}}', GREATEST({n}_mx - {n}_mn, 1))) - {bits} AS {n}_s"
        for n in names
    )
    buckets = ", ".join(
        f"CASE WHEN {n}_s >= 0 THEN ({n} - {n}_mn) >> {n}_s "
        f"ELSE ({n} - {n}_mn) << (-{n}_s) END AS b_{n}"
        for n in names
    )
    terms = " | ".join(
        f"(((b_{n} >> {j}) & 1) << {j * k + i})"
        for i, n in enumerate(names)
        for j in range(bits)
    )
    shift = k * bits - top_bits
    return f"""
WITH ints AS (SELECT {ints} FROM lineitem),
stats AS (SELECT {stats} FROM ints),
shifts AS (SELECT *, {shifts} FROM stats),
bucketed AS (SELECT {buckets} FROM ints, shifts),
z AS (SELECT {terms} AS zvalue FROM bucketed)
SELECT CAST(zvalue >> {shift} AS BIGINT) AS z_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM z GROUP BY 1 ORDER BY 1
"""


def zorder_histogram_k(
    spark, sf_dir: str, cols: Sequence[str], bits: int = 6, top_bits: int = 6
) -> DataFrame:
    """k-column curve-prefix histogram over lineitem — same balance
    diagnostic as :func:`zorder_histogram`, any column count."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    stats = column_stats(l, list(cols))
    z = zorder_code(l, list(cols), stats, bits)
    shift = len(cols) * bits - top_bits
    return (
        l.select(z)
        .groupBy(F.shiftright("zvalue", shift).cast("bigint").alias("z_prefix"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("z_prefix")
    )
