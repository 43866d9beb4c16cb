"""Per-column table profiling: the first look at any new table and the
cheap pre-check before a row-level diff (a column whose profile moved is
where the datadiff will light up).

The reference has no profiling surface (its scans read catalog metadata
only — SURVEY §2.3); this is extension surface, designed Spark-first: ONE
aggregation pass computes every column's stats map-side (count/nulls/
min/max/avg are all partial-aggregable), then the single wide row pivots to
one row per column with an explode — no per-column scans, no driver loop.

Distinct counts are the one stat with a scale trade: exact
``countDistinct`` per column makes Catalyst expand the input once per
distinct aggregate (row multiplication), while ``approx=True`` switches to
HyperLogLog sketches — one pass, KB-sized mergeable state, ±2% — which is
what you run at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all) → one row per column:
    (column, n_rows, n_nulls, null_rate, n_distinct, min, max, avg).

    min/max are rendered as strings so heterogeneous column types share one
    schema; avg is NULL for non-numeric columns."""
    columns = columns or df.columns
    dtypes = dict(df.dtypes)
    nd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__nn"),
            nd(col).alias(f"{c}__nd"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            (
                F.round(F.avg(col), 4)
                if _is_numeric(dtypes[c])
                else F.lit(None).cast("double")
            ).alias(f"{c}__avg"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.round((F.col("_n") - F.col(f"{c}__nn")) / F.col("_n"), 4).alias(
                    "null_rate"
                ),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__avg").alias("avg"),
            )
            for c in columns
        ]
    )
    return (
        wide.select(F.explode(per_col).alias("p")).select("p.*").orderBy("column")
    )


def sql_profile_table(
    table: str, columns: list[str], numeric: set[str], order_by: bool = True
) -> str:
    """DuckDB oracle: one SELECT per column, unioned — same stats, exact.
    ``order_by=False`` yields a CTE-composable body (see
    :func:`sql_profile_drift`)."""
    parts = []
    for c in columns:
        avg = f"ROUND(AVG({c}), 4)" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"""
SELECT '{c}' AS "column", COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       ROUND((COUNT(*) - COUNT({c})) / CAST(COUNT(*) AS DOUBLE), 4) AS null_rate,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min, CAST(MAX({c}) AS VARCHAR) AS max,
       {avg} AS avg
FROM {table}""")
    body = " UNION ALL ".join(parts)
    return body + ' ORDER BY "column"' if order_by else body


def sql_profile_drift(
    base_table: str,
    target_table: str,
    columns: list[str],
    numeric: set[str],
    tol: float = 0.01,
) -> str:
    """DuckDB oracle for :func:`profile_drift` over two tables/CTEs —
    profiles both sides and applies the identical moved-column predicate.
    Emitted WITHOUT a leading WITH so callers can prepend their own CTEs
    (prefix ``", bp AS …"`` composes after an existing WITH clause)."""
    bp = sql_profile_table(base_table, columns, numeric, order_by=False)
    tp = sql_profile_table(target_table, columns, numeric, order_by=False)
    return f"""bp AS ({bp}), tp AS ({tp})
SELECT bp."column", bp.n_rows, bp.n_nulls, bp.null_rate, bp.n_distinct,
       bp."min", bp."max", bp."avg",
       tp.n_rows AS n_rows_t, tp.n_nulls AS n_nulls_t,
       tp.null_rate AS null_rate_t, tp.n_distinct AS n_distinct_t,
       tp."min" AS min_t, tp."max" AS max_t, tp."avg" AS avg_t
FROM bp JOIN tp ON bp."column" = tp."column"
WHERE ABS(bp.null_rate - tp.null_rate) > {tol}
   OR (bp."avg" IS NOT NULL AND tp."avg" IS NOT NULL
       AND ABS(bp."avg" - tp."avg") > {tol} * GREATEST(ABS(bp."avg"), 1e-9))
   OR bp."min" IS DISTINCT FROM tp."min"
   OR bp."max" IS DISTINCT FROM tp."max"
   OR bp.n_distinct <> tp.n_distinct
ORDER BY bp."column"\n"""


def profile_drift(
    base_profile: DataFrame, target_profile: DataFrame, tol: float = 0.01
) -> DataFrame:
    """Columns whose profile moved between two snapshots: joins the two
    profiles and keeps rows where null_rate or avg shifted by more than
    ``tol`` (relative for avg), or min/max/n_distinct changed at all —
    the catalog-sized pre-check that tells you WHICH columns to row-diff."""
    t = target_profile.select(
        "column",
        *[
            F.col(c).alias(f"{c}_t")
            for c in target_profile.columns
            if c != "column"
        ],
    )
    j = base_profile.join(t, "column")
    null_moved = F.abs(F.col("null_rate") - F.col("null_rate_t")) > tol
    avg_moved = (
        F.col("avg").isNotNull()
        & F.col("avg_t").isNotNull()
        & (
            F.abs(F.col("avg") - F.col("avg_t"))
            > tol * F.greatest(F.abs(F.col("avg")), F.lit(1e-9))
        )
    )
    bounds_moved = (
        ~F.col("min").eqNullSafe(F.col("min_t"))
        | ~F.col("max").eqNullSafe(F.col("max_t"))
        | (F.col("n_distinct") != F.col("n_distinct_t"))
    )
    return j.where(null_moved | avg_moved | bounds_moved).orderBy("column")


def psi_histogram_drift(
    base: DataFrame, target: DataFrame, col: str, n_bins: int = 10
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the distribution-level drift metric :func:`profile_drift`'s
    summary stats can't see (same mean/min/max, different shape).

    Equi-width bins over the COMBINED min/max (one tiny agg broadcast to
    both sides), Laplace-smoothed proportions, per-bin
    ``(p−q)·ln(p/q)`` terms. One histogram aggregation per side — two
    scans total, KB-sized result; at 100 TB this is the cheap daily
    monitor that decides whether to run the expensive row diff.
    Bin assignment and log terms are identical IEEE-double expressions on
    Spark and DuckDB, and the per-bin output avoids cross-row summation —
    fully oracle-checkable. PSI > 0.2 is the conventional alert level.
    """
    v = F.col(col).cast("double")
    both = base.select(v.alias("_v")).unionAll(target.select(v.alias("_v")))
    # collect the 2-value stats row ONCE and bin against literals — left
    # lazy under each side's histogram, the stats subtree (a scan of BOTH
    # sides) would re-execute per side: 3× the scan cost at 100 TB
    srow = both.agg(F.min("_v").alias("_mn"), F.max("_v").alias("_mx")).collect()[0]
    mn, mx = float(srow["_mn"]), float(srow["_mx"])

    def hist(df: DataFrame, side: str) -> DataFrame:
        b = df.select(
            F.least(
                F.floor((v - F.lit(mn)) * n_bins / F.lit(mx - mn)).cast("int"),
                F.lit(n_bins - 1),
            ).alias("bin")
        )
        return b.groupBy("bin").agg(F.count(F.lit(1)).alias(f"n_{side}"))

    hb, ht = hist(base, "base"), hist(target, "target")
    bins = (
        base.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
        .join(hb, "bin", "left")
        .join(ht, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_target", F.lit(0)).alias("n_target"),
        )
    )
    # bin totals as a scalar aggregate crossJoined back broadcast — the
    # bins frame is n_bins rows so a SUM() OVER () would be harmless, but
    # the agg form keeps every registered plan free of single-partition
    # windows (pinned in tests/test_plans.py)
    totals = bins.agg(
        F.sum("n_base").alias("_tb"), F.sum("n_target").alias("_tt")
    )
    bins = bins.crossJoin(F.broadcast(totals))
    p = (F.col("n_base") + 0.5) / (F.col("_tb") + 0.5 * n_bins)
    q = (F.col("n_target") + 0.5) / (F.col("_tt") + 0.5 * n_bins)
    return (
        bins.select(
            "bin",
            "n_base",
            "n_target",
            F.round(p, 6).alias("p_base"),
            F.round(q, 6).alias("p_target"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


def sql_psi_histogram_drift(
    base_where: str, target_where: str, col: str, n_bins: int = 10
) -> str:
    """DuckDB twin: identical binning/smoothing/log expressions over two
    WHERE-filtered views of the events table."""
    return f"""
WITH v AS (SELECT CAST({col} AS DOUBLE) AS _v,
                  CASE WHEN {base_where} THEN 'b'
                       WHEN {target_where} THEN 't' END AS side
           FROM events),
stats AS (SELECT MIN(_v) AS mn, MAX(_v) AS mx FROM v WHERE side IS NOT NULL),
binned AS (
  SELECT side,
         LEAST(CAST(FLOOR((_v - mn) * {n_bins} / (mx - mn)) AS INT), {n_bins - 1}) AS bin
  FROM v, stats WHERE side IS NOT NULL),
h AS (
  SELECT bin,
         COUNT(*) FILTER (side = 'b') AS n_base,
         COUNT(*) FILTER (side = 't') AS n_target
  FROM binned GROUP BY bin),
bins AS (
  SELECT i.range AS bin, COALESCE(n_base, 0) AS n_base, COALESCE(n_target, 0) AS n_target
  FROM range({n_bins}) i LEFT JOIN h ON h.bin = i.range),
tot AS (SELECT SUM(n_base) AS tb, SUM(n_target) AS tt FROM bins)
SELECT CAST(bin AS INT) AS bin, n_base, n_target,
       ROUND((n_base + 0.5) / (tb + 0.5 * {n_bins}), 6) AS p_base,
       ROUND((n_target + 0.5) / (tt + 0.5 * {n_bins}), 6) AS p_target,
       ROUND(((n_base + 0.5) / (tb + 0.5 * {n_bins}) - (n_target + 0.5) / (tt + 0.5 * {n_bins}))
             * LN(((n_base + 0.5) / (tb + 0.5 * {n_bins})) / ((n_target + 0.5) / (tt + 0.5 * {n_bins}))), 6) AS psi_term
FROM bins, tot
ORDER BY bin
"""
