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
