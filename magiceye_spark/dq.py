"""Declarative data-quality checks — the monitoring companion to the diff
engine (diff says *what changed*; this says *what's broken*).

One aggregate pass per table evaluates every rule (conditional counts share
the scan and the single shuffle); referential checks add one anti-join per
referenced table. Output is a findings-style DataFrame:
(check, column, violations, total, pass) — same structured-first philosophy
as the schema diff (strings rendered at the edge, not in the operator).

At 100 TB: all row-local rules cost one scan regardless of rule count;
uniqueness adds one distinct aggregation on the key; referential integrity
is a broadcast anti-join when the referenced key set is dimension-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rules:
    """Rule set for one table."""

    not_null: list[str] = field(default_factory=list)
    unique: list[list[str]] = field(default_factory=list)       # key tuples
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)
    accepted: dict[str, list[str]] = field(default_factory=dict)
    #: column -> (referenced DataFrame, referenced column)
    references: dict[str, tuple[DataFrame, str]] = field(default_factory=dict)


def check_quality(df: DataFrame, rules: Rules) -> DataFrame:
    """Evaluate every rule; one row per rule with its violation count."""
    total = F.count(F.lit(1))
    aggs, labels = [], []

    for c in rules.not_null:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)))
        labels.append(("not_null", c))
    for c, (lo, hi) in rules.ranges.items():
        aggs.append(F.count(F.when(~F.col(c).between(lo, hi), 1)))
        labels.append(("range", c))
    for c, vals in rules.accepted.items():
        aggs.append(F.count(F.when(~F.col(c).isin(*vals), 1)))
        labels.append(("accepted_values", c))

    spark = df.sparkSession
    out = None

    if aggs:
        row = df.agg(total.alias("_total"), *[a.alias(f"_v{i}") for i, a in enumerate(aggs)])
        # ONE row → explode into one output row per rule. A per-rule
        # select + union would repeat the aggregate subtree (and its full
        # scan) once per rule in the plan — k scans for k scalar rules.
        entries = F.array(
            *[
                F.struct(
                    F.lit(kind).alias("check"),
                    F.lit(col).alias("column"),
                    F.col(f"_v{i}").alias("violations"),
                )
                for i, (kind, col) in enumerate(labels)
            ]
        )
        out = (
            row.select("_total", F.explode(entries).alias("e"))
            .select(
                "e.check",
                "e.column",
                "e.violations",
                F.col("_total").alias("total"),
                (F.col("e.violations") == 0).alias("pass"),
            )
        )

    for key in rules.unique:
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.coalesce(F.sum(F.when(F.col("_n") > 1, F.col("_n"))), F.lit(0)).alias("violations"),
                F.sum("_n").alias("total"),
            )
            .select(
                F.lit("unique").alias("check"),
                F.lit(",".join(key)).alias("column"),
                "violations",
                "total",
                (F.col("violations") == 0).alias("pass"),
            )
        )
        out = dup if out is None else out.unionByName(dup)

    for col, (ref_df, ref_col) in rules.references.items():
        orphan = (
            df.select(F.col(col))
            .join(ref_df.select(F.col(ref_col).alias(col)).distinct(), col, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
        )
        n = df.agg(F.count(F.lit(1)).alias("total"))
        ref = orphan.crossJoin(n).select(
            F.lit("referential").alias("check"),
            F.lit(col).alias("column"),
            "violations",
            "total",
            (F.col("violations") == 0).alias("pass"),
        )
        out = ref if out is None else out.unionByName(ref)

    if out is None:
        raise ValueError("Rules is empty — nothing to check")
    return out.orderBy("check", "column")


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
    assume_unique_parents: bool = False,
) -> DataFrame:
    """Whole-schema FK conformance: one row per declared relation
    ``(relation, n_child_rows, n_orphans, pass)``.

    ``relations`` entries are ``(name, child_df, child_col, parent_df,
    parent_col)``. Relations are GROUPED BY CHILD (plan-semantic identity,
    so two ``read_table`` calls for the same table share a group): a child
    with k declared FKs is scanned ONCE, feeding k chained existence joins
    against the parents' distinct key sets, and all k orphan counts plus the
    row count come out of one aggregate — at 100 TB that reads the fact
    table once instead of 2k times. Parent key sets are distinct-reduced
    (keys only, no payloads) and broadcast when small (AQE downgrades to a
    shuffle join for warehouse-sized parents); a NULL child key matches
    nothing and counts as an orphan, identical to the anti-join semantics
    this replaces. Output is relation-count-sized. The cross-table
    complement to per-table ``check_quality``.

    ``assume_unique_parents=True`` skips the per-parent distinct: when the
    referenced columns are declared primary/unique keys (the normal FK
    case), the dedup shuffle per parent buys nothing — the audit's only
    remaining exchanges are the one-row aggregates."""
    if not relations:
        raise ValueError("no relations declared")

    def _plan_key(df: DataFrame):
        try:
            return df._jdf.queryExecution().analyzed().semanticHash()
        except Exception:
            return id(df)

    groups: dict = {}
    for name, child, child_col, parent, parent_col in relations:
        key = _plan_key(child)
        groups.setdefault(key, (child, []))[1].append((name, child_col, parent, parent_col))

    out = None
    for child, rels in groups.values():
        j = child.select(*sorted({ccol for _, ccol, _, _ in rels}))
        for i, (_, ccol, parent, pcol) in enumerate(rels):
            pk = parent.select(F.col(pcol).alias(f"_pk{i}"))
            if not assume_unique_parents:
                pk = pk.distinct()
            j = j.join(F.broadcast(pk), F.col(ccol) == F.col(f"_pk{i}"), "left")
        agg = j.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            *[
                F.count(F.when(F.col(f"_pk{i}").isNull(), 1)).alias(f"_o{i}")
                for i in range(len(rels))
            ],
        )
        # unpivot the one-row aggregate into one row per relation — a single
        # plan branch, so the child scan provably runs once
        rows = agg.select(
            "n_child_rows",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("relation"),
                            F.col(f"_o{i}").alias("n_orphans"),
                        )
                        for i, (name, _, _, _) in enumerate(rels)
                    ]
                )
            ).alias("_r"),
        ).select(
            F.col("_r.relation").alias("relation"),
            "n_child_rows",
            F.col("_r.n_orphans").alias("n_orphans"),
            (F.col("_r.n_orphans") == 0).alias("pass"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("relation")


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity check on a quasi-identifier column set: one summary row
    (k, n_groups, n_risky_groups, n_risky_rows, risky_row_frac) where a
    group smaller than ``k`` re-identifies its members — the
    data-governance gate run before sharing or training on user-adjacent
    tables. One aggregation over the quasi columns plus a catalog-sized
    rollup; at 100 TB the group-by is the only corpus-sized shuffle."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return groups.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0)).cast("long").alias("n_risky_groups"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)).cast("long").alias("n_risky_rows"),
        F.round(
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)) / F.lit(float(total)),
            6,
        ).alias("risky_row_frac"),
    )


def sql_k_anonymity(table: str, quasi_cols: list[str], k: int = 5) -> str:
    cols = ", ".join(quasi_cols)
    return f"""
WITH g AS (SELECT {cols}, COUNT(*) AS n FROM {table} GROUP BY {cols}),
t AS (SELECT COUNT(*) AS total FROM {table})
SELECT {k} AS k,
       COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN n < {k} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
       CAST(SUM(CASE WHEN n < {k} THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
       ROUND(SUM(CASE WHEN n < {k} THEN n ELSE 0 END) / CAST(total AS DOUBLE), 6) AS risky_row_frac
FROM g, t
GROUP BY total
"""


def l_diversity_audit(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """l-diversity companion to :func:`k_anonymity_audit`: a quasi-identifier
    group where the SENSITIVE column takes fewer than ``l`` distinct values
    leaks that attribute even when the group is k-anonymous (everyone in
    the group shares it). One summary row: (l, n_groups, n_leaky_groups,
    n_leaky_rows, leaky_row_frac). Same single corpus-sized groupBy."""
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive_col).alias("n_sens"),
    )
    total = df.count()
    return groups.agg(
        F.lit(l).alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_sens") < l, 1).otherwise(0)).cast("long").alias("n_leaky_groups"),
        F.sum(F.when(F.col("n_sens") < l, F.col("n")).otherwise(0)).cast("long").alias("n_leaky_rows"),
        F.round(
            F.sum(F.when(F.col("n_sens") < l, F.col("n")).otherwise(0)) / F.lit(float(total)),
            6,
        ).alias("leaky_row_frac"),
    )


def sql_l_diversity(
    table: str, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> str:
    cols = ", ".join(quasi_cols)
    return f"""
WITH g AS (SELECT {cols}, COUNT(*) AS n, COUNT(DISTINCT {sensitive_col}) AS n_sens
           FROM {table} GROUP BY {cols}),
t AS (SELECT COUNT(*) AS total FROM {table})
SELECT {l} AS l,
       COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN n_sens < {l} THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_groups,
       CAST(SUM(CASE WHEN n_sens < {l} THEN n ELSE 0 END) AS BIGINT) AS n_leaky_rows,
       ROUND(SUM(CASE WHEN n_sens < {l} THEN n ELSE 0 END) / CAST(total AS DOUBLE), 6) AS leaky_row_frac
FROM g, t
GROUP BY total
"""


def iqr_outlier_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Tukey-fence outlier profile across numeric columns in ONE pass:
    melt the columns into (column, value) rows, take exact interpolated
    quartiles per column, broadcast the fences back, and count values
    outside [q1 − 1.5·IQR, q3 + 1.5·IQR]. The per-column DQ screen that
    catches unit mix-ups and sensor spikes; exact percentiles are
    bit-identical to DuckDB quantile_cont."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.column", "e.v")
    fences = melted.groupBy("column").agg(
        F.expr("percentile(v, 0.25)").alias("q1"),
        F.expr("percentile(v, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        melted.join(F.broadcast(fences), "column")
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("q1"), 4).alias("q1"),
            F.round(F.min("q3"), 4).alias("q3"),
            F.sum(((F.col("v") < lo) | (F.col("v") > hi)).cast("int"))
            .cast("long")
            .alias("n_outliers"),
            F.round(
                F.sum(((F.col("v") < lo) | (F.col("v") > hi)).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("outlier_frac"),
        )
        .orderBy("column")
    )


def sql_iqr_outlier_profile(table: str, cols: list[str]) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS DOUBLE) AS v FROM {table}"
        for c in cols
    )
    return f"""
WITH m AS ({union}),
f AS (
  SELECT col_name, quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
  FROM m GROUP BY col_name)
SELECT m.col_name AS "column",
       COUNT(*) AS n,
       ROUND(MIN(f.q1), 4) AS q1,
       ROUND(MIN(f.q3), 4) AS q3,
       CAST(SUM(CASE WHEN m.v < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR m.v > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN m.v < f.q1 - 1.5 * (f.q3 - f.q1)
                        OR m.v > f.q3 + 1.5 * (f.q3 - f.q1)
                      THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_frac
FROM m JOIN f ON f.col_name = m.col_name
GROUP BY m.col_name
ORDER BY m.col_name
"""


def order_total_reconciliation(
    orders: DataFrame, lineitem: DataFrame, tolerance: float = 0.01
) -> DataFrame:
    """Cross-table reconciliation: recompute each order's total from its
    lines (Σ extendedprice·(1−discount)·(1+tax), exact decimals) and
    compare against the stored header total — the books-balance audit
    between a header table and its detail table. One row:
    orders checked / headers with no lines / matches within tolerance /
    match rate / max and mean absolute discrepancy. (On the synthetic
    testdata headers don't reconcile — which is exactly what the audit
    is for.)"""
    line_total = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                4,
            ).cast("decimal(18,4)")
        ).alias("computed")
    )
    joined = orders.select(
        "o_orderkey", F.round(F.col("o_totalprice"), 4).cast("decimal(18,4)").alias("stored")
    ).join(line_total, orders.o_orderkey == line_total.l_orderkey, "left")
    diff = F.abs((F.col("stored") - F.col("computed")).cast("double"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("computed").isNull().cast("int")).cast("long").alias("n_missing_lines"),
        F.sum((diff < tolerance).cast("int")).cast("long").alias("n_reconciled"),
        F.round(
            F.sum((diff < tolerance).cast("int"))
            / F.sum(F.col("computed").isNotNull().cast("int")),
            6,
        ).alias("reconciled_rate"),
        F.round(F.max(diff), 4).alias("max_abs_diff"),
        F.round(F.avg(diff), 4).alias("avg_abs_diff"),
    )


def sql_order_total_reconciliation(tolerance: float = 0.01) -> str:
    return f"""
WITH lt AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS DECIMAL(18,4))) AS computed
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT CAST(ROUND(o.o_totalprice, 4) AS DECIMAL(18,4)) AS stored, lt.computed,
         ABS(CAST(CAST(ROUND(o.o_totalprice, 4) AS DECIMAL(18,4)) - lt.computed AS DOUBLE)) AS d
  FROM orders o LEFT JOIN lt ON lt.l_orderkey = o.o_orderkey)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN computed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_lines,
       CAST(SUM(CASE WHEN d < {tolerance} THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
       ROUND(SUM(CASE WHEN d < {tolerance} THEN 1 ELSE 0 END)
             / CAST(SUM(CASE WHEN computed IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE), 6) AS reconciled_rate,
       ROUND(MAX(d), 4) AS max_abs_diff,
       ROUND(AVG(d), 4) AS avg_abs_diff
FROM j
"""


def benford_screen(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit screen over a positive numeric column:
    observed vs expected digit shares (log10(1 + 1/d)) and each digit's
    chi-square contribution — the fabrication/aggregation-artifact screen
    auditors run on financial columns. A flat or spiked distribution is a
    prompt to investigate, not proof. One aggregation on the first
    significant digit (pure math, no string casts)."""
    v = F.col(col).cast("double")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("long")
    digits = df.where(v > 0).select(digit.alias("digit"))
    total = digits.count()
    exp = F.log10(1 + 1 / F.col("digit").cast("double"))
    obs = F.col("n") / F.lit(float(total))
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(
                F.pow(obs - exp, 2) / exp * total, 4
            ).alias("chi2_contrib"),
        )
        .orderBy("digit")
    )


def sql_benford_screen(table: str, col: str) -> str:
    return f"""
WITH pos AS (SELECT CAST({col} AS DOUBLE) AS v FROM {table} WHERE {col} > 0),
t AS (SELECT COUNT(*) AS total FROM pos),
d AS (
  SELECT CAST(FLOOR(v / POW(10.0, FLOOR(LOG10(v)))) AS BIGINT) AS digit
  FROM pos),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
SELECT digit, n,
       ROUND(n / CAST(total AS DOUBLE), 6) AS observed,
       ROUND(LOG10(1 + 1 / CAST(digit AS DOUBLE)), 6) AS expected,
       ROUND(POW(n / CAST(total AS DOUBLE) - LOG10(1 + 1 / CAST(digit AS DOUBLE)), 2)
             / LOG10(1 + 1 / CAST(digit AS DOUBLE)) * total, 4) AS chi2_contrib
FROM c CROSS JOIN t
ORDER BY digit
"""


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    bin_width: float = 1000.0,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness companion to :func:`k_anonymity_audit` /
    :func:`l_diversity_audit`: a quasi-identifier group whose SENSITIVE
    distribution sits further than ``t`` (ordered earth-mover's distance)
    from the global distribution leaks the attribute even when the group
    is k-anonymous and l-diverse. The numeric sensitive column is binned
    at ``bin_width``; for an ordered attribute with m bins,
    EMD(P, Q) = Σ_i |Σ_{j<=i}(p_j − q_j)| / (m − 1).

    One summary row: (t, m_bins, n_groups, n_over_t, over_t_row_frac,
    max_emd). Exactness: p and q are integer-count divisions, the
    cumulative and the |·| total both run inside per-group windows
    ordered by bin (fixed IEEE summation order), and real outputs are
    emitted unrounded — bit-identical on any engine. Scale: one
    corpus-sized (quasi, bin) groupBy; the bin lattice is
    groups × m rows via a broadcast nested-loop join (m is a constant),
    and every window is partitioned by the quasi key."""
    from pyspark.sql.window import Window

    bin_col = F.floor(F.col(sensitive_col) / F.lit(bin_width)).cast("int")
    binned = df.select(*quasi_cols, bin_col.alias("bin"))
    gb_counts = binned.groupBy(*quasi_cols, "bin").agg(F.count(F.lit(1)).alias("c"))
    groups = gb_counts.groupBy(*quasi_cols).agg(F.sum("c").cast("long").alias("n_g"))
    bins = gb_counts.groupBy("bin").agg(F.sum("c").cast("long").alias("n_b"))
    scal = bins.agg(
        F.sum("n_b").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("m_bins"),
    )
    lattice = (
        groups.crossJoin(F.broadcast(bins))
        .join(gb_counts, [*quasi_cols, "bin"], "left")
        .crossJoin(F.broadcast(scal))
    )
    pq = (
        F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("n_g").cast("double")
    ) - (F.col("n_b").cast("double") / F.col("n_total").cast("double"))
    wcum = (
        Window.partitionBy(*quasi_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrank = Window.partitionBy(*quasi_cols).orderBy("bin")
    stepped = (
        lattice.withColumn("cum", F.sum(pq).over(wcum))
        .withColumn("acum", F.sum(F.abs(F.col("cum"))).over(wcum))
        .withColumn("brk", F.row_number().over(wrank))
    )
    per_group = stepped.where(F.col("brk") == F.col("m_bins")).select(
        *quasi_cols,
        "n_g",
        "n_total",
        "m_bins",
        # m_bins == 1 (bin_width wider than the value range): EMD over a
        # single ordered bin is trivially 0 — guarded, because the
        # unguarded /0 is NULL on Spark but inf/NaN on DuckDB's IEEE
        # division and would silently poison the CLI's --t-max gate
        F.when(
            F.col("m_bins") > 1,
            F.col("acum") / (F.col("m_bins") - 1).cast("double"),
        ).otherwise(F.lit(0.0)).alias("emd"),
    )
    return per_group.groupBy("n_total", "m_bins").agg(
        F.lit(t).alias("t"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("emd") > t, 1).otherwise(0)).cast("long").alias("n_over_t"),
        (
            F.sum(F.when(F.col("emd") > t, F.col("n_g")).otherwise(0)).cast("double")
            / F.col("n_total").cast("double")
        ).alias("over_t_row_frac"),
        F.max("emd").alias("max_emd"),
    ).select("t", "m_bins", "n_groups", "n_over_t", "over_t_row_frac", "max_emd")


def sql_t_closeness(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    bin_width: float = 1000.0,
    t: float = 0.2,
) -> str:
    cols = ", ".join(quasi_cols)
    qcols = ", ".join(f"g.{c}" for c in quasi_cols)
    joincond = " AND ".join(f"gc.{c} = g.{c}" for c in quasi_cols)
    return f"""
WITH binned AS (
  SELECT {cols}, CAST(FLOOR({sensitive_col} / {bin_width}) AS INTEGER) AS bin
  FROM {table}),
gb AS (SELECT {cols}, bin, COUNT(*) AS c FROM binned GROUP BY {cols}, bin),
grp AS (SELECT {cols}, CAST(SUM(c) AS BIGINT) AS n_g FROM gb GROUP BY {cols}),
bins AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS n_b FROM gb GROUP BY bin),
scal AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n_total, COUNT(*) AS m_bins FROM bins),
lattice AS (
  SELECT {qcols}, g.n_g, b.bin, b.n_b, s.n_total, s.m_bins,
         CAST(COALESCE(gc.c, 0) AS DOUBLE) / CAST(g.n_g AS DOUBLE)
           - CAST(b.n_b AS DOUBLE) / CAST(s.n_total AS DOUBLE) AS pq
  FROM grp g CROSS JOIN bins b CROSS JOIN scal s
  LEFT JOIN gb gc ON {joincond} AND gc.bin = b.bin),
stepped AS (
  SELECT *, SUM(pq) OVER w AS cum FROM lattice
  WINDOW w AS (PARTITION BY {cols} ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
stepped2 AS (
  SELECT *, SUM(ABS(cum)) OVER w AS acum,
         ROW_NUMBER() OVER (PARTITION BY {cols} ORDER BY bin) AS brk
  FROM stepped
  WINDOW w AS (PARTITION BY {cols} ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
per_group AS (
  SELECT {cols}, n_g, n_total, m_bins,
         CASE WHEN m_bins > 1 THEN acum / CAST(m_bins - 1 AS DOUBLE)
              ELSE 0.0 END AS emd
  FROM stepped2 WHERE brk = m_bins)
SELECT CAST({t} AS DOUBLE) AS t, m_bins, COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN emd > {t} THEN 1 ELSE 0 END) AS BIGINT) AS n_over_t,
       CAST(SUM(CASE WHEN emd > {t} THEN n_g ELSE 0 END) AS DOUBLE)
         / CAST(n_total AS DOUBLE) AS over_t_row_frac,
       MAX(emd) AS max_emd
FROM per_group
GROUP BY n_total, m_bins
"""


def functional_dependency_audit(
    df: DataFrame, deps: list[tuple[list[str], str]]
) -> DataFrame:
    """Functional-dependency check: for each declared ``lhs → rhs``, does
    every lhs value map to exactly one rhs value? The profiling step
    behind normalization review, denormalized-copy drift ("city no
    longer determined by zip"), and join-key sanity. One row per
    dependency: (dependency, n_lhs_values, n_violating_lhs,
    max_rhs_per_lhs, holds).

    One groupBy per dependency (map-side combined), unioned — each is the
    minimal corpus-sized shuffle for that key; the verdict rollup is
    catalog-sized."""
    out = None
    for lhs, rhs in deps:
        g = df.groupBy(*lhs).agg(F.countDistinct(rhs).alias("n_rhs"))
        row = g.agg(
            F.lit(", ".join(lhs) + " -> " + rhs).alias("dependency"),
            F.count(F.lit(1)).alias("n_lhs_values"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_lhs"),
            F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
            (F.max("n_rhs") == 1).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("dependency")


def sql_functional_dependency_audit(
    table: str, deps: list[tuple[list[str], str]]
) -> str:
    blocks = []
    for lhs, rhs in deps:
        cols = ", ".join(lhs)
        name = ", ".join(lhs) + " -> " + rhs
        blocks.append(f"""
SELECT '{name}' AS dependency,
       COUNT(*) AS n_lhs_values,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
       CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs,
       MAX(n_rhs) = 1 AS holds
FROM (SELECT {cols}, COUNT(DISTINCT {rhs}) AS n_rhs FROM {table} GROUP BY {cols})""")
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY dependency"


def pk_candidate_audit(df: DataFrame, candidates: list[list[str]]) -> DataFrame:
    """Primary-key candidate check: for each column set, how far is it
    from unique? One row per candidate: (candidate, n_rows, n_distinct,
    n_dup_rows, is_key). The discovery step before declaring a merge/diff
    key (datadiff's PK argument) or a bucketing column.

    NULL-containing rows disqualify a key and are counted distinctly from
    duplicates. One groupBy per candidate, unioned."""
    out = None
    for cand in candidates:
        any_null = None
        for c in cand:
            cond = F.col(c).isNull()
            any_null = cond if any_null is None else (any_null | cond)
        g = df.groupBy(*cand).agg(F.count(F.lit(1)).alias("n"))
        counts = g.agg(
            F.lit(", ".join(cand)).alias("candidate"),
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_dup_rows"),
        )
        nulls = df.agg(
            F.sum(F.when(any_null, 1).otherwise(0)).cast("long").alias("n_null_rows")
        )
        row = counts.crossJoin(F.broadcast(nulls)).select(
            "candidate",
            "n_rows",
            "n_distinct",
            "n_dup_rows",
            "n_null_rows",
            ((F.col("n_dup_rows") == 0) & (F.col("n_null_rows") == 0)).alias("is_key"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")


def sql_pk_candidate_audit(table: str, candidates: list[list[str]]) -> str:
    blocks = []
    for cand in candidates:
        cols = ", ".join(cand)
        name = ", ".join(cand)
        nullcond = " OR ".join(f"{c} IS NULL" for c in cand)
        blocks.append(f"""
SELECT '{name}' AS candidate,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       COUNT(*) AS n_distinct,
       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows,
       (SELECT CAST(SUM(CASE WHEN {nullcond} THEN 1 ELSE 0 END) AS BIGINT) FROM {table}) AS n_null_rows,
       SUM(CASE WHEN n > 1 THEN n ELSE 0 END) = 0
         AND (SELECT SUM(CASE WHEN {nullcond} THEN 1 ELSE 0 END) FROM {table}) = 0 AS is_key
FROM (SELECT {cols}, COUNT(*) AS n FROM {table} GROUP BY {cols})""")
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY candidate"
