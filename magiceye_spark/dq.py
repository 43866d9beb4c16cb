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
        parts = []
        for i, (kind, col) in enumerate(labels):
            parts.append(
                row.select(
                    F.lit(kind).alias("check"),
                    F.lit(col).alias("column"),
                    F.col(f"_v{i}").alias("violations"),
                    F.col("_total").alias("total"),
                    (F.col(f"_v{i}") == 0).alias("pass"),
                )
            )
        for p in parts:
            out = p if out is None else out.unionByName(p)

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
    relations: list[tuple[str, DataFrame, str, DataFrame, str]]
) -> DataFrame:
    """Whole-schema FK conformance: one row per declared relation
    ``(relation, n_child_rows, n_orphans, pass)``.

    ``relations`` entries are ``(name, child_df, child_col, parent_df,
    parent_col)``. Each relation costs one anti-join (shuffle on the key —
    AQE handles skew) plus a count; parents are reduced to distinct keys
    first so the join carries keys, not payloads. Output is
    relation-count-sized. The cross-table complement to per-table
    ``check_quality``."""
    out = None
    for name, child, child_col, parent, parent_col in relations:
        keys = child.select(F.col(child_col).alias("_k"))
        orphans = keys.join(
            parent.select(F.col(parent_col).alias("_k")).distinct(), "_k", "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = keys.agg(F.count(F.lit(1)).alias("n_child_rows"))
        row = total.crossJoin(orphans).select(
            F.lit(name).alias("relation"),
            "n_child_rows",
            "n_orphans",
            (F.col("n_orphans") == 0).alias("pass"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("no relations declared")
    return out.orderBy("relation")
