"""Migration-hint generation: findings → candidate ALTER statements.

An extension beyond the reference (its report is prose only —
``src/action/run/steps/check.rs`` renders strings, never DDL). Each
property-diff finding maps to the ALTER that would make TARGET match BASE
(the diff's direction: base is the source of truth). Findings that require
a full object definition the findings row doesn't carry (missing tables/
columns/indexes/FKs) emit an explicit ``-- recreate`` comment instead of
guessing — a wrong ALTER is worse than none.

Pure column expressions over the findings DataFrame; Postgres-flavored
syntax.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _qual() -> Column:
    return F.concat_ws(".", F.col("table_name"), F.col("object_name"))


def suggest_ddl(findings: DataFrame) -> DataFrame:
    """(table_name, object_kind, object_name, check, statement) — one
    candidate statement per finding, aligned target→base."""
    tbl = F.col("table_name")
    obj = F.col("object_name")
    base = F.col("base_value")

    stmt = (
        F.when(
            (F.col("check") == "missing") & (F.col("object_kind") == "table"),
            F.concat(F.lit("-- recreate table "), tbl, F.lit(" (definition not in findings)")),
        )
        .when(
            F.col("check") == "missing",
            F.concat(F.lit("-- recreate "), F.col("object_kind"), F.lit(" "), _qual()),
        )
        .when(
            F.col("check") == "data_type",
            F.concat(
                F.lit("ALTER TABLE "), tbl, F.lit(" ALTER COLUMN "), obj,
                F.lit(" TYPE "), base, F.lit(";"),
            ),
        )
        .when(
            F.col("check") == "nullable",
            F.concat(
                F.lit("ALTER TABLE "), tbl, F.lit(" ALTER COLUMN "), obj,
                F.when(base == "NULL", F.lit(" DROP NOT NULL;")).otherwise(
                    F.lit(" SET NOT NULL;")
                ),
            ),
        )
        .when(
            F.col("check") == "default",
            F.when(
                base == "",
                F.concat(F.lit("ALTER TABLE "), tbl, F.lit(" ALTER COLUMN "), obj,
                         F.lit(" DROP DEFAULT;")),
            ).otherwise(
                F.concat(F.lit("ALTER TABLE "), tbl, F.lit(" ALTER COLUMN "), obj,
                         F.lit(" SET DEFAULT "), base, F.lit(";")),
            ),
        )
        .when(
            F.col("check") == "comment",
            F.concat(
                F.lit("COMMENT ON COLUMN "), _qual(), F.lit(" IS '"),
                F.regexp_replace(base, "'", "''"), F.lit("';"),
            ),
        )
        .when(
            F.col("check").isin("index_columns", "index_predicate", "index_unique"),
            F.concat(
                F.lit("DROP INDEX "), obj,
                F.lit("; -- then recreate as in base ("), F.col("check"),
                F.lit(": "), base, F.lit(")"),
            ),
        )
        .when(
            F.col("check") == "fk_ref",
            F.concat(
                F.lit("ALTER TABLE "), tbl, F.lit(" DROP CONSTRAINT "), obj,
                F.lit("; ALTER TABLE "), tbl, F.lit(" ADD CONSTRAINT "), obj,
                F.lit(" FOREIGN KEY REFERENCES "), base, F.lit(";"),
            ),
        )
        .when(
            F.col("check") == "auto_increment",
            F.concat(F.lit("-- adjust AUTO_INCREMENT/identity on "), _qual(),
                     F.lit(" to match base ("), base, F.lit(")")),
        )
        .otherwise(F.concat(F.lit("-- unhandled check: "), F.col("check")))
    )
    return findings.select(
        "table_name", "object_kind", "object_name", "check", stmt.alias("statement")
    )
