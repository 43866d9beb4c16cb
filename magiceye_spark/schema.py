"""Fixed StructType schemas for schema-catalog snapshots and diff findings.

These mirror the reference's data model (``/root/reference/src/sql/mod.rs``:
``Table`` :52-59, ``Column`` :10-18, ``Index`` :20-26, ``ForeignKey``
:28-33) flattened into four normalized tables — the snapshot contract of
FIXTURES.md §1. All property values are strings/booleans, exactly like the
reference (``mod.rs``: every field is String/bool); NULL text properties are
coalesced to '' at scan time (reference does this in catalog SQL,
``src/sql/postgres.rs:54-56``, ``src/sql/mysql.rs:42-44``).

Index ``columns`` is ArrayType because ORDER IS SEMANTIC — the reference
compares Vec<String> with order-sensitive equality and its report says
"Please check the order" (``src/action/run/steps/check.rs:267-277``). Spark
array equality is also order-sensitive, so the default `!=` is already the
right comparison.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), nullable=True)


def _b(name: str) -> StructField:
    return StructField(name, BooleanType(), nullable=True)


#: One row per table. Mirrors Table{name, comment} (children normalized out).
TABLES_SCHEMA = StructType([_s("table_name"), _s("table_comment")])

#: One row per column. Mirrors Column (src/sql/mod.rs:10-18);
#: is_auto_increment is MySQL-only and always False for Postgres snapshots
#: (reference defaults it, src/sql/postgres.rs:85).
COLUMNS_SCHEMA = StructType(
    [
        _s("table_name"),
        _s("column_name"),
        _s("data_type"),
        _s("column_default"),
        _b("is_nullable"),
        _s("comment"),
        _b("is_auto_increment"),
    ]
)

#: One row per index. predicate is the partial-index WHERE (PG only; '' for
#: MySQL, src/sql/mysql.rs:98). columns order matters (see module docstring).
INDEXES_SCHEMA = StructType(
    [
        _s("table_name"),
        _s("index_name"),
        StructField("columns", ArrayType(StringType(), containsNull=False), nullable=True),
        _s("predicate"),
        _b("is_unique"),
    ]
)

#: One row per foreign key. Local `columns` exist in the reference model but
#: are NOT diffed (only presence-by-name + referenced side are compared,
#: src/action/run/steps/check.rs:356-380); kept for completeness.
FKS_SCHEMA = StructType(
    [
        _s("table_name"),
        _s("fk_name"),
        StructField("columns", ArrayType(StringType(), containsNull=False), nullable=True),
        _s("ref_table"),
        _s("ref_column"),
    ]
)

#: Structured findings — the engine's primary diff output. Localized report
#: strings (reference: inline format! in every predicate arm,
#: check.rs:141-148 etc.) are rendered from this at the sink (report.py),
#: keeping the operator layer language-neutral and oracle-testable.
#: base_value/target_value hold *rendered* scalars (e.g. 'NULL'/'NOT NULL',
#: 'col_a, col_b') so rendering is a pure string template per (kind, check).
FINDINGS_SCHEMA = StructType(
    [
        _s("table_name"),
        _s("object_kind"),  # table | column | index | fk
        _s("object_name"),
        _s("check"),  # missing | data_type | comment | nullable | default |
        #              auto_increment | index_columns | index_predicate |
        #              index_unique | fk_ref
        _s("base_value"),
        _s("target_value"),
    ]
)

#: Stable ordering ranks used for deterministic report output (the reference
#: iterates a HashMap → nondeterministic order, check.rs:33; we fix that).
OBJECT_KIND_RANK = {"table": 0, "column": 1, "index": 2, "fk": 3}
CHECK_RANK = {
    "missing": 0,
    "data_type": 1,
    "comment": 2,
    "nullable": 3,
    "default": 4,
    "auto_increment": 5,
    "index_columns": 1,
    "index_predicate": 2,
    "index_unique": 3,
    "fk_ref": 1,
}
