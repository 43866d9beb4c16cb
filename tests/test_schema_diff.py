"""Golden tests for the D1-D17 schema diff against the reference's example
fixtures (the planted diffs of examples/{postgres,mysql}/{base,target}.sql),
plus the semantic properties the reference guarantees:

- diff(x, x) is empty (no finding without a difference)
- directionality: target-only objects are never reported
  (/root/reference/src/action/run/background.rs:48-51)
- index column order is semantic (check.rs:267-277)
"""

import pytest

from magiceye_spark import diff_schemas
from magiceye_spark.fixtures import (
    EXPECTED_MYSQL_FINDINGS,
    EXPECTED_PG_FINDINGS,
    mysql_base,
    mysql_target,
    postgres_base,
    postgres_target,
)
from magiceye_spark.snapshot import SchemaSnapshot


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_postgres_pair_golden(spark):
    got = _rows(diff_schemas(postgres_base(spark), postgres_target(spark)))
    assert got == sorted(EXPECTED_PG_FINDINGS)


def test_mysql_pair_golden(spark):
    got = _rows(diff_schemas(mysql_base(spark), mysql_target(spark)))
    assert got == sorted(EXPECTED_MYSQL_FINDINGS)


@pytest.mark.parametrize("builder", [postgres_base, mysql_base])
def test_self_diff_is_empty(spark, builder):
    snap = builder(spark)
    assert diff_schemas(snap, snap).count() == 0


def test_directionality_target_only_ignored(spark):
    """Swapping sides must NOT mirror the findings: target-side additions
    (e.g. the partial-index predicate present only in pg target) are reported
    when diffing target→base, but base→target only reports base-side facts."""
    base, target = postgres_base(spark), postgres_target(spark)
    forward = {tuple(r) for r in diff_schemas(base, target).collect()}
    # target has no object that base lacks, so reverse diff reports property
    # diffs (symmetric) but NO 'missing' rows beyond those provable from
    # target's side; specifically sessions.user_id missing appears only
    # forward.
    reverse = {tuple(r) for r in diff_schemas(target, base).collect()}
    assert ("sessions", "column", "user_id", "missing", "", "") in forward
    assert ("sessions", "column", "user_id", "missing", "", "") not in reverse


def test_missing_table_suppresses_child_findings(spark):
    """A table absent from target reports ONCE as a table finding — its
    columns/indexes/fks are not individually reported (check.rs:48-107:
    child comparison happens only in the Some(target_table) arm)."""
    base, target = mysql_base(spark), mysql_target(spark)
    findings = diff_schemas(base, target).collect()
    blocks = [tuple(r) for r in findings if r["table_name"] == "blocks"]
    assert blocks == [("blocks", "table", "blocks", "missing", "", "")]


def test_index_order_sensitivity(spark):
    base = SchemaSnapshot.from_rows(
        spark,
        tables=[("t", "")],
        indexes=[("t", "ix", ["a", "b"], "", False)],
    )
    target = SchemaSnapshot.from_rows(
        spark,
        tables=[("t", "")],
        indexes=[("t", "ix", ["b", "a"], "", False)],
    )
    rows = _rows(diff_schemas(base, target))
    assert rows == [("t", "index", "ix", "index_columns", "a, b", "b, a")]


def test_diff_against_empty_target_reports_all_tables_missing(spark):
    base = mysql_base(spark)
    empty = SchemaSnapshot.from_rows(spark)
    got = diff_schemas(base, empty).collect()
    # every base table reported exactly once, as a missing-table finding;
    # no child findings leak (children of missing tables are suppressed)
    assert {r["check"] for r in got} == {"missing"}
    assert {r["object_kind"] for r in got} == {"table"}
    assert len(got) == base.tables.count()


def test_empty_base_reports_nothing(spark):
    # directional semantics: an empty base has nothing to report, no matter
    # how much the target contains (background.rs:48-51)
    empty = SchemaSnapshot.from_rows(spark)
    assert diff_schemas(empty, mysql_target(spark)).count() == 0


def test_diff_timeline_tags_adjacent_pairs(spark):
    """Three-version history: v1→v2 evolves (mysql planted diffs), v2→v3 is
    identical — the timeline must show findings only on the first step."""
    from magiceye_spark.diff.core import diff_timeline

    v1, v2 = mysql_base(spark), mysql_target(spark)
    tl = diff_timeline([("v1", v1), ("v2", v2), ("v3", v2)])
    rows = tl.collect()
    steps = {(r["from_version"], r["to_version"]) for r in rows}
    assert steps == {("v1", "v2")}  # the identical step contributes nothing
    n_direct = diff_schemas(v1, v2).count()
    assert len(rows) == n_direct


def test_spark_catalog_source_diff(spark):
    """Snapshot two live Spark databases via the catalog API and diff them —
    the reference's two-live-databases flow (background.rs:20-46) with Spark
    itself as the DBMS."""
    from magiceye_spark.diff.core import diff_schemas
    from magiceye_spark.sources.spark_catalog import snapshot_spark_catalog

    for db in ("diff_base_t", "diff_target_t"):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for tbl in ("diff_base_t.users", "diff_target_t.users", "diff_base_t.gone"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql("CREATE TABLE diff_base_t.users (id INT, email STRING) USING parquet")
    spark.sql("CREATE TABLE diff_target_t.users (id BIGINT, email STRING) USING parquet")
    spark.sql("CREATE TABLE diff_base_t.gone (x INT) USING parquet")
    try:
        base = snapshot_spark_catalog(spark, "diff_base_t")
        target = snapshot_spark_catalog(spark, "diff_target_t")
        findings = {tuple(r) for r in diff_schemas(base, target).collect()}
        assert findings == {
            ("gone", "table", "gone", "missing", "", ""),
            ("users", "column", "id", "data_type", "int", "bigint"),
        }
        # directionality: swapping sides must NOT report target-only objects
        reverse = {tuple(r) for r in diff_schemas(target, base).collect()}
        assert ("gone", "table", "gone", "missing", "", "") not in reverse
        assert ("users", "column", "id", "data_type", "bigint", "int") in reverse
    finally:
        for tbl in ("diff_base_t.users", "diff_target_t.users", "diff_base_t.gone"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        for db in ("diff_base_t", "diff_target_t"):
            spark.sql(f"DROP DATABASE IF EXISTS {db}")


def test_null_properties_still_produce_findings(spark):
    """A raw (un-normalized) snapshot can carry SQL NULL properties — e.g. a
    user building SchemaSnapshot(...) straight from their own DataFrames.
    `a != b` is NULL when either side is NULL, which would silently DROP a
    real difference; the property checks must be null-safe."""
    from magiceye_spark.schema import COLUMNS_SCHEMA, FKS_SCHEMA, INDEXES_SCHEMA, TABLES_SCHEMA

    def snap(default, comment, predicate, ref_col):
        return SchemaSnapshot(
            tables=spark.createDataFrame([("t", "")], TABLES_SCHEMA),
            columns=spark.createDataFrame(
                [("t", "c", "int", default, True, comment, False)], COLUMNS_SCHEMA
            ),
            indexes=spark.createDataFrame(
                [("t", "ix", ["c"], predicate, False)], INDEXES_SCHEMA
            ),
            fks=spark.createDataFrame([("t", "fk", ["c"], "p", ref_col)], FKS_SCHEMA),
        )

    base = snap("now()", None, "c > 0", None)
    target = snap(None, "a comment", None, "id")
    checks = {r["check"]: (r["base_value"], r["target_value"])
              for r in diff_schemas(base, target).collect()}
    assert checks == {
        "default": ("now()", ""),
        "comment": ("", "a comment"),
        "index_predicate": ("c > 0", ""),
        "fk_ref": ("p", "p.id"),  # concat_ws skips the NULL ref_column
    }
    # and NULL == NULL is NOT a difference
    both_null = snap(None, None, None, None)
    assert diff_schemas(both_null, both_null).count() == 0
