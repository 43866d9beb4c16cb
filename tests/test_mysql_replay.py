"""MySQL catalog-scan REPLAY fixture (r9): the four scans' raw result
rows, shaped exactly as MySQL 8 delivers them over JDBC, replayed through
the reader's post-scan assembly (`sources.jdbc.assemble_catalog_snapshot`
— the same function the live path calls after `spark.read.jdbc`).

This image has never shipped a mysqld (5 rounds running; the live test in
test_mysql_live.py stays skip-armed), so these rows are NOT server-
recorded: they are rendered from the reference's example DDL
(`/root/reference/examples/mysql/{base,target}.sql`) per MySQL 8.0's
DOCUMENTED information_schema semantics and Connector/J type mapping —
which is precisely the layer a replay can pin without a server:

- MySQL has no boolean result type: the scan SQL's comparison/LIKE
  expressions (``is_nullable = 'YES'``, ``extra LIKE '%auto_increment%'``,
  ``MIN(non_unique) = 0`` — mysql.rs:42-65,98 semantics) arrive as
  LONGLONG 0/1, not BOOLEAN. Feeding that into the snapshot's
  ``coalesce(col, false)`` normalization is an ANSI-mode analysis error —
  the dialect slip this fixture caught, fixed by the explicit casts in
  assemble_catalog_snapshot (pinned below by the raises-test).
- GROUP_CONCAT(... ORDER BY seq_in_index / ordinal_position) delivers the
  index/FK column lists as ONE csv string whose order is semantic
  (check.rs:267-277): the split must preserve it.
- column_type arrives verbatim (``int``, ``varchar(255)`` — 8.0.19+
  drops integer display width), auto FK names are ``{table}_ibfk_{n}``,
  FK auto-indexes are named after the local column (naming confirmed by
  the reference's golden README report, README.md:55-86).

What this does NOT pin (stays honestly `untested live`): the JDBC
URL/driver layer and the SQL texts' acceptance by a real MySQL parser.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from magiceye_spark import diff_schemas
from magiceye_spark.fixtures import (
    EXPECTED_MYSQL_FINDINGS,
    _my_base_spec,
    _my_target_spec,
    mysql_base,
    mysql_target,
)
from magiceye_spark.snapshot import SchemaSnapshot
from magiceye_spark.sources.jdbc import assemble_catalog_snapshot

_TABLES_DDL = "table_name string, table_comment string"
_COLUMNS_DDL = (
    "table_name string, column_name string, data_type string, "
    "column_default string, is_nullable bigint, comment string, "
    "is_auto_increment bigint"
)
_INDEXES_DDL = (
    "table_name string, index_name string, columns_csv string, "
    "predicate string, is_unique bigint"
)
_FKS_DDL = (
    "table_name string, fk_name string, columns_csv string, "
    "ref_table string, ref_column string"
)


def _raw_scan_frames(spark, spec):
    """Render a fixture spec into the four result frames the MY_*_SQL
    scans produce on MySQL 8: booleans as LONGLONG 0/1, index/FK column
    lists as one csv string in seq_in_index/ordinal_position order."""
    tables = [(t, "") for t in spec["columns"]]
    columns = [
        (t, name, dtype, default, int(nullable), comment, int(auto))
        for t, cols in spec["columns"].items()
        for name, dtype, default, nullable, comment, auto in cols
    ]
    indexes = [
        (t, n, ",".join(cols), pred, int(uniq))
        for t, n, cols, pred, uniq in spec["indexes"]
    ]
    fks = [(t, n, ",".join(cols), rt, rc) for t, n, cols, rt, rc in spec["fks"]]
    return (
        spark.createDataFrame(tables, _TABLES_DDL),
        spark.createDataFrame(columns, _COLUMNS_DDL),
        spark.createDataFrame(indexes, _INDEXES_DDL),
        spark.createDataFrame(fks, _FKS_DDL),
    )


def _snap_rows(snap: SchemaSnapshot):
    return {
        kind: sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in getattr(snap, kind).collect()
        )
        for kind in ("tables", "columns", "indexes", "fks")
    }


def test_mysql_replay_assembles_to_fixture_snapshots(spark):
    """Raw MySQL-shaped scan rows through the real post-scan assembly must
    reproduce the hand-encoded fixture snapshots frame-for-frame — the
    transform pin for S11-S13 (long→boolean flags, csv→ordered array,
    normalization)."""
    got_base = assemble_catalog_snapshot(*_raw_scan_frames(spark, _my_base_spec()))
    assert _snap_rows(got_base) == _snap_rows(mysql_base(spark))
    got_target = assemble_catalog_snapshot(
        *_raw_scan_frames(spark, _my_target_spec())
    )
    assert _snap_rows(got_target) == _snap_rows(mysql_target(spark))


def test_mysql_replay_end_to_end_golden_diff(spark):
    """The replayed pair must reproduce the reference's golden findings
    end-to-end (scan shape → assembly → diff), including the
    order-sensitive composite index (idx_user_name_email survives the csv
    round-trip in declaration order — no finding for it here, unlike the
    PG pair where the order flips)."""
    base = assemble_catalog_snapshot(*_raw_scan_frames(spark, _my_base_spec()))
    target = assemble_catalog_snapshot(*_raw_scan_frames(spark, _my_target_spec()))
    got = sorted(tuple(r) for r in diff_schemas(base, target).collect())
    assert got == sorted(EXPECTED_MYSQL_FINDINGS)


def test_mysql_long_flags_without_cast_break_normalization(spark):
    """Documents WHY assemble_catalog_snapshot's boolean casts exist: the
    raw LONGLONG flag columns fed straight into the snapshot normalization
    (as the pre-r9 reader did) are an ANSI analysis error — the exact
    failure a first real-MySQL run would have hit."""
    tables, columns, indexes, fks = _raw_scan_frames(spark, _my_base_spec())
    with pytest.raises(Exception, match="(?i)datatype_mismatch|cannot resolve|boolean"):
        SchemaSnapshot.from_dataframes(
            tables=tables,
            columns=columns,
            indexes=indexes.withColumn(
                "columns", F.split(F.col("columns_csv"), ",")
            ).drop("columns_csv"),
            fks=fks.withColumn("columns", F.split(F.col("columns_csv"), ",")).drop(
                "columns_csv"
            ),
        ).columns.collect()
