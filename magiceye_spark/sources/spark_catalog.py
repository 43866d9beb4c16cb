"""Schema-snapshot source for the SPARK catalog itself: snapshot any
database visible to the session (Hive metastore, in-memory catalog, or a
configured lakehouse catalog) into the same four-table SchemaSnapshot the
diff engine consumes — so two Spark databases (prod vs staging, yesterday's
metastore export vs today's) diff exactly like the reference diffs two
Postgres schemas (``/root/reference/src/sql/postgres.rs:22-199``).

Mapping to the reference's data model (src/sql/mod.rs:10-59):

- tables:  name + comment (``DESCRIBE TABLE EXTENDED`` Comment row).
- columns: name, Spark SQL data-type string rendered verbatim (the diff is
  textual, mirroring the reference's string-rendered ``data_type``,
  mod.rs:13), nullability; ``column_default`` from the table property where
  defined, '' otherwise; ``is_auto_increment`` always False (no such
  concept in Spark).
- indexes/fks: empty — OSS Spark has no catalog indexes or enforced
  foreign keys. The diff operators treat an empty side correctly (missing
  objects simply produce no findings), so snapshots from Spark interop
  with JDBC/parquet snapshots from richer catalogs.

Scale note: OSS Spark exposes no ``information_schema`` relation to scan
set-orientedly, so listing is a driver-side catalog walk — CATALOG-sized
(like the reference's own per-table loop, fetching.rs:29-50), never
data-sized; the resulting snapshot is immediately a DataFrame bundle and
everything downstream is distributed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from magiceye_spark.snapshot import SchemaSnapshot


def snapshot_spark_catalog(
    spark: SparkSession, database: str | None = None, include_views: bool = False
) -> SchemaSnapshot:
    """Snapshot one Spark database into a SchemaSnapshot.

    ``include_views=False`` matches the reference's BASE-TABLE-only listing
    (information_schema.tables WHERE table_type = 'BASE TABLE',
    src/sql/postgres.rs:30).
    """
    db = database or spark.catalog.currentDatabase()
    table_rows: list[tuple] = []
    column_rows: list[tuple] = []
    for t in spark.catalog.listTables(db):
        if t.tableType == "VIEW" and not include_views:
            continue
        if t.tableType == "TEMPORARY":
            continue
        table_rows.append((t.name, t.description or ""))
        for c in spark.catalog.listColumns(t.name, db):
            column_rows.append(
                (
                    t.name,
                    c.name,
                    c.dataType,
                    "",  # Spark column DEFAULTs live in table DDL properties;
                         # not surfaced by the catalog API — '' like the
                         # reference's absent defaults (postgres.rs:54)
                    bool(c.nullable),
                    c.description or "",
                    False,  # no auto_increment in Spark
                )
            )
    return SchemaSnapshot.from_rows(
        spark, tables=table_rows, columns=column_rows, indexes=(), fks=()
    )
