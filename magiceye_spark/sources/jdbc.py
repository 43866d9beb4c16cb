"""Set-oriented JDBC catalog readers for PostgreSQL and MySQL.

Reproduces the semantics of the reference's catalog scans
(``/root/reference/src/sql/postgres.rs:22-199``, ``src/sql/mysql.rs:16-151``)
with one structural fix: the reference describes tables ONE AT A TIME in a
sequential loop — 1 + 3·N or 1 + 4·N catalog queries per side
(``src/action/run/steps/fetching.rs:29-50``). Here each object kind is ONE
whole-schema query (4 queries per side total, independent of table count),
pushed down to the server via the JDBC ``query`` option; Spark ingests the
result set in parallel and the snapshot never lands on the driver.

Semantics preserved exactly:
- PG varchar rendering ``character varying`` + length → ``varchar(N)``
  (postgres.rs:39-44; other types verbatim).
- NULL text properties coalesced to '' server-side (postgres.rs:54-56,
  mysql.rs:42-44).
- PG index columns ordered by position in ``indkey`` (postgres.rs:110-148);
  MySQL by ``seq_in_index`` (mysql.rs:71-100); rendered as a comma-joined
  string server-side, split into an array on ingest (postgres.rs:144).
- MySQL ``is_auto_increment`` from ``extra LIKE '%auto_increment%'``
  (mysql.rs:65); always false for PG (postgres.rs:85).
- MySQL index predicate always '' (mysql.rs:98).
- Deviation (improvement): MySQL table comments are real — the reference
  hard-codes '' with a TODO (mysql.rs:144).

Testing: the PostgreSQL SQL texts are verified against a LIVE PostgreSQL 15
server (tests/test_pg_live.py): the reference's own example DDL
(examples/postgres/{base,target}.sql) is loaded into two live databases,
the four texts run verbatim, and the resulting snapshots must match the
hand-encoded fixture exactly and reproduce the golden diff findings. The
shared JDBC ingestion path and the generic DatabaseMetaData reader are
live-tested against embedded Apache Derby (tests/test_jdbc_live.py). The
MySQL SQL texts remain unexecuted against a real server (none in any
round's environment so far; reviewed line-by-line against
mysql.rs:16-151) — but as of r9 the post-scan path is REPLAY-tested:
tests/test_mysql_replay.py feeds MySQL-8-shaped result rows (LONGLONG
0/1 flags, csv GROUP_CONCAT column lists) through
:func:`assemble_catalog_snapshot` and pins snapshot equality plus the
golden diff end-to-end. That replay is what caught the boolean-flag
cast requirement (see the function's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magiceye_spark.snapshot import SchemaSnapshot

# --------------------------------------------------------------- postgres

PG_TABLES_SQL = """
SELECT t.table_name,
       COALESCE(obj_description(c.oid), '') AS table_comment
FROM information_schema.tables t
JOIN pg_class c ON c.relname = t.table_name
JOIN pg_namespace n ON n.oid = c.relnamespace AND n.nspname = t.table_schema
WHERE t.table_schema = 'public' AND t.table_type = 'BASE TABLE'
"""

PG_COLUMNS_SQL = """
SELECT c.table_name,
       c.column_name,
       CASE WHEN c.data_type = 'character varying'
            THEN 'varchar(' || c.character_maximum_length || ')'
            ELSE c.data_type END AS data_type,
       COALESCE(c.column_default, '') AS column_default,
       c.is_nullable = 'YES' AS is_nullable,
       COALESCE(col_description(pc.oid, c.ordinal_position), '') AS comment,
       false AS is_auto_increment
FROM information_schema.columns c
JOIN pg_class pc ON pc.relname = c.table_name
JOIN pg_namespace n ON n.oid = pc.relnamespace AND n.nspname = c.table_schema
WHERE c.table_schema = 'public'
"""

PG_INDEXES_SQL = """
SELECT t.relname AS table_name,
       i.relname AS index_name,
       string_agg(a.attname, ',' ORDER BY array_position(ix.indkey, a.attnum)) AS columns_csv,
       COALESCE(pg_get_expr(ix.indpred, ix.indrelid), '') AS predicate,
       ix.indisunique AS is_unique
FROM pg_index ix
JOIN pg_class t ON t.oid = ix.indrelid
JOIN pg_class i ON i.oid = ix.indexrelid
JOIN pg_namespace n ON n.oid = t.relnamespace AND n.nspname = 'public'
JOIN pg_attribute a ON a.attrelid = t.oid AND a.attnum = ANY(ix.indkey)
GROUP BY t.relname, i.relname, ix.indpred, ix.indrelid, ix.indisunique
"""

PG_FKS_SQL = """
SELECT tc.table_name,
       tc.constraint_name AS fk_name,
       string_agg(kcu.column_name, ',' ORDER BY kcu.ordinal_position) AS columns_csv,
       MIN(ccu.table_name) AS ref_table,
       MIN(ccu.column_name) AS ref_column
FROM information_schema.table_constraints tc
JOIN information_schema.key_column_usage kcu
  ON tc.constraint_name = kcu.constraint_name AND tc.table_schema = kcu.table_schema
JOIN information_schema.constraint_column_usage ccu
  ON tc.constraint_name = ccu.constraint_name AND tc.table_schema = ccu.table_schema
WHERE tc.constraint_type = 'FOREIGN KEY' AND tc.table_schema = 'public'
GROUP BY tc.table_name, tc.constraint_name
"""

# ----------------------------------------------------------------- mysql

MY_TABLES_SQL = """
SELECT table_name, COALESCE(table_comment, '') AS table_comment
FROM information_schema.tables
WHERE table_schema = DATABASE() AND table_type = 'BASE TABLE'
"""

MY_COLUMNS_SQL = """
SELECT table_name,
       column_name,
       column_type AS data_type,
       COALESCE(column_default, '') AS column_default,
       is_nullable = 'YES' AS is_nullable,
       COALESCE(column_comment, '') AS comment,
       extra LIKE '%auto_increment%' AS is_auto_increment
FROM information_schema.columns
WHERE table_schema = DATABASE()
"""

MY_INDEXES_SQL = """
SELECT table_name,
       index_name,
       GROUP_CONCAT(column_name ORDER BY seq_in_index SEPARATOR ',') AS columns_csv,
       '' AS predicate,
       MIN(non_unique) = 0 AS is_unique
FROM information_schema.statistics
WHERE table_schema = DATABASE()
GROUP BY table_name, index_name
"""

MY_FKS_SQL = """
SELECT kcu.table_name,
       kcu.constraint_name AS fk_name,
       GROUP_CONCAT(kcu.column_name ORDER BY kcu.ordinal_position SEPARATOR ',') AS columns_csv,
       MIN(kcu.referenced_table_name) AS ref_table,
       MIN(kcu.referenced_column_name) AS ref_column
FROM information_schema.key_column_usage kcu
JOIN information_schema.referential_constraints rc
  ON rc.constraint_name = kcu.constraint_name AND rc.constraint_schema = kcu.table_schema
WHERE kcu.table_schema = DATABASE() AND kcu.referenced_table_name IS NOT NULL
GROUP BY kcu.table_name, kcu.constraint_name
"""

_CATALOG_SQL = {
    "postgresql": (PG_TABLES_SQL, PG_COLUMNS_SQL, PG_INDEXES_SQL, PG_FKS_SQL),
    "mysql": (MY_TABLES_SQL, MY_COLUMNS_SQL, MY_INDEXES_SQL, MY_FKS_SQL),
}


def _read_query(spark: SparkSession, url: str, sql: str, props: dict | None) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", sql)
        .option("fetchsize", "10000")
    )
    for k, v in (props or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def assemble_catalog_snapshot(
    tables: DataFrame, columns: DataFrame, indexes: DataFrame, fks: DataFrame
) -> SchemaSnapshot:
    """Post-scan assembly shared by the live JDBC path and the replay-
    fixture tests: exactly what happens to the four scans' RESULT frames
    between the server and the snapshot, factored out so the transforms
    can be pinned against dialect-shaped input without a server.

    - Boolean flags are cast explicitly: MySQL has no boolean result type —
      comparison/LIKE expressions (``is_nullable = 'YES'``,
      ``extra LIKE ...``, ``MIN(non_unique) = 0``) arrive over JDBC as
      LONGLONG 0/1, and feeding those into the snapshot's
      ``coalesce(col, false)`` normalization is an ANSI-mode analysis
      error. ``cast('boolean')`` is a no-op for PG (real booleans) and the
      documented 0/1 mapping for MySQL.
    - The server-side comma-joined index/FK column lists (ordered by
      seq_in_index / ordinal_position in the SQL) split into arrays —
      order-preserving, which D12's order-sensitive index compare relies
      on (check.rs:267-277 semantics)."""
    columns = columns.withColumn(
        "is_nullable", F.col("is_nullable").cast("boolean")
    ).withColumn("is_auto_increment", F.col("is_auto_increment").cast("boolean"))
    indexes = (
        indexes.withColumn("columns", F.split(F.col("columns_csv"), ","))
        .withColumn("is_unique", F.col("is_unique").cast("boolean"))
        .drop("columns_csv")
    )
    fks = fks.withColumn("columns", F.split(F.col("columns_csv"), ",")).drop(
        "columns_csv"
    )
    return SchemaSnapshot.from_dataframes(
        tables=tables,
        columns=columns,
        indexes=indexes.select("table_name", "index_name", "columns", "predicate", "is_unique"),
        fks=fks.select("table_name", "fk_name", "columns", "ref_table", "ref_column"),
    )


def read_catalog_snapshot(
    spark: SparkSession,
    url: str,
    kind: str = "postgresql",
    properties: dict | None = None,
) -> SchemaSnapshot:
    """Snapshot a live database's schema catalog as a SchemaSnapshot.

    ``kind`` ∈ {postgresql, mysql}; ``url`` is a JDBC URL (credentials via
    ``properties`` or the URL). Four server-side queries total, regardless
    of table count — vs the reference's 1 + 3·N/4·N sequential round-trips.
    """
    if kind not in _CATALOG_SQL:
        raise ValueError(f"kind must be one of {sorted(_CATALOG_SQL)}, got {kind!r}")
    tables_sql, columns_sql, indexes_sql, fks_sql = _CATALOG_SQL[kind]
    return assemble_catalog_snapshot(
        tables=_read_query(spark, url, tables_sql, properties),
        columns=_read_query(spark, url, columns_sql, properties),
        indexes=_read_query(spark, url, indexes_sql, properties),
        fks=_read_query(spark, url, fks_sql, properties),
    )


# ------------------------------------------------- generic (DatabaseMetaData)


def _rs_rows(rs, cols: list[str]) -> list[tuple]:
    """Drain a java.sql.ResultSet into python tuples of the named columns."""
    out = []
    while rs.next():
        out.append(tuple(rs.getString(c) for c in cols))
    rs.close()
    return out


def read_catalog_snapshot_generic(
    spark: SparkSession,
    url: str,
    schema: str | None = None,
    properties: dict | None = None,
) -> SchemaSnapshot:
    """Catalog snapshot for ANY JDBC database via ``java.sql.DatabaseMetaData``.

    The dialect-specific :func:`read_catalog_snapshot` is richer for
    PostgreSQL/MySQL (comments, partial-index predicates); this fallback
    covers every other JDBC source (Derby, H2, Oracle, SQL Server, ...)
    with the four standard metadata calls — getTables / getColumns /
    getIndexInfo / getImportedKeys. It runs on the driver, which is the
    right place: catalogs are KB-sized and the reference's own scans are
    sequential driver-side loops (fetching.rs:29-50); the heavy, distributed
    work is the diff that follows, not the fetch.

    Identifier case is normalized to lowercase (Derby/H2/Oracle report
    uppercase, PG lowercase — a case-only difference is not a schema diff).
    VARCHAR lengths render as ``varchar(N)`` matching the reference's PG
    normalization (postgres.rs:39-44).
    """
    jvm = spark._jvm
    gateway = spark.sparkContext._gateway
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        md = conn.getMetaData()
        types = gateway.new_array(jvm.java.lang.String, 1)
        types[0] = "TABLE"
        t_rows = _rs_rows(
            md.getTables(None, schema, "%", types), ["TABLE_NAME", "REMARKS"]
        )
        tables = [(t.lower(), r or "") for t, r in t_rows]
        # With schema=None getColumns(None, None, '%', '%') sweeps system
        # schemas too, while getTables filtered to type TABLE — restrict the
        # column scan to the fetched table set so the snapshot is consistent.
        fetched = {t for t, _ in t_rows}

        columns = []
        c_rs = md.getColumns(None, schema, "%", "%")
        while c_rs.next():
            if c_rs.getString("TABLE_NAME") not in fetched:
                continue
            type_name = (c_rs.getString("TYPE_NAME") or "").lower()
            if type_name == "varchar":
                type_name = f"varchar({c_rs.getInt('COLUMN_SIZE')})"
            columns.append(
                (
                    c_rs.getString("TABLE_NAME").lower(),
                    c_rs.getString("COLUMN_NAME").lower(),
                    type_name,
                    c_rs.getString("COLUMN_DEF") or "",
                    c_rs.getInt("NULLABLE") == 1,  # columnNullable
                    c_rs.getString("REMARKS") or "",
                    (c_rs.getString("IS_AUTOINCREMENT") or "").upper() == "YES",
                )
            )
        c_rs.close()

        table_names = [t for t, _ in t_rows]
        indexes, fks = [], []
        for t in table_names:
            # (index_name, position, column) accumulated per table, ordered
            ix_cols: dict[str, list[tuple[int, str]]] = {}
            ix_meta: dict[str, tuple[str, bool]] = {}
            ix_rs = md.getIndexInfo(None, schema, t, False, False)
            while ix_rs.next():
                name = ix_rs.getString("INDEX_NAME")
                col = ix_rs.getString("COLUMN_NAME")
                if name is None or col is None:  # table statistics row
                    continue
                ix_cols.setdefault(name, []).append(
                    (ix_rs.getInt("ORDINAL_POSITION"), col.lower())
                )
                ix_meta[name] = (
                    ix_rs.getString("FILTER_CONDITION") or "",
                    not ix_rs.getBoolean("NON_UNIQUE"),
                )
            ix_rs.close()
            for name, poscols in ix_cols.items():
                pred, uniq = ix_meta[name]
                indexes.append(
                    (
                        t.lower(),
                        name.lower(),
                        [c for _, c in sorted(poscols)],
                        pred,
                        uniq,
                    )
                )

            fk_cols: dict[str, list[tuple[int, str]]] = {}
            fk_ref: dict[str, tuple[str, str]] = {}
            fk_rs = md.getImportedKeys(None, schema, t)
            # FK_NAME is legally NULL for unnamed constraints on several JDBC
            # sources; rows arrive ordered with KEY_SEQ restarting at 1 per
            # constraint, so synthesize a stable per-table name at each restart.
            anon_n = 0
            while fk_rs.next():
                name = fk_rs.getString("FK_NAME")
                if name is None:
                    if fk_rs.getInt("KEY_SEQ") == 1:
                        anon_n += 1
                    name = f"fk_{t.lower()}_unnamed_{anon_n}"
                fk_cols.setdefault(name, []).append(
                    (fk_rs.getInt("KEY_SEQ"), fk_rs.getString("FKCOLUMN_NAME").lower())
                )
                fk_ref[name] = (
                    fk_rs.getString("PKTABLE_NAME").lower(),
                    fk_rs.getString("PKCOLUMN_NAME").lower(),
                )
            fk_rs.close()
            for name, poscols in fk_cols.items():
                ref_t, ref_c = fk_ref[name]
                fks.append(
                    (
                        t.lower(),
                        name.lower(),
                        [c for _, c in sorted(poscols)],
                        ref_t,
                        ref_c,
                    )
                )
    finally:
        conn.close()

    return SchemaSnapshot.from_rows(
        spark, tables=tables, columns=columns, indexes=indexes, fks=fks
    )
