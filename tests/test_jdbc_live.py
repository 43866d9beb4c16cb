"""LIVE JDBC round-trip — the one reference behavior (catalog scans against
a real database, fetching.rs:29-50) everything else can only test offline.

Spark ships embedded Apache Derby on its classpath (it backs the Hive
metastore), so an in-memory Derby database gives a real JDBC server-side
catalog without any install: DDL through java.sql via py4j, then

- ``_read_query``: Spark's distributed JDBC read path (format("jdbc") with a
  pushed-down ``query``) against the live database, and
- ``read_catalog_snapshot_generic``: the DatabaseMetaData catalog reader,
  snapshotting two live databases with planted diffs and running the full
  D1-D17 diff over them.

PG/MySQL dialect SQL texts stay cited-and-shape-tested only (no live PG/MySQL
in CI); this file proves the shared ingestion and assembly machinery live.
"""

import pytest

from magiceye_spark.diff.core import diff_schemas
from magiceye_spark.sources.jdbc import _read_query, read_catalog_snapshot_generic


def _exec(spark, url: str, *stmts: str) -> None:
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
        st.close()
    finally:
        conn.close()


@pytest.fixture(scope="module")
def derby_pair(spark):
    base, target = "jdbc:derby:memory:cat_base", "jdbc:derby:memory:cat_target"
    _exec(
        spark,
        base + ";create=true",
        "CREATE TABLE users (id INT NOT NULL GENERATED ALWAYS AS IDENTITY, "
        "email VARCHAR(120) NOT NULL, age INT DEFAULT 21, PRIMARY KEY (id))",
        "CREATE TABLE posts (pid INT NOT NULL, uid INT, body VARCHAR(400), "
        "PRIMARY KEY (pid), CONSTRAINT fk_posts_user FOREIGN KEY (uid) REFERENCES users(id))",
        "CREATE TABLE legacy (x INT)",
        "CREATE UNIQUE INDEX ix_users_email ON users(email, id)",
        "INSERT INTO users (email, age) VALUES ('a@x.io', 30), ('b@x.io', 40)",
    )
    _exec(
        spark,
        target + ";create=true",
        # planted diffs vs base: legacy missing; users.age type+default changed,
        # email length changed; ix_users_email column order swapped & not unique;
        # fk_posts_user references a different column
        "CREATE TABLE users (id INT NOT NULL GENERATED ALWAYS AS IDENTITY, "
        "email VARCHAR(200) NOT NULL, age BIGINT, PRIMARY KEY (id), "
        "CONSTRAINT uq_users_email UNIQUE (email))",
        "CREATE TABLE posts (pid INT NOT NULL, uid INT, body VARCHAR(400), "
        "PRIMARY KEY (pid))",
        "CREATE INDEX ix_users_email ON users(id, email)",
    )
    return base, target


def test_spark_jdbc_query_pushdown_live(spark, derby_pair):
    """spark.read.format('jdbc') with the `query` option against live Derby:
    the exact ingestion path the PG/MySQL catalog scans use."""
    base, _ = derby_pair
    df = _read_query(
        spark, base, "SELECT email, age FROM users WHERE age >= 35", None
    )
    rows = [(r[0], r[1]) for r in df.collect()]
    assert rows == [("b@x.io", 40)]
    assert [f.lower() for f in df.columns] == ["email", "age"]


def test_generic_catalog_snapshot_live_diff(spark, derby_pair):
    """Snapshot two LIVE databases and diff them — the reference's full
    background.rs flow (connect -> fetch -> fetch -> diff) with the generic
    DatabaseMetaData reader standing in for the PG/MySQL dialect scans."""
    base_url, target_url = derby_pair
    base = read_catalog_snapshot_generic(spark, base_url, schema="APP")
    target = read_catalog_snapshot_generic(spark, target_url, schema="APP")

    # the snapshot itself is faithful
    base_tables = {r["table_name"] for r in base.tables.collect()}
    assert base_tables == {"users", "posts", "legacy"}
    base_cols = {
        (r["table_name"], r["column_name"]): r for r in base.columns.collect()
    }
    assert base_cols[("users", "email")]["data_type"] == "varchar(120)"
    assert base_cols[("users", "id")]["is_auto_increment"] is True
    assert base_cols[("users", "age")]["is_nullable"] is True
    assert not base_cols[("users", "email")]["is_nullable"]
    ix = {
        r["index_name"]: r
        for r in base.indexes.collect()
        if r["table_name"] == "users"
    }
    assert ix["ix_users_email"]["columns"] == ["email", "id"]
    assert ix["ix_users_email"]["is_unique"] is True
    fks = {r["fk_name"]: r for r in base.fks.collect()}
    assert fks["fk_posts_user"]["ref_table"] == "users"
    assert fks["fk_posts_user"]["ref_column"] == "id"

    # live -> live directional diff reports exactly the planted differences
    findings = {
        (r["table_name"], r["object_kind"], r["object_name"], r["check"])
        for r in diff_schemas(base, target).collect()
    }
    assert ("legacy", "table", "legacy", "missing") in findings
    assert ("users", "column", "age", "data_type") in findings
    assert ("users", "column", "age", "default") in findings
    assert ("users", "column", "email", "data_type") in findings
    assert ("users", "index", "ix_users_email", "index_columns") in findings
    assert ("users", "index", "ix_users_email", "index_unique") in findings
    assert ("posts", "fk", "fk_posts_user", "missing") in findings
    # nothing invented: every finding is about a planted diff
    assert {f[0] for f in findings} <= {"users", "posts", "legacy"}
