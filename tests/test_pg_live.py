"""LIVE PostgreSQL evidence for the dialect catalog SQL.

The shared JDBC ingestion path is live-tested against embedded Derby
(test_jdbc_live.py); what that can't cover is the PostgreSQL-specific
catalog SQL TEXT (information_schema/pg_catalog queries, jdbc.py:41-93) —
the part of the reference's core behavior (src/sql/postgres.rs:22-188)
that needs a real server. This module runs those exact SQL strings against
a LIVE PostgreSQL via psql (no JDBC driver jar needed — the ingestion
transport is already proven; what's under test is the SQL), loads the
reference's own example DDL (examples/postgres/{base,target}.sql), builds
SchemaSnapshots from the live results, and checks:

1. live base catalog == the hand-encoded fixture snapshot (0 diff findings)
2. diff(live base, live target) == the golden EXPECTED_PG_FINDINGS

Environment: needs `psql` + a reachable server (socket dir in
SPARK_GRAFT_PG_SOCK, default /tmp/pgsock). The fixture below will try to
initdb+start a throwaway server as the `postgres` user when none is
running; skips cleanly when PostgreSQL isn't installed.
"""

import csv
import io
import os
import shutil
import subprocess

import pytest

PG_SOCK = os.environ.get("SPARK_GRAFT_PG_SOCK", "/tmp/pgsock")
PG_DATA = "/tmp/pgdata_magiceye_test"
REF_SQL = "/root/reference/examples/postgres"


def _psql(args, **kw):
    return subprocess.run(
        ["psql", "-h", PG_SOCK, "-U", "postgres", "-v", "ON_ERROR_STOP=0", *args],
        capture_output=True, text=True, **kw,
    )


def _server_up() -> bool:
    return (
        shutil.which("psql") is not None
        and _psql(["-d", "postgres", "-c", "SELECT 1"]).returncode == 0
    )


def _try_start_server() -> bool:
    if not (shutil.which("initdb") and shutil.which("pg_ctl")):
        return False
    try:
        os.makedirs(PG_SOCK, exist_ok=True)
        subprocess.run(["chown", "postgres:postgres", PG_SOCK], check=False)
        if not os.path.exists(os.path.join(PG_DATA, "PG_VERSION")):
            os.makedirs(PG_DATA, exist_ok=True)
            subprocess.run(["chown", "postgres:postgres", PG_DATA], check=False)
            r = subprocess.run(
                ["su", "postgres", "-s", "/bin/bash", "-c",
                 f"initdb -D {PG_DATA} -U postgres"],
                capture_output=True, text=True, cwd="/tmp",
            )
            if r.returncode != 0:
                return False
        r = subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c",
             f"pg_ctl -D {PG_DATA} -o \"-k {PG_SOCK} -c listen_addresses=''\" "
             f"-l {PG_DATA}/log start"],
            capture_output=True, text=True, cwd="/tmp",
        )
        return r.returncode == 0 and _server_up()
    except OSError:
        return False


@pytest.fixture(scope="module")
def pg(spark):
    if not os.path.isdir(REF_SQL):
        pytest.skip("reference postgres examples not available")
    if not _server_up() and not _try_start_server():
        pytest.skip("no live PostgreSQL (psql/initdb unavailable or cannot start)")
    for db, f in (("prod", "base.sql"), ("dev", "target.sql")):
        exists = _psql(
            ["-d", "postgres", "-tAc",
             f"SELECT 1 FROM pg_database WHERE datname='{db}'"]
        ).stdout.strip()
        if exists != "1":
            r = _psql(["-f", os.path.join(REF_SQL, f)], cwd="/tmp")
            assert r.returncode == 0, r.stderr
    return True


def _live_snapshot(spark, db: str):
    """The four dialect SQL texts, executed verbatim on the live server."""
    from magiceye_spark.snapshot import SchemaSnapshot
    from magiceye_spark.sources.jdbc import (
        PG_COLUMNS_SQL, PG_FKS_SQL, PG_INDEXES_SQL, PG_TABLES_SQL,
    )

    def q(sql):
        r = _psql(["-d", db, "--csv", "-c", sql])
        assert r.returncode == 0, r.stderr
        return list(csv.DictReader(io.StringIO(r.stdout)))

    b = lambda v: v == "t"
    tables = [(r["table_name"], r["table_comment"]) for r in q(PG_TABLES_SQL)]
    columns = [
        (r["table_name"], r["column_name"], r["data_type"], r["column_default"],
         b(r["is_nullable"]), r["comment"], b(r["is_auto_increment"]))
        for r in q(PG_COLUMNS_SQL)
    ]
    indexes = [
        (r["table_name"], r["index_name"], r["columns_csv"].split(","),
         r["predicate"], b(r["is_unique"]))
        for r in q(PG_INDEXES_SQL)
    ]
    fks = [
        (r["table_name"], r["fk_name"], r["columns_csv"].split(","),
         r["ref_table"], r["ref_column"])
        for r in q(PG_FKS_SQL)
    ]
    return SchemaSnapshot.from_rows(spark, tables, columns, indexes, fks)


def test_live_pg_base_matches_fixture_encoding(spark, pg):
    """The fixture snapshot encodes what the catalog SQL *should* return for
    base.sql — the live server must agree exactly (diff == empty)."""
    from magiceye_spark.diff.core import diff_schemas
    from magiceye_spark.fixtures import postgres_base

    live = _live_snapshot(spark, "prod")
    findings = diff_schemas(postgres_base(spark), live)
    back = diff_schemas(live, postgres_base(spark))
    assert findings.count() == 0, [tuple(r) for r in findings.collect()]
    assert back.count() == 0, [tuple(r) for r in back.collect()]


def test_live_pg_pair_reproduces_golden_findings(spark, pg):
    """End-to-end reference parity on real infrastructure: two live
    databases, dialect catalog SQL, schema diff — must reproduce the golden
    findings derived from the reference's own example pair."""
    from magiceye_spark.diff.core import diff_schemas
    from magiceye_spark.fixtures import EXPECTED_PG_FINDINGS

    live_base = _live_snapshot(spark, "prod")
    live_target = _live_snapshot(spark, "dev")
    got = sorted(
        (r["table_name"], r["object_kind"], r["object_name"],
         r["check"], r["base_value"], r["target_value"])
        for r in diff_schemas(live_base, live_target).collect()
    )
    assert got == sorted(EXPECTED_PG_FINDINGS)
