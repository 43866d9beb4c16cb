"""LIVE MySQL evidence for the dialect catalog SQL — the twin of
test_pg_live.py for the 4 MySQL catalog texts (sources/jdbc.py
MY_TABLES_SQL / MY_COLUMNS_SQL / MY_INDEXES_SQL / MY_FKS_SQL, behavior
from the reference src/sql/mysql.rs:16-151).

The round-4 PG twin proved this test class catches real dialect drift
(live catalog → SchemaSnapshot → diff vs golden). MySQL remains the one
reviewed-not-executed surface: this environment ships no mysqld/mariadbd
(checked each round — ROADMAP.md "Live MySQL integration"). This module
is the explicit skip-with-reason marker: it probes for a server binary
and SKIPS with the reason recorded in the pytest output; the first
environment that ships one runs the live texts automatically.
"""

import shutil
import subprocess

import pytest

MYSQLD = shutil.which("mysqld") or shutil.which("mariadbd")
MYSQL_CLI = shutil.which("mysql") or shutil.which("mariadb")
REF_SQL = "/root/reference/examples/mysql"

pytestmark = pytest.mark.skipif(
    MYSQLD is None or MYSQL_CLI is None,
    reason=(
        "no mysqld/mariadbd in this environment — the MySQL catalog SQL "
        "(jdbc.py MY_*_SQL) stays reviewed-not-executed; see ROADMAP.md "
        "'Live MySQL integration'"
    ),
)


def _mysql(args, **kw):
    return subprocess.run(
        [MYSQL_CLI, "--batch", "--raw", *args], capture_output=True, text=True, **kw
    )


def test_mysql_catalog_sql_texts_execute_live():
    """Each catalog text must run verbatim against a live server (the
    same 'does this dialect SQL parse and bind' gate the PG twin passes).
    Server bootstrap intentionally minimal: assumes a default local
    socket; extend with an initdb-style throwaway bootstrap (as
    test_pg_live does for PostgreSQL) when an environment first ships a
    server and this skip lifts."""
    from magiceye_spark.sources.jdbc import (
        MY_COLUMNS_SQL,
        MY_FKS_SQL,
        MY_INDEXES_SQL,
        MY_TABLES_SQL,
    )

    for sql in (MY_TABLES_SQL, MY_COLUMNS_SQL, MY_INDEXES_SQL, MY_FKS_SQL):
        r = _mysql(["-e", sql, "information_schema"])
        assert r.returncode == 0, r.stderr
