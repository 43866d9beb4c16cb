"""LIVE MySQL evidence for the dialect catalog SQL — the twin of
test_pg_live.py for the 4 MySQL catalog texts (sources/jdbc.py
MY_TABLES_SQL / MY_COLUMNS_SQL / MY_INDEXES_SQL / MY_FKS_SQL, behavior
from the reference src/sql/mysql.rs:16-151).

The round-4 PG twin proved this test class catches real dialect drift
(live catalog → SchemaSnapshot → diff vs golden). MySQL remains the one
reviewed-not-executed surface: this environment ships no mysqld/mariadbd
(checked each round — ROADMAP.md "Live MySQL integration"). This module
is the explicit skip-with-reason marker PLUS the throwaway-datadir
bootstrap (ADVICE r5): the first environment that ships a server binary
initializes a socket-only instance in /tmp, loads the reference's own
example DDL, and runs the live texts — no pre-running daemon assumed.
"""

import os
import shutil
import subprocess

import pytest

MYSQLD = shutil.which("mysqld") or shutil.which("mariadbd")
MYSQL_CLI = shutil.which("mysql") or shutil.which("mariadb")
REF_SQL = "/root/reference/examples/mysql"
MY_DATA = "/tmp/mysqldata_magiceye_test"
MY_SOCK = os.path.join(MY_DATA, "mysqld.sock")

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
        [MYSQL_CLI, "--batch", "--raw", f"--socket={MY_SOCK}", "-u", "root", *args],
        capture_output=True, text=True, **kw,
    )


def _server_up() -> bool:
    return _mysql(["-e", "SELECT 1"]).returncode == 0


def _try_start_server() -> bool:
    """Throwaway socket-only instance (the initdb+pg_ctl move from
    test_pg_live): --initialize-insecure (mysqld) / --no-defaults install
    (mariadbd), then start with networking off. Never touches a system
    datadir."""
    try:
        if not os.path.isdir(MY_DATA):
            os.makedirs(MY_DATA, exist_ok=True)
            init = subprocess.run(
                [MYSQLD, "--no-defaults", "--initialize-insecure",
                 f"--datadir={MY_DATA}"],
                capture_output=True, text=True, cwd="/tmp",
            )
            if init.returncode != 0:  # mariadbd spells it differently
                install = shutil.which("mariadb-install-db") or shutil.which(
                    "mysql_install_db"
                )
                if install is None:
                    return False
                init = subprocess.run(
                    [install, "--no-defaults", f"--datadir={MY_DATA}",
                     "--auth-root-authentication-method=normal"],
                    capture_output=True, text=True, cwd="/tmp",
                )
                if init.returncode != 0:
                    return False
        subprocess.Popen(
            [MYSQLD, "--no-defaults", f"--datadir={MY_DATA}",
             f"--socket={MY_SOCK}", "--skip-networking",
             f"--pid-file={MY_DATA}/mysqld.pid"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd="/tmp",
        )
        import time

        for _ in range(30):
            if _server_up():
                return True
            time.sleep(1)
        return False
    except OSError:
        return False


@pytest.fixture(scope="module")
def mysql_db():
    if not os.path.isdir(REF_SQL):
        pytest.skip("reference mysql examples not available")
    if not _server_up() and not _try_start_server():
        pytest.skip("mysqld present but a throwaway instance failed to start")
    r = _mysql(["-e", "DROP DATABASE IF EXISTS magiceye_base; CREATE DATABASE magiceye_base"])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(REF_SQL, "base.sql")) as fh:
        r = _mysql(["magiceye_base"], input=fh.read())
    assert r.returncode == 0, r.stderr
    return "magiceye_base"


def test_mysql_catalog_sql_texts_execute_live(mysql_db):
    """Each catalog text must run verbatim against a live server holding
    the reference's own example schema (the same 'does this dialect SQL
    parse and bind' gate the PG twin passes), and the table scan must see
    the example's tables."""
    from magiceye_spark.sources.jdbc import (
        MY_COLUMNS_SQL,
        MY_FKS_SQL,
        MY_INDEXES_SQL,
        MY_TABLES_SQL,
    )

    for sql in (MY_TABLES_SQL, MY_COLUMNS_SQL, MY_INDEXES_SQL, MY_FKS_SQL):
        r = _mysql(["-e", sql, mysql_db])
        assert r.returncode == 0, r.stderr
    tables = _mysql(["-e", MY_TABLES_SQL, mysql_db]).stdout
    assert "users" in tables  # reference examples/mysql/base.sql table
