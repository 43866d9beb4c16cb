"""End-to-end tests of the datadiff / dq CLI subcommands.

The CLI's `get_spark` reuses the session-scoped test session (getOrCreate),
so these exercise the real argument plumbing, read paths, and exit-code
contract without a second JVM.
"""

import json

from magiceye_spark import cli


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path))


def test_cli_datadiff_full_and_out(spark, tmp_path, capsys):
    base = tmp_path / "base"
    target = tmp_path / "target"
    _write(spark, base, [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
           "id int, name string, v int")
    _write(spark, target, [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
           "id int, name string, v int")
    out = tmp_path / "diff_out"
    rc = cli.main(["datadiff", str(base), str(target), "--keys", "id",
                   "--out", str(out)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "added    1" in printed
    assert "changed  1" in printed
    assert "removed  1" in printed
    got = {(r["id"], r["diff_status"], r["changed_columns"])
           for r in spark.read.parquet(str(out)).collect()}
    assert got == {(2, "changed", "name"), (3, "removed", ""), (4, "added", "")}


def test_cli_datadiff_fingerprint_exit_codes(spark, tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    _write(spark, a, [(1, "x")], "id int, s string")
    _write(spark, b, [(1, "x")], "id int, s string")
    assert cli.main(["datadiff", str(a), str(b), "--mode", "fingerprint"]) == 0
    c = tmp_path / "c"
    _write(spark, c, [(1, "y")], "id int, s string")
    assert cli.main(["datadiff", str(a), str(c), "--mode", "fingerprint"]) == 1


def test_cli_datadiff_keyed_mode_requires_keys(spark, tmp_path):
    a = tmp_path / "a2"
    _write(spark, a, [(1, "x")], "id int, s string")
    assert cli.main(["datadiff", str(a), str(a)]) == 2


def test_cli_datadiff_csv_format(spark, tmp_path, capsys):
    base = tmp_path / "base_csv"
    target = tmp_path / "target_csv"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(str(base))
    df.where("id = 1").coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(str(target))
    rc = cli.main(["datadiff", str(base), str(target), "--keys", "id",
                   "--format", "csv"])
    assert rc == 0
    assert "removed  1" in capsys.readouterr().out


def test_cli_dq_gate(spark, tmp_path, capsys):
    tbl = tmp_path / "tbl"
    ref = tmp_path / "ref"
    _write(spark, tbl, [(1, "ok", 5), (2, None, 50), (3, "ok", 7)],
           "id int, status string, score int")
    _write(spark, ref, [(1,), (2,), (3,)], "id int")
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps({
        "not_null": ["status"],
        "unique": [["id"]],
        "ranges": {"score": [0, 10]},
        "references": {"id": f"{ref}:id"},
    }))
    rc = cli.main(["dq", str(tbl), "--rules", str(rules)])
    assert rc == 1  # null status + out-of-range score fail
    printed = capsys.readouterr().out
    assert "FAIL not_null" in printed
    assert "FAIL range" in printed
    assert "PASS unique" in printed
    assert "PASS referential" in printed

    ok_rules = tmp_path / "ok_rules.json"
    ok_rules.write_text(json.dumps({"unique": [["id"]]}))
    assert cli.main(["dq", str(tbl), "--rules", str(ok_rules)]) == 0
