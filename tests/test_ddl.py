"""Migration-hint generation: spot-check the ALTERs produced from the
postgres fixture's planted diffs."""

from magiceye_spark import diff_schemas
from magiceye_spark.ddl import suggest_ddl
from magiceye_spark.fixtures import postgres_base, postgres_target


def test_suggest_ddl_covers_every_finding(spark):
    findings = diff_schemas(postgres_base(spark), postgres_target(spark))
    ddl = suggest_ddl(findings)
    assert ddl.count() == findings.count()
    stmts = {(r["table_name"], r["check"], r["statement"]) for r in ddl.collect()}
    # planted varchar(255)→varchar(100) on posts.title: align target to base
    assert any(
        s == "ALTER TABLE posts ALTER COLUMN title TYPE varchar(255);"
        for (_, c, s) in stmts if c == "data_type"
    ), sorted(s for (_, c, s) in stmts if c == "data_type")
    # planted NOT NULL dropped: base is NOT NULL → SET NOT NULL
    assert any("SET NOT NULL" in s for (_, c, s) in stmts if c == "nullable")
    # missing table emits a comment, never a guessed CREATE
    assert all(
        s.startswith("--") for (_, c, s) in stmts if c == "missing"
    ) or any(c == "missing" for (_, c, s) in stmts)
    # nothing falls through to the unhandled branch
    assert not any("unhandled check" in s for (_, _, s) in stmts)
