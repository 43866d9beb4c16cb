"""API misuse must fail fast with clear ValueErrors, not deep Spark
AnalysisExceptions three stages later."""

import pytest

from magiceye_spark.datadiff import diff_data, diff_dataset
from magiceye_spark.diff.core import diff_timeline
from magiceye_spark.llmops.textstats import chunk_documents
from magiceye_spark.skew import salted_join


def _df(spark):
    return spark.createDataFrame([(1, "a")], "k int, v string")


def test_diff_data_rejects_bad_how(spark):
    with pytest.raises(ValueError, match="how"):
        diff_data(_df(spark), _df(spark), keys=["k"], how="full_outer")


def test_diff_data_rejects_missing_key(spark):
    with pytest.raises(ValueError, match="key column"):
        diff_data(_df(spark), _df(spark), keys=["nope"])


def test_salted_join_rejects_right_join(spark):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(_df(spark), _df(spark), keys=["k"], how="right")


def test_chunking_rejects_overlap_ge_chunk(spark):
    docs = spark.createDataFrame(
        [(1, "abc", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_chars=64, overlap=64)


def test_diff_dataset_rejects_empty(spark):
    with pytest.raises(ValueError, match="at least one"):
        diff_dataset({}, keys={})


def test_diff_timeline_rejects_single_snapshot(spark):
    from magiceye_spark.fixtures import mysql_base

    with pytest.raises(ValueError, match="at least two"):
        diff_timeline([("v1", mysql_base(spark))])


def test_k_anonymity_audit_planted(spark):
    """Planted: two quasi groups of 10 and one singleton -> the singleton
    is the only risky group; frac = 1/21."""
    from pyspark.sql import functions as F

    from magiceye_spark.dq import k_anonymity_audit

    df = spark.range(21).select(
        F.when(F.col("id") < 10, "a").when(F.col("id") < 20, "b").otherwise("c").alias("seg"),
        F.lit(1).alias("region"),
    )
    row = k_anonymity_audit(df, ["seg", "region"], k=5).first()
    assert row.n_groups == 3
    assert row.n_risky_groups == 1 and row.n_risky_rows == 1
    assert abs(row.risky_row_frac - 1 / 21) < 1e-6


def test_order_reconciliation_planted(spark):
    """Planted: one order balances, one is off by 10, one has no lines."""
    from magiceye_spark.dq import order_total_reconciliation

    orders = spark.createDataFrame(
        [(1, 110.0), (2, 100.0), (3, 50.0)], "o_orderkey long, o_totalprice double"
    )
    lines = spark.createDataFrame(
        [(1, 100.0, 0.0, 0.1), (2, 100.0, 0.1, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    row = order_total_reconciliation(orders, lines).first()
    assert row.n_orders == 3 and row.n_missing_lines == 1
    assert row.n_reconciled == 1  # order 1: 100*1.1 == 110
    assert row.max_abs_diff == 10.0  # order 2: stored 100 vs computed 90
