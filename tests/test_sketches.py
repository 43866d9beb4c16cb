"""Sketch accuracy: HLL approximate distinct counts must sit within the
configured relative error of the exact counts."""

from pyspark.sql import functions as F

from magiceye_spark.analytics import _events
from magiceye_spark.sketches import approx_user_counts


def test_hll_within_tolerance(spark, sf_dir):
    e = _events(spark, sf_dir)
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_user_counts(e, rsd=0.05).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err <= 0.15, f"{k}: approx={approx[k]} exact={exact[k]}"
