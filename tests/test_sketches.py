"""Sketch accuracy: HLL approximate distinct counts must sit within the
configured relative error of the exact counts."""

from pyspark.sql import functions as F

from magiceye_spark.analytics import _events
from magiceye_spark.sketches import (
    approx_user_counts,
    approx_value_distribution,
    value_distribution,
)


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


def test_gk_percentiles_within_tolerance(spark, sf_dir):
    e = _events(spark, sf_dir)
    exact = {r["event_type"]: (r["p50_value"], r["p95_value"])
             for r in value_distribution(e).collect()}
    approx = {r["event_type"]: (r["p50_approx"], r["p95_approx"])
              for r in approx_value_distribution(e).collect()}
    assert approx.keys() == exact.keys()
    for k, (p50, p95) in exact.items():
        a50, a95 = approx[k]
        # value-space tolerance: GK bounds rank error, values are smooth here
        assert abs(a50 - p50) / max(p50, 1e-9) <= 0.1, f"{k} p50 {a50} vs {p50}"
        assert abs(a95 - p95) / max(p95, 1e-9) <= 0.1, f"{k} p95 {a95} vs {p95}"


def test_sketch_rollup_matches_exact_daily_distincts(spark, sf_dir):
    """Daily distinct users derived by unioning hourly HLL sketches must
    sit within HLL tolerance of the exact daily COUNT DISTINCT — the
    re-aggregability property a naive sum-of-hourly-distincts lacks."""
    from magiceye_spark.analytics import events_sketch_rollup

    e = _events(spark, sf_dir)
    exact = {
        (r["day"], r["event_type"]): r["n"]
        for r in e.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        (r["day"], r["event_type"]): r["approx_users"]
        for r in events_sketch_rollup(spark, sf_dir).collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) / max(n, 1) <= 0.15, f"{k}: {approx[k]} vs {n}"


def test_materialized_rollup_roundtrip(spark, sf_dir, tmp_path):
    """materialize_rollups → read_partials → derive must equal the direct
    queries: the count/sum cascade bit-identical, the HLL estimate exact-
    equal (the sketch bytes round-trip through parquet unchanged)."""
    from magiceye_spark.analytics import (
        _events,
        daily_from_partials,
        events_rollup_cascade,
        events_sketch_rollup,
        materialize_rollups,
        read_partials,
    )

    path = str(tmp_path / "partials")
    materialize_rollups(_events(spark, sf_dir), path)
    partials = read_partials(spark, path)

    direct = [tuple(r) for r in events_rollup_cascade(spark, sf_dir).collect()]
    derived = [tuple(r) for r in daily_from_partials(partials).collect()]
    assert derived == direct

    from magiceye_spark.analytics import sketch_rollup_from_partials

    direct_sk = [tuple(r) for r in events_sketch_rollup(spark, sf_dir).collect()]
    derived_sk = [tuple(r) for r in sketch_rollup_from_partials(partials).collect()]
    assert derived_sk == direct_sk


def test_estimate_join_size_tracks_exact(spark, sf_dir):
    """HLL join-size estimate within 5% of the exact join cardinality on
    a real FK join, and exact-ish on a planted uniform fan-out."""
    from magiceye_spark.sketches import estimate_join_size

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    est = estimate_join_size(
        lineitem.select("l_orderkey"), orders.select("o_orderkey").withColumnRenamed("o_orderkey", "l_orderkey"),
        ["l_orderkey"],
    ).first()
    exact = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
    assert abs(est.est_join_rows - exact) <= 0.05 * exact, (est.est_join_rows, exact)

    # planted: 100 keys x fan-out 3 on the left, 2 on the right = 600 rows
    from pyspark.sql import functions as F
    left = spark.range(300).select((F.col("id") % 100).alias("k"))
    right = spark.range(200).select((F.col("id") % 100).alias("k"))
    est2 = estimate_join_size(left, right, ["k"]).first()
    assert abs(est2.est_join_rows - 600) <= 0.05 * 600
