"""Relational analytics rows: the TPC-H query suite over the testdata tables.

Split from the single-file registry in r13; each @register call populates the shared _REGISTRY in magiceye_spark.registry (same driver contract, same keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from magiceye_spark import analytics
from magiceye_spark.registry import register


# ------------------------------------------------------------- analytics

@register("q1_pricing_summary", analytics.SQL_Q1)
def q1(spark, sf_dir):
    return analytics.q1_pricing_summary(spark, sf_dir)


@register("q3_shipping_priority", analytics.SQL_Q3)
def q3(spark, sf_dir):
    return analytics.q3_shipping_priority(spark, sf_dir)


@register("q5_local_supplier_volume", analytics.SQL_Q5)
def q5(spark, sf_dir):
    return analytics.q5_local_supplier_volume(spark, sf_dir)


@register("q6_forecast_revenue", analytics.SQL_Q6)
def q6(spark, sf_dir):
    return analytics.q6_forecast_revenue(spark, sf_dir)


@register("q4_order_priority", analytics.SQL_Q4)
def q4(spark, sf_dir):
    return analytics.q4_order_priority(spark, sf_dir)


@register("q7_nation_volume", analytics.SQL_Q7)
def q7(spark, sf_dir):
    return analytics.q7_nation_volume(spark, sf_dir)


@register("q8_market_share", analytics.SQL_Q8)
def q8(spark, sf_dir):
    return analytics.q8_market_share(spark, sf_dir)


@register("q10_returned_items", analytics.SQL_Q10)
def q10(spark, sf_dir):
    return analytics.q10_returned_items(spark, sf_dir)


@register("q12_shipmode_priority", analytics.sql_q12())
def q12(spark, sf_dir):
    """TPC-H Q12 over DERIVED ship attributes (analytics.derived_shipping):
    the testdata lacks shipmode/commitdate/receiptdate, so they're pure
    integer-arithmetic functions of (orderkey, linenumber, shipdate), with
    the identical derivation as the oracle CTE — the derived-partsupp
    precedent. Completes the expressible TPC-H set at 22/22."""
    return analytics.q12_shipmode_priority(spark, sf_dir)


@register("q13_order_count_distribution", analytics.SQL_Q13)
def q13(spark, sf_dir):
    return analytics.q13_order_count_distribution(spark, sf_dir)


@register("q14_promo_revenue", analytics.SQL_Q14)
def q14(spark, sf_dir):
    return analytics.q14_promo_revenue(spark, sf_dir)


@register("q15_top_supplier", analytics.SQL_Q15)
def q15(spark, sf_dir):
    return analytics.q15_top_supplier(spark, sf_dir)


@register("q17_small_quantity_revenue", analytics.SQL_Q17)
def q17(spark, sf_dir):
    return analytics.q17_small_quantity_revenue(spark, sf_dir)


@register("q18_large_volume_customers", analytics.SQL_Q18)
def q18(spark, sf_dir):
    return analytics.q18_large_volume_customers(spark, sf_dir)


@register("q19_bracket_revenue", analytics.SQL_Q19)
def q19(spark, sf_dir):
    return analytics.q19_bracket_revenue(spark, sf_dir)


@register("q21_sole_late_supplier", analytics.SQL_Q21)
def q21(spark, sf_dir):
    return analytics.q21_sole_late_supplier(spark, sf_dir)


@register("q22_idle_balances", analytics.SQL_Q22)
def q22(spark, sf_dir):
    return analytics.q22_idle_balances(spark, sf_dir)


@register("events_hourly_rollup", analytics.SQL_EVENTS_HOURLY)
def events_hourly(spark, sf_dir):
    return analytics.events_hourly_rollup(spark, sf_dir)


@register("events_rollup_cascade", analytics.SQL_ROLLUP_CASCADE)
def rollup_cascade_q(spark, sf_dir):
    """Daily totals derived from hourly PARTIALS (lossless re-aggregation;
    oracle aggregates raw directly — results must be bit-identical)."""
    return analytics.events_rollup_cascade(spark, sf_dir)


@register("events_sketch_rollup", None)  # HLL estimates: tolerance in tests
def sketch_rollup_q(spark, sf_dir):
    return analytics.events_sketch_rollup(spark, sf_dir)


# hash-checked attestation of the HLL rollup cascade (r12, verdict ask
# #2): per (day, type) emit the EXACT distinct (both engines compute it)
# plus within_bound = |sketch-union estimate − exact| ≤ 5% — the oracle
# asserts TRUE for every group, so a drifted sketch union (wrong merge,
# wrong estimate, re-aggregated COUNT DISTINCT overcount) flips row
# hashes. The 5% bound is deliberate headroom over HLL lgK=12's ~1.6%
# standard error; at driver SFs most groups sit in the sketch's exact
# sparse mode. The estimate itself stays rows-only in
# events_sketch_rollup (its value is approximate by contract).
_SQL_SKETCH_ERROR_BOUNDED = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("events_sketch_error_bounded", _SQL_SKETCH_ERROR_BOUNDED)
def sketch_error_bounded_q(spark, sf_dir):
    approx = analytics.events_sketch_rollup(spark, sf_dir)
    exact = (
        analytics._events(spark, sf_dir)  # noqa: SLF001
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("event_type"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_users"))
    )
    return (
        exact.join(approx, ["day", "event_type"])
        .select(
            F.col("day").cast("date").alias("day"),
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_bound"),
        )
        .orderBy("day", "event_type")
    )


@register("top_users_by_events", analytics.SQL_TOP_USERS)
def top_users(spark, sf_dir):
    return analytics.top_users_by_events(spark, sf_dir)


@register("orders_customer_rollup", analytics.SQL_ORDERS_ROLLUP)
def orders_rollup(spark, sf_dir):
    return analytics.orders_customer_rollup(spark, sf_dir)


@register("nation_coverage_setops", analytics.SQL_NATION_COVERAGE)
def setops_q(spark, sf_dir):
    return analytics.nation_coverage_setops(spark, sf_dir)


@register("orders_rollup_hierarchy", analytics.SQL_ROLLUP_HIERARCHY)
def rollup_hierarchy_q(spark, sf_dir):
    return analytics.orders_rollup_hierarchy(spark, sf_dir)


@register("events_pivot_by_type", analytics.SQL_EVENTS_PIVOT)
def pivot_q(spark, sf_dir):
    return analytics.events_pivot_by_type(spark, sf_dir)


