"""Relational analytics queries over the testdata star schema.

These demonstrate the engine's general query surface (the capability the
north-star mandates on top of the reference's diff-only feature set) and
anchor the benchmark. Monetary aggregates are summed as per-row-rounded
DECIMALs so Spark and the DuckDB oracle produce bit-identical values —
double summation order is engine-dependent, decimal addition is exact.

Every query is declarative DataFrame API: joins broadcast where a side is
dimension-sized, aggregations are partial (map-side) by construction, and
filters sit directly on the scan so parquet row-group pruning applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) — read as long (see
    session.py nanosAsLong) and truncate to microseconds with integer
    division (double division would lose precision at 1e18 nanos)."""
    e = _t(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return e


def _dec(col, scale=4):
    """Round a double expression per-row and fix it as decimal so SUM is
    exact and engine-order-independent."""
    return F.round(col, scale).cast(f"decimal(18,{scale})")


def _money(agg_col):
    return F.round(agg_col.cast("double"), 2)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag/linestatus."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"),
            _money(F.sum(_dec(F.col("l_extendedprice")))).alias("sum_base_price"),
            _money(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("sum_disc_price"),
            _money(
                F.sum(
                    _dec(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))
                    )
                )
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue, top 10. The customer filter
    side is dimension-sized → broadcast; the orders⋈lineitem join shuffles
    on o_orderkey only."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share a
    nation. All dimensions broadcast; one shuffle for the fact joins + one
    for the aggregation."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


SQL_Q5 = """
SELECT n_name,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + aggregate — the canonical pushdown test
    (filters reach the parquet scan; no shuffle except the final 1-row agg)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money(F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_Q6 = """
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * l_discount, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the events stream table (the batch
    shape of the streaming drift monitor's windowed agg)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def top_users_by_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function query: rank users by event count per event_type, keep
    top 5 per type. Single shuffle on event_type for the window."""
    e = _events(spark, sf_dir)
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .orderBy("event_type", "rnk")
    )


SQL_TOP_USERS = """
SELECT event_type, user_id, n_events, rnk FROM (
  SELECT event_type, user_id, n_events,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n_events DESC, user_id ASC) AS rnk
  FROM (
    SELECT event_type, user_id, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
  )
)
WHERE rnk <= 5
ORDER BY event_type, rnk
"""


def orders_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped join rollup: order counts + totals per market segment and
    order priority (broadcast dim join + single agg shuffle)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.sum(_dec(F.col("o_totalprice")))).alias("sum_totalprice"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


SQL_ORDERS_ROLLUP = """
SELECT c_mktsegment, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY 1, 2
"""
