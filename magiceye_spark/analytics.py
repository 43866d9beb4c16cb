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


def _t(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    from magiceye_spark.io import read_table

    return read_table(spark, sf_dir, name, parallelize=parallelize)


def _events(
    spark: SparkSession, sf_dir: str, parallelize: bool = False
) -> DataFrame:
    """Normalize events.ts to TIMESTAMP regardless of how the parquet was
    written. Known encodings across testdata generations: TIMESTAMP(NANOS)
    read as long (session.py nanosAsLong — truncate with integer division;
    double division would lose precision at 1e18 nanos), and plain
    timestamp[us] which Spark reads as TIMESTAMP_NTZ (cast to TIMESTAMP —
    value-preserving because the session TZ is pinned UTC in session.py)."""
    e = _t(spark, sf_dir, "events", parallelize=parallelize)
    dtype = dict(e.dtypes)["ts"]
    if dtype == "bigint":
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    return e


def _dec(col, scale=4):
    """Round a double expression per-row and fix it as decimal so SUM is
    exact and engine-order-independent."""
    return F.round(col, scale).cast(f"decimal(18,{scale})")


def _money(agg_col):
    return F.round(agg_col.cast("double"), 2)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag/linestatus."""
    l = _t(spark, sf_dir, "lineitem", parallelize=True)
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
    l = _t(spark, sf_dir, "lineitem", parallelize=True)
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


def hourly_partials(events: DataFrame) -> DataFrame:
    """Hour-grain PARTIAL aggregates designed for lossless re-aggregation:
    counts and unrounded decimal sums (sums of sums are exact) plus a
    mergeable HLL sketch of user_id (``hll_sketch_agg``) — the one stat a
    plain COUNT DISTINCT would make non-re-aggregable. This is the
    materialized-rollup building block: persist this table once, derive
    every coarser grain from it without touching raw events again."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec(F.col("value"))).alias("sum_value_partial"),
        F.hll_sketch_agg("user_id").alias("users_sketch"),
    )


def materialize_rollups(events: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the hourly partials to parquet, partitioned by calendar day.

    This is the at-scale entry point for the rollup cascade: write once per
    ingest batch, then derive every coarser grain (``daily_from_partials``,
    ``sketch_rollup_from_partials``) from the partials table — ~events/3600
    rows — without rescanning raw events. Day-partitioning means an
    incremental refresh overwrites only the touched days (dynamic partition
    overwrite — set per-write below so it holds regardless of the session's
    ``spark.sql.sources.partitionOverwriteMode``; without it a plain
    overwrite would STATICALLY delete every existing day) and a date-ranged
    rollup prunes at the directory level."""
    (
        hourly_partials(events)
        .withColumn("day", F.to_date(F.col("hour")))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )


def read_partials(spark: SparkSession, path: str) -> DataFrame:
    """Read a partials table written by :func:`materialize_rollups`,
    dropping the partition column so the frame matches ``hourly_partials``
    output exactly."""
    return spark.read.parquet(path).drop("day")


def daily_from_partials(partials: DataFrame) -> DataFrame:
    """(day, event_type, n_events, sum_value) from hourly partials. Lossless
    re-aggregation: sum of counts, sum of unrounded decimal sums — the
    result is bit-identical to aggregating raw events."""
    return (
        partials.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"), F.col("event_type")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            _money(F.sum("sum_value_partial")).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup derived from HOURLY PARTIALS: (day, event_type,
    n_events, sum_value). This registered query rebuilds the partials from
    raw events each call (nothing is persisted here); the point of the
    cascade shape is that when the hourly table IS materialized — see
    ``materialize_rollups`` — the daily pass reads ~24 rows per day instead
    of every raw event, and because the partials re-aggregate losslessly
    (sum of counts, sum of unrounded decimal sums), the result is
    bit-identical to aggregating raw, which is exactly what the DuckDB
    oracle checks."""
    return daily_from_partials(hourly_partials(_events(spark, sf_dir)))


SQL_ROLLUP_CASCADE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day and event_type by unioning the hourly HLL
    sketches (``hll_union_agg``) and estimating. As registered this
    rebuilds the hourly sketches from raw events each call; with the
    partials materialized (``materialize_rollups``) the daily estimate
    never rescans raw data — the sketch union is what makes that legal. The
    sketch column is KB-sized mergeable state — the only way a distinct
    count survives a rollup cascade; re-aggregating COUNT DISTINCT numbers
    would overcount every user active in multiple hours. Estimate error vs
    the exact distinct is pinned in tests."""
    return sketch_rollup_from_partials(hourly_partials(_events(spark, sf_dir)))


def sketch_rollup_from_partials(partials: DataFrame) -> DataFrame:
    """(day, event_type, approx_users) by unioning hourly HLL sketches —
    the derive-from-partials half of :func:`events_sketch_rollup`."""
    return (
        partials.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"), F.col("event_type")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("users_sketch")).alias(
                "approx_users"
            )
        )
        .orderBy("day", "event_type")
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


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join. Orders (in a quarter) that
    have at least one lineitem shipped >90 days after the order date,
    counted by priority. The semi join shuffles on orderkey only and never
    widens rows — the EXISTS decorrelation Catalyst would do for SQL,
    expressed directly."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    Customer and nation broadcast; the fact join shuffles once on orderkey,
    the aggregation once on custkey."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from one part class in a month.
    Conditional aggregation over a broadcast part join — both sums exact
    decimals, the final ratio one double division."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem", parallelize=True).where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_Q14 = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                                   THEN CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue_pct,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity), decorrelated into an aggregate + re-join — the plan Catalyst
    produces for the SQL form, written directly. The per-part average is an
    exact decimal sum / count rounded once, so both engines compare
    ``l_quantity < 0.2 * avg`` against the identical double."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_q = l.groupBy("l_partkey").agg(
        F.round(
            F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_q.withColumnRenamed("l_partkey", "a_partkey"),
              F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 4).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_Q17 = """
WITH avg_q AS (
  SELECT l_partkey AS a_partkey,
         ROUND(CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice, 4) AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_q ON l_partkey = a_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped fact, then enrich. The
    quantity rollup shuffles on orderkey; qualifying orderkeys are few, so
    the enrichment joins broadcast the filtered aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_money(F.sum(_dec(F.col("l_quantity")))).alias("sum_qty"))
        .where(F.col("sum_qty") > 170)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                F.round(F.col("o_totalprice"), 2).alias("o_totalprice"), "sum_qty")
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(100)
    )


SQL_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey,
         ROUND(CAST(SUM(CAST(ROUND(l_quantity, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty
  FROM lineitem GROUP BY 1
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 170
ORDER BY sum_qty DESC, o_orderkey
LIMIT 100
"""


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brackets over a broadcast
    part join — the OR-of-ANDs predicate Catalyst pushes into the join."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem", parallelize=True)
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.where(bracket).agg(
        _money(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_Q19 = """
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order (late = shipped >90 days after the order date).
    The double EXISTS/NOT-EXISTS correlation decorrelates into one grouped
    pass over the order's lineitems (conditional distinct counts), then a
    semi join back — two shuffles total, no correlated re-scans."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    j = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    qualifying = per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)).select(
        F.col("l_orderkey").alias("q_orderkey")
    )
    culprits = (
        j.where(F.col("is_late"))
        .join(qualifying, F.col("l_orderkey") == F.col("q_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        culprits.join(F.broadcast(s), culprits.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


SQL_Q21 = """
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM j GROUP BY l_orderkey
),
culprits AS (
  SELECT DISTINCT j.l_orderkey, j.l_suppkey
  FROM j JOIN per_order USING (l_orderkey)
  WHERE j.is_late AND per_order.n_supp > 1 AND per_order.n_late_supp = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM culprits JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average balance) + NOT
    EXISTS → left-anti join. The scalar is a broadcast 1-row cross join;
    the anti join shuffles on custkey only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    n = _t(spark, sf_dir, "nation")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bal")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        rich.join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money(F.sum(_dec(F.col("c_acctbal")))).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, both
    directions. Nation dims broadcast twice (supplier side, customer side);
    the fact joins shuffle on their keys once."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _money(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue by year —
    conditional-sum ratio over a multi-dim broadcast join tree."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


SQL_Q8 = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                       THEN CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY o_year
ORDER BY o_year
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer (including
    zero-order customers via left outer join). Two aggregations: per-customer
    count, then histogram over counts — the second input is customer-sized,
    so its shuffle is negligible."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


#: deterministic shipping attributes for Q12 — the testdata lacks
#: l_shipmode/l_commitdate/l_receiptdate, so they are DERIVED from
#: (l_orderkey, l_linenumber, l_shipdate) by pure integer arithmetic,
#: following the derived-partsupp precedent (partsupp.py): the identical
#: derivation is emitted as a SQL CTE for the DuckDB oracle, so the query
#: remains oracle-checked over shipped inputs only.
_SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]


def derived_shipping(l: DataFrame) -> DataFrame:
    """lineitem + (l_shipmode, l_commitdate, l_receiptdate), all derived:
    mode = modes[(3·okey + lineno) mod 7]; commitdate = shipdate +
    ((5·okey + 11·lineno) mod 61 − 30) days (can precede or follow ship);
    receiptdate = shipdate + ((7·okey + 13·lineno) mod 28 + 1) days.
    Map-side expressions only — no shuffle, no data generation."""
    okey, lineno = F.col("l_orderkey"), F.col("l_linenumber").cast("bigint")
    mode_idx = (okey * 3 + lineno) % 7
    commit_off = ((okey * 5 + lineno * 11) % 61 - 30).cast("int")
    receipt_off = ((okey * 7 + lineno * 13) % 28 + 1).cast("int")
    ship_d = F.col("l_shipdate").cast("date")
    return l.select(
        "*",
        F.element_at(F.array(*[F.lit(m) for m in _SHIPMODES]), (mode_idx + 1).cast("int")).alias("l_shipmode"),
        F.date_add(ship_d, commit_off).alias("l_commitdate"),
        F.date_add(ship_d, receipt_off).alias("l_receiptdate"),
    )


#: the identical derivation as a DuckDB CTE over lineitem
SHIPPING_CTE = """
WITH lineitem_s AS (
  SELECT *,
         ['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB']
           [CAST((l_orderkey * 3 + l_linenumber) % 7 AS INT) + 1] AS l_shipmode,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 5 + l_linenumber * 11) % 61 - 30 AS INT) AS l_commitdate,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 7 + l_linenumber * 13) % 28 + 1 AS INT) AS l_receiptdate
  FROM lineitem
)
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str, year: int = 1996) -> DataFrame:
    """TPC-H Q12 shape: for late deliveries (committed before received,
    shipped before committed) received in ``year`` via MAIL or SHIP, count
    critical- vs non-critical-priority orders per ship mode. One
    orderkey-equi-join (lineitem side pre-filtered on the scan), then a
    7-group aggregation — the canonical Q12 plan. Ship attributes derived
    per :func:`derived_shipping`; pure counts, engine-exact."""
    l = derived_shipping(_t(spark, sf_dir, "lineitem")).where(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
        & (F.year("l_receiptdate") == year)
    )
    o = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


def sql_q12(year: int = 1996) -> str:
    return SHIPPING_CTE + f"""
SELECT l_shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem_s JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipmode IN ('MAIL','SHIP')
  AND l_commitdate < l_receiptdate
  AND CAST(l_shipdate AS DATE) < l_commitdate
  AND YEAR(l_receiptdate) = {year}
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum revenue in a quarter — the
    scalar-max-over-aggregate pattern (the revenue view joined to its own
    max). The max is a scalar aggregate crossJoined back broadcast: a
    ``MAX() OVER ()`` window here would funnel the whole supplier-grain
    rollup through one task, while the scalar agg computes partial maxes
    map-side and moves one row."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy("l_suppkey").agg(
        _money(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        ).alias("total_revenue")
    )
    revenue.persist()  # supplier-grain rollup: the max pass and the
    # filter pass share it instead of re-scanning lineitem
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.crossJoin(F.broadcast(max_rev)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_Q15 = """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def nation_coverage_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator surface: nations with BOTH customers and suppliers
    (INTERSECT) and nations with customers but NO suppliers (EXCEPT),
    tagged. Spark's intersect/exceptAll are distinct-set/multiset exact."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    n = _t(spark, sf_dir, "nation")
    both = c.intersect(s).withColumn("coverage", F.lit("both"))
    cust_only = c.exceptAll(s).withColumn("coverage", F.lit("customers_only"))
    return (
        both.unionByName(cust_only)
        .join(F.broadcast(n), F.col("nk") == n.n_nationkey)
        .select("n_name", "coverage")
        .orderBy("n_name")
    )


SQL_NATION_COVERAGE = """
SELECT n_name, coverage FROM (
  SELECT nk, 'both' AS coverage FROM (
    SELECT DISTINCT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nk FROM supplier
  )
  UNION ALL
  SELECT nk, 'customers_only' AS coverage FROM (
    SELECT DISTINCT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nk FROM supplier
  )
) t JOIN nation ON nk = n_nationkey
ORDER BY n_name
"""


def orders_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: order counts/totals at (segment, priority),
    (segment), and grand-total levels in one pass — Spark computes all
    grouping sets in a single shuffle with partial aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.sum(_dec(F.col("o_totalprice")))).alias("sum_totalprice"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("<all>")).alias("mktsegment"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n_orders",
            "sum_totalprice",
        )
        .orderBy("mktsegment", "orderpriority")
    )


SQL_ROLLUP_HIERARCHY = """
SELECT COALESCE(c_mktsegment, '<all>') AS mktsegment,
       COALESCE(o_orderpriority, '<all>') AS orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
ORDER BY mktsegment, orderpriority
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts with one column per event type. The
    explicit value list keeps the plan single-pass (no extra distinct scan
    to discover pivot values)."""
    e = _events(spark, sf_dir)
    out = e.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    ).orderBy("user_id")


SQL_EVENTS_PIVOT = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


SQL_Q22 = """
WITH avg_bal AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(c_acctbal, 4) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(ROUND(c_acctbal, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS totacctbal
FROM customer, avg_bal
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
ORDER BY n_name
"""


def events_anomalous_days(spark: SparkSession, sf_dir: str, z_cut: float = 2.0) -> DataFrame:
    """Days whose event volume deviates from their event_type's mean by more
    than ``z_cut`` sample standard deviations: (event_type, day, n_events,
    z). The rollup-level anomaly screen (outage days, bot spikes) a
    monitoring pipeline runs on the partials table.

    The moments are computed EXPLICITLY from integer counts (Σn, Σn², days)
    rather than a stddev built-in, so the doubles go through the identical
    IEEE operations on any engine — the same determinism trick as
    ``value_k_corr``. Two small shuffles: the daily rollup, then a
    per-event_type aggregate of day-count rows (catalog-sized)."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n_days")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_days")) / (
        F.col("n_days") - 1
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    # Filter on the UNROUNDED z (the oracle SQL does the same) and round only
    # in the projection; var > 0 guards the all-days-equal group, where Spark
    # yields NULL but IEEE float division can yield NaN (> z_cut in DuckDB).
    return (
        daily.join(F.broadcast(mom), "event_type")
        .where(F.col("n_days") > 1)
        .where(var > 0)
        .where(F.abs(z) > z_cut)
        .select("event_type", "day", "n_events", F.round(z, 4).alias("z"))
        .orderBy("event_type", "day")
    )


def events_robust_outliers(
    spark: SparkSession, sf_dir: str, k: float = 3.5
) -> DataFrame:
    """Median/MAD outlier fence per event_type: (event_type, n, med, mad,
    n_outliers) where an outlier is ``|v − median| > k · MAD``. The
    heavy-tail-safe complement to :func:`events_anomalous_days`'s
    mean/stddev z-screen — one pathological whale moves a mean fence but
    not a median one.

    Engine determinism: medians are exact percentiles (linear interpolation
    of two order statistics — no float summation anywhere, so DuckDB
    computes bit-identical values), counts are integers; med/mad rounded
    only in the projection. Three grouped passes over the fact table (med →
    MAD → fence counts) with the KB-sized intermediate broadcast back; at
    100 TB swap the exact percentile for ``approx_percentile`` and keep the
    same shape."""
    e = _events(spark, sf_dir).select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    med = e.groupBy("event_type").agg(F.expr("percentile(v, 0.5)").alias("med"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(v - med), 0.5)").alias("mad"),
        )
    )
    return (
        e.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("v").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.count(
                F.when(F.abs(F.col("v") - F.col("med")) > k * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def sql_events_robust_outliers(k: float = 3.5) -> str:
    return f"""
WITH e AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
med AS (
  SELECT event_type, percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS med
  FROM e GROUP BY event_type),
mad AS (
  SELECT e.event_type, MIN(med) AS med,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY ABS(v - med)) AS mad
  FROM e JOIN med USING (event_type) GROUP BY e.event_type)
SELECT e.event_type, COUNT(v) AS n,
       ROUND(MIN(med), 6) AS med, ROUND(MIN(mad), 6) AS mad,
       COUNT(CASE WHEN ABS(v - med) > {k} * mad THEN 1 END) AS n_outliers
FROM e JOIN mad USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def sql_events_anomalous_days(z_cut: float = 2.0) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2),
mom AS (
  SELECT event_type, COUNT(*) AS n_days,
         SUM(n_events) AS s1, SUM(n_events * n_events) AS s2
  FROM daily GROUP BY event_type)
SELECT event_type, day, n_events,
       ROUND((n_events - s1 / CAST(n_days AS DOUBLE))
             / SQRT((s2 - s1 * s1 / CAST(n_days AS DOUBLE))
                    / (n_days - 1)), 4) AS z
FROM daily JOIN mom USING (event_type)
WHERE n_days > 1
  AND (s2 - s1 * s1 / CAST(n_days AS DOUBLE)) / (n_days - 1) > 0
  AND ABS((n_events - s1 / CAST(n_days AS DOUBLE))
          / SQRT((s2 - s1 * s1 / CAST(n_days AS DOUBLE))
                 / (n_days - 1))) > {z_cut}
ORDER BY event_type, day
"""


def customer_rfm(spark: SparkSession, sf_dir: str, n_tiles: int = 4) -> DataFrame:
    """RFM segmentation over orders: per customer, recency (days since
    last order relative to the corpus max date), frequency (order count),
    monetary (exact-decimal total spend) — each quartile-coded with NTILE
    into 1..n (1 = best: most recent / most frequent / highest spend) and
    concatenated into the classic 'rfm' segment code. NTILE ties are
    broken on custkey so both engines cut identically.

    One orders aggregation, then three two-phase global ranks
    (:func:`magiceye_spark.io.two_phase_window`: range-partition +
    within-partition rank + broadcast prefix offsets) over the
    per-customer rollup — NO unpartitioned ``Window.orderBy``, so no
    single-task sort when the customer table is hundreds of millions of
    rows. NTILE is recovered arithmetically from the global rank: with N
    rows and n tiles, the first N%n tiles hold ceil(N/n) rows and the
    rest floor(N/n) — exactly the SQL NTILE bucket rule both engines
    implement."""
    from magiceye_spark.io import two_phase_window
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        _money(F.sum(_dec(F.col("o_totalprice")))).alias("monetary"),
    )
    max_date = per_cust.agg(F.max("last_order").alias("max_date"))
    scored = per_cust.crossJoin(F.broadcast(max_date)).select(
        F.col("o_custkey").alias("custkey"),
        F.datediff(F.col("max_date"), F.col("last_order")).cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    ranked = two_phase_window(
        scored, [F.col("recency_days").asc(), F.col("custkey").asc()], rank_col="_gr"
    )
    ranked = two_phase_window(
        ranked, [F.col("frequency").desc(), F.col("custkey").asc()], rank_col="_gf"
    )
    ranked = two_phase_window(
        ranked, [F.col("monetary").desc(), F.col("custkey").asc()], rank_col="_gm"
    )
    # N rides as a broadcast scalar column, not a driver-side count(): the
    # plan stays lazy and self-contained (no stale-count hazard if the
    # input changes between build and execution)
    n_count = scored.agg(F.count(F.lit(1)).alias("_n"))
    ranked = (
        ranked.crossJoin(F.broadcast(n_count))
        .withColumn("_q", F.expr(f"_n div {n_tiles}"))
        .withColumn("_rem", F.expr(f"_n % {n_tiles}"))
        .withColumn("_thr", F.expr("_rem * (_q + 1)"))
    )

    def tile(rank: str):
        # SQL NTILE bucket rule from the global rank; the _q = 0 branch
        # (fewer rows than tiles) also guards the `div _q` in the tail
        # (CASE branches evaluate lazily, so no ANSI div-by-zero)
        return F.expr(
            f"CASE WHEN _q = 0 OR {rank} <= _thr THEN ({rank} + _q) div (_q + 1) "
            f"ELSE _rem + ({rank} - _thr + _q - 1) div _q END"
        ).cast("long")

    return ranked.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        tile("_gr").alias("r_tile"),
        tile("_gf").alias("f_tile"),
        tile("_gm").alias("m_tile"),
    ).withColumn(
        "rfm", F.concat_ws("", "r_tile", "f_tile", "m_tile")
    ).orderBy("custkey")


def sql_customer_rfm(n_tiles: int = 4) -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS monetary
  FROM orders GROUP BY o_custkey),
m AS (SELECT MAX(last_order) AS max_date FROM per_cust),
scored AS (
  SELECT custkey,
         CAST(DATEDIFF('day', last_order, max_date) AS BIGINT) AS recency_days,
         frequency, monetary
  FROM per_cust CROSS JOIN m)
SELECT custkey, recency_days, frequency, monetary,
       CAST(NTILE({n_tiles}) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_tile,
       CAST(NTILE({n_tiles}) OVER (ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_tile,
       CAST(NTILE({n_tiles}) OVER (ORDER BY monetary DESC, custkey ASC) AS BIGINT) AS m_tile,
       CONCAT(
         CAST(NTILE({n_tiles}) OVER (ORDER BY recency_days ASC, custkey ASC) AS VARCHAR),
         CAST(NTILE({n_tiles}) OVER (ORDER BY frequency DESC, custkey ASC) AS VARCHAR),
         CAST(NTILE({n_tiles}) OVER (ORDER BY monetary DESC, custkey ASC) AS VARCHAR)
       ) AS rfm
FROM scored
ORDER BY custkey
"""


def parts_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC inventory analysis: parts ranked by exact-decimal revenue,
    classified A (top 80% of cumulative revenue share), B (to 95%), C
    (tail). The cumulative share uses the EXACT decimal running sum over
    (revenue DESC, partkey) so the class boundaries are engine-identical;
    doubles appear only in the reported share.

    The running sum is the two-phase formulation (range-partition +
    within-partition running sum + broadcast per-partition prefix totals,
    :func:`magiceye_spark.io.two_phase_window`) — identical values to
    ``SUM() OVER (ORDER BY …)`` but parallel over the part table instead
    of a single-task global sort."""
    from magiceye_spark.io import two_phase_window

    l = _t(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev_dec")
    )
    tot = rev.agg(F.sum("rev_dec").alias("total"))
    cum = two_phase_window(
        rev,
        [F.col("rev_dec").desc(), F.col("l_partkey").asc()],
        cumsum={"cum": "rev_dec"},
    )
    classed = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn(
            # exact decimal sums; ONE IEEE double division so the class
            # boundary is bit-identical across engines (decimal-division
            # scale rules differ between Spark and DuckDB)
            "share_raw", F.col("cum").cast("double") / F.col("total").cast("double")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("rev_dec"),
            F.when(F.col("share_raw") <= 0.80, "A")
            .when(F.col("share_raw") <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    # carry the EXACT decimal into the rollup — rounding per-part revenue
    # to cents first and re-summing diverges between engines wherever a
    # part lands on a half-cent (ROUND half-up vs half-even on doubles)
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        _money(F.sum("rev_dec")).alias("class_revenue"),
    ).orderBy("abc_class")


def sql_parts_abc_classes() -> str:
    return """
WITH rev AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS rev_dec
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT SUM(rev_dec) AS total FROM rev),
c AS (
  SELECT partkey, rev_dec,
         CAST(SUM(rev_dec) OVER (ORDER BY rev_dec DESC, partkey ASC
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(total AS DOUBLE) AS cum_share_raw
  FROM rev CROSS JOIN t)
SELECT CASE WHEN cum_share_raw <= 0.80 THEN 'A'
            WHEN cum_share_raw <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts,
       ROUND(CAST(SUM(rev_dec) AS DOUBLE), 2) AS class_revenue
FROM c
GROUP BY 1
ORDER BY 1
"""


def basket_pair_lift(spark: SparkSession, sf_dir: str, min_pair_orders: int = 3) -> DataFrame:
    """Market-basket analysis: part pairs co-purchased in the same order,
    with support counts and LIFT = P(a,b) / (P(a)·P(b)). The
    cross_source_overlap plan — ONE order-grouped collect_set, pairs
    exploded row-locally from each order's (small) part set, pair counts
    aggregated; per-part order counts join back broadcast. No self-join
    of the lineitem table."""
    l = _t(spark, sf_dir, "lineitem")
    sets = (
        l.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    n_orders = sets.count()
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda a, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda b: F.struct(a.alias("part_a"), b.alias("part_b")),
            ),
        )
    )
    pair_counts = (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_pair_orders)
    )
    part_counts = (
        l.select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ca = part_counts.select(F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_a"))
    cb = part_counts.select(F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_b"))
    return (
        pair_counts.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                (F.col("n_both") * F.lit(float(n_orders)))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )


def sql_basket_pair_lift(min_pair_orders: int = 3) -> str:
    return f"""
WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_both
  FROM po a JOIN po b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_pair_orders}),
pc AS (SELECT l_partkey, COUNT(*) AS n_orders_part FROM po GROUP BY 1)
SELECT part_a, part_b, n_both,
       ROUND(n_both * CAST(n.n_orders AS DOUBLE) / (ca.n_orders_part * cb.n_orders_part), 4) AS lift
FROM pairs
JOIN pc ca ON ca.l_partkey = pairs.part_a
JOIN pc cb ON cb.l_partkey = pairs.part_b
CROSS JOIN n
ORDER BY part_a, part_b
"""


def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the revenue-concentration
    scalar behind 'whales vs long tail' decisions:
    G = Σ(2i − n − 1)·x_i / (n·Σx) over spend sorted ascending.

    Spend totals are EXACT decimals; ranks come from a two-phase global
    rank over the customer rollup (tie-broken on custkey,
    :func:`magiceye_spark.io.two_phase_window` — no single-task sort);
    the weighted sum uses decimal×integer products so only the final
    ratio is floating point. Σ(2i − n − 1)·x_i is folded to
    2·Σi·x_i − (n + 1)·Σx_i — exactly equal in decimal arithmetic — so
    the constant n never needs a per-row column (the old form needed an
    unpartitioned COUNT(*) OVER ()). Output: one row (n_customers,
    total_spend, gini)."""
    from magiceye_spark.io import two_phase_window

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(_dec(F.col("o_totalprice"))).alias("spend")
    )
    ranked = two_phase_window(
        per_cust, [F.col("spend").asc(), F.col("o_custkey").asc()], rank_col="i"
    )
    n = F.count(F.lit(1))
    return ranked.agg(
        n.alias("n_customers"),
        _money(F.sum("spend")).alias("total_spend"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("spend")) - (n + 1) * F.sum("spend"))
            .cast("double")
            / (n.cast("double") * F.sum("spend").cast("double")),
            6,
        ).alias("gini"),
    )


def sql_customer_spend_gini() -> str:
    return """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4))) AS spend
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT spend,
         ROW_NUMBER() OVER (ORDER BY spend ASC, o_custkey ASC) AS i,
         COUNT(*) OVER () AS n
  FROM per_cust)
SELECT COUNT(*) AS n_customers,
       ROUND(CAST(SUM(spend) AS DOUBLE), 2) AS total_spend,
       ROUND(CAST(SUM((2 * i - n - 1) * spend) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(spend) AS DOUBLE)), 6) AS gini
FROM ranked
"""


def orders_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order split into NEW (customer's first-ever order month)
    vs RETURNING — the growth-vs-retention curve. The first-order month
    comes from one customer-keyed window; the monthly rollup is a
    conditional aggregation. Output per month: n_orders, n_new,
    n_returning, new_frac."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    flagged = o.select(
        month.alias("month"),
        (month == F.min(month).over(w)).cast("int").alias("is_new"),
    )
    return (
        flagged.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("is_new").cast("long").alias("n_new"),
            (F.count(F.lit(1)) - F.sum("is_new")).cast("long").alias("n_returning"),
            F.round(F.sum("is_new") / F.count(F.lit(1)), 4).alias("new_frac"),
        )
        .orderBy("month")
    )


def sql_orders_new_vs_returning() -> str:
    return """
WITH f AS (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
         CASE WHEN DATE_TRUNC('month', o_orderdate) =
                   MIN(DATE_TRUNC('month', o_orderdate)) OVER (PARTITION BY o_custkey)
              THEN 1 ELSE 0 END AS is_new
  FROM orders)
SELECT month,
       COUNT(*) AS n_orders,
       CAST(SUM(is_new) AS BIGINT) AS n_new,
       CAST(COUNT(*) - SUM(is_new) AS BIGINT) AS n_returning,
       ROUND(SUM(is_new) / CAST(COUNT(*) AS DOUBLE), 4) AS new_frac
FROM f
GROUP BY month
ORDER BY month
"""


def daily_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest over the event stream: predict each
    day's count per event type with the SAME-WEEKDAY-LAST-WEEK value
    (lag 7 on the daily series) and score MAE / MAPE / bias per type —
    the baseline every real forecaster must beat, and the backtest
    machinery (lag-as-prediction → error rollup) any model would reuse.
    Integer errors; doubles only in the final ratios."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.withColumn("pred", F.lag("n", 7).over(w)).where(
        F.col("pred").isNotNull()
    )
    err = F.col("n") - F.col("pred")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(F.abs(err)), 4).alias("mae"),
            F.round(F.avg(F.abs(err) / F.col("n")), 4).alias("mape"),
            F.round(F.avg(err), 4).alias("bias"),
        )
        .orderBy("event_type")
    )


def sql_daily_forecast_backtest() -> str:
    return """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT event_type, n,
         LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
  FROM daily)
SELECT event_type,
       COUNT(*) AS n_days,
       ROUND(AVG(ABS(n - pred)), 4) AS mae,
       ROUND(AVG(ABS(n - pred) / CAST(n AS DOUBLE)), 4) AS mape,
       ROUND(AVG(n - pred), 4) AS bias
FROM scored WHERE pred IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier performance rollup joined with the supplier dimension:
    exact-decimal revenue, line count, distinct parts, average discount,
    and return rate (share of 'R' return-flag lines) — the vendor-review
    table. One lineitem aggregation + a broadcast dimension join."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    per_supp = l.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_partkey").alias("n_parts"),
        _money(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        ).alias("revenue"),
        F.round(F.avg(_dec(F.col("l_discount")).cast("double")), 4).alias("avg_discount"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("return_rate"),
    )
    return (
        per_supp.join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
            "n_lines",
            "n_parts",
            "revenue",
            "avg_discount",
            "return_rate",
        )
        .orderBy("suppkey")
    )


def sql_supplier_scorecard() -> str:
    return """
WITH per_supp AS (
  SELECT l_suppkey AS suppkey,
         COUNT(*) AS n_lines,
         COUNT(DISTINCT l_partkey) AS n_parts,
         ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
         ROUND(AVG(CAST(CAST(ROUND(l_discount, 4) AS DECIMAL(18,4)) AS DOUBLE)), 4) AS avg_discount,
         ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4) AS return_rate
  FROM lineitem GROUP BY l_suppkey)
SELECT suppkey, s.s_name AS supplier, n_lines, n_parts, revenue, avg_discount, return_rate
FROM per_supp JOIN supplier s ON s.s_suppkey = per_supp.suppkey
ORDER BY suppkey
"""


def events_daily_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p95 of event value per type — the latency/value SLO trend
    chart's data. Exact interpolated percentiles per (type, day) group;
    the full value set shuffles once per group, fine at daily grain."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        )
        .orderBy("event_type", "day")
    )


SQL_DAILY_PERCENTILE_TREND = """
SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.95), 4) AS p95
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def order_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of lines per order: (n_lines, n_orders, share) — the
    basket-size histogram feeding packing and pricing decisions. Two
    cheap aggregations (order rollup, then histogram)."""
    l = _t(spark, sf_dir, "lineitem")
    sizes = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    total = sizes.count()
    return (
        sizes.groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "n_lines",
            "n_orders",
            F.round(F.col("n_orders") / F.lit(float(total)), 6).alias("share"),
        )
        .orderBy("n_lines")
    )


SQL_ORDER_SIZE_HISTOGRAM = """
WITH sizes AS (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey),
t AS (SELECT COUNT(*) AS total FROM sizes)
SELECT n_lines, COUNT(*) AS n_orders,
       ROUND(COUNT(*) / CAST(MIN(total) AS DOUBLE), 6) AS share
FROM sizes CROSS JOIN t
GROUP BY n_lines
ORDER BY n_lines
"""


def quarterly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly revenue with year-over-year growth: exact-decimal revenue
    per quarter, YoY = rev / lag(rev, 4) − 1 over the quarter series —
    the finance rollup. One orders aggregation + one catalog-sized lag
    window; growth is ONE double division per row."""
    o = _t(spark, sf_dir, "orders")
    q = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    ).agg(F.sum(_dec(F.col("o_totalprice"))).alias("rev_dec"))
    w = Window.orderBy("yr", "qtr")
    prev = F.lag("rev_dec", 4).over(w)
    return q.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("qtr").cast("long").alias("qtr"),
        _money(F.col("rev_dec")).alias("revenue"),
        F.round(
            (F.col("rev_dec").cast("double") / prev.cast("double")) - 1.0, 4
        ).alias("yoy_growth"),
    ).orderBy("yr", "qtr")


SQL_QUARTERLY_REVENUE_YOY = """
WITH q AS (
  SELECT YEAR(o_orderdate) AS yr, QUARTER(o_orderdate) AS qtr,
         SUM(CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY 1, 2)
SELECT CAST(yr AS BIGINT) AS yr, CAST(qtr AS BIGINT) AS qtr,
       ROUND(CAST(rev_dec AS DOUBLE), 2) AS revenue,
       ROUND(CAST(rev_dec AS DOUBLE)
             / CAST(LAG(rev_dec, 4) OVER (ORDER BY yr, qtr) AS DOUBLE) - 1.0, 4) AS yoy_growth
FROM q
ORDER BY yr, qtr
"""


def error_rate_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPC p-chart over the event stream: hourly error share vs binomial
    3σ control limits around the overall rate
    (UCL/LCL = p̄ ± 3·√(p̄(1−p̄)/n)) — the alert rule that adapts its
    threshold to each hour's sample size instead of a fixed cut. One
    hourly aggregation + a broadcast scalar; flags computed per row."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("n_err"),
    )
    overall = hourly.agg(
        (F.sum("n_err") / F.sum("n")).alias("p_bar")
    )
    p = F.col("n_err") / F.col("n")
    sigma = F.sqrt(F.col("p_bar") * (1 - F.col("p_bar")) / F.col("n"))
    return (
        hourly.crossJoin(F.broadcast(overall))
        .select(
            F.col("hour").cast("timestamp").alias("hour"),
            "n",
            F.col("n_err").cast("long").alias("n_err"),
            F.round(p, 6).alias("p"),
            F.round(F.col("p_bar") + 3 * sigma, 6).alias("ucl"),
            F.round(F.greatest(F.col("p_bar") - 3 * sigma, F.lit(0.0)), 6).alias("lcl"),
            (
                (p > F.col("p_bar") + 3 * sigma)
                | (p < F.greatest(F.col("p_bar") - 3 * sigma, F.lit(0.0)))
            ).alias("out_of_control"),
        )
        .orderBy("hour")
    )


SQL_ERROR_RATE_CONTROL_CHART = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
  FROM events GROUP BY 1),
o AS (SELECT SUM(n_err) / CAST(SUM(n) AS DOUBLE) AS p_bar FROM hourly)
SELECT CAST(hour AS TIMESTAMP) AS hour, n, CAST(n_err AS BIGINT) AS n_err,
       ROUND(n_err / CAST(n AS DOUBLE), 6) AS p,
       ROUND(p_bar + 3 * SQRT(p_bar * (1 - p_bar) / n), 6) AS ucl,
       ROUND(GREATEST(p_bar - 3 * SQRT(p_bar * (1 - p_bar) / n), 0.0), 6) AS lcl,
       (n_err / CAST(n AS DOUBLE) > p_bar + 3 * SQRT(p_bar * (1 - p_bar) / n)
        OR n_err / CAST(n AS DOUBLE) < GREATEST(p_bar - 3 * SQRT(p_bar * (1 - p_bar) / n), 0.0)) AS out_of_control
FROM hourly CROSS JOIN o
ORDER BY hour
"""


def cohort_ltv_curve(spark: SparkSession, sf_dir: str, max_months: int = 12) -> DataFrame:
    """Cohort LTV curves: customers grouped by FIRST-ORDER month, tracking
    cumulative revenue per customer over months since acquisition — the
    payback-period table. One first-order window, one (cohort, age)
    aggregation, one cumulative window over the catalog-sized rollup;
    exact decimals END TO END: the per-customer quotient is rounded to
    cents via exact BIGINT half-up arithmetic (floor((2X + 10⁴n)/(2·10⁴n))
    over X = cum·10⁶), because cum/size is the mean shape whose true
    value can land exactly on a half-cent (sf0.1 cohort 1997-07-01 age 11:
    15246010.92/24 = 635250.455), where a double quotient is 1 ulp off the
    half and the engines' ROUNDs disagree."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    first_month = F.date_trunc("month", F.min("o_orderdate").over(w)).cast("date")
    tagged = o.select(
        "o_custkey",
        first_month.alias("cohort"),
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), first_month
        ).cast("long").alias("age_months"),
        _dec(F.col("o_totalprice")).alias("rev"),
    ).where(F.col("age_months") < max_months)
    sizes = tagged.groupBy("cohort").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    by_age = tagged.groupBy("cohort", "age_months").agg(
        F.sum("rev").alias("rev_dec")
    )
    wc = Window.partitionBy("cohort").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        by_age.withColumn("cum_dec", F.sum("rev_dec").over(wc))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_months",
            "cohort_size",
            _money(F.col("rev_dec")).alias("revenue"),
            (
                F.expr(
                    "(2 * CAST(cum_dec * 1000000 AS BIGINT)"
                    " + 10000 * cohort_size)"
                    " DIV (20000 * cohort_size)"
                ).cast("double")
                / 100
            ).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort", "age_months")
    )


def sql_cohort_ltv_curve(max_months: int = 12) -> str:
    return f"""
WITH f AS (
  SELECT o_custkey,
         CAST(DATE_TRUNC('month', MIN(o_orderdate) OVER (PARTITION BY o_custkey)) AS DATE) AS cohort,
         CAST(DATEDIFF('month',
              DATE_TRUNC('month', MIN(o_orderdate) OVER (PARTITION BY o_custkey)),
              DATE_TRUNC('month', o_orderdate)) AS BIGINT) AS age_months,
         CAST(ROUND(o_totalprice, 4) AS DECIMAL(18,4)) AS rev
  FROM orders),
t AS (SELECT * FROM f WHERE age_months < {max_months}),
sizes AS (SELECT cohort, COUNT(DISTINCT o_custkey) AS cohort_size FROM t GROUP BY cohort),
by_age AS (SELECT cohort, age_months, SUM(rev) AS rev_dec FROM t GROUP BY cohort, age_months),
cum AS (
  SELECT cohort, age_months, rev_dec,
         SUM(rev_dec) OVER (PARTITION BY cohort ORDER BY age_months
                            ROWS UNBOUNDED PRECEDING) AS cum_dec
  FROM by_age)
SELECT c.cohort, c.age_months, s.cohort_size,
       ROUND(CAST(c.rev_dec AS DOUBLE), 2) AS revenue,
       -- exact BIGINT half-up cents: cum/size can land exactly on a
       -- half-cent (see cohort_ltv_curve docstring); // is DuckDB's
       -- integer floor division (Spark side uses DIV)
       CAST((2 * CAST(c.cum_dec * 1000000 AS BIGINT)
             + 10000 * s.cohort_size)
            // (20000 * s.cohort_size) AS DOUBLE) / 100
         AS cum_ltv_per_customer
FROM cum c JOIN sizes s ON s.cohort = c.cohort
ORDER BY c.cohort, c.age_months
"""


def cohort_retention_triangle(spark: SparkSession, sf_dir: str, max_months: int = 12) -> DataFrame:
    """The classic retention triangle: for each acquisition-month cohort,
    the share of its customers active again at each month age — the
    companion to the LTV curve tracking PRESENCE instead of revenue. One
    first-order window + one distinct (cohort, age, customer) rollup."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    first_month = F.date_trunc("month", F.min("o_orderdate").over(w)).cast("date")
    tagged = o.select(
        "o_custkey",
        first_month.alias("cohort"),
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), first_month
        ).cast("long").alias("age_months"),
    ).where(F.col("age_months") < max_months).distinct()
    sizes = tagged.where(F.col("age_months") == 0).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = tagged.groupBy("cohort", "age_months").agg(
        F.count(F.lit(1)).alias("active_customers")
    )
    return (
        active.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_months",
            "cohort_size",
            "active_customers",
            F.round(F.col("active_customers") / F.col("cohort_size"), 4).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort", "age_months")
    )


def sql_cohort_retention_triangle(max_months: int = 12) -> str:
    return f"""
WITH f AS (
  SELECT DISTINCT o_custkey,
         CAST(DATE_TRUNC('month', MIN(o_orderdate) OVER (PARTITION BY o_custkey)) AS DATE) AS cohort,
         CAST(DATEDIFF('month',
              DATE_TRUNC('month', MIN(o_orderdate) OVER (PARTITION BY o_custkey)),
              DATE_TRUNC('month', o_orderdate)) AS BIGINT) AS age_months
  FROM orders),
t AS (SELECT * FROM f WHERE age_months < {max_months}),
sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM t WHERE age_months = 0 GROUP BY cohort),
a AS (SELECT cohort, age_months, COUNT(*) AS active_customers FROM t GROUP BY cohort, age_months)
SELECT a.cohort, a.age_months, s.cohort_size, a.active_customers,
       ROUND(a.active_customers / CAST(s.cohort_size AS DOUBLE), 4) AS retention_rate
FROM a JOIN sizes s ON s.cohort = a.cohort
ORDER BY a.cohort, a.age_months
"""


def repurchase_interval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase behavior in one row: share of one-time customers, and
    the p25/p50/p90 of days between consecutive orders — the
    reorder-cycle numbers behind retention targets and churn windows.
    One customer-keyed lag window over orders; exact interpolated
    percentiles on integer day gaps."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("double").alias("gap_days"),
    )
    per_cust = gaps.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    one_time = per_cust.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum((F.col("n_orders") == 1).cast("int")).alias("n_one_time"),
    )
    dist = gaps.where(F.col("gap_days").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_days, 0.25)"), 2).alias("p25_days"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 2).alias("p50_days"),
        F.round(F.expr("percentile(gap_days, 0.9)"), 2).alias("p90_days"),
    )
    return one_time.crossJoin(dist).select(
        "n_customers",
        F.col("n_one_time").cast("long").alias("n_one_time"),
        F.round(F.col("n_one_time") / F.col("n_customers"), 4).alias("one_time_frac"),
        "n_gaps",
        "p25_days",
        "p50_days",
        "p90_days",
    )


SQL_REPURCHASE_INTERVAL_STATS = """
WITH g AS (
  SELECT o_custkey,
         CAST(DATEDIFF('day',
              LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS DOUBLE) AS gap_days
  FROM orders),
pc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM g GROUP BY o_custkey),
ot AS (SELECT COUNT(*) AS n_customers,
              SUM(CASE WHEN n_orders = 1 THEN 1 ELSE 0 END) AS n_one_time
       FROM pc),
d AS (SELECT COUNT(*) AS n_gaps,
             ROUND(quantile_cont(gap_days, 0.25), 2) AS p25_days,
             ROUND(quantile_cont(gap_days, 0.5), 2) AS p50_days,
             ROUND(quantile_cont(gap_days, 0.9), 2) AS p90_days
      FROM g WHERE gap_days IS NOT NULL)
SELECT n_customers, CAST(n_one_time AS BIGINT) AS n_one_time,
       ROUND(n_one_time / CAST(n_customers AS DOUBLE), 4) AS one_time_frac,
       n_gaps, p25_days, p50_days, p90_days
FROM ot CROSS JOIN d
"""


def hourly_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value seasonality by hour of day per event type: count, exact-
    decimal sum, and mean — the daypart profile pricing/capacity reads
    next to the dow-hour traffic heatmap. One aggregation."""
    e = _events(spark, sf_dir)
    # no derived mean column: sum/count quotients land on exact decimal
    # half-boundaries (551.43/8 = 68.92875) where Spark's BigDecimal
    # half-up and DuckDB's binary-expansion rounding disagree — consumers
    # divide the exact pieces themselves
    return (
        e.groupBy(F.col("event_type"), F.hour("ts").cast("long").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .orderBy("event_type", "hour")
    )


SQL_HOURLY_VALUE_PROFILE = """
SELECT event_type, CAST(HOUR(ts) AS BIGINT) AS hour, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def brand_rank_movers(spark: SparkSession, sf_dir: str, cutoff: str = "1998-01-01") -> DataFrame:
    """Revenue-rank movement per part brand between two eras (ship date
    before/after the cutoff): rank in each era and the delta — the
    winners/losers table a merchandising review starts from. One
    lineitem×part broadcast join, one (brand, era) agg, two catalog-sized
    rank windows (revenue DESC, brand tie-break)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    era = F.when(F.col("l_shipdate") < F.lit(cutoff).cast("timestamp"), "before").otherwise("after")
    rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), era.alias("era"))
        .agg(F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("rev_dec"))
    )
    w = Window.partitionBy("era").orderBy(F.col("rev_dec").desc(), F.col("brand").asc())
    ranked = rev.withColumn("rnk", F.row_number().over(w))
    before = ranked.where(F.col("era") == "before").select(
        "brand", F.col("rnk").alias("rank_before"),
        _money(F.col("rev_dec")).alias("rev_before"),
    )
    after = ranked.where(F.col("era") == "after").select(
        "brand", F.col("rnk").alias("rank_after"),
        _money(F.col("rev_dec")).alias("rev_after"),
    )
    return (
        before.join(after, "brand", "full_outer")
        .select(
            "brand",
            "rev_before", "rank_before", "rev_after", "rank_after",
            (F.col("rank_before") - F.col("rank_after")).cast("long").alias("rank_gain"),
        )
        .orderBy("brand")
    )


def sql_brand_rank_movers(cutoff: str = "1998-01-01") -> str:
    return f"""
WITH rev AS (
  SELECT p.p_brand AS brand,
         CASE WHEN l.l_shipdate < TIMESTAMP '{cutoff} 00:00:00' THEN 'before' ELSE 'after' END AS era,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(18,4))) AS rev_dec
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY era ORDER BY rev_dec DESC, brand ASC) AS rnk
  FROM rev)
SELECT COALESCE(b.brand, a.brand) AS brand,
       ROUND(CAST(b.rev_dec AS DOUBLE), 2) AS rev_before,
       b.rnk AS rank_before,
       ROUND(CAST(a.rev_dec AS DOUBLE), 2) AS rev_after,
       a.rnk AS rank_after,
       CAST(b.rnk - a.rnk AS BIGINT) AS rank_gain
FROM (SELECT * FROM ranked WHERE era = 'before') b
FULL OUTER JOIN (SELECT * FROM ranked WHERE era = 'after') a ON a.brand = b.brand
ORDER BY brand
"""


def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full supplier-nation × customer-nation revenue matrix — TPC-H
    Q7's shape generalized from one nation pair to all of them: who
    sells to whom, with exact-decimal revenue and line counts. Fact
    tables join on their keys; every dimension (orders→customer side
    collapses through one join, supplier/nation sides broadcast)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    supp_n = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _money(
                F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


SQL_NATION_TRADE_MATRIX = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       COUNT(*) AS n_lines,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def brand_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration screen: the Herfindahl–Hirschman index of
    supplier line share within each part brand (1.0 = single-sourced,
    →0 = fragmented) plus the top supplier's share — the
    single-point-of-failure review for a supply chain. One
    lineitem×part broadcast join, one (brand, supplier) count, one
    brand rollup; shares are integer-count ratios."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    counts = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_suppkey"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("brand")
    share = F.col("n") / F.sum("n").over(tot)
    return (
        counts.withColumn("share", share)
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("n").cast("long").alias("n_lines"),
            F.round(F.sum(F.pow(F.col("share"), 2)), 4).alias("hhi"),
            F.round(F.max("share"), 4).alias("top_supplier_share"),
        )
        .orderBy("brand")
    )


SQL_BRAND_SUPPLIER_HHI = """
WITH c AS (
  SELECT p.p_brand AS brand, l.l_suppkey, COUNT(*) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
s AS (
  SELECT brand, n, n / CAST(SUM(n) OVER (PARTITION BY brand) AS DOUBLE) AS share
  FROM c)
SELECT brand,
       COUNT(*) AS n_suppliers,
       CAST(SUM(n) AS BIGINT) AS n_lines,
       ROUND(SUM(POW(share, 2)), 4) AS hhi,
       ROUND(MAX(share), 4) AS top_supplier_share
FROM s
GROUP BY brand
ORDER BY brand
"""


def skyline_2d(
    df: DataFrame, minimize_col: str, maximize_col: str
) -> DataFrame:
    """Pareto frontier (skyline) over two criteria: rows NOT dominated by
    any other row, where q dominates p iff q is ≤ on ``minimize_col`` and
    ≥ on ``maximize_col`` with at least one strict. The classic
    multi-criteria shortlist operator ("no cheaper part is also bigger").

    Sort-based, never a self-join: group rows by the minimize value
    (per-group max of the maximize column), take the EXCLUSIVE running
    max of those group maxes over ascending minimize order —
    :func:`magiceye_spark.io.two_phase_window` keeps that global scan
    parallel — then p survives iff no strictly-cheaper group reaches its
    value (``m_lt < max``) and it tops its own price group. O(n log n)
    and shuffle-bounded vs the O(n²) NOT EXISTS the oracle runs."""
    from magiceye_spark.io import two_phase_window

    groups = df.groupBy(minimize_col).agg(
        F.max(maximize_col).alias("_gmax")
    )
    ranked = two_phase_window(
        groups, [F.asc(minimize_col)], cummax_excl={"_m_lt": "_gmax"}
    )
    j = df.join(ranked, minimize_col)
    return (
        j.where(
            (F.col("_m_lt").isNull() | (F.col("_m_lt") < F.col(maximize_col)))
            & (F.col("_gmax") <= F.col(maximize_col))
        )
        .drop("_gmax", "_m_lt")
    )


def parts_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (minimize retail price, maximize size) Pareto
    frontier: no other part is at-most-as-expensive AND at-least-as-big
    with one strict. Duplicated (price, size) points co-survive —
    dominance needs a strict edge."""
    p = _t(spark, sf_dir, "part")
    return skyline_2d(p, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


def sql_parts_pareto_frontier() -> str:
    return """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""
