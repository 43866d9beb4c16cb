"""Distribution statistics and cardinality sketches over event streams.

Two tiers, like the similarity operators:

- :func:`value_distribution` — exact interpolated percentiles (Spark
  ``percentile``; identical math to DuckDB ``quantile_cont``, so it is
  oracle-checkable bit-for-bit) plus min/max/count. Exact percentiles
  shuffle the full value set per group — fine when groups are few.
- :func:`approx_user_counts` — HyperLogLog++ distinct counts
  (``approx_count_distinct``) — the sketch path for 100 TB where an exact
  countDistinct would shuffle every (group, user) pair; HLL state is a few
  KB per group and merges map-side. Tolerance vs exact pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magiceye_spark.analytics import _events


def value_distribution(events: DataFrame) -> DataFrame:
    """Per event type: exact p50/p95 of value (interpolated), min, max, n."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_value"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


SQL_VALUE_DISTRIBUTION = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50_value,
       ROUND(quantile_cont(value, 0.95), 4) AS p95_value,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def approx_user_counts(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Per event type: HLL++ approximate distinct users (relative standard
    deviation ``rsd``). Rows-only driver check; accuracy vs exact pinned in
    tests/test_llmops.py-style tolerance test."""
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .orderBy("event_type")
    )


def approx_value_distribution(events: DataFrame, accuracy: int = 1000) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (``percentile_approx``) —
    the sketch path: mergeable bounded state per group instead of shuffling
    the full value set, error ≤ 1/accuracy in rank. Rows-only driver check;
    error vs exact pinned in tests."""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.percentile_approx("value", 0.5, accuracy), 4).alias("p50_approx"),
            F.round(F.percentile_approx("value", 0.95, accuracy), 4).alias("p95_approx"),
        )
        .orderBy("event_type")
    )


def value_histogram(events: DataFrame, bin_width: float = 25.0) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type: (event_type, bin,
    bin_lo, n). One aggregation shuffle; the binning is a floor division."""
    b = F.floor(F.col("value") / bin_width).cast("long")
    return (
        events.groupBy(F.col("event_type"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            F.round(F.col("bin") * bin_width, 2).alias("bin_lo"),
            "n",
        )
        .orderBy("event_type", "bin")
    )


def sql_value_histogram(bin_width: float = 25.0) -> str:
    return f"""
SELECT event_type, bin, ROUND(CAST(bin * {bin_width} AS DOUBLE), 2) AS bin_lo, n
FROM (
  SELECT event_type, CAST(FLOOR(value / {bin_width}) AS BIGINT) AS bin, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
ORDER BY event_type, bin
"""


def value_k_correlation(events: DataFrame) -> DataFrame:
    """Pearson correlation of value vs the JSON ``k`` property per event
    type — computed from EXACT decimal moments (Σx, Σy, Σxy, Σx², Σy², n)
    so the result is bit-identical on any engine or partitioning, unlike a
    naive double ``corr`` whose summation order floats. The final formula
    runs in double on the five exact scalars."""
    x = F.round(F.col("value"), 4).cast("decimal(18,4)")
    y = F.get_json_object(F.col("props"), "$.k").cast("decimal(18,4)")
    m = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(28,8)")).alias("sxy"),
        F.sum((x * x).cast("decimal(28,8)")).alias("sxx"),
        F.sum((y * y).cast("decimal(28,8)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select("event_type", F.round(corr, 6).alias("corr_value_k")).orderBy(
        "event_type"
    )


SQL_VALUE_K_CORR = """
SELECT event_type,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_value_k
FROM (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(ROUND(value, 4) AS DECIMAL(18,4))
                       * CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4)) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(ROUND(value, 4) AS DECIMAL(18,4))
                       * CAST(ROUND(value, 4) AS DECIMAL(18,4)) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4))
                       * CAST(json_extract_string(props, '$.k') AS DECIMAL(18,4)) AS DECIMAL(28,8))) AS DOUBLE) AS syy
  FROM events GROUP BY event_type
)
ORDER BY event_type
"""


def value_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(_events(spark, sf_dir))


def value_k_correlation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_k_correlation(_events(spark, sf_dir))


def value_distribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_distribution(_events(spark, sf_dir))


def approx_user_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_counts(_events(spark, sf_dir))


def approx_value_distribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_value_distribution(_events(spark, sf_dir))


def estimate_join_size(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lg_k: int = 14,
) -> DataFrame:
    """Pre-flight equi-join cardinality estimate WITHOUT running the join:
    per-side row counts, per-side distinct-key HLL estimates, a matching-
    key estimate via inclusion–exclusion on merged sketches, and the
    predicted output rows under a uniform fan-out model
    (rows_l/d_l · rows_r/d_r · d_match). One scan per side producing a
    KB sketch + two scalars; the decision input before committing a
    multi-TB shuffle (broadcast vs SMJ, salting, or don't run it at all).
    Tolerance vs the exact join is pinned in pytest; rows-only surface
    (sketch estimates have no DuckDB twin).
    """
    def side(df: DataFrame, name: str) -> DataFrame:
        # rows with a NULL key can never match in an equi-join — drop them
        # BEFORE counting/sketching so the estimate models what the join
        # does (concat_ws would otherwise skip nulls and both collide
        # ('a', NULL) with ('a',) and count NULLs as joinable)
        df = df.na.drop(subset=keys)
        # xxhash64 over the key tuple: no string-encoding ambiguity for
        # multi-column keys, 64-bit collisions negligible for an estimate
        k = F.xxhash64(*[F.col(c) for c in keys])
        return df.agg(
            F.count(F.lit(1)).alias(f"rows_{name}"),
            F.hll_sketch_agg(k, F.lit(lg_k)).alias(f"sk_{name}"),
        )

    l, r = side(left, "l"), side(right, "r")
    est_l = F.hll_sketch_estimate("sk_l")
    est_r = F.hll_sketch_estimate("sk_r")
    est_union = F.hll_sketch_estimate(F.hll_union("sk_l", "sk_r"))
    d_match = F.greatest(est_l + est_r - est_union, F.lit(0.0))
    return (
        l.crossJoin(r)
        .select(
            "rows_l",
            "rows_r",
            F.round(est_l, 1).alias("distinct_l"),
            F.round(est_r, 1).alias("distinct_r"),
            F.round(d_match, 1).alias("distinct_match"),
            F.round(
                (F.col("rows_l") / F.greatest(est_l, F.lit(1.0)))
                * (F.col("rows_r") / F.greatest(est_r, F.lit(1.0)))
                * d_match,
                1,
            ).alias("est_join_rows"),
        )
    )


def winsorized_value_stats(
    events: DataFrame, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Winsorized moments per event type: clip ``value`` at the exact
    interpolated [lo, hi] percentiles, then mean/stddev of the clipped
    column next to the raw mean — the heavy-tail-robust summary (a few
    extreme values can't move the clipped moments). Two passes over one
    grouped frame: percentile bounds, then conditional aggregation; exact
    interpolated percentiles are bit-identical to DuckDB quantile_cont."""
    bounds = events.groupBy("event_type").agg(
        F.expr(f"percentile(value, {lo})").alias("p_lo"),
        F.expr(f"percentile(value, {hi})").alias("p_hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return (
        events.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.round(F.avg(clipped), 4).alias("wins_mean"),
            F.round(F.stddev_samp(clipped), 4).alias("wins_std"),
            F.round(F.min("p_lo"), 4).alias("p_lo"),
            F.round(F.min("p_hi"), 4).alias("p_hi"),
        )
        .orderBy("event_type")
    )


def sql_winsorized_value_stats(lo: float = 0.05, hi: float = 0.95) -> str:
    return f"""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, {lo}) AS p_lo,
         quantile_cont(value, {hi}) AS p_hi
  FROM events GROUP BY event_type)
SELECT e.event_type,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS raw_mean,
       ROUND(AVG(LEAST(GREATEST(value, p_lo), p_hi)), 4) AS wins_mean,
       ROUND(STDDEV_SAMP(LEAST(GREATEST(value, p_lo), p_hi)), 4) AS wins_std,
       ROUND(MIN(p_lo), 4) AS p_lo,
       ROUND(MIN(p_hi), 4) AS p_hi
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


# -------------------------------------------------- count-min heavy hitters

def cms_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 64,
    k: int = 20,
) -> DataFrame:
    """Heavy hitters through an EXPLICIT count-min sketch (Cormode &
    Muthukrishnan 2005), materialized as a (depth x width) table so the
    estimate path is inspectable and engine-portable.

    Row hashes are md5-derived (``md5(i ':' key)`` -> first 8 hex chars ->
    int mod width) — deterministic and identical in DuckDB, so the oracle
    reproduces every estimate bit-for-bit, overcounts included; that is the
    point of the query: it reports ``est - exact`` per key, the collision
    error a production sketch would silently carry.

    Scale shape: per-key counts partial-aggregate map-side (one shuffle at
    key cardinality, not event count); the sketch itself is depth*width
    rows (256 here) — broadcast back for the estimate join, so the whole
    estimate phase is shuffle-free after the first groupBy. At 100 TB the
    sketch state is the same 256 cells; only the key->count rollup grows,
    and a streaming twin would merge per-micro-batch cell increments
    without ever holding the key set. Top-k is (est DESC, key) through
    TakeOrderedAndProject — a total order, so the LIMIT is deterministic.
    """
    exact = events.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    tagged = exact.withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "b",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("key").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    cms = tagged.groupBy("i", "b").agg(F.sum("exact").alias("c"))
    est = (
        tagged.join(F.broadcast(cms), ["i", "b"])
        .groupBy("key", "exact")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.select(
            "key",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("overcount"),
        )
        .orderBy(F.col("est").desc(), "key")
        .limit(k)
    )


def sql_cms_heavy_hitters(depth: int = 4, width: int = 64, k: int = 20) -> str:
    return f"""
WITH exact AS (
  SELECT user_id AS key, COUNT(*) AS exact FROM events GROUP BY 1
),
tagged AS (
  SELECT key, exact, i,
         CAST(CONCAT('0x', substr(md5(CAST(i AS VARCHAR) || ':' || CAST(key AS VARCHAR)), 1, 8)) AS BIGINT)
           % {width} AS b
  FROM exact, unnest(range(0, {depth})) AS u(i)
),
cms AS (SELECT i, b, SUM(exact) AS c FROM tagged GROUP BY 1, 2),
est AS (
  SELECT key, exact, MIN(c) AS est
  FROM tagged JOIN cms USING (i, b)
  GROUP BY key, exact
)
SELECT key, CAST(est AS BIGINT) AS est, exact,
       CAST(est - exact AS BIGINT) AS overcount
FROM est
ORDER BY est DESC, key
LIMIT {k}
"""


def hll_distinct_users(
    events: DataFrame, key_col: str = "user_id", p: int = 8
) -> DataFrame:
    """Distinct users per event type through an EXPLICIT HyperLogLog
    (Flajolet et al. 2007), materialized as a (group x 2^p)-register table
    so the estimate path is inspectable and engine-portable — the
    oracle-backed twin of :func:`approx_user_counts`'s opaque
    ``approx_count_distinct`` state.

    Determinism is the design: bucket = first 8 md5 hex chars mod m; the
    rank rho comes from the NEXT 8 hex chars as a 32-bit value via
    ``33 - length(ltrim(bin(x),'0'))`` (pure integer/string ops — no
    float log2); each register's contribution ``2^(33-rho)`` is an exact
    BIGINT shift summed in integer space, so the harmonic mean's
    denominator is a single exact integer in BOTH engines and the final
    estimate is ONE double division of precomputed literals. DuckDB
    reproduces every register and every estimate bit-for-bit — including
    the small-range linear-counting branch (``m*ln(m/empty)``) when the
    group is tiny.

    Scale shape: insertion is idempotent (max per register), so there is
    NO distinct pre-aggregation — events map straight to (group, bucket,
    rho) and partial-aggregate map-side into at most ``groups * m`` rows
    (m=256 here): one shuffle whose size is independent of event count or
    key cardinality. At 100 TB the register table is the same few KB per
    group and merges associatively (streaming/rollup-friendly). The exact
    ``n_exact`` audit column is the expensive part (a real distinct) and
    exists only to surface the sketch's error; a production pipeline
    drops it and keeps the shuffle-free estimate path.
    """
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    numerator = alpha * m * m * float(1 << 33)  # one double literal
    h = F.md5(F.col(key_col).cast("string"))
    b = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    x = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # bin() emits no leading zeros in either engine, so only x=0 needs care
    rho = F.when(x == 0, F.lit(33)).otherwise(33 - F.length(F.bin(x))).cast("int")
    regs = (
        events.select(F.col("event_type"), b.alias("b"), rho.alias("rho"))
        .groupBy("event_type", "b")
        .agg(F.max("rho").alias("r"))
    )
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - r)")).alias("s"),
    )
    s_total = F.col("s") + (F.lit(m) - F.col("v")) * F.lit(1 << 33)
    e_raw = F.lit(numerator) / s_total.cast("double")
    empty = F.lit(m) - F.col("v")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(e_raw)
    exact = events.groupBy("event_type").agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.col("v").alias("regs_used"),
            F.round(est, 4).alias("hll_est"),
            F.round(est / F.col("n_exact") - 1.0, 4).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def sql_hll_distinct_users(p: int = 8) -> str:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    numerator = alpha * m * m * float(1 << 33)
    return f"""
WITH hashed AS (
  SELECT event_type,
         CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {m} AS b,
         33 - length(ltrim(bin(CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 9, 8)) AS BIGINT)), '0')) AS rho
  FROM events),
regs AS (SELECT event_type, b, MAX(rho) AS r FROM hashed GROUP BY 1, 2),
agg AS (
  SELECT event_type, COUNT(*) AS v,
         CAST(SUM(CAST(1 AS BIGINT) << (33 - r)) AS BIGINT) AS s
  FROM regs GROUP BY 1),
est AS (
  SELECT event_type, v,
         CASE WHEN {numerator!r} / CAST(s + ({m} - v) * (CAST(1 AS BIGINT) << 33) AS DOUBLE) <= {2.5 * m}
                   AND {m} - v > 0
              THEN {float(m)!r} * LN({float(m)!r} / CAST({m} - v AS DOUBLE))
              ELSE {numerator!r} / CAST(s + ({m} - v) * (CAST(1 AS BIGINT) << 33) AS DOUBLE)
         END AS e
  FROM agg),
exact AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
SELECT est.event_type, n_exact,
       CAST(v AS BIGINT) AS regs_used,
       ROUND(e, 4) AS hll_est,
       ROUND(e / n_exact - 1.0, 4) AS rel_err
FROM est JOIN exact ON est.event_type = exact.event_type
ORDER BY 1
"""


def daily_trend_ols(events: DataFrame) -> DataFrame:
    """Per event type: ordinary-least-squares trend of DAILY total value
    over the day index — slope (value/day), intercept (at the 2024-01-01
    anchor), and r² — the one-pass screening regression behind "is this
    metric drifting" dashboards (the fitted counterpart of the
    seasonal-naive forecast backtest).

    Exact-moment discipline (same as :func:`value_k_correlation`): the
    daily y is Σ round(value, 4) accumulated as DECIMAL (exact in any
    partitioning/order), x is an integer day offset, and the five
    moments (Σx, Σy, Σxy, Σx², n) are DECIMAL sums — so the closed-form
    slope/intercept/r² are doubles computed from exact scalars, in one
    fixed expression, bit-identical on any engine. Two aggregation
    shuffles (events → daily, daily → moments), the second over
    groups×days rows only; at 100 TB the daily rollup is the only real
    shuffle and it partial-aggregates map-side.
    """
    y = F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)")).alias("y")
    daily = events.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
    ).agg(y)
    xd = F.col("x").cast("decimal(10,0)")
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(F.col("y")).alias("sy"),
        F.sum((xd * F.col("y")).cast("decimal(28,4)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(28,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,8)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    ).orderBy("event_type")


SQL_DAILY_TREND_OLS = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(10,0))) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(x AS DECIMAL(10,0)) * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(x AS DECIMAL(10,0)) * CAST(x AS DECIMAL(10,0)) AS DECIMAL(28,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,8))) AS DOUBLE) AS syy
  FROM daily GROUP BY 1)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
ORDER BY event_type
"""


def daily_trend_ols_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_trend_ols(_events(spark, sf_dir))
