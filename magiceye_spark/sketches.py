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
    # guarded divisions (same discipline as the trend/corr siblings): one
    # observed day makes the slope denominator 0, constant daily totals
    # make the r² denominator 0 — unguarded, Spark (non-ANSI) yields NULL
    # while DuckDB's IEEE division yields inf/NaN, a cross-engine split
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    slope = F.when(dx > 0, (n * sxy - sx * sy) / dx)
    intercept = F.when(dx > 0, (sy - ((n * sxy - sx * sy) / dx) * sx) / n)
    r2 = F.when(
        (dx > 0) & (dy > 0),
        ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (dx * dy),
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
       CASE WHEN n * sxx - sx * sx > 0
            THEN ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
       CASE WHEN n * sxx - sx * sx > 0
            THEN ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) END AS intercept,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                       / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2
FROM m
ORDER BY event_type
"""


def daily_trend_ols_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_trend_ols(_events(spark, sf_dir, parallelize=True))


def _daily_totals(events: DataFrame) -> DataFrame:
    """Shared exact daily rollup for the trend family: (event_type, x, y)
    where x is the integer day offset from the 2024-01-01 anchor and y is
    Σ round(value, 4) accumulated as DECIMAL(18,4) — exact under any
    partitioning or order, so every statistic derived from it is a fixed
    function of exact scalars. At 100 TB this rollup is the only
    corpus-sized shuffle in the family (map-side partial agg); everything
    downstream runs on groups×days rows."""
    return events.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("x"),
    ).agg(F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)")).alias("y"))


def daily_trend_robust(events: DataFrame) -> DataFrame:
    """Per event type: Mann-Kendall trend test (S statistic, tie-corrected
    variance, z score) + Theil-Sen slope (median of pairwise daily
    slopes) — the rank-based robust counterpart of
    :func:`daily_trend_ols`, immune to single-day spikes.

    Pairwise stage runs on the DAILY rollup only (d days per type →
    d(d-1)/2 pairs, bounded by the calendar — ~66k pairs/type-year even
    at 100 TB of raw events), never on raw rows. The Theil-Sen median is
    selected by explicit middle ranks inside a per-type window (the two
    middle slopes averaged), so the value is a fixed function of the
    exact slope multiset on any engine; the sign sums and tie counts are
    exact integers. Real-valued outputs are emitted UNROUNDED: both
    engines derive them through identical IEEE expression trees from
    exact decimals/integers, so the doubles are bit-identical — engine-
    side rounding would only add half-boundary hazards."""
    from pyspark.sql.window import Window

    # daily is consumed by four independent subtrees (pair sides, tie
    # counts, day counts); without a persist each re-executes the full
    # corpus rollup (measured 8 parquet scans / 6.9 s serialized at
    # sf0.1). The frame is calendar-bounded (types x days) - KB-sized at
    # any corpus scale; same cache-lifetime caveat as two_phase_window.
    daily = _daily_totals(events).persist()
    a = daily.select("event_type", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select("event_type", F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = (
        a.join(b, "event_type")
        .where(F.col("xa") < F.col("xb"))
        .select(
            "event_type",
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
            .alias("sgn"),
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa")).cast("double")
            ).alias("slope"),
        )
    )
    mk = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    ranked = pairs.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("slope"))
    )
    med = (
        ranked.join(F.broadcast(mk.select("event_type", "n_pairs")), "event_type")
        .where(
            (F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n_pairs") + 2) / 2))
        )
        .groupBy("event_type")
        .agg(F.avg("slope").alias("sen_slope"))
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5))
            .cast("long")
            .alias("tie")
        )
    )
    n = F.col("n_days")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie")).cast("double") / F.lit(18.0)
    )
    z = (
        F.when(
            (var_s > 0) & (F.col("s_stat") > 0),
            (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
        )
        .when(
            (var_s > 0) & (F.col("s_stat") < 0),
            (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        mk.join(med, "event_type")
        .join(nd, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            "s_stat",
            var_s.alias("var_s"),
            z.alias("z_mk"),
            "sen_slope",
        )
        .orderBy("event_type")
    )


SQL_DAILY_TREND_ROBUST = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.x < b.x),
mk AS (
  SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat, COUNT(*) AS n_pairs
  FROM pairs GROUP BY 1),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn
  FROM pairs),
med AS (
  SELECT r.event_type, AVG(slope) AS sen_slope
  FROM ranked r JOIN mk USING (event_type)
  WHERE rn = FLOOR((n_pairs + 1) / 2) OR rn = FLOOR((n_pairs + 2) / 2)
  GROUP BY 1),
nd AS (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1),
ties AS (
  SELECT event_type, CAST(SUM(c*(c-1)*(2*c+5)) AS BIGINT) AS tie
  FROM (SELECT event_type, y, COUNT(*) AS c FROM daily GROUP BY 1, 2)
  GROUP BY 1)
SELECT mk.event_type, n_days, n_pairs, s_stat,
       CAST(n_days*(n_days-1)*(2*n_days+5) - tie AS DOUBLE) / 18.0 AS var_s,
       CASE WHEN CAST(n_days*(n_days-1)*(2*n_days+5) - tie AS DOUBLE) / 18.0 > 0 AND s_stat > 0
              THEN CAST(s_stat - 1 AS DOUBLE) / SQRT(CAST(n_days*(n_days-1)*(2*n_days+5) - tie AS DOUBLE) / 18.0)
            WHEN CAST(n_days*(n_days-1)*(2*n_days+5) - tie AS DOUBLE) / 18.0 > 0 AND s_stat < 0
              THEN CAST(s_stat + 1 AS DOUBLE) / SQRT(CAST(n_days*(n_days-1)*(2*n_days+5) - tie AS DOUBLE) / 18.0)
            ELSE 0.0 END AS z_mk,
       sen_slope
FROM mk JOIN med USING (event_type) JOIN nd USING (event_type) JOIN ties USING (event_type)
ORDER BY event_type
"""


def daily_trend_robust_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_trend_robust(_events(spark, sf_dir, parallelize=True))


def daily_cusum_changepoint(events: DataFrame) -> DataFrame:
    """Per event type: CUSUM changepoint screen over the exact daily
    totals — the day k maximizing |Σ_{i<=k}(y_i − ȳ)| splits the series
    at its strongest level shift, with the before/after means and their
    delta. The classic "when did this metric move" primitive behind drift
    triage dashboards.

    The cumulative sum runs over DECIMAL y inside a per-type ordered
    window (exact, order-fixed by the day index), and the deviation is
    cs_k − k·(Σy/n): one decimal→double cast and a fixed IEEE expression,
    so the argmax ordering and every emitted double are bit-identical on
    any engine. Ties on |dev| break to the earliest day. One events-sized
    rollup shuffle; windows run on groups×days rows partitioned by
    event_type (never a single-partition sort)."""
    from pyspark.sql.window import Window

    daily = _daily_totals(events)
    wtot = Window.partitionBy("event_type")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        daily.withColumn("cs", F.sum("y").over(wcum))
        .withColumn("rk", F.row_number().over(Window.partitionBy("event_type").orderBy("x")))
        .withColumn("n_days", F.count(F.lit(1)).over(wtot))
        .withColumn("sy", F.sum("y").over(wtot))
    )
    dev = F.col("cs").cast("double") - F.col("rk").cast("double") * (
        F.col("sy").cast("double") / F.col("n_days").cast("double")
    )
    d = d.withColumn("dev", dev)
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("dev")).desc(), F.col("x").asc()
    )
    out = d.withColumn("pk", F.row_number().over(pick)).where(F.col("pk") == 1)
    mean_before = F.col("cs").cast("double") / F.col("rk").cast("double")
    mean_after = F.when(
        F.col("rk") < F.col("n_days"),
        (F.col("sy") - F.col("cs")).cast("double")
        / (F.col("n_days") - F.col("rk")).cast("double"),
    )
    return out.select(
        "event_type",
        "n_days",
        F.col("x").alias("cp_x"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("x")).alias("cp_date"),
        F.abs(F.col("dev")).alias("max_abs_dev"),
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
        (mean_after - mean_before).alias("mean_delta"),
    ).orderBy("event_type")


SQL_DAILY_CUSUM = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
d AS (
  SELECT event_type, x,
         SUM(y) OVER (PARTITION BY event_type ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days,
         SUM(y) OVER (PARTITION BY event_type) AS sy
  FROM daily),
dd AS (
  SELECT *, CAST(cs AS DOUBLE) - CAST(rk AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)) AS dev
  FROM d),
pk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(dev) DESC, x ASC) AS pk
  FROM dd)
SELECT event_type, n_days, x AS cp_x,
       DATE '2024-01-01' + CAST(x AS INTEGER) AS cp_date,
       ABS(dev) AS max_abs_dev,
       CAST(cs AS DOUBLE) / CAST(rk AS DOUBLE) AS mean_before,
       CASE WHEN rk < n_days
            THEN CAST(sy - cs AS DOUBLE) / CAST(n_days - rk AS DOUBLE) END AS mean_after,
       CASE WHEN rk < n_days
            THEN CAST(sy - cs AS DOUBLE) / CAST(n_days - rk AS DOUBLE) END
         - CAST(cs AS DOUBLE) / CAST(rk AS DOUBLE) AS mean_delta
FROM pk WHERE pk = 1
ORDER BY event_type
"""


def daily_cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_cusum_changepoint(_events(spark, sf_dir, parallelize=True))


def daily_type_correlation(events: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation between event types' exact daily
    totals (over days where BOTH types have activity) — which metrics
    co-move, the screen behind "did checkout dip because clicks dipped".

    Same exact-moment discipline as :func:`daily_trend_ols`: all five
    moments are DECIMAL sums over the daily rollup, r is one closed-form
    IEEE expression over exact scalars — bit-identical on any engine.
    The day-key equi-join runs on groups×days rows (calendar-bounded);
    with T event types the output is T(T−1)/2 rows. Zero-variance sides
    yield NULL r rather than a division error."""
    # both join sides re-execute the rollup without this (2 corpus scans)
    daily = _daily_totals(events).persist()
    a = daily.select(F.col("event_type").alias("type_a"), "x", F.col("y").alias("ya"))
    b = daily.select(F.col("event_type").alias("type_b"), "x", F.col("y").alias("yb"))
    joined = a.join(b, "x").where(F.col("type_a") < F.col("type_b"))
    m = joined.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("ya").alias("sx"),
        F.sum("yb").alias("sy"),
        F.sum((F.col("ya") * F.col("yb")).cast("decimal(38,8)")).alias("sxy"),
        F.sum((F.col("ya") * F.col("ya")).cast("decimal(38,8)")).alias("sxx"),
        F.sum((F.col("yb") * F.col("yb")).cast("decimal(38,8)")).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    r = F.when((dx > 0) & (dy > 0), (n * sxy - sx * sy) / F.sqrt(dx * dy))
    return m.select("type_a", "type_b", "n_days", r.alias("pearson_r")).orderBy(
        "type_a", "type_b"
    )


SQL_DAILY_TYPE_CORR = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
j AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.y AS ya, b.y AS yb
  FROM daily a JOIN daily b ON a.x = b.x AND a.event_type < b.event_type),
m AS (
  SELECT type_a, type_b, COUNT(*) AS n_days,
         CAST(SUM(ya) AS DOUBLE) AS sx, CAST(SUM(yb) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ya * yb AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ya * ya AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(yb * yb AS DECIMAL(38,8))) AS DOUBLE) AS syy
  FROM j GROUP BY 1, 2)
SELECT type_a, type_b, n_days,
       CASE WHEN n_days * sxx - sx * sx > 0 AND n_days * syy - sy * sy > 0
            THEN (n_days * sxy - sx * sy)
                 / SQRT((n_days * sxx - sx * sx) * (n_days * syy - sy * sy)) END AS pearson_r
FROM m
ORDER BY type_a, type_b
"""


def daily_type_correlation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_type_correlation(_events(spark, sf_dir, parallelize=True))


def type_value_association(events: DataFrame, bin_width: float = 25.0) -> DataFrame:
    """Per event type: its chi-square and mutual-information contribution
    to the (event_type × value-bin) contingency table — "does this
    metric's distribution depend on the event type, and which type
    carries the dependence". The profiling screen behind segmented-drift
    triage: a type whose chi2/MI part dominates has a value distribution
    unlike the corpus.

    The full lattice (every type × every observed bin, zero-observed
    cells included — chi-square is wrong without them) is built with a
    broadcast nested-loop join (bin count is a constant); both statistics
    accumulate in a per-type window ordered by bin, so the double
    summation order is fixed and engine-identical. MI terms use the
    single fixed expression p·ln(c·n / (r·c_bin)); zero cells contribute
    only to chi2. One corpus-sized (type, bin) groupBy; everything
    downstream is lattice-sized."""
    from pyspark.sql.window import Window

    binned = events.groupBy(
        "event_type", F.floor(F.col("value") / F.lit(bin_width)).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    rows_t = binned.groupBy("event_type").agg(F.sum("c").cast("long").alias("r_x"))
    cols_b = binned.groupBy("bin").agg(F.sum("c").cast("long").alias("c_y"))
    scal = cols_b.agg(
        F.sum("c_y").cast("long").alias("n_tot"), F.count(F.lit(1)).alias("n_bins")
    )
    lat = (
        rows_t.crossJoin(F.broadcast(cols_b))
        .join(binned, ["event_type", "bin"], "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)))
    )
    e = (
        F.col("r_x").cast("double")
        * F.col("c_y").cast("double")
        / F.col("n_tot").cast("double")
    )
    chi_cell = (F.col("c0").cast("double") - e) * (F.col("c0").cast("double") - e) / e
    p = F.col("c0").cast("double") / F.col("n_tot").cast("double")
    mi_cell = F.when(
        F.col("c0") > 0,
        p
        * F.log(
            F.col("c0").cast("double")
            * F.col("n_tot").cast("double")
            / (F.col("r_x").cast("double") * F.col("c_y").cast("double"))
        ),
    ).otherwise(F.lit(0.0))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrank = Window.partitionBy("event_type").orderBy("bin")
    stepped = (
        lat.withColumn("chi2_run", F.sum(chi_cell).over(wcum))
        .withColumn("mi_run", F.sum(mi_cell).over(wcum))
        .withColumn("brk", F.row_number().over(wrank))
    )
    return (
        stepped.where(F.col("brk") == F.col("n_bins"))
        .select(
            "event_type",
            F.col("r_x").alias("n_rows"),
            "n_bins",
            F.col("chi2_run").alias("chi2_part"),
            F.col("mi_run").alias("mi_part"),
        )
        .orderBy("event_type")
    )


def sql_type_value_association(bin_width: float = 25.0) -> str:
    return f"""
WITH binned AS (
  SELECT event_type, CAST(FLOOR(value / {bin_width}) AS BIGINT) AS bin, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
rows_t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS r_x FROM binned GROUP BY 1),
cols_b AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS c_y FROM binned GROUP BY 1),
scal AS (SELECT CAST(SUM(c_y) AS BIGINT) AS n_tot, COUNT(*) AS n_bins FROM cols_b),
lat AS (
  SELECT t.event_type, t.r_x, b.bin, b.c_y, s.n_tot, s.n_bins,
         COALESCE(bn.c, 0) AS c0
  FROM rows_t t CROSS JOIN cols_b b CROSS JOIN scal s
  LEFT JOIN binned bn ON bn.event_type = t.event_type AND bn.bin = b.bin),
cells AS (
  SELECT *,
         (CAST(c0 AS DOUBLE) - CAST(r_x AS DOUBLE) * CAST(c_y AS DOUBLE) / CAST(n_tot AS DOUBLE))
         * (CAST(c0 AS DOUBLE) - CAST(r_x AS DOUBLE) * CAST(c_y AS DOUBLE) / CAST(n_tot AS DOUBLE))
         / (CAST(r_x AS DOUBLE) * CAST(c_y AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS chi_cell,
         CASE WHEN c0 > 0
              THEN (CAST(c0 AS DOUBLE) / CAST(n_tot AS DOUBLE))
                   * LN(CAST(c0 AS DOUBLE) * CAST(n_tot AS DOUBLE)
                        / (CAST(r_x AS DOUBLE) * CAST(c_y AS DOUBLE)))
              ELSE 0.0 END AS mi_cell
  FROM lat),
stepped AS (
  SELECT *, SUM(chi_cell) OVER w AS chi2_run, SUM(mi_cell) OVER w AS mi_run,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bin) AS brk
  FROM cells
  WINDOW w AS (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, r_x AS n_rows, n_bins, chi2_run AS chi2_part, mi_run AS mi_part
FROM stepped WHERE brk = n_bins
ORDER BY event_type
"""


def type_value_association_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_value_association(_events(spark, sf_dir, parallelize=True))


def seasonal_decomposition(events: DataFrame) -> DataFrame:
    """Classical additive decomposition of each type's daily series:
    trend (centered 7-day moving average), day-of-week seasonal index,
    and residual — the STL-lite screen separating "weekly rhythm" from
    "actual drift" before anomaly rules fire.

    Exactness: the 7-day window sum is DECIMAL (exact); the seasonal
    index is mean(7·y − Σ₇y)/7 — the numerator stays an exact decimal
    sum (order-free across the group), so the only double ops are fixed
    divisions. Rows without a full 7-day window get NULL trend and are
    excluded from the seasonal fit, exactly as in the SQL twin. One
    corpus-sized rollup; windows partitioned by event_type."""
    from pyspark.sql.window import Window

    daily = _daily_totals(events)
    w7 = (
        Window.partitionBy("event_type").orderBy("x").rowsBetween(-3, 3)
    )
    # persisted: the seasonal fit and the output join both consume it
    d = daily.withColumn("sum7", F.sum("y").over(w7)).withColumn(
        "cnt7", F.count(F.lit(1)).over(w7)
    ).persist()
    trend = F.when(
        F.col("cnt7") == 7, F.col("sum7").cast("double") / F.lit(7.0)
    )
    d = d.withColumn("trend", trend).withColumn("dow", F.col("x") % 7)
    # seasonal numerator 7y − Σ7 is exact decimal; mean over the (type,
    # dow) group is decimal-sum / count — order-free
    seas = (
        d.where(F.col("cnt7") == 7)
        .groupBy("event_type", "dow")
        .agg(
            (
                F.sum(F.col("y") * 7 - F.col("sum7")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(7.0)
            ).alias("seasonal")
        )
    )
    out = d.join(seas, ["event_type", "dow"], "left")
    return out.select(
        "event_type",
        "x",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("x")).alias("day"),
        F.col("y").cast("double").alias("daily_value"),
        "trend",
        F.when(F.col("trend").isNotNull(), F.col("seasonal")).alias("seasonal"),
        F.when(
            F.col("trend").isNotNull(),
            F.col("y").cast("double") - F.col("trend") - F.col("seasonal"),
        ).alias("residual"),
    ).orderBy("event_type", "x")


SQL_SEASONAL_DECOMP = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
d AS (
  SELECT *, SUM(y) OVER w AS sum7, COUNT(*) OVER w AS cnt7, x % 7 AS dow
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
dd AS (
  SELECT *, CASE WHEN cnt7 = 7 THEN CAST(sum7 AS DOUBLE) / 7.0 END AS trend
  FROM d),
seas AS (
  SELECT event_type, dow,
         CAST(SUM(y * 7 - sum7) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 7.0 AS seasonal
  FROM dd WHERE cnt7 = 7 GROUP BY 1, 2)
SELECT dd.event_type, x, DATE '2024-01-01' + CAST(x AS INTEGER) AS day,
       CAST(y AS DOUBLE) AS daily_value, trend,
       CASE WHEN trend IS NOT NULL THEN seasonal END AS seasonal,
       CASE WHEN trend IS NOT NULL
            THEN CAST(y AS DOUBLE) - trend - seasonal END AS residual
FROM dd LEFT JOIN seas ON dd.event_type = seas.event_type AND dd.dow = seas.dow
ORDER BY dd.event_type, x
"""


def seasonal_decomposition_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decomposition(_events(spark, sf_dir, parallelize=True))


def ks_half_month_drift(events: DataFrame, split_day: int = 15) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift per event type: D = max |ECDF
    difference| between the first and second half of the window — the
    NONPARAMETRIC drift screen next to the binned PSI monitor (no bin
    choice, sensitive to any distributional change, not just mass
    shifts). Emits D, its location, and the α=0.05 rejection threshold
    c(α)·√((n_a+n_b)/(n_a·n_b)).

    Exactness: both ECDFs are integer cumulative counts over the SAME
    per-(type, distinct-value) rollup (one corpus-sized groupBy), so D
    is a fixed double expression at every step and the argmax ordering
    is engine-identical (ties break to the smallest value). Windows are
    partitioned by event_type; rows after the rollup are
    types × distinct-values."""
    from pyspark.sql.window import Window

    half = F.when(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")) < split_day, F.lit("a")
    ).otherwise(F.lit("b"))
    counts = events.groupBy("event_type", half.alias("half"), "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    byval = counts.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("half") == "a", F.col("c")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("half") == "b", F.col("c")).otherwise(0)).alias("c_b"),
    )
    wtot = Window.partitionBy("event_type")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        byval.withColumn("n_a", F.sum("c_a").over(wtot))
        .withColumn("n_b", F.sum("c_b").over(wtot))
        .withColumn("cum_a", F.sum("c_a").over(wcum))
        .withColumn("cum_b", F.sum("c_b").over(wcum))
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .withColumn(
            "d",
            F.abs(
                F.col("cum_a").cast("double") / F.col("n_a").cast("double")
                - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
            ),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(F.desc("d"), F.asc("value"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    crit = F.lit(1.358) * F.sqrt((na + nb) / (na * nb))
    return (
        d.withColumn("pk", F.row_number().over(pick))
        .where(F.col("pk") == 1)
        .select(
            "event_type",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("d").alias("ks_d"),
            F.col("value").alias("at_value"),
            crit.alias("crit_05"),
            (F.col("d") > crit).alias("drifted"),
        )
        .orderBy("event_type")
    )


def sql_ks_half_month_drift(split_day: int = 15) -> str:
    return f"""
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) < {split_day}
              THEN 'a' ELSE 'b' END AS half
  FROM events),
counts AS (SELECT event_type, half, value, COUNT(*) AS c FROM tagged GROUP BY 1, 2, 3),
byval AS (
  SELECT event_type, value,
         SUM(CASE WHEN half = 'a' THEN c ELSE 0 END) AS c_a,
         SUM(CASE WHEN half = 'b' THEN c ELSE 0 END) AS c_b
  FROM counts GROUP BY 1, 2),
d AS (
  SELECT *,
         SUM(c_a) OVER (PARTITION BY event_type) AS n_a,
         SUM(c_b) OVER (PARTITION BY event_type) AS n_b,
         SUM(c_a) OVER w AS cum_a,
         SUM(c_b) OVER w AS cum_b
  FROM byval
  WINDOW w AS (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
dd AS (
  SELECT *, ABS(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS d
  FROM d WHERE n_a > 0 AND n_b > 0),
pk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d DESC, value ASC) AS pk
  FROM dd)
SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       d AS ks_d, value AS at_value,
       1.358 * SQRT((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS crit_05,
       d > 1.358 * SQRT((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS drifted
FROM pk WHERE pk = 1
ORDER BY event_type
"""


def ks_half_month_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_half_month_drift(_events(spark, sf_dir, parallelize=True))


def daily_type_spearman(events: DataFrame) -> DataFrame:
    """Pairwise Spearman rank correlation between event types' daily
    totals — the robust companion to :func:`daily_type_correlation`
    (monotone co-movement, immune to single-day spikes). Average-rank tie
    handling: for a tie group the rank is min_rank + (t−1)/2, kept EXACT
    by carrying 2·rank as an integer (2·avg_rank = 2·min_rank + t − 1),
    so all five moments are exact integer sums and ρ is one closed-form
    IEEE expression. Rank windows are partitioned per type; the day-key
    join runs on groups×days rows.

    SEMANTICS NOTE: each type is ranked over its FULL daily series, then
    ρ is computed over the pair's common days — deliberately, so a type's
    ranks are stable across every pairing (one rank pass, not one per
    pair). When two types cover different day sets this is Pearson-of-
    full-series-ranks on the overlap, which can differ from a textbook
    Spearman that re-ranks within the paired sample (ranks there are
    1..n of the overlap). The SQL twin computes the identical quantity,
    so engine parity is unaffected; re-rank the joined day set per pair
    if sample-local Spearman is required."""
    from pyspark.sql.window import Window

    daily = _daily_totals(events)
    wmin = Window.partitionBy("event_type").orderBy("y")
    # persisted: both join sides would otherwise re-run rollup + ranks
    d2 = (
        daily.withColumn("minrk", F.rank().over(wmin))
        .withColumn(
            "t",
            F.count(F.lit(1)).over(Window.partitionBy("event_type", "y")),
        )
        .withColumn("rk2", (2 * F.col("minrk") + F.col("t") - 1).cast("long"))
        .persist()
    )
    a = d2.select(F.col("event_type").alias("type_a"), "x", F.col("rk2").alias("ra"))
    b = d2.select(F.col("event_type").alias("type_b"), "x", F.col("rk2").alias("rb"))
    j = a.join(b, "x").where(F.col("type_a") < F.col("type_b"))
    m = j.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("ra").cast("long").alias("sx"),
        F.sum("rb").cast("long").alias("sy"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("sxy"),
        F.sum(F.col("ra") * F.col("ra")).cast("long").alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).cast("long").alias("syy"),
    )
    n = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    rho = F.when((dx > 0) & (dy > 0), (n * sxy - sx * sy) / F.sqrt(dx * dy))
    return m.select("type_a", "type_b", "n_days", rho.alias("spearman_rho")).orderBy(
        "type_a", "type_b"
    )


SQL_DAILY_TYPE_SPEARMAN = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
d2 AS (
  SELECT event_type, x,
         CAST(2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
              + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS BIGINT) AS rk2
  FROM daily),
j AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.rk2 AS ra, b.rk2 AS rb
  FROM d2 a JOIN d2 b ON a.x = b.x AND a.event_type < b.event_type),
m AS (
  SELECT type_a, type_b, COUNT(*) AS n_days,
         CAST(SUM(ra) AS BIGINT) AS sx, CAST(SUM(rb) AS BIGINT) AS sy,
         CAST(SUM(ra * rb) AS BIGINT) AS sxy,
         CAST(SUM(ra * ra) AS BIGINT) AS sxx,
         CAST(SUM(rb * rb) AS BIGINT) AS syy
  FROM j GROUP BY 1, 2)
SELECT type_a, type_b, n_days,
       CASE WHEN CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS spearman_rho
FROM m
ORDER BY type_a, type_b
"""


def daily_type_spearman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_type_spearman(_events(spark, sf_dir, parallelize=True))


def daily_lag_correlation(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Per event type and lag k = 1..max_lag: Pearson correlation between
    the exact daily totals y_t and y_{t−k} (over matched day pairs) — the
    ACF-style "does today predict k days out" screen that separates
    weekly rhythm (spike at k=7) from momentum (decay from k=1).

    Same exact-moment discipline as the trend family: one persisted
    calendar-bounded rollup, one lag-banded equi-join (days × lags rows
    total), decimal moments, closed-form r, NULL on zero variance or
    fewer than 3 matched pairs."""
    daily = _daily_totals(events).persist()
    lags = daily.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    j = a.join(
        b,
        (F.col("event_type") == F.col("et_b"))
        & (F.col("xb") == F.col("xa") - F.col("lag")),
    )
    m = j.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("ya").alias("sx"),
        F.sum("yb").alias("sy"),
        F.sum((F.col("ya") * F.col("yb")).cast("decimal(38,8)")).alias("sxy"),
        F.sum((F.col("ya") * F.col("ya")).cast("decimal(38,8)")).alias("sxx"),
        F.sum((F.col("yb") * F.col("yb")).cast("decimal(38,8)")).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    r = F.when((F.col("n_pairs") >= 3) & (dx > 0) & (dy > 0), (n * sxy - sx * sy) / F.sqrt(dx * dy))
    return m.select("event_type", "lag", "n_pairs", r.alias("lag_r")).orderBy(
        "event_type", "lag"
    )


SQL_DAILY_LAG_CORR = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
lags AS (SELECT UNNEST(generate_series(1, 7)) AS lag),
j AS (
  SELECT a.event_type, l.lag, a.y AS ya, b.y AS yb
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.event_type = a.event_type AND b.x = a.x - l.lag),
m AS (
  SELECT event_type, lag, COUNT(*) AS n_pairs,
         CAST(SUM(ya) AS DOUBLE) AS sx, CAST(SUM(yb) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ya * yb AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ya * ya AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(yb * yb AS DECIMAL(38,8))) AS DOUBLE) AS syy
  FROM j GROUP BY 1, 2)
SELECT event_type, CAST(lag AS INT) AS lag, n_pairs,
       CASE WHEN n_pairs >= 3 AND n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
            THEN (n_pairs * sxy - sx * sy)
                 / SQRT((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)) END AS lag_r
FROM m
ORDER BY event_type, lag
"""


def daily_lag_correlation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_lag_correlation(_events(spark, sf_dir, parallelize=True))


def segmented_trend(events: DataFrame) -> DataFrame:
    """Per event type: OLS slope fitted separately BEFORE and AFTER the
    CUSUM changepoint (the broken-stick summary) — "flat then rising at
    +2.1/day since Jan 21" instead of one misleading global slope.

    The changepoint day comes from the same argmax-|cusum| rule as
    :func:`daily_cusum_changepoint`; both side fits use the exact
    decimal moments. Sides with < 3 days report NULL slope. One persisted
    calendar-bounded rollup feeds the changepoint pass and both fits."""
    from pyspark.sql.window import Window

    daily = _daily_totals(events).persist()
    wtot = Window.partitionBy("event_type")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = (
        daily.withColumn("cs", F.sum("y").over(wcum))
        .withColumn("rk", F.row_number().over(Window.partitionBy("event_type").orderBy("x")))
        .withColumn("n_days", F.count(F.lit(1)).over(wtot))
        .withColumn("sy", F.sum("y").over(wtot))
    )
    dev = F.col("cs").cast("double") - F.col("rk").cast("double") * (
        F.col("sy").cast("double") / F.col("n_days").cast("double")
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(dev).desc(), F.col("x").asc()
    )
    cp = (
        d.withColumn("pk", F.row_number().over(pick))
        .where(F.col("pk") == 1)
        .select("event_type", F.col("x").alias("cp_x"))
    )
    sides = daily.join(F.broadcast(cp), "event_type").withColumn(
        "side", F.when(F.col("x") <= F.col("cp_x"), F.lit("before")).otherwise(F.lit("after"))
    )
    xd = F.col("x").cast("decimal(10,0)")
    m = sides.groupBy("event_type", "cp_x", "side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((xd * F.col("y")).cast("decimal(28,4)")).alias("sxy"),
        F.sum((xd * xd).cast("decimal(28,0)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = F.when(
        (F.col("n") >= 3) & (n * sxx - sx * sx > 0), (n * sxy - sx * sy) / (n * sxx - sx * sx)
    )
    scored = m.select("event_type", "cp_x", "side", F.col("n").alias("n_side"), slope.alias("slope"))
    b = scored.where(F.col("side") == "before").select(
        "event_type",
        "cp_x",
        F.col("n_side").alias("n_before"),
        F.col("slope").alias("slope_before"),
    )
    a = scored.where(F.col("side") == "after").select(
        "event_type",
        F.col("n_side").alias("n_after"),
        F.col("slope").alias("slope_after"),
    )
    return (
        b.join(a, "event_type", "left")
        .select(
            "event_type",
            "cp_x",
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("cp_x")).alias("cp_date"),
            "n_before",
            "n_after",
            "slope_before",
            "slope_after",
            (F.col("slope_after") - F.col("slope_before")).alias("slope_change"),
        )
        .orderBy("event_type")
    )


SQL_SEGMENTED_TREND = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS y
  FROM events GROUP BY 1, 2),
d AS (
  SELECT event_type, x,
         SUM(y) OVER (PARTITION BY event_type ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days,
         SUM(y) OVER (PARTITION BY event_type) AS sy
  FROM daily),
cp AS (
  SELECT event_type, x AS cp_x
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY event_type
          ORDER BY ABS(CAST(cs AS DOUBLE) - CAST(rk AS DOUBLE)
                       * (CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE))) DESC, x ASC) AS pk
        FROM d)
  WHERE pk = 1),
sides AS (
  SELECT daily.event_type, cp.cp_x,
         CASE WHEN daily.x <= cp.cp_x THEN 'before' ELSE 'after' END AS side,
         daily.x, daily.y
  FROM daily JOIN cp ON daily.event_type = cp.event_type),
m AS (
  SELECT event_type, cp_x, side, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(10,0))) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(x AS DECIMAL(10,0)) * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(x AS DECIMAL(10,0)) * CAST(x AS DECIMAL(10,0)) AS DECIMAL(28,0))) AS DOUBLE) AS sxx
  FROM sides GROUP BY 1, 2, 3),
scored AS (
  SELECT event_type, cp_x, side, n AS n_side,
         CASE WHEN n >= 3 AND n * sxx - sx * sx > 0
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope
  FROM m)
SELECT b.event_type, b.cp_x,
       DATE '2024-01-01' + CAST(b.cp_x AS INTEGER) AS cp_date,
       b.n_side AS n_before, a.n_side AS n_after,
       b.slope AS slope_before, a.slope AS slope_after,
       a.slope - b.slope AS slope_change
FROM scored b
LEFT JOIN scored a ON a.event_type = b.event_type AND a.side = 'after'
WHERE b.side = 'before'
ORDER BY b.event_type
"""


def segmented_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segmented_trend(_events(spark, sf_dir, parallelize=True))


def seasonal_residual_anomalies(events: DataFrame, z_cut: float = 3.0) -> DataFrame:
    """Anomalous days per event type AFTER removing trend and weekly
    seasonality: z-score of the :func:`seasonal_decomposition` residual
    against the type's residual distribution — the screen that doesn't
    fire every Saturday (raw daily z-scores do). Emits flagged days
    (|z| > z_cut) with the residual and z.

    Residual moments accumulate in a per-type window ordered by day (the
    fixed-IEEE-order pattern), so mean/std and every z are
    engine-identical; days without a full 7-day MA window are excluded
    from both the fit and the scoring, exactly as in the twin."""
    from pyspark.sql.window import Window

    dec = seasonal_decomposition(events).where(F.col("residual").isNotNull())
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrank = Window.partitionBy("event_type").orderBy("x")
    stepped = (
        dec.withColumn("s1", F.sum("residual").over(wcum))
        .withColumn("s2", F.sum(F.col("residual") * F.col("residual")).over(wcum))
        .withColumn("brk", F.row_number().over(wrank))
        .withColumn("n_fit", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    )
    fit = stepped.where(F.col("brk") == F.col("n_fit")).select(
        "event_type",
        (F.col("s1") / F.col("n_fit").cast("double")).alias("mu"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_fit").cast("double"))
            / (F.col("n_fit") - 1).cast("double")
        ).alias("sd"),
    )
    scored = dec.join(F.broadcast(fit), "event_type")
    # z guarded by when(): Catalyst may reorder filter conjuncts, so a
    # bare division inside the |z| predicate can hit sd = 0 under ANSI
    # even "behind" an sd > 0 conjunct
    z = F.when(F.col("sd") > 0, (F.col("residual") - F.col("mu")) / F.col("sd"))
    return (
        scored.withColumn("z", z)
        .where(F.abs(F.col("z")) > z_cut)
        .select("event_type", "x", "day", "daily_value", "residual", "z")
        .orderBy("event_type", "x")
    )


def sql_seasonal_residual_anomalies(z_cut: float = 3.0) -> str:
    body = SQL_SEASONAL_DECOMP.strip().rstrip()
    # reuse the decomposition SQL as a subquery, drop its ORDER BY
    body = body[: body.rindex("ORDER BY")]
    return f"""
WITH dec AS ({body}),
d AS (SELECT * FROM dec WHERE residual IS NOT NULL),
stepped AS (
  SELECT *, SUM(residual) OVER w AS s1,
         SUM(residual * residual) OVER w AS s2,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS brk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_fit
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
fit AS (
  SELECT event_type, s1 / CAST(n_fit AS DOUBLE) AS mu,
         SQRT((s2 - s1 * s1 / CAST(n_fit AS DOUBLE)) / CAST(n_fit - 1 AS DOUBLE)) AS sd
  FROM stepped WHERE brk = n_fit)
SELECT d.event_type, d.x, d.day, d.daily_value, d.residual,
       CASE WHEN fit.sd > 0 THEN (d.residual - fit.mu) / fit.sd END AS z
FROM d JOIN fit ON d.event_type = fit.event_type
WHERE ABS(CASE WHEN fit.sd > 0 THEN (d.residual - fit.mu) / fit.sd END) > {z_cut}
ORDER BY d.event_type, d.x
"""


def seasonal_residual_anomalies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_residual_anomalies(_events(spark, sf_dir, parallelize=True), z_cut=1.5)


def type_mix_drift(events: DataFrame, split_day: int = 15) -> DataFrame:
    """Categorical mix drift between the two halves of the window: chi²
    and G-test of independence on the (event_type × half) contingency —
    'did the SHARE of each event type change', completing the drift
    triad (PSI = numeric binned, KS = numeric nonparametric, this =
    categorical). One row: (n_a, n_b, dof, chi2, g_stat).

    Counts are exact integers from one corpus-sized groupBy; both
    statistics fold over the type-sorted cell list (fixed IEEE order on
    both engines — the catalog-sized analogue of the ordered-window
    pattern). Zero-observed cells contribute to chi² only; expected
    counts are always positive when both halves are nonempty."""
    half = F.when(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")) < split_day, F.lit("a")
    ).otherwise(F.lit("b"))
    byt = events.groupBy("event_type", half.alias("half")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cells = byt.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == "a", F.col("c")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("half") == "b", F.col("c")).otherwise(0)).alias("c_b"),
    )
    row = cells.agg(
        F.sort_array(
            F.collect_list(F.struct("event_type", "c_a", "c_b"))
        ).alias("arr"),
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).alias("n_types"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb

    def chi_cell(x):
        rt = (x["c_a"] + x["c_b"]).cast("double")
        ea = rt * na / n
        eb = rt * nb / n
        oa = x["c_a"].cast("double")
        ob = x["c_b"].cast("double")
        return (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb

    def g_cell(x):
        rt = (x["c_a"] + x["c_b"]).cast("double")
        ea = rt * na / n
        eb = rt * nb / n
        oa = x["c_a"].cast("double")
        ob = x["c_b"].cast("double")
        ta = F.when(x["c_a"] > 0, oa * F.log(oa / ea)).otherwise(F.lit(0.0))
        tb = F.when(x["c_b"] > 0, ob * F.log(ob / eb)).otherwise(F.lit(0.0))
        return ta + tb

    chi2 = F.aggregate(F.col("arr"), F.lit(0.0), lambda acc, x: acc + chi_cell(x))
    g = F.lit(2.0) * F.aggregate(
        F.col("arr"), F.lit(0.0), lambda acc, x: acc + g_cell(x)
    )
    return row.select(
        "n_a",
        "n_b",
        (F.col("n_types") - 1).cast("long").alias("dof"),
        chi2.alias("chi2"),
        g.alias("g_stat"),
    )


def sql_type_mix_drift(split_day: int = 15) -> str:
    # NOTE: DuckDB's arrow-lambda parser rejects the full per-cell
    # arithmetic inline (a parser, not semantic, limit) — so the cell
    # math runs in a plain CTE and the type-sorted fold sums precomputed
    # cell values. Per-cell expressions and the accumulation order match
    # the Spark fold exactly, so the doubles are identical.
    return f"""
WITH tagged AS (
  SELECT event_type,
         CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) < {split_day}
              THEN 'a' ELSE 'b' END AS half
  FROM events),
byt AS (SELECT event_type, half, COUNT(*) AS c FROM tagged GROUP BY 1, 2),
cells AS (
  SELECT event_type,
         SUM(CASE WHEN half = 'a' THEN c ELSE 0 END) AS c_a,
         SUM(CASE WHEN half = 'b' THEN c ELSE 0 END) AS c_b
  FROM byt GROUP BY 1),
cells2 AS (
  SELECT event_type, c_a, c_b,
         SUM(c_a) OVER () AS n_a, SUM(c_b) OVER () AS n_b
  FROM cells),
cc AS (
  SELECT event_type, c_a, c_b, n_a, n_b,
         (CAST(c_a AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) * CAST(n_a AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
         * (CAST(c_a AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) * CAST(n_a AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
         / (CAST(c_a + c_b AS DOUBLE) * CAST(n_a AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
         + (CAST(c_b AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) * CAST(n_b AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
         * (CAST(c_b AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) * CAST(n_b AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
         / (CAST(c_a + c_b AS DOUBLE) * CAST(n_b AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) AS chi_cell,
         (CASE WHEN c_a > 0
               THEN CAST(c_a AS DOUBLE) * LN(CAST(c_a AS DOUBLE)
                    / (CAST(c_a + c_b AS DOUBLE) * CAST(n_a AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
               ELSE 0.0 END)
         + (CASE WHEN c_b > 0
               THEN CAST(c_b AS DOUBLE) * LN(CAST(c_b AS DOUBLE)
                    / (CAST(c_a + c_b AS DOUBLE) * CAST(n_b AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
               ELSE 0.0 END) AS g_cell
  FROM cells2),
agg AS (
  SELECT list_sort(list({{'event_type': event_type, 'chi': chi_cell, 'g': g_cell}})) AS arr,
         CAST(MAX(n_a) AS BIGINT) AS n_a,
         CAST(MAX(n_b) AS BIGINT) AS n_b,
         COUNT(*) AS n_types
  FROM cc)
SELECT n_a, n_b, CAST(n_types - 1 AS BIGINT) AS dof,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list_transform(arr, x -> x.chi)),
                   (acc, v) -> acc + v) AS chi2,
       2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list_transform(arr, x -> x.g)),
                         (acc, v) -> acc + v) AS g_stat
FROM agg
"""


def type_mix_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return type_mix_drift(_events(spark, sf_dir, parallelize=True))
