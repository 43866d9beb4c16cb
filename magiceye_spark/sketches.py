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


def value_distribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_distribution(_events(spark, sf_dir))


def approx_user_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_counts(_events(spark, sf_dir))


def approx_value_distribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_value_distribution(_events(spark, sf_dir))
