"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its FULL plan into the noop sink (no driver collect of
large results, no laziness shortcuts). One measured run per query after a
session warm-up; BASELINE.md records the protocol.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "schema_diff_full",
    "datadiff_lineitem",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "events_hourly_rollup",
    "top_users_by_events",
    "q18_large_volume_customers",
    "events_sessionize",
    "purchase_last_click_asof",
    "vocab_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from magiceye_spark.session import get_spark
    from magiceye_spark import registry

    from pyspark.sql import functions as F

    spark = get_spark("magiceye-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # warm-up: exercise the real execution paths once (parquet scan, shuffle
    # agg, broadcast join, noop sink) so per-query timings measure the query,
    # not first-use JIT/codegen/classloading of those operators.
    spark.range(1).count()
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
