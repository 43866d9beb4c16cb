"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same configs are what we'd set on a
1000-executor cluster (AQE, skew handling, broadcast threshold). Nothing here
is local-mode-specific except the master fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "magiceye-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
      which is what makes the fixed shuffle-partition number safe at any SF.
    - UTC session timezone: deterministic timestamps vs the DuckDB oracle.
    - Arrow enabled: fast pandas interchange for the few Pandas-UDF operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark's reader
        # rejects nanos unless surfaced as long (converted at the scan,
        # analytics._events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # joins whose keys EXTEND a bucketed/partitioned layout (e.g. the
        # schema-diff matchers on (table_name, object_name) over snapshots
        # bucketed by table_name) may reuse that layout instead of
        # re-shuffling both sides — subset co-partitioning
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # runtime bloom-filter join pruning is default-ON in Spark 4
        # (fires only past its 10 GB application-side scan threshold, i.e.
        # on a real lake). Do NOT enable the sibling
        # runtimeFilter.semiJoinReduction flag: on this Spark 4.1.2 build
        # it hangs even a plain parquet count (reproduced in isolation).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off by default (headless); SPARK_GRAFT_UI=1 turns it on for
        # the REST-API stage audit (tools/stage_audit.py)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        # InferFiltersFromGenerate adds `size(arr) > 0` above every
        # explode; predicate pushdown then drags that filter — with the
        # FULL array-building expression substituted in — below the
        # explicit repartitions that spread CPU-dense projections, so
        # shingling / gram-hashing / signature transforms re-run inside
        # the one-task scan stage, once per consuming subtree (measured
        # 4 subtrees x 4.5 s on the containment index at sf0.1). The
        # rule's only benefit is skipping empty-array rows before a
        # generate — never the hot case here; excluding it is strictly
        # cheaper than the explode_outer workaround, which silently
        # disables generator codegen (measured 26x total-CPU blowup on
        # the phash signature pass). See PLANS.md "CPU-dense stages vs
        # byte-based sizing".
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    # SPARK_GRAFT_MASTER points the whole engine (bench.py included) at a
    # real cluster (spark://…, yarn, k8s://…) without code changes; the
    # local[N] fallback is the only local-mode-specific line in this file.
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    return builder.master(master).getOrCreate()
