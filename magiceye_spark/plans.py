"""Physical-plan inspection utilities.

The reference has no optimizer (SURVEY.md §4) — Catalyst is ours for free,
but only if the operators stay declarative. These helpers make plan quality
*testable*: scans must show pushed filters and pruned schemas, dimension
joins must broadcast, Python must not appear in hot paths. Used by
tests/test_plans.py to pin the plans, so a refactor that silently degrades
to a shuffle join or a row-at-a-time Python eval fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (AQE may later coalesce them, but each
    is a logical shuffle boundary — the thing to minimize at 100 TB)."""
    return len(re.findall(r"\bExchange\b", executed_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", executed_plan(df)))


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", executed_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries from every file scan — the evidence that a
    filter on a hive-partition column prunes directories at planning time
    instead of reading and discarding rows."""
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: ([^\n]+)", formatted_plan(df))


def python_eval_count(df: DataFrame) -> int:
    """Row-at-a-time or Arrow Python evals in the plan. Zero for every
    operator except the explicitly-Pandas multimodal kernels."""
    return len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas", executed_plan(df)))


def wholestage_codegen_count(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", executed_plan(df)))


def cartesian_product_count(df: DataFrame) -> int:
    """True CartesianProduct operators (both sides shuffled, O(n·m) —
    never acceptable at scale). BroadcastNestedLoopJoin is NOT counted:
    a broadcast scalar crossJoin is the repo's standard total/offset
    move and streams the big side once."""
    return len(re.findall(r"\bCartesianProduct\b", executed_plan(df)))


def single_partition_window_contexts(df: DataFrame) -> list[str]:
    """Plan contexts where an ``Exchange SinglePartition`` feeds a Window
    (directly or through Sort / WindowGroupLimit) — the single-task global
    sort that serializes an unpartitioned ``Window.orderBy`` /
    ``Window.partitionBy()`` through one core at scale.

    The ONE permitted shape is excluded: the two-phase helper's offsets
    window (``magiceye_spark.io.two_phase_window`` /
    ``assign_global_ids``), whose input is one row per shuffle partition
    (Sort on ``_pid``) — bounded by partition count, never by data.
    """
    def op_indent(ln: str) -> int:
        m = re.search(r"[+:]- ", ln)
        return m.start() if m else -1  # tree root

    def op_text(ln: str) -> str:
        m = re.search(r"[+:]- ", ln)
        t = ln[m.end():] if m else ln
        return re.sub(r"^\*\(\d+\) ", "", t)  # strip codegen stage tag

    lines = executed_plan(df).split("\n")
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        # walk the exchange's ANCESTOR chain (nearest line above with a
        # smaller operator indent, repeatedly) instead of a fixed lookback:
        # a Window separated from its Exchange by extra Project/Filter
        # lines is still found, and sibling subtrees are never matched
        chain = []
        indent = op_indent(ln)
        for j in range(i - 1, -1, -1):
            pin = op_indent(lines[j])
            if pin < indent:
                chain.append(lines[j])
                indent = pin
                if pin < 0:
                    break
        permitted = False
        flagged = False
        for anc in chain:
            t = op_text(anc)
            if t.startswith("Sort ") and re.match(r"Sort \[_pid#\d+", t):
                # the bounded two-phase offsets window: its input is one
                # row per shuffle partition, sorted exactly on _pid
                permitted = True
                break
            if t.startswith(("Window", "WindowGroupLimit")):
                flagged = True
                break
            if not t.startswith(("Sort ", "Project", "Filter")):
                break  # scalar aggregate / limit — partial-agg'd, fine
        if flagged and not permitted:
            bad.append("\n".join([*reversed(chain[:4]), ln]))
    return bad
