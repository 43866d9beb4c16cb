"""magiceye_spark — a PySpark-native engine with the capabilities of
myyrakle/magiceye (a database schema diff checker), extended with row-level
data diffing and LLM-data-pipeline operators.

Everything is expressed as pure DataFrame transforms so Catalyst owns the
physical plan; see SURVEY.md for the blueprint and reference citations.
"""

from magiceye_spark.schema import (
    TABLES_SCHEMA,
    COLUMNS_SCHEMA,
    INDEXES_SCHEMA,
    FKS_SCHEMA,
    FINDINGS_SCHEMA,
)
from magiceye_spark.snapshot import SchemaSnapshot
from magiceye_spark.diff.core import (
    diff_tables,
    diff_columns,
    diff_indexes,
    diff_foreign_keys,
    diff_schemas,
    diff_timeline,
)
from magiceye_spark.report import render_findings, grouped_report, write_report
from magiceye_spark.datadiff import (
    diff_data,
    diff_data_hash,
    diff_data_incremental,
    diff_data_summary,
    build_scd2,
    scd2_apply_snapshot,
    scd2_snapshot_at,
    diff_triage,
    diff_rows_set,
    read_fingerprints,
    write_fingerprints,
)
from magiceye_spark.events_ops import asof_join, range_join_count, sessionize
from magiceye_spark.skew import salted_join
from magiceye_spark.dq import Rules, check_quality
from magiceye_spark.profile import profile_table, profile_drift, psi_histogram_drift
from magiceye_spark.layout import zorder_write, zorder_code, file_span_profile
from magiceye_spark.ddl import suggest_ddl
from magiceye_spark.io import (
    compact_table,
    read_table,
    write_bucketed,
    write_partitioned,
)
from magiceye_spark.sources.spark_catalog import snapshot_spark_catalog

__all__ = [
    "TABLES_SCHEMA",
    "COLUMNS_SCHEMA",
    "INDEXES_SCHEMA",
    "FKS_SCHEMA",
    "FINDINGS_SCHEMA",
    "SchemaSnapshot",
    "diff_tables",
    "diff_columns",
    "diff_indexes",
    "diff_foreign_keys",
    "diff_schemas",
    "render_findings",
    "grouped_report",
    "write_report",
    "diff_data",
    "diff_data_hash",
    "diff_data_incremental",
    "diff_data_summary",
    "build_scd2",
    "scd2_apply_snapshot",
    "scd2_snapshot_at",
    "diff_triage",
    "diff_rows_set",
    "read_fingerprints",
    "write_fingerprints",
    "asof_join",
    "sessionize",
    "salted_join",
    "profile_table",
    "profile_drift",
    "psi_histogram_drift",
    "zorder_write",
    "zorder_code",
    "file_span_profile",
    "read_table",
    "compact_table",
    "write_bucketed",
    "snapshot_spark_catalog",
]

__version__ = "0.1.0"
