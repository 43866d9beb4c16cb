from magiceye_spark.diff.core import (
    diff_tables,
    diff_columns,
    diff_indexes,
    diff_foreign_keys,
    diff_schemas,
)

__all__ = [
    "diff_tables",
    "diff_columns",
    "diff_indexes",
    "diff_foreign_keys",
    "diff_schemas",
]
