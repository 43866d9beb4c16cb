"""SchemaSnapshot — a bundle of the four catalog DataFrames for one database.

Replaces the reference's driver-memory ``HashMap<String, Table>`` snapshot
(``src/action/run/steps/fetching.rs:14,27``) with distributed DataFrames so a
catalog of millions of objects (or a data lake's worth of table metadata)
diffs without ever materializing on one machine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magiceye_spark.schema import (
    COLUMNS_SCHEMA,
    FKS_SCHEMA,
    INDEXES_SCHEMA,
    TABLES_SCHEMA,
)

_KINDS = ("tables", "columns", "indexes", "fks")
_SCHEMAS = {
    "tables": TABLES_SCHEMA,
    "columns": COLUMNS_SCHEMA,
    "indexes": INDEXES_SCHEMA,
    "fks": FKS_SCHEMA,
}


def _normalize(df: DataFrame, kind: str) -> DataFrame:
    """Coalesce NULL text properties to '' and NULL bools to False, matching
    the reference's scan-time normalization (src/sql/postgres.rs:54-56,
    src/sql/mysql.rs:42-44) so inequality checks never hit SQL NULL traps."""
    schema = _SCHEMAS[kind]
    cols = []
    for field in schema.fields:
        c = F.col(field.name)
        if field.dataType.typeName() == "string":
            c = F.coalesce(c, F.lit(""))
        elif field.dataType.typeName() == "boolean":
            c = F.coalesce(c, F.lit(False))
        elif field.dataType.typeName() == "array":
            c = F.coalesce(c, F.array().cast(field.dataType))
        cols.append(c.alias(field.name))
    return df.select(*cols)


@dataclass(frozen=True)
class SchemaSnapshot:
    """The four normalized catalog tables for one database side."""

    tables: DataFrame
    columns: DataFrame
    indexes: DataFrame
    fks: DataFrame

    @classmethod
    def from_rows(
        cls,
        spark: SparkSession,
        tables: Iterable[Sequence] = (),
        columns: Iterable[Sequence] = (),
        indexes: Iterable[Sequence] = (),
        fks: Iterable[Sequence] = (),
    ) -> "SchemaSnapshot":
        """Build from plain Python rows (tests, fixtures, tiny catalogs)."""
        return cls(
            tables=_normalize(spark.createDataFrame(list(tables), TABLES_SCHEMA), "tables"),
            columns=_normalize(spark.createDataFrame(list(columns), COLUMNS_SCHEMA), "columns"),
            indexes=_normalize(spark.createDataFrame(list(indexes), INDEXES_SCHEMA), "indexes"),
            fks=_normalize(spark.createDataFrame(list(fks), FKS_SCHEMA), "fks"),
        )

    @classmethod
    def from_dataframes(
        cls, tables: DataFrame, columns: DataFrame, indexes: DataFrame, fks: DataFrame
    ) -> "SchemaSnapshot":
        return cls(
            tables=_normalize(tables, "tables"),
            columns=_normalize(columns, "columns"),
            indexes=_normalize(indexes, "indexes"),
            fks=_normalize(fks, "fks"),
        )

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "SchemaSnapshot":
        """Read a snapshot previously persisted with :meth:`write_parquet`.

        Parquet is the snapshot interchange format (self-describing schema,
        column-pruned scans); layout is ``{path}/{tables,columns,indexes,fks}``.
        """
        dfs = {k: spark.read.parquet(f"{path}/{k}") for k in _KINDS}
        return cls.from_dataframes(dfs["tables"], dfs["columns"], dfs["indexes"], dfs["fks"])

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        for kind in _KINDS:
            getattr(self, kind).write.mode(mode).parquet(f"{path}/{kind}")

    @classmethod
    def read_bucketed(cls, spark: SparkSession, table_prefix: str) -> "SchemaSnapshot":
        """Read a snapshot persisted with :meth:`write_bucketed` from the
        session catalog (``{prefix}_tables`` … ``{prefix}_fks``).

        Deliberately does NOT re-run :func:`_normalize`: the persisted rows
        were normalized before the bucketed write, and wrapping table_name
        in another ``coalesce`` would hide the scan's bucket partitioning
        from the optimizer — exactly the property this path exists for
        (shuffle-free matcher joins)."""
        dfs = {k: spark.table(f"{table_prefix}_{k}") for k in _KINDS}
        return cls(tables=dfs["tables"], columns=dfs["columns"],
                   indexes=dfs["indexes"], fks=dfs["fks"])

    def write_bucketed(self, table_prefix: str, n_buckets: int = 32) -> None:
        """Persist all four sides bucketed (and sorted) by ``table_name``
        into the session catalog as ``{prefix}_tables`` … ``{prefix}_fks``.

        The scale path for catalogs too big to broadcast (millions of
        objects): when BOTH diff sides are written this way with the same
        bucket count, every matcher join in :mod:`magiceye_spark.diff.core`
        clusters on table_name at WRITE time, so
        ``diff_schemas(..., hint_broadcast=False)`` runs shuffle-free
        end-to-end — write once, diff every subsequent snapshot against it
        without re-shuffling either side (pinned in tests/test_plans.py).
        """
        from magiceye_spark import io

        for kind in _KINDS:
            io.write_bucketed(
                getattr(self, kind), f"{table_prefix}_{kind}", ["table_name"], n_buckets
            )

    def table_names(self) -> DataFrame:
        return self.tables.select("table_name")
