"""Synthetic catalog snapshots derived deterministically from the testdata
``part`` table, so every schema-diff operator (D1-D17) gets an ANSI-SQL
DuckDB oracle over the same parquet inputs.

The derivation maps each part row to catalog objects with modulo-keyed
perturbations on the target side; the EXACT same derivation is emitted as
SQL CTE text (:func:`oracle_ctes`) so the driver's side-by-side check
exercises the real diff operators, not a toy.

Perturbation plan (p = p_partkey; at sf0.01 p spans 0..1999):

- table id = p % 50; target drops table ids {7, 23, 41}          → D1
- one column per part row; target drops rows with p % 97 = 0     → D4
  data_type upper()'d when p % 13 = 0                            → D5
  comment suffixed when p % 53 = 0                               → D6
  nullable flipped when p % 31 = 0                               → D7
  default blanked when p % 41 = 0                                → D8
- one index per p % 10 = 0 row; target drops p % 70 = 0          → D11
  column order swapped when p % 30 = 0                           → D12
  predicate added when p % 110 = 0                               → D13
  uniqueness flipped when p % 130 = 0                            → D14
- one FK per p % 20 = 0 row; target drops p % 60 = 0             → D16
  ref table retargeted when p % 140 = 0                          → D17
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magiceye_spark.snapshot import SchemaSnapshot

MISSING_TABLE_IDS = (7, 23, 41)


def _part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/part.parquet")


def _tbl(p):  # table name from part key
    return F.concat(F.lit("tbl_"), (p % 50).cast("string"))


def base_snapshot(spark: SparkSession, sf_dir: str) -> SchemaSnapshot:
    part = _part(spark, sf_dir)
    p = F.col("p_partkey")
    tables = part.select(_tbl(p).alias("table_name")).distinct().withColumn(
        "table_comment", F.lit("")
    )
    columns = part.select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("col_"), p.cast("string")).alias("column_name"),
        F.col("p_type").alias("data_type"),
        F.col("p_brand").alias("column_default"),
        (F.col("p_size") % 2 == 0).alias("is_nullable"),
        F.col("p_name").alias("comment"),
        F.lit(False).alias("is_auto_increment"),
    )
    indexes = part.where(p % 10 == 0).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("idx_"), p.cast("string")).alias("index_name"),
        F.array(F.col("p_brand"), F.col("p_name")).alias("columns"),
        F.lit("").alias("predicate"),
        (F.col("p_size") % 3 == 0).alias("is_unique"),
    )
    fks = part.where(p % 20 == 0).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("fk_"), p.cast("string")).alias("fk_name"),
        F.array(F.concat(F.lit("col_"), p.cast("string"))).alias("columns"),
        F.col("p_brand").alias("ref_table"),
        F.col("p_type").alias("ref_column"),
    )
    return SchemaSnapshot.from_dataframes(tables, columns, indexes, fks)


def target_snapshot(spark: SparkSession, sf_dir: str) -> SchemaSnapshot:
    part = _part(spark, sf_dir)
    p = F.col("p_partkey")
    # a real catalog scan never yields child objects for absent tables
    # (fetching.rs:11-60, the invariant _scope_to_target_tables relies on),
    # so the dropped tables' columns/indexes/fks are dropped too
    present = ~(p % 50).isin(*MISSING_TABLE_IDS)
    tables = (
        part.where(present)
        .select(_tbl(p).alias("table_name"))
        .distinct()
        .withColumn("table_comment", F.lit(""))
    )
    nullable = F.col("p_size") % 2 == 0
    columns = part.where(present & (p % 97 != 0)).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("col_"), p.cast("string")).alias("column_name"),
        F.when(p % 13 == 0, F.upper("p_type")).otherwise(F.col("p_type")).alias("data_type"),
        F.when(p % 41 == 0, F.lit("")).otherwise(F.col("p_brand")).alias("column_default"),
        F.when(p % 31 == 0, ~nullable).otherwise(nullable).alias("is_nullable"),
        F.when(p % 53 == 0, F.concat(F.col("p_name"), F.lit(" v2"))).otherwise(
            F.col("p_name")
        ).alias("comment"),
        F.lit(False).alias("is_auto_increment"),
    )
    unique = F.col("p_size") % 3 == 0
    indexes = part.where(present & (p % 10 == 0) & (p % 70 != 0)).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("idx_"), p.cast("string")).alias("index_name"),
        F.when(p % 30 == 0, F.array(F.col("p_name"), F.col("p_brand"))).otherwise(
            F.array(F.col("p_brand"), F.col("p_name"))
        ).alias("columns"),
        F.when(p % 110 == 0, F.lit("p_size > 10")).otherwise(F.lit("")).alias("predicate"),
        F.when(p % 130 == 0, ~unique).otherwise(unique).alias("is_unique"),
    )
    fks = part.where(present & (p % 20 == 0) & (p % 60 != 0)).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("fk_"), p.cast("string")).alias("fk_name"),
        F.array(F.concat(F.lit("col_"), p.cast("string"))).alias("columns"),
        F.when(p % 140 == 0, F.lit("elsewhere")).otherwise(F.col("p_brand")).alias("ref_table"),
        F.col("p_type").alias("ref_column"),
    )
    return SchemaSnapshot.from_dataframes(tables, columns, indexes, fks)


# --------------------------------------------------------------- oracle SQL

#: CTE block reproducing the derivation above in DuckDB SQL. Index/FK column
#: lists are derived directly as their rendered ', '-joined strings (order
#: preserved), which is exactly what the findings table exposes.
ORACLE_CTES = """
WITH base_tables AS (
  SELECT DISTINCT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name FROM part
),
target_tables AS (
  SELECT DISTINCT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name
  FROM part WHERE p_partkey % 50 NOT IN (7, 23, 41)
),
matched AS (
  SELECT table_name FROM base_tables INTERSECT SELECT table_name FROM target_tables
),
base_columns AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'col_' || CAST(p_partkey AS VARCHAR) AS column_name,
         p_type AS data_type,
         p_brand AS column_default,
         p_size % 2 = 0 AS is_nullable,
         p_name AS comment
  FROM part
),
target_columns AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'col_' || CAST(p_partkey AS VARCHAR) AS column_name,
         CASE WHEN p_partkey % 13 = 0 THEN UPPER(p_type) ELSE p_type END AS data_type,
         CASE WHEN p_partkey % 41 = 0 THEN '' ELSE p_brand END AS column_default,
         CASE WHEN p_partkey % 31 = 0 THEN NOT (p_size % 2 = 0) ELSE p_size % 2 = 0 END AS is_nullable,
         CASE WHEN p_partkey % 53 = 0 THEN p_name || ' v2' ELSE p_name END AS comment
  FROM part WHERE p_partkey % 97 <> 0 AND p_partkey % 50 NOT IN (7, 23, 41)
),
base_indexes AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'idx_' || CAST(p_partkey AS VARCHAR) AS index_name,
         p_brand || ', ' || p_name AS columns_str,
         '' AS predicate,
         p_size % 3 = 0 AS is_unique
  FROM part WHERE p_partkey % 10 = 0
),
target_indexes AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'idx_' || CAST(p_partkey AS VARCHAR) AS index_name,
         CASE WHEN p_partkey % 30 = 0 THEN p_name || ', ' || p_brand
              ELSE p_brand || ', ' || p_name END AS columns_str,
         CASE WHEN p_partkey % 110 = 0 THEN 'p_size > 10' ELSE '' END AS predicate,
         CASE WHEN p_partkey % 130 = 0 THEN NOT (p_size % 3 = 0) ELSE p_size % 3 = 0 END AS is_unique
  FROM part WHERE p_partkey % 10 = 0 AND p_partkey % 70 <> 0
    AND p_partkey % 50 NOT IN (7, 23, 41)
),
base_fks AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'fk_' || CAST(p_partkey AS VARCHAR) AS fk_name,
         p_brand AS ref_table,
         p_type AS ref_column
  FROM part WHERE p_partkey % 20 = 0
),
target_fks AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'fk_' || CAST(p_partkey AS VARCHAR) AS fk_name,
         CASE WHEN p_partkey % 140 = 0 THEN 'elsewhere' ELSE p_brand END AS ref_table,
         p_type AS ref_column
  FROM part WHERE p_partkey % 20 = 0 AND p_partkey % 60 <> 0
    AND p_partkey % 50 NOT IN (7, 23, 41)
)
"""

_F6 = """table_name, object_kind, object_name, "check", base_value, target_value"""

SQL_MISSING_TABLES = f"""
SELECT b.table_name, 'table' AS object_kind, b.table_name AS object_name,
       'missing' AS "check", '' AS base_value, '' AS target_value
FROM base_tables b LEFT JOIN target_tables t USING (table_name)
WHERE t.table_name IS NULL
"""

SQL_COLUMN_DIFFS = f"""
SELECT {_F6} FROM (
  SELECT b.table_name, 'column' AS object_kind, b.column_name AS object_name,
         'missing' AS "check", '' AS base_value, '' AS target_value
  FROM base_columns b
  JOIN matched m USING (table_name)
  LEFT JOIN target_columns t USING (table_name, column_name)
  WHERE t.column_name IS NULL
  UNION ALL
  SELECT b.table_name, 'column', b.column_name, 'data_type', b.data_type, t.data_type
  FROM base_columns b JOIN matched m USING (table_name)
  JOIN target_columns t USING (table_name, column_name)
  WHERE b.data_type <> t.data_type
  UNION ALL
  SELECT b.table_name, 'column', b.column_name, 'comment', b.comment, t.comment
  FROM base_columns b JOIN matched m USING (table_name)
  JOIN target_columns t USING (table_name, column_name)
  WHERE b.comment <> t.comment
  UNION ALL
  SELECT b.table_name, 'column', b.column_name, 'nullable',
         CASE WHEN b.is_nullable THEN 'NULL' ELSE 'NOT NULL' END,
         CASE WHEN t.is_nullable THEN 'NULL' ELSE 'NOT NULL' END
  FROM base_columns b JOIN matched m USING (table_name)
  JOIN target_columns t USING (table_name, column_name)
  WHERE b.is_nullable <> t.is_nullable
  UNION ALL
  SELECT b.table_name, 'column', b.column_name, 'default', b.column_default, t.column_default
  FROM base_columns b JOIN matched m USING (table_name)
  JOIN target_columns t USING (table_name, column_name)
  WHERE b.column_default <> t.column_default
)
"""

SQL_INDEX_DIFFS = f"""
SELECT {_F6} FROM (
  SELECT b.table_name, 'index' AS object_kind, b.index_name AS object_name,
         'missing' AS "check", '' AS base_value, '' AS target_value
  FROM base_indexes b
  JOIN matched m USING (table_name)
  LEFT JOIN target_indexes t USING (table_name, index_name)
  WHERE t.index_name IS NULL
  UNION ALL
  SELECT b.table_name, 'index', b.index_name, 'index_columns', b.columns_str, t.columns_str
  FROM base_indexes b JOIN matched m USING (table_name)
  JOIN target_indexes t USING (table_name, index_name)
  WHERE b.columns_str <> t.columns_str
  UNION ALL
  SELECT b.table_name, 'index', b.index_name, 'index_predicate', b.predicate, t.predicate
  FROM base_indexes b JOIN matched m USING (table_name)
  JOIN target_indexes t USING (table_name, index_name)
  WHERE b.predicate <> t.predicate
  UNION ALL
  SELECT b.table_name, 'index', b.index_name, 'index_unique',
         CASE WHEN b.is_unique THEN 'UNIQUE' ELSE 'NOT UNIQUE' END,
         CASE WHEN t.is_unique THEN 'UNIQUE' ELSE 'NOT UNIQUE' END
  FROM base_indexes b JOIN matched m USING (table_name)
  JOIN target_indexes t USING (table_name, index_name)
  WHERE b.is_unique <> t.is_unique
)
"""

SQL_FK_DIFFS = f"""
SELECT {_F6} FROM (
  SELECT b.table_name, 'fk' AS object_kind, b.fk_name AS object_name,
         'missing' AS "check", '' AS base_value, '' AS target_value
  FROM base_fks b
  JOIN matched m USING (table_name)
  LEFT JOIN target_fks t USING (table_name, fk_name)
  WHERE t.fk_name IS NULL
  UNION ALL
  SELECT b.table_name, 'fk', b.fk_name, 'fk_ref',
         b.ref_table || '.' || b.ref_column, t.ref_table || '.' || t.ref_column
  FROM base_fks b JOIN matched m USING (table_name)
  JOIN target_fks t USING (table_name, fk_name)
  WHERE b.ref_table <> t.ref_table OR b.ref_column <> t.ref_column
)
"""


def oracle_sql_full() -> str:
    parts = " UNION ALL ".join(
        f"SELECT {_F6} FROM ({q})"
        for q in (SQL_MISSING_TABLES, SQL_COLUMN_DIFFS, SQL_INDEX_DIFFS, SQL_FK_DIFFS)
    )
    return ORACLE_CTES + parts


def with_ctes(body: str) -> str:
    return ORACLE_CTES + body


def _swap_roles(sql: str) -> str:
    """Reverse-direction diff SQL: swap base_*/target_* CTE references for
    the four object kinds (``matched`` is an INTERSECT — symmetric — and
    the ``base_value`` output alias is deliberately untouched)."""
    out = sql
    for kind in ("tables", "columns", "indexes", "fks"):
        out = (
            out.replace(f"base_{kind}", "__swap__")
            .replace(f"target_{kind}", f"base_{kind}")
            .replace("__swap__", f"target_{kind}")
        )
    return out


def oracle_sql_timeline() -> str:
    """Oracle for a 3-version drift timeline v1=base → v2=target → v3=base
    (a revert): the forward findings tagged (v1, v2) plus the role-swapped
    reverse findings tagged (v2, v3)."""
    bodies = (SQL_MISSING_TABLES, SQL_COLUMN_DIFFS, SQL_INDEX_DIFFS, SQL_FK_DIFFS)
    fwd = " UNION ALL ".join(f"SELECT {_F6} FROM ({q})" for q in bodies)
    rev = " UNION ALL ".join(
        f"SELECT {_F6} FROM ({_swap_roles(q)})" for q in bodies
    )
    return ORACLE_CTES + f"""
SELECT 'v1' AS from_version, 'v2' AS to_version, {_F6} FROM ({fwd})
UNION ALL
SELECT 'v2' AS from_version, 'v3' AS to_version, {_F6} FROM ({rev})
"""


def renamed_snapshot(spark: SparkSession, sf_dir: str) -> SchemaSnapshot:
    """A target variant for the rename detector: identical to
    :func:`base_snapshot` except every column with p_partkey % 11 == 0 is
    RENAMED (col_N → rcol_N) — type, default, nullability and comment
    untouched. The drop+add pair this produces is exactly what
    check.rs-style diffing reports as two findings and a human reads as
    one rename."""
    part = _part(spark, sf_dir)
    p = F.col("p_partkey")
    tables = part.select(_tbl(p).alias("table_name")).distinct().withColumn(
        "table_comment", F.lit("")
    )
    columns = part.select(
        _tbl(p).alias("table_name"),
        F.when(
            p % 11 == 0, F.concat(F.lit("rcol_"), p.cast("string"))
        ).otherwise(F.concat(F.lit("col_"), p.cast("string"))).alias("column_name"),
        F.col("p_type").alias("data_type"),
        F.col("p_brand").alias("column_default"),
        (F.col("p_size") % 2 == 0).alias("is_nullable"),
        F.col("p_name").alias("comment"),
        F.lit(False).alias("is_auto_increment"),
    )
    indexes = part.where(p % 10 == 0).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("idx_"), p.cast("string")).alias("index_name"),
        F.array(F.col("p_brand"), F.col("p_name")).alias("columns"),
        F.lit("").alias("predicate"),
        (F.col("p_size") % 3 == 0).alias("is_unique"),
    )
    fks = part.where(p % 20 == 0).select(
        _tbl(p).alias("table_name"),
        F.concat(F.lit("fk_"), p.cast("string")).alias("fk_name"),
        F.array(F.concat(F.lit("col_"), p.cast("string"))).alias("columns"),
        F.col("p_brand").alias("ref_table"),
        F.col("p_type").alias("ref_column"),
    )
    return SchemaSnapshot.from_dataframes(tables, columns, indexes, fks)


SQL_RENAME_CANDIDATES = """
WITH base_cols AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         'col_' || CAST(p_partkey AS VARCHAR) AS column_name,
         p_type AS data_type, p_brand AS column_default, p_name AS comment
  FROM part
),
ren_cols AS (
  SELECT 'tbl_' || CAST(p_partkey % 50 AS VARCHAR) AS table_name,
         CASE WHEN p_partkey % 11 = 0 THEN 'rcol_' || CAST(p_partkey AS VARCHAR)
              ELSE 'col_' || CAST(p_partkey AS VARCHAR) END AS column_name,
         p_type AS data_type, p_brand AS column_default, p_name AS comment
  FROM part
),
dropped AS (
  SELECT * FROM base_cols b
  WHERE NOT EXISTS (SELECT 1 FROM ren_cols t
                    WHERE t.table_name = b.table_name AND t.column_name = b.column_name)
),
added AS (
  SELECT * FROM ren_cols t
  WHERE NOT EXISTS (SELECT 1 FROM base_cols b
                    WHERE b.table_name = t.table_name AND b.column_name = t.column_name)
),
scored AS (
  SELECT d.table_name, d.column_name AS old_column, a.column_name AS new_column,
         levenshtein(d.column_name, a.column_name) AS name_dist,
         COALESCE(d.column_default, '') = COALESCE(a.column_default, '') AS default_match
  FROM dropped d JOIN added a
    ON d.table_name = a.table_name AND d.data_type = a.data_type AND d.comment = a.comment
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY table_name, old_column
                               ORDER BY name_dist ASC, new_column ASC) AS rk
  FROM scored
)
SELECT table_name, old_column, new_column, CAST(name_dist AS INT) AS name_dist, default_match
FROM ranked WHERE rk = 1
ORDER BY table_name, old_column
"""
