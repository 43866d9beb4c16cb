"""Snapshot sources: live PostgreSQL/MySQL catalogs over JDBC, and parquet
snapshot interchange (magiceye_spark.snapshot handles the latter)."""
