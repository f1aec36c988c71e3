"""Data sources/sinks beyond the lake's own parquet tables."""

from pg_ducklake_spark.sources.csv import ingest_csv, read_csv

__all__ = ["read_csv", "ingest_csv"]
