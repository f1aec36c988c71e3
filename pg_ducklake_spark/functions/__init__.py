"""Column-function helpers shared by operators and query plans."""

from pg_ducklake_spark.functions.exact import davg, dsum, sql_davg, sql_dsum

__all__ = ["dsum", "davg", "sql_dsum", "sql_davg"]
