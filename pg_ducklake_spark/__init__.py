"""pg_ducklake_spark — a PySpark-native lakehouse analytics engine.

Re-implements the query and data-processing capabilities of the
`relytcloud/pg_ducklake` PostgreSQL extension (see SURVEY.md) as an
idiomatic Spark package:

- ``Lake``: a DuckLake-shaped lakehouse layer (snapshots, time travel,
  change feed, partitioning, sorted compaction, inline small-write
  buffer, vacuum/cleanup, freeze/attach) over Parquet + a JSON snapshot
  log (Delta-log style; no Delta dependency needed).
- ``plans``: the delegated analytic SQL surface (SURVEY.md §2.B) plus
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing), each expressed DataFrame-first and paired with a
  DuckDB oracle SQL string for cross-engine verification.
"""

from pg_ducklake_spark.errors import (
    AccessControlError,
    ConcurrentModificationError,
    LakeError,
    ReadOnlyError,
    TableNotFoundError,
)

from pg_ducklake_spark.lake import Lake

__all__ = [
    "Lake",
    "LakeError",
    "TableNotFoundError",
    "ConcurrentModificationError",
    "ReadOnlyError",
    "AccessControlError",
]

__version__ = "0.1.0"
