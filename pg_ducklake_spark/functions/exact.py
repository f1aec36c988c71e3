"""Deterministic cross-engine aggregates.

Floating-point SUM/AVG are order-dependent, so a distributed Spark sum
and a single-threaded DuckDB sum of the same doubles can differ in the
last ULPs — enough to break value-hash comparison. The fix: round each
*input term* to DECIMAL(38,10) (a deterministic, order-independent
conversion — no binary fraction is an exact decimal tie at scale 10, so
any round-to-nearest engine agrees), sum exactly in decimal, and cast
the final result back to DOUBLE. Identical on any engine and any
parallelism/partitioning — which is exactly what a 1000-executor job
needs for reproducible results.

Spark executes decimal sums inside whole-stage codegen with partial
(map-side) aggregation, so this costs little versus a double sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,10)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM(double) → DOUBLE (exact decimal internally).

    The decimal result goes through VARCHAR before the double cast:
    engines disagree by 1 ULP on direct decimal→double conversion, but
    decimal→string is exact and string→double parsing is correctly
    rounded everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("string").cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG(double) → DOUBLE (exact sum / non-null count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("string").cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB/ANSI SQL text equivalent of :func:`dsum`."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB/ANSI SQL text equivalent of :func:`davg`."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT(({expr}))"
    )
