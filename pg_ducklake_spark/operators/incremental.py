"""Incremental aggregate maintenance over the change feed (algebraic
materialized-view maintenance).

A grouped COUNT/SUM aggregate (and everything derivable from them: AVG,
rates, ratios) is *algebraic*: it can be advanced from snapshot a to
snapshot b using only the rows that changed, never rescanning the
table. The change feed (≙ ducklake table_changes,
src/pgducklake_functions.cpp:107-118) supplies exactly the needed
multiset delta:

    insert / update_postimage  → +1 (and +measure)
    delete / update_preimage   → −1 (and −measure)

Scale shape (the 100 TB materialized-view pattern): the delta
aggregation touches only changed rows (bounded by the DML volume, not
the table), one map-side-combined shuffle on the group keys; the merge
with the base aggregate is a full-outer join on the same keys — base is
|groups| rows, usually broadcastable. Recomputing from scratch scans
the corpus; this scans the diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_agg(
    lake,
    name: str,
    base: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    from_version: int,
    to_version: int | None = None,
    count_col: str = "n",
) -> DataFrame:
    """Advance a grouped COUNT + SUM aggregate from ``from_version`` to
    ``to_version`` using only the change feed.

    ``base`` holds the aggregate at ``from_version`` with columns
    ``group_cols + [count_col] + [f"sum_{c}" for c in sum_cols]``.
    Returns the same shape at ``to_version``; groups whose count drops
    to zero disappear (exactly like a recompute).

    Measures must be exactly representable under addition (integers, or
    fixed-point decimals scaled to integers) for the incremental result
    to be bit-equal to a recompute — floating SUMs are order-dependent
    and will drift; scale them first (functions/exact.py rationale).
    """
    if to_version is None:
        to_version = lake.current_snapshot(name)
    if to_version <= from_version:
        return base
    feed = lake.table_changes(name, from_version + 1, to_version)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = feed.groupBy(*group_cols).agg(
        F.sum(sign).alias("_dn"),
        *[
            F.sum(sign * F.col(c)).alias(f"_ds_{c}")
            for c in sum_cols
        ],
    )
    merged = base.join(delta, group_cols, "full_outer")
    out_cols = [*group_cols]
    n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("_dn"), F.lit(0)
    )
    out_cols.append(n.alias(count_col))
    for c in sum_cols:
        s = F.coalesce(F.col(f"sum_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"_ds_{c}"), F.lit(0)
        )
        out_cols.append(s.alias(f"sum_{c}"))
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def snapshot_agg(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """The from-scratch aggregate in the shape ``incremental_agg``
    maintains — used to seed the base and to verify increments."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
