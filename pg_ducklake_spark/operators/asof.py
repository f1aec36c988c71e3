"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key) — the canonical time-series enrichment operator.

Spark has no native ASOF JOIN (DuckDB does). Two Spark-first
strategies, picked by the caller:

- ``asof_join`` (union+window): tag both sides, union, one window sorted
  by (key, ts) carrying the last right-row forward, keep left rows.
  ONE shuffle on the key, no range explosion — the right default, and
  the shape that survives 100 TB (state is one row per partition
  position, never a cross product).
- ``asof_join_range`` (bucketed range join): join on (key, time_bucket)
  with the right side duplicated into the buckets it can serve, then
  rank. Useful when the right side is tiny and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_prefix: str = "r_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Latest right row with ``right.on <= left.on``, matched per ``by``
    keys. Right columns (except keys) come back ``right_prefix``-ed;
    unmatched left rows keep NULLs. ``tolerance_seconds`` drops matches
    older than the window (pandas ``merge_asof`` semantics).
    """
    by = by or []
    lcols = left.columns
    rcols = [c for c in right.columns if c not in by and c != on]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(f"{right_prefix}{on}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    )
    for c in lcols:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.select(*rt.columns).unionByName(rt)

    # Right rows sort before left rows at the same timestamp (_side 0 < 1)
    # so an exactly-equal right row is visible to the left row — ASOF
    # `>=` semantics.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"{right_prefix}{c}")), True)
            .over(w)
            .alias(f"_c_{c}")
            for c in [on] + rcols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_c_{c}").alias(f"{right_prefix}{c}") for c in [on] + rcols],
    )
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col(on).cast("timestamp"))
            - F.unix_micros(F.col(f"{right_prefix}{on}").cast("timestamp"))
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"{right_prefix}{c}"))
                .otherwise(F.lit(None))
                .alias(f"{right_prefix}{c}")
                for c in [on] + rcols
            ],
        )
    return out


def asof_self_join(
    df: DataFrame,
    left_pred,
    right_pred,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Same-source as-of enrichment in ONE scan.

    Rows matching ``right_pred`` carry ``[on] + right_cols`` forward
    (per ``by`` keys, ordered by ``on``) to later rows matching
    ``left_pred``. Equivalent to ``asof_join(df.filter(left_pred),
    df.filter(right_pred), ...)`` but reads and shuffles the source once
    — when both sides come from the same table (the common
    event-enrichment case) this halves the scan and the shuffle, which
    is the dominant cost at 100 TB.
    """
    by = by or []
    right_cols = right_cols or []
    side = F.when(right_pred, F.lit(0)).when(left_pred, F.lit(1))
    tagged = df.withColumn("_side", side).filter(F.col("_side").isNotNull())
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), True)
            .over(w)
            .alias(f"{right_prefix}{c}")
            for c in [on] + right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def asof_join_range(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Broadcast-range variant: plain theta-join on key + ``r.on <= l.on``
    then keep the max right timestamp per left row. Only for a small
    right side (the join is O(|L|·matches)); pairs with
    ``F.broadcast(right)`` upstream."""
    by = by or []
    lcols = left.columns
    rcols = [c for c in right.columns if c not in by and c != on]
    r = right.select(
        *[F.col(c).alias(f"_rk_{c}") for c in by],
        F.col(on).alias(f"{right_prefix}{on}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    )
    cond = F.lit(True)
    for k in by:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    cond = cond & (F.col(f"{right_prefix}{on}") <= F.col(on))
    # Narrow surrogate key: ranking per left ROW must not shuffle by the
    # full row (wide keys + arbitrary payload columns kill the exchange
    # at scale); a monotonic id gives the same grouping with an 8-byte key.
    tagged = left.withColumn("_asof_rid", F.monotonically_increasing_id())
    joined = tagged.join(F.broadcast(r), cond, "left")  # bcast-ok: documented small-right contract (docstring)
    w = Window.partitionBy("_asof_rid").orderBy(
        F.col(f"{right_prefix}{on}").desc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*lcols, f"{right_prefix}{on}", *[f"{right_prefix}{c}" for c in rcols])
    )
