"""Distributed EXACT per-group order statistics (median et al.) via the
classic two-phase bin + refine layout.

The naive exact median — ``row_number() OVER (PARTITION BY key ORDER BY
value)`` — funnels each group through ONE task (a window partition is a
single partition), which dies when a group holds billions of rows. The
scale-safe exact plan used here:

1. **Histogram pass**: aggregate ``(key, bin)`` counts where ``bin`` is
   a coarse integer bucket of the value (default ``floor(value)``).
   The histogram is |keys| x |bins| rows — tiny — and the aggregation
   is map-side combined.
2. **Locate**: a cumulative sum over the (small) histogram finds, per
   group, the bin containing the k-th element and the offset j of that
   element *within* the bin.
3. **Refine pass**: re-scan only the rows that fall in each group's
   target bin (an equi-join against the broadcast one-row-per-group
   target set) and take the j-th smallest by a per-group sort whose
   input is now ~n/|bins| rows.

Both passes are full scans but neither ever materializes a whole group
in one task, so the layout survives 100 TB with a skewed key. The
statistic is the **lower median** (k = (n+1) div 2, an actual data
value — no interpolation), which makes results bit-exact across
engines and lets a DuckDB window-function oracle pin it.

Reference parity note: the reference delegates quantiles to DuckDB
(``quantile_disc``/``quantile_cont`` are DuckDB built-ins exercised via
the delegated SQL surface); this module is the distributed-exact
equivalent for the Spark engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_order_statistic(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: Column | None = None,
    bin_col: Column | None = None,
    out_col: str = "median",
) -> DataFrame:
    """Exact k-th smallest ``value_col`` per group (default: lower
    median, k = (n+1) div 2). Returns one row per group:
    ``key_cols... , <out_col>``.

    ``k`` is a Column evaluated against the per-group total count
    column ``_n`` (e.g. ``(F.col("_n") + 1) / 2`` ceil'd); ``bin_col``
    is the coarse bucket expression (default ``floor(value)`` — right
    whenever values span a modest numeric range; pass e.g.
    ``F.floor(F.col(v) * 100)`` for sub-unit spreads).
    """
    b = (
        bin_col
        if bin_col is not None
        else F.floor(F.col(value_col)).cast("long")
    )
    binned = df.select(*key_cols, F.col(value_col).alias("_v"), b.alias("_bin"))
    hist = binned.groupBy(*key_cols, "_bin").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*key_cols)
    hist = hist.withColumn("_cum", F.sum("_cnt").over(wcum)).withColumn(
        "_n", F.sum("_cnt").over(wtot)
    )
    k_expr = (
        k if k is not None else F.expr("CAST((_n + 1) DIV 2 AS BIGINT)")
    )
    hist = hist.withColumn("_k", k_expr)
    # The target bin is the first whose cumulative count reaches k; the
    # wanted element is the j-th smallest inside it.
    target = hist.filter(
        (F.col("_cum") >= F.col("_k")) & (F.col("_cum") - F.col("_cnt") < F.col("_k"))
    ).select(*key_cols, "_bin", (F.col("_k") - (F.col("_cum") - F.col("_cnt"))).alias("_j"))
    # Refine: only rows in each group's target bin are sorted, and the
    # target set (one row per group) broadcasts.
    in_bin = binned.join(F.broadcast(target), [*key_cols, "_bin"])  # bcast-ok: one bin per group, group-domain bounded
    wrank = Window.partitionBy(*key_cols).orderBy("_v")
    return (
        in_bin.withColumn("_rn", F.row_number().over(wrank))
        .filter(F.col("_rn") == F.col("_j"))
        .select(*key_cols, F.col("_v").alias(out_col))
    )


def group_median_exact(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    bin_col: Column | None = None,
    out_col: str = "median",
) -> DataFrame:
    """Exact lower median per group (two-phase bin + refine)."""
    return group_order_statistic(
        df, key_cols, value_col, bin_col=bin_col, out_col=out_col
    )
