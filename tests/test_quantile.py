"""operators/quantile.py: distributed exact per-group order statistics.

Pins (1) value correctness of the two-phase bin + refine median against
a brute-force sorted reference, (2) the lower-median definition on even
counts, (3) custom bin expressions for sub-unit value spreads, and
(4) the scale contract: every Window node in the plan is partitioned
(no single-partition WindowExec over the full input).
"""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.operators.quantile import (
    group_median_exact,
    group_order_statistic,
)


def _brute_lower_median(vals):
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_median_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    rows = [
        (k, round(rng.uniform(0, 500), 2))
        for k in ("a", "b", "c")
        for _ in range(rng.randrange(50, 150))
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: r["median"]
        for r in group_median_exact(df, ["k"], "v").collect()
    }
    by_key = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    for k, vals in by_key.items():
        assert got[k] == _brute_lower_median(vals), k


def test_lower_median_even_count(spark):
    df = spark.createDataFrame(
        [("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", 10.0)], "k string, v double"
    )
    [row] = group_median_exact(df, ["k"], "v").collect()
    # Lower median of 4 elements = 2nd smallest, no interpolation.
    assert row["median"] == 2.0


def test_custom_bin_expression(spark):
    # Values all inside [0, 1): the default floor(v) bin puts everything
    # in one bucket (still correct, just unbalanced); a scaled bin keeps
    # the refine pass small and must not change the answer.
    vals = [i / 97.0 for i in range(97)]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v double")
    expect = _brute_lower_median(vals)
    [r1] = group_median_exact(df, ["k"], "v").collect()
    [r2] = group_median_exact(
        df, ["k"], "v", bin_col=F.floor(F.col("v") * 100).cast("long")
    ).collect()
    assert r1["median"] == expect
    assert r2["median"] == expect


def test_order_statistic_k(spark):
    df = spark.createDataFrame(
        [("k", float(v)) for v in [5, 3, 9, 1, 7]], "k string, v double"
    )
    [row] = group_order_statistic(
        df, ["k"], "v", k=F.lit(2), out_col="second"
    ).collect()
    assert row["second"] == 3.0


def test_all_windows_partitioned(spark):
    """No Window node in the median plan may be unpartitioned — the
    whole point of bin + refine is that no group funnels through a
    single task."""
    df = spark.createDataFrame(
        [("k", float(i)) for i in range(100)], "k string, v double"
    )
    plan = group_median_exact(df, ["k"], "v")._jdf.queryExecution().toString()
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert "k#" in ln, f"unpartitioned Window: {ln.strip()}"


def test_nulls_and_single_row(spark):
    df = spark.createDataFrame(
        [("k", 42.0)], "k string, v double"
    )
    [row] = group_median_exact(df, ["k"], "v").collect()
    assert row["median"] == 42.0
