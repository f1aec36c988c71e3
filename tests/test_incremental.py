"""operators/incremental.py: change-feed-driven aggregate maintenance
must equal a from-scratch recompute after any DML sequence."""

import random

from pyspark.sql import functions as F

from pg_ducklake_spark.operators.incremental import (
    incremental_agg,
    snapshot_agg,
)

SCHEMA = "id bigint, grp string, val bigint"


def _agg_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _seed(lake, spark, n=60):
    rng = random.Random(11)
    rows = [
        (i, rng.choice("abcd"), rng.randint(0, 500)) for i in range(n)
    ]
    lake.create_table("t", SCHEMA)
    lake.insert("t", spark.createDataFrame(rows, SCHEMA))
    return rng


def test_incremental_matches_recompute_after_mixed_dml(lake, spark):
    rng = _seed(lake, spark)
    v0 = lake.current_snapshot("t")
    base = spark.createDataFrame(
        snapshot_agg(lake.table("t"), ["grp"], ["val"]).collect(),
        "grp string, n bigint, sum_val bigint",
    )
    lake.delete("t", "grp = 'a'")
    lake.update("t", {"val": "val + 10"}, "id % 3 = 0")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(1000 + i, rng.choice("abcd"), rng.randint(0, 500)) for i in range(15)],
            SCHEMA,
        ),
    )
    lake.delete("t", "val > 400")
    got = _agg_rows(
        incremental_agg(lake, "t", base, ["grp"], ["val"], from_version=v0)
    )
    want = _agg_rows(snapshot_agg(lake.table("t"), ["grp"], ["val"]))
    assert got == want


def test_group_vanishes_when_count_hits_zero(lake, spark):
    _seed(lake, spark)
    v0 = lake.current_snapshot("t")
    base = spark.createDataFrame(
        snapshot_agg(lake.table("t"), ["grp"], ["val"]).collect(),
        "grp string, n bigint, sum_val bigint",
    )
    lake.delete("t", "grp = 'b'")
    got = incremental_agg(lake, "t", base, ["grp"], ["val"], from_version=v0)
    assert sorted(r["grp"] for r in got.collect()) == ["a", "c", "d"]


def test_new_group_appears_from_delta_only(lake, spark):
    _seed(lake, spark)
    v0 = lake.current_snapshot("t")
    base = spark.createDataFrame(
        snapshot_agg(lake.table("t"), ["grp"], ["val"]).collect(),
        "grp string, n bigint, sum_val bigint",
    )
    lake.insert(
        "t", spark.createDataFrame([(9999, "z", 42)], SCHEMA)
    )
    got = {
        r["grp"]: (r["n"], r["sum_val"])
        for r in incremental_agg(
            lake, "t", base, ["grp"], ["val"], from_version=v0
        ).collect()
    }
    assert got["z"] == (1, 42)


def test_noop_range_returns_base(lake, spark):
    _seed(lake, spark)
    v0 = lake.current_snapshot("t")
    base = snapshot_agg(lake.table("t"), ["grp"], ["val"])
    got = incremental_agg(
        lake, "t", base, ["grp"], ["val"], from_version=v0, to_version=v0
    )
    assert _agg_rows(got) == _agg_rows(base)


def test_delta_join_stays_bounded(lake, spark):
    """The merge must be a join on the group keys of two aggregate-sized
    inputs — the change-feed scan is bounded by the DML's snapshots, not
    the table's full history."""
    _seed(lake, spark)
    v0 = lake.current_snapshot("t")
    base = snapshot_agg(lake.table("t"), ["grp"], ["val"])
    lake.delete("t", "id = 0")
    df = incremental_agg(lake, "t", base, ["grp"], ["val"], from_version=v0)
    plan = df._jdf.queryExecution().toString()
    assert "FullOuter" in plan or "full_outer" in plan.lower()
