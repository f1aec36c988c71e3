"""Bucketed / storage-partitioned joins (operators/colocated.py):
bucket(n, key) partition transform + bucket-to-bucket join with no
global shuffle, including the late-bucketing residual path."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import LakeError


def _mk(spark, lo, hi, val):
    return spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * val).cast("double").alias(f"v{val}"),
    )


def _setup(lake, spark, buckets=4):
    lake.create_table("l", "k bigint, v2 double", partition_by=[f"bucket({buckets}, k)"])
    lake.create_table("r", "k bigint, v3 double", partition_by=[f"bucket({buckets}, k)"])
    lake.insert("l", _mk(spark, 0, 200, 2))
    lake.insert("r", _mk(spark, 100, 300, 3))


def test_bucketed_join_matches_plain_join(lake, spark):
    from pg_ducklake_spark.operators.colocated import bucketed_join

    _setup(lake, spark)
    got = sorted(
        (r.k, r.v2, r.v3) for r in bucketed_join(lake, "l", "r", "k").collect()
    )
    want = sorted(
        (r.k, r.v2, r.v3)
        for r in lake.table("l").join(lake.table("r"), "k").collect()
    )
    assert got == want and len(got) == 100


def test_bucketed_join_no_table_wide_shuffle(lake, spark):
    """Per-bucket pieces join without an Exchange on the join key — the
    whole point of co-location. (A plain join of the same tables plans
    hash-partitioning exchanges or a broadcast; bucketed_join's pieces
    must not shuffle the bucketed files.)"""
    from pg_ducklake_spark.operators.colocated import bucketed_join

    _setup(lake, spark)
    df = bucketed_join(lake, "l", "r", "k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(k" not in plan
    assert df.count() == 100


def test_bucketed_join_residual_files(lake, spark):
    """Files inserted before the bucket spec (late bucketing) join via
    the residual path; results stay exact."""
    from pg_ducklake_spark.operators.colocated import bucketed_join

    lake.create_table("l", "k bigint, v2 double")
    lake.insert("l", _mk(spark, 0, 50, 2))  # pre-bucketing files
    lake.set_partition("l", "bucket(4, k)")
    lake.insert("l", _mk(spark, 50, 200, 2))  # bucketed files

    lake.create_table("r", "k bigint, v3 double", partition_by=["bucket(4, k)"])
    lake.insert("r", _mk(spark, 0, 300, 3))

    got = sorted(r.k for r in bucketed_join(lake, "l", "r", "k").collect())
    assert got == list(range(0, 200))


def test_bucketed_join_spec_mismatch_raises(lake, spark):
    from pg_ducklake_spark.operators.colocated import bucketed_join

    lake.create_table("l", "k bigint, v2 double", partition_by=["bucket(4, k)"])
    lake.create_table("r", "k bigint, v3 double", partition_by=["bucket(8, k)"])
    with pytest.raises(LakeError, match="specs differ"):
        bucketed_join(lake, "l", "r", "k")
    lake.create_table("u", "k bigint, v3 double")
    with pytest.raises(LakeError, match="requires bucket"):
        bucketed_join(lake, "l", "u", "k")
    with pytest.raises(LakeError, match="inner joins only"):
        bucketed_join(lake, "l", "r", "k", how="left")


def test_vacuum_rebuckets_residual_files(lake, spark):
    """OPTIMIZE/vacuum rewrites pre-bucketing files under the current
    spec, completing the bucketing migration."""
    lake.create_table("t", "k bigint, v2 double")
    lake.insert("t", _mk(spark, 0, 100, 2))
    lake.set_partition("t", "bucket(4, k)")
    lake.vacuum("t", target_file_size=1 << 20)
    from pg_ducklake_spark.operators.colocated import _files_by_bucket

    buckets, residual = _files_by_bucket(lake, "t", "k")
    assert not residual, f"vacuum left unbucketed files: {residual}"
    assert sum(len(v) for v in buckets.values()) >= 1
    assert lake.table("t").count() == 100
