"""As-of join operator semantics (operators/asof.py)."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00")),
            (2, 1, _ts("2024-01-01 12:00:00")),
            (3, 2, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 3, _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "id int, k int, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100.0),
            (1, _ts("2024-01-01 10:00:00"), 200.0),  # equal ts → matches (>=)
            (1, _ts("2024-01-01 11:00:00"), 300.0),
            (2, _ts("2024-01-01 09:30:00"), 400.0),
        ],
        "k int, ts timestamp_ntz, px double",
    )
    return left, right


def test_asof_join_union_window(spark):
    from pg_ducklake_spark.operators.asof import asof_join

    left, right = _frames(spark)
    got = {r.id: (r.r_ts, r.r_px) for r in asof_join(left, right, by=["k"]).collect()}
    assert got[1] == (_ts("2024-01-01 10:00:00"), 200.0)  # equal-ts match
    assert got[2] == (_ts("2024-01-01 11:00:00"), 300.0)  # latest ≤
    assert got[3] == (None, None)  # nothing before
    assert got[4] == (None, None)  # key absent


def test_asof_join_tolerance(spark):
    from pg_ducklake_spark.operators.asof import asof_join

    left, right = _frames(spark)
    got = {
        r.id: r.r_px
        for r in asof_join(left, right, by=["k"], tolerance_seconds=600).collect()
    }
    assert got[1] == 200.0  # 0s gap: within tolerance
    assert got[2] is None  # 1h gap: dropped


def test_asof_range_variant_agrees(spark):
    from pg_ducklake_spark.operators.asof import asof_join, asof_join_range

    left, right = _frames(spark)
    a = {(r.id, r.r_ts, r.r_px) for r in asof_join(left, right, by=["k"]).collect()}
    b = {
        (r.id, r.r_ts, r.r_px)
        for r in asof_join_range(left, right, by=["k"]).collect()
    }
    assert a == b


def test_asof_no_keys_global_series(spark):
    from pg_ducklake_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"))], "id int, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(_ts("2024-01-01 10:00:00"), "tick1"), (_ts("2024-01-01 11:00:00"), "tick2")],
        "ts timestamp_ntz, tag string",
    )
    got = asof_join(left, right).collect()[0]
    assert got.r_tag == "tick1"
