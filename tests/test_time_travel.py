"""Mirrors time_travel.sql: version + timestamp travel, historical
schema after evolution, error cases, session as-of (A16/A17)."""

import datetime as dt

import pytest

from pg_ducklake_spark.errors import SnapshotNotFoundError


@pytest.fixture()
def t(spark, lake):
    lake.create_table("t", "a int")  # v1
    lake.insert("t", spark.createDataFrame([(1,), (2,)], "a int"))  # v2
    lake.insert("t", spark.createDataFrame([(3,)], "a int"))  # v3
    return lake


def test_time_travel_by_version(t):
    assert sorted(r.a for r in t.time_travel("t", 2).collect()) == [1, 2]
    assert sorted(r.a for r in t.time_travel("t", 3).collect()) == [1, 2, 3]
    assert t.table("t", version=1).count() == 0


def test_time_travel_by_timestamp(t):
    snaps = {r.snapshot_id: r.snapshot_time for r in t.snapshots("t").collect()}
    ts2 = snaps[2]
    got = t.time_travel("t", ts2.isoformat())
    assert sorted(r.a for r in got.collect()) == [1, 2]


def test_time_travel_before_first_snapshot_fails(t):
    with pytest.raises(SnapshotNotFoundError):
        t.time_travel("t", dt.datetime(1990, 1, 1).isoformat())
    with pytest.raises(SnapshotNotFoundError):
        t.time_travel("t", 99)


def test_historical_schema_after_add_column(spark, t):
    """time_travel.sql:13-18 — old versions keep the old column set."""
    t.add_column("t", "b", "string")  # v4
    t.insert("t", spark.createDataFrame([(4, "x")], "a int, b string"))  # v5
    assert t.table("t").columns == ["a", "b"]
    assert t.table("t", version=3).columns == ["a"]
    # rows written before the new column read as NULL under the new schema
    vals = {r.a: r.b for r in t.table("t").collect()}
    assert vals[1] is None and vals[4] == "x"


def test_historical_schema_after_drop_and_rename(spark, t):
    t.add_column("t", "b", "string")
    t.rename_column("t", "a", "a2")
    assert t.table("t").columns == ["a2", "b"]
    t.drop_column("t", "b")
    assert t.table("t").columns == ["a2"]
    assert t.table("t", version=3).columns == ["a"]


def test_session_as_of(t):
    snaps = {r.snapshot_id: r.snapshot_time for r in t.snapshots("t").collect()}
    t.as_of_timestamp = snaps[2].isoformat()  # A17 GUC analog
    try:
        assert sorted(r.a for r in t.table("t").collect()) == [1, 2]
    finally:
        t.as_of_timestamp = None
    assert sorted(r.a for r in t.table("t").collect()) == [1, 2, 3]


def test_view_pins_travel_schema(spark, t):
    """time_travel.sql:21-23 — a view over time_travel keeps its snapshot."""
    t.time_travel("t", 2).createOrReplaceTempView("t_v2")
    t.insert("t", spark.createDataFrame([(9,)], "a int"))
    assert sorted(r.a for r in spark.table("t_v2").collect()) == [1, 2]


def test_alter_column_type_upcast_metadata_only(spark, t):
    """int→bigint is metadata-only: same files, new read schema."""
    files_before = sorted(r.path for r in t.list_files("t").collect())
    t.alter_column_type("t", "a", "bigint")
    assert sorted(r.path for r in t.list_files("t").collect()) == files_before
    assert dict(t.table("t").dtypes)["a"] == "bigint"
    assert sorted(r.a for r in t.table("t").collect()) == [1, 2, 3]
    # historical schema unaffected
    assert dict(t.table("t", version=3).dtypes)["a"] == "int"


def test_alter_column_type_conversion_rewrites(spark, t):
    """int→string requires a rewrite; data converts, one snapshot."""
    v = t.current_snapshot("t")
    t.alter_column_type("t", "a", "string")
    assert t.current_snapshot("t") == v + 1
    assert dict(t.table("t").dtypes)["a"] == "string"
    assert sorted(r.a for r in t.table("t").collect()) == ["1", "2", "3"]
