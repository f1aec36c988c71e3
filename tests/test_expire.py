"""Snapshot expiry (≙ ducklake_expire_snapshots / expire_older_than):
bounded metadata growth — old history becomes unreadable, the live
window keeps working, restarts replay from the trimmed checkpoint."""

import datetime as dt

import pytest

from pg_ducklake_spark import Lake
from pg_ducklake_spark.errors import SnapshotNotFoundError


def _build(lake, spark, n=6):
    lake.create_table("t", "id int")
    for i in range(n):
        lake.insert("t", spark.createDataFrame([(i,)], "id int"))
    return lake


def test_expire_keep_last(lake, spark):
    _build(lake, spark)  # versions 1..7 (create + 6 inserts)
    latest = lake.current_snapshot("t")
    n = lake.expire_snapshots("t", keep_last=3)
    assert n == latest - 3
    # current reads unaffected
    assert lake.table("t").count() == 6
    # time travel below the cutoff raises; at/above works
    with pytest.raises(SnapshotNotFoundError):
        lake.time_travel("t", latest - 3)
    assert lake.time_travel("t", latest - 2).count() == 4
    # snapshot listing shows only the surviving window
    sids = [r["snapshot_id"] for r in lake.snapshots("t").collect()]
    assert sids == [latest - 2, latest - 1, latest]


def test_expire_older_than_timedelta(lake, spark):
    _build(lake, spark, n=3)
    # everything is newer than 1 hour → nothing expires
    assert lake.expire_snapshots("t", older_than=dt.timedelta(hours=1)) == 0
    # everything is older than -1 hour (future cutoff) → all but latest
    n = lake.expire_snapshots("t", older_than=dt.timedelta(hours=-1))
    assert n == lake.current_snapshot("t") - 1
    assert lake.table("t").count() == 3


def test_expire_change_feed_bounds(lake, spark):
    _build(lake, spark)
    latest = lake.current_snapshot("t")
    lake.expire_snapshots("t", keep_last=2)
    with pytest.raises(SnapshotNotFoundError):
        lake.table_changes("t", 1).collect()
    assert lake.table_changes("t", latest - 1).count() == 2


def test_expire_survives_restart(lake, spark):
    _build(lake, spark)
    lake.expire_snapshots("t", keep_last=2)
    fresh = Lake.attach(spark, lake.path, read_only=True)
    assert fresh.table("t").count() == 6
    latest = fresh.current_snapshot("t")
    with pytest.raises(SnapshotNotFoundError):
        fresh.table("t", version=latest - 2)


def test_expire_keeps_defaults_semantics(lake, spark):
    """The schema log survives expiry, so per-file-age initial_default
    fills still resolve add-snapshots correctly."""
    lake.create_table("t", "id int")
    lake.insert("t", spark.createDataFrame([(1,)], "id int"))
    lake.add_column("t", "n", "int", default="9")
    lake.insert("t", spark.createDataFrame([(2, 2)], "id int, n int"))
    lake.expire_snapshots("t", keep_last=1)
    rows = {r["id"]: r["n"] for r in lake.table("t").collect()}
    assert rows == {1: 9, 2: 2}


def test_expire_via_call_statement(lake, spark):
    _build(lake, spark, n=3)
    n = lake.execute("CALL expire_snapshots('t', keep_last => 2)")
    assert n == lake.current_snapshot("t") - 2 + 1 - 1  # all below cutoff
    assert lake.table("t").count() == 3


def test_expired_cdc_stream_raises_clearly(lake, spark, tmp_path):
    """A CDC stream whose checkpointed offset predates expiry must fail
    with a clear message, not silently skip commits."""
    _build(lake, spark, n=3)
    lake.expire_snapshots("t", keep_last=2)
    q = (
        lake.stream_changes("t", starting_version=1)
        .writeStream.format("memory")
        .queryName("cdc_expired")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="expired"):
        q.awaitTermination(120)
