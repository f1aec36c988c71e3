"""Zero-copy table clone: shared inodes, full-history independence."""

import os

import pytest

from pg_ducklake_spark.lake import TableAlreadyExistsError, TableNotFoundError


def _rows(lake, tbl):
    return sorted(tuple(r) for r in lake.table(tbl).collect())


def test_clone_carries_data_and_history(spark, lake):
    lake.create_table("src", "a int, b string")
    lake.insert(
        "src", spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    )
    lake.update("src", {"b": "'z'"}, "a = 2")
    lake.clone_table("src", "dst")
    assert _rows(lake, "dst") == _rows(lake, "src")
    # full history: time travel to the pre-update version works
    assert _rows(lake, "src") != sorted(
        tuple(r) for r in lake.time_travel("dst", 2).collect()
    )
    assert sorted(tuple(r) for r in lake.time_travel("dst", 2).collect()) == [
        (1, "x"),
        (2, "y"),
    ]
    # change feed replays on the clone
    assert lake.table_changes("dst", 2, 3).count() > 0


def test_clone_is_zero_copy_and_independent(spark, lake):
    lake.create_table("src2", "a int")
    lake.insert("src2", spark.createDataFrame([(i,) for i in range(50)], "a int"))
    lake.clone_table("src2", "dst2")
    # zero-copy: every cloned data file shares its inode with the source
    sdir, ddir = lake._table_dir("src2"), lake._table_dir("dst2")
    shared = 0
    for root, _d, files in os.walk(os.path.join(ddir, "data")):
        for f in files:
            dpath = os.path.join(root, f)
            spath = os.path.join(sdir, os.path.relpath(dpath, ddir))
            assert os.stat(dpath).st_ino == os.stat(spath).st_ino
            shared += 1
    assert shared > 0
    # divergence: writes to one side do not affect the other
    lake.insert("dst2", spark.createDataFrame([(999,)], "a int"))
    assert lake.table("src2").count() == 50
    assert lake.table("dst2").count() == 51
    # dropping the source does not break the clone (links keep inodes)
    lake.drop_table("src2")
    assert lake.table("dst2").count() == 51


def test_clone_sql_route_and_errors(spark, lake):
    lake.execute("CREATE TABLE t1 (a int)")
    lake.execute("INSERT INTO t1 VALUES (7)")
    lake.execute("CREATE TABLE t2 CLONE t1")
    assert [tuple(r) for r in lake.execute("SELECT * FROM t2").collect()] == [(7,)]
    with pytest.raises(TableAlreadyExistsError):
        lake.clone_table("t1", "t2")
    with pytest.raises(TableNotFoundError):
        lake.clone_table("missing", "t3")


def test_clone_with_inline_rows_and_vacuum_independence(spark, lake):
    lake.create_table(
        "src3", "a int, b string", options={"data_inlining_row_limit": 100}
    )
    lake.insert(
        "src3", spark.createDataFrame([(1, "p"), (2, "q")], "a int, b string")
    )
    lake.append_batch("src3", {"a": [3, 4], "b": ["r", "s"]})  # inline rows
    lake.clone_table("src3", "dst3")
    assert _rows(lake, "dst3") == _rows(lake, "src3")
    # flushing/vacuuming the clone must not disturb the source
    lake.flush_inlined_data("dst3")
    lake.vacuum("dst3")
    assert _rows(lake, "dst3") == _rows(lake, "src3")
    assert lake.table("src3").count() == 4
    # and the source's own flush still works on its intact inline state
    lake.flush_inlined_data("src3")
    assert lake.table("src3").count() == 4
