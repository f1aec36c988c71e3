"""Robustness edges: empty frames, full deletes, zero-match DML on
fresh tables, single-snapshot tables, boundary change-feed ranges."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import SnapshotNotFoundError


def test_insert_empty_dataframe(spark, lake):
    lake.create_table("t", "a int")
    empty = spark.createDataFrame([], "a int")
    assert lake.insert("t", empty) == 0
    assert lake.table("t").count() == 0


def test_delete_everything_then_read_and_insert(spark, lake):
    lake.create_table("t", "a int")
    lake.insert("t", spark.createDataFrame([(1,), (2,)], "a int"))
    assert lake.delete("t", "true") == 2
    assert lake.table("t").count() == 0
    assert lake.table("t").columns == ["a"]
    lake.insert("t", spark.createDataFrame([(3,)], "a int"))
    assert [r.a for r in lake.table("t").collect()] == [3]


def test_dml_on_empty_table(spark, lake):
    lake.create_table("t", "a int")
    assert lake.delete("t", "a = 1") == 0
    assert lake.update("t", {"a": "2"}, "a = 1") == 0
    assert lake.current_snapshot("t") == 1


def test_fresh_table_reads_empty_with_schema(spark, lake):
    lake.create_table("t", "a int, b string")
    df = lake.table("t")
    assert df.count() == 0 and df.columns == ["a", "b"]
    assert lake.table_info("t")["total_rows"] == 0


def test_change_feed_create_only(spark, lake):
    lake.create_table("t", "a int")
    assert lake.table_changes("t", 1, 1).count() == 0


def test_time_travel_create_only(spark, lake):
    lake.create_table("t", "a int")
    assert lake.table("t", version=1).count() == 0
    with pytest.raises(SnapshotNotFoundError):
        lake.table("t", version=0)


def test_vacuum_empty_and_single_file(spark, lake):
    lake.create_table("t", "a int")
    assert lake.vacuum("t")["files_removed"] == 0
    lake.insert("t", spark.createDataFrame([(1,)], "a int").coalesce(1))
    assert lake.vacuum("t")["files_removed"] == 0  # single file: no merge


def test_unicode_and_special_strings_roundtrip(spark, lake):
    lake.create_table("t", "s string", options={"data_inlining_row_limit": 10})
    vals = ["", "  spaces  ", "quote'quote", 'double"double', "tab\tnewline\n", "emoji🚀中文"]
    lake.insert_rows("t", [{"s": v} for v in vals])
    got = sorted(r.s for r in lake.table("t").collect())
    assert got == sorted(vals)
    assert lake.delete("t", "s = 'quote\\'quote'") == 1


def test_merge_into_empty_table(spark, lake):
    lake.create_table("t", "k int, v string")
    res = lake.merge(
        "t",
        spark.createDataFrame([(1, "a")], "k int, v string"),
        on=["k"],
        when_matched_update={"v": "source.v"},
    )
    assert res["num_inserted"] == 1 and res["num_updated"] == 0
    assert lake.table("t").count() == 1


def test_append_batch_empty(spark, lake):
    lake.create_table("t", "a int", options={"data_inlining_row_limit": 10})
    assert lake.append_batch("t", {"a": []}) == 0
    assert lake.table("t").count() == 0


def test_nulls_through_inline_and_dml(spark, lake):
    lake.create_table("t", "a int, b string", options={"data_inlining_row_limit": 10})
    lake.insert_rows("t", [{"a": None, "b": None}, {"a": 1, "b": "x"}])
    rows = lake.table("t").collect()
    assert any(r.a is None and r.b is None for r in rows)
    # NULL-safe predicate semantics: b = 'x' doesn't match the NULL row
    assert lake.delete("t", "b = 'x'") == 1
    assert lake.table("t").count() == 1


def test_sql_view_reflects_latest_on_reregister(spark, lake):
    lake.create_table("t", "a int")
    lake.insert("t", spark.createDataFrame([(1,)], "a int"))
    assert lake.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 1
    lake.insert("t", spark.createDataFrame([(2,)], "a int"))
    assert lake.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 2
