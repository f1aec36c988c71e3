"""Mirrors vacuum.sql: file-count assertions before/after; cleanup of
unreferenced files; inline flush (data_inlining_row_limit.sql)."""

import os


def test_vacuum_merges_small_files(spark, lake):
    lake.create_table("t", "a int")
    for i in range(5):
        lake.insert("t", spark.createDataFrame([(i,)], "a int"))
    before = lake.table_info("t")["file_count"]
    assert before >= 5
    res = lake.vacuum("t", target_file_size=1 << 20)
    after = lake.table_info("t")["file_count"]
    assert after < before and res["files_removed"] == before
    assert sorted(r.a for r in lake.table("t").collect()) == list(range(5))
    # idempotent: second vacuum is a no-op
    assert lake.vacuum("t", target_file_size=1 << 20) == {
        "files_removed": 0,
        "files_added": 0,
        "dvs_cleared": 0,
    }


def test_vacuum_preserves_time_travel_reads(spark, lake):
    lake.create_table("t", "a int")
    lake.insert("t", spark.createDataFrame([(1,)], "a int"))
    lake.insert("t", spark.createDataFrame([(2,)], "a int"))
    v = lake.current_snapshot("t")
    lake.vacuum("t", target_file_size=1 << 20)
    assert sorted(r.a for r in lake.table("t", version=v).collect()) == [1, 2]


def test_cleanup_old_files(spark, lake):
    """vacuum.sql:60-66 / cleanup_old_files: physically removes files not
    referenced by the current snapshot."""
    lake.create_table("t", "a int")
    lake.insert("t", spark.createDataFrame([(1,)], "a int"))
    lake.insert("t", spark.createDataFrame([(2,)], "a int"))
    lake.vacuum("t", target_file_size=1 << 20)  # old files now unreferenced

    def count_parquet(root):
        return sum(
            1
            for r, _d, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    data_dir = os.path.join(lake._table_dir("t"), "data")
    physical_before = count_parquet(data_dir)
    live = lake.table_info("t")["file_count"]
    assert physical_before > live
    removed = lake.cleanup_old_files("t")
    assert removed == physical_before - live
    assert count_parquet(data_dir) == live
    assert sorted(r.a for r in lake.table("t").collect()) == [1, 2]


def test_flush_inlined_data_all_tables(spark, lake):
    lake.create_table("t1", "a int", options={"data_inlining_row_limit": 10})
    lake.create_table("t2", "a int", options={"data_inlining_row_limit": 10})
    lake.insert_rows("t1", [{"a": 1}])
    lake.insert_rows("t2", [{"a": 2}, {"a": 3}])
    assert lake.flush_inlined_data() == 3
    assert lake.table_info("t1")["inlined_rows"] == 0
    assert lake.table_info("t2")["inlined_rows"] == 0
    assert sorted(r.a for r in lake.table("t2").collect()) == [2, 3]


def test_inline_limit_spills_to_parquet(spark, lake):
    """data_inlining_row_limit.sql: batches above the limit go to parquet."""
    lake.create_table("t", "a int", options={"data_inlining_row_limit": 2})
    lake.insert_rows("t", [{"a": 1}, {"a": 2}])  # inline
    lake.insert_rows("t", [{"a": i} for i in range(3, 8)])  # over limit → files
    info = lake.table_info("t")
    assert info["inlined_rows"] == 2 and info["file_count"] >= 1
    assert lake.table("t").count() == 7


def test_append_batch_equal_length_contract(spark, lake):
    """insert_unnest.sql:56-70 — zipped arrays, count reported, error on
    ragged arrays."""
    import pytest

    from pg_ducklake_spark.errors import LakeError

    lake.create_table("t", "a int, b string", options={"data_inlining_row_limit": 100})
    assert lake.append_batch("t", {"a": [1, 2, 3], "b": ["x", "y", "z"]}) == 3
    with pytest.raises(LakeError):
        lake.append_batch("t", {"a": [1, 2], "b": ["x"]})
    got = sorted((r.a, r.b) for r in lake.table("t").collect())
    assert got == [(1, "x"), (2, "y"), (3, "z")]


def test_flush_respects_partition_and_sort_spec(spark, lake):
    """Flushed inline rows land hive-partitioned and sorted like any
    other write (reference: sort applies at flush/compaction)."""
    import json

    lake.create_table(
        "t", "a int, cat string",
        partition_by=["cat"], sorted_by=["a ASC"],
        options={"data_inlining_row_limit": 10},
    )
    lake.insert_rows(
        "t",
        [{"a": 3, "cat": "x"}, {"a": 1, "cat": "y"}, {"a": 2, "cat": "x"}],
    )
    lake.flush_inlined_data("t")
    pv = [json.loads(r.partition_values) for r in lake.list_files("t").collect()]
    assert {d.get("_p_cat") for d in pv} == {"x", "y"}
    assert lake.table_info("t")["inlined_rows"] == 0
    assert sorted((r.a, r.cat) for r in lake.table("t").collect()) == [
        (1, "y"), (2, "x"), (3, "x")]
