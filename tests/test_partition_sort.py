"""Mirrors partition.sql + sorted_table.sql: transforms, late
partitioning (old files stay), reset; sort spec applied at compaction."""

import json

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import LakeError


def test_partition_on_write(spark, lake):
    lake.create_table("t", "a int, cat string", partition_by=["cat"])
    df = spark.createDataFrame([(1, "x"), (2, "y"), (3, "x")], "a int, cat string")
    lake.insert("t", df)
    files = lake.list_files("t").collect()
    pvals = {json.dumps(json.loads(r.partition_values)) for r in files}
    assert {'{"_p_cat": "x"}', '{"_p_cat": "y"}'} <= pvals
    # original column still in the data files
    assert sorted((r.a, r.cat) for r in lake.table("t").collect()) == [
        (1, "x"), (2, "y"), (3, "x")]


def test_partition_transforms(spark, lake):
    """partition.sql:26 — year(ts)-style transform keys."""
    lake.create_table("t", "id int, ts timestamp_ntz", partition_by=["year(ts)", "month(ts)"])
    df = spark.createDataFrame(
        [(1, "2023-01-15 00:00:00"), (2, "2024-06-01 00:00:00")], "id int, ts string"
    ).select("id", F.col("ts").cast("timestamp_ntz"))
    lake.insert("t", df)
    pv = [json.loads(r.partition_values) for r in lake.list_files("t").collect()]
    assert {d["_p_year_ts"] for d in pv} == {"2023", "2024"}
    assert all("_p_month_ts" in d for d in pv)
    assert lake.get_partition("t") == ["year(ts)", "month(ts)"]


def test_late_partitioning_old_files_stay(spark, lake):
    """partition.sql:42-56 — set_partition applies only to new files."""
    lake.create_table("t", "a int, cat string")
    lake.insert("t", spark.createDataFrame([(1, "x")], "a int, cat string"))
    lake.set_partition("t", "cat")
    lake.insert("t", spark.createDataFrame([(2, "y")], "a int, cat string"))
    pv = [json.loads(r.partition_values) for r in lake.list_files("t").collect()]
    assert {} in pv  # old unpartitioned file still live
    assert {"_p_cat": "y"} in pv
    assert lake.table("t").count() == 2
    lake.reset_partition("t")
    assert lake.get_partition("t") == []


def test_set_partition_unknown_column(spark, lake):
    lake.create_table("t", "a int")
    with pytest.raises(LakeError):
        lake.set_partition("t", "nope")
    with pytest.raises(LakeError):
        lake.set_partition("t", "year(nope)")


def test_sort_spec_parse_and_get(spark, lake):
    lake.create_table("t", "a int, ts timestamp_ntz")
    lake.set_sort("t", "a DESC NULLS LAST", "date_trunc('day', ts)")
    spec = lake.get_sort("t")
    assert spec[0]["expression"] == "a" and spec[0]["direction"] == "DESC"
    assert spec[0]["null_order"] == "LAST" and spec[0]["sort_key_index"] == 0
    assert spec[1]["expression"] == "date_trunc('day', ts)"
    lake.reset_sort("t")
    assert lake.get_sort("t") == []


def test_sort_applied_at_compaction(spark, lake):
    """sorted_table.sql semantics: inserts land unsorted; vacuum/compaction
    rewrites sorted (min/max clustering for file skipping)."""
    lake.create_table("t", "a int", sorted_by=["a ASC"])
    import random

    rng = random.Random(0)
    vals = list(range(100))
    rng.shuffle(vals)
    for chunk in (vals[:50], vals[50:]):
        lake.insert("t", spark.createDataFrame([(v,) for v in chunk], "a int"))
    lake.vacuum("t", target_file_size=1 << 20)
    # after compaction: each file's rows are sorted runs (footer min/max
    # ranges don't overlap across sorted output partitions)
    state = lake._state("t")
    ranges = sorted(
        (f.stats["a"]["min"], f.stats["a"]["max"]) for f in state.files.values()
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    assert sorted(r.a for r in lake.table("t").collect()) == list(range(100))


def test_partitioned_vacuum_groups_by_partition(spark, lake):
    lake.create_table("t", "a int, cat string", partition_by=["cat"])
    for i in range(3):
        lake.insert(
            "t",
            spark.createDataFrame([(i, "x"), (i, "y")], "a int, cat string"),
        )
    before = lake.table_info("t")["file_count"]
    res = lake.vacuum("t", target_file_size=1 << 20)
    assert res["files_removed"] == before
    pv = [json.loads(r.partition_values) for r in lake.list_files("t").collect()]
    # still hive-partitioned after compaction
    assert all(d.get("_p_cat") in ("x", "y") for d in pv)
    assert lake.table("t").count() == 6
