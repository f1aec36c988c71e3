"""Mirrors test/regression/sql/basic.sql + ddl_triggers.sql shapes:
create, insert, scan with filter, drop; error cases."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import (
    LakeError,
    TableAlreadyExistsError,
    TableNotFoundError,
)


def _two_inserts(spark, lake):
    lake.create_table("t", "a int")
    lake.insert("t", spark.createDataFrame([(1,)], "a int"))
    lake.insert("t", spark.createDataFrame([(2,)], "a int"))


def test_basic_scan_and_filter(spark, lake):
    _two_inserts(spark, lake)
    assert sorted(r.a for r in lake.table("t").collect()) == [1, 2]
    assert [r.a for r in lake.sql("SELECT * FROM t WHERE a = 1").collect()] == [1]


def test_create_table_twice_fails(spark, lake):
    lake.create_table("t", "a int")
    with pytest.raises(TableAlreadyExistsError):
        lake.create_table("t", "a int")
    lake.create_table("t", "a int", if_not_exists=True)  # no raise


def test_missing_table(lake):
    with pytest.raises(TableNotFoundError):
        lake.table("nope")


def test_drop_table(spark, lake):
    _two_inserts(spark, lake)
    lake.drop_table("t")
    with pytest.raises(TableNotFoundError):
        lake.table("t")
    assert lake.list_tables() == []


def test_rename_table(spark, lake):
    _two_inserts(spark, lake)
    lake.rename_table("t", "t2")
    assert sorted(r.a for r in lake.table("t2").collect()) == [1, 2]
    with pytest.raises(TableNotFoundError):
        lake.table("t")


def test_insert_casts_to_table_schema(spark, lake):
    lake.create_table("t", "a bigint, b double")
    lake.insert("t", spark.createDataFrame([(1, 2)], "a int, b int"))
    row = lake.table("t").collect()[0]
    assert isinstance(row.a, int) and isinstance(row.b, float)


def test_schema_from_structtype(spark, lake):
    from pyspark.sql import types as T

    lake.create_table(
        "t", T.StructType([T.StructField("x", T.ArrayType(T.FloatType()))])
    )
    lake.insert("t", spark.createDataFrame([([1.0, 2.0],)], "x array<float>"))
    assert lake.table("t").collect()[0].x == [1.0, 2.0]


def test_invalid_table_name(lake):
    with pytest.raises(LakeError):
        lake.create_table("bad name!", "a int")


def test_ctas_from_sql_and_df(spark, lake):
    """ctas.sql: CREATE TABLE AS SELECT, incl. ORDER BY/LIMIT shapes."""
    lake.create_table("src", "id bigint")
    lake.insert("src", spark.range(1, 11))
    n = lake.create_table_as("t3", "SELECT id * 2 AS twice FROM src WHERE id <= 3")
    assert n == 3
    assert sorted(r.twice for r in lake.table("t3").collect()) == [2, 4, 6]
    df = spark.range(5).select(F.col("id").alias("v"))
    assert lake.create_table_as("t4", df) == 5
    snaps = lake.snapshots("t4").collect()
    assert len(snaps) == 1 and snaps[0].operation == "CREATE TABLE AS"


def test_metadata_sql_views(spark, lake):
    """A19 introspection via SQL views over snapshots/files."""
    lake.create_table("t", "a int")
    lake.insert("t", spark.createDataFrame([(1,)], "a int"))
    lake.register_metadata_views("t")
    snaps = spark.sql(
        "SELECT operation FROM t_snapshots ORDER BY snapshot_id"
    ).collect()
    assert [r.operation for r in snaps] == ["CREATE TABLE", "INSERT"]
    files = spark.sql("SELECT path, rows FROM t_files").collect()
    assert sum(r.rows for r in files) == 1


def test_analyze_table_stats(spark, lake):
    """ANALYZE persists table + column stats to the snapshot log
    (ducklake_table_stats / ducklake_table_column_stats analog) and a
    fresh Lake replays them from metadata."""
    from pyspark.sql import functions as F

    from pg_ducklake_spark import Lake

    lake.create_table("t", "a bigint, s string")
    lake.insert(
        "t",
        spark.range(500).select(
            F.col("id").alias("a"), (F.col("id") % 7).cast("string").alias("s")
        ),
    )
    assert lake.table_stats("t") is None
    st = lake.analyze("t")
    assert st["row_count"] == 500
    assert st["columns"]["a"]["nulls"] == 0
    assert st["columns"]["a"]["min"] == "0" and st["columns"]["a"]["max"] == "499"
    assert 6 <= st["columns"]["s"]["ndv"] <= 8  # approx NDV of 7
    fresh = Lake(spark, lake.path)
    replayed = fresh.table_stats("t")
    assert replayed["row_count"] == 500
    assert replayed["snapshot_id"] == st["snapshot_id"]
