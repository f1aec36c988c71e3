"""Z-order compaction: multi-column clustering makes file pruning
effective on BOTH z-ordered columns (vs. a plain sort helping only the
leading key)."""

from pyspark.sql import functions as F

from pg_ducklake_spark.operators.pruning import prune_files
from pg_ducklake_spark.operators.zorder import optimize_zorder, zorder_key


def _grid(spark):
    # 128x128 grid of (x, y) points, inserted row-major (clustered by x only)
    return spark.range(0, 16384).select(
        (F.col("id") / 128).cast("int").alias("x"),
        (F.col("id") % 128).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_key_locality(spark):
    df, key = zorder_key(_grid(spark), ["x", "y"], bits=6)
    rows = df.withColumn("z", key).orderBy("z").limit(4).collect()
    # z-adjacent points are spatially adjacent (both coords small)
    assert all(r.x < 4 and r.y < 4 for r in rows)


def test_optimize_zorder_improves_two_axis_pruning(spark, lake):
    lake.create_table("g", "x int, y int, payload bigint")
    lake.insert("g", _grid(spark).repartitionByRange(8, "x"))  # x-clustered files
    state = lake._state("g")
    n_files = len(state.files)
    # x-clustered layout: selective y-predicates prune nothing
    assert len(prune_files(state, "y = 10")) == n_files

    res = optimize_zorder(lake, "g", ["x", "y"], target_file_size=8 * 1024, bits=7)
    assert res["files_removed"] == n_files and res["files_added"] > 1
    state2 = lake._state("g")
    n2 = len(state2.files)
    pruned_x = len(prune_files(state2, "x = 10"))
    pruned_y = len(prune_files(state2, "y = 10"))
    assert pruned_x < n2 and pruned_y < n2  # both axes prune now
    # data intact
    assert lake.table("g").count() == 16384
    assert lake.table("g").filter("x = 10 AND y = 10").count() == 1


def test_zorder_folds_in_deletion_vectors(spark, lake):
    lake.create_table("g", "x int, y int, payload bigint")
    lake.insert("g", _grid(spark))
    lake.delete("g", "x < 2")  # dv delete: 256 rows
    res = optimize_zorder(lake, "g", ["x", "y"], target_file_size=1 << 20)
    assert res["files_removed"] >= 1
    assert not lake._state("g").dvs
    assert lake.table("g").count() == 16384 - 256
