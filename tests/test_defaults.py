"""Column DEFAULTs (A4 — the reference regenerates ALTER ... SET
DEFAULT DDL, src/pgducklake_table.cpp:847-937; ducklake_column carries
initial_default / default_value in the metadata contract §2.C).

Semantics follow PG: ADD COLUMN ... DEFAULT backfills rows that predate
the column (initial_default, applied per file-age at scan time — no
rewrite) AND applies to future inserts that omit the column
(default_value); ALTER COLUMN SET DEFAULT affects only future inserts."""

import pytest

from pg_ducklake_spark import Lake


def test_add_column_with_default_backfills_old_rows(lake, spark):
    lake.create_table("t", "id int")
    lake.insert("t", spark.createDataFrame([(1,), (2,)], "id int"))
    lake.add_column("t", "status", "string", default="'new'")
    # old file rows read the default, not NULL
    rows = {r["id"]: r["status"] for r in lake.table("t").collect()}
    assert rows == {1: "new", 2: "new"}


def test_default_applies_to_future_inserts_and_explicit_null(lake, spark):
    lake.create_table("t", "id int")
    lake.insert("t", spark.createDataFrame([(1,)], "id int"))
    lake.add_column("t", "n", "int", default="7")
    # omitted column -> default; explicit NULL stays NULL
    lake.insert("t", spark.createDataFrame([(2,)], "id int"))
    lake.insert(
        "t", spark.createDataFrame([(3, None)], "id int, n int")
    )
    rows = {r["id"]: r["n"] for r in lake.table("t").collect()}
    assert rows == {1: 7, 2: 7, 3: None}


def test_set_default_only_affects_future_inserts(lake, spark):
    lake.create_table("t", "id int, n int")
    lake.insert("t", spark.createDataFrame([(1, None)], "id int, n int"))
    lake.set_column_default("t", "n", "42")
    lake.insert("t", spark.createDataFrame([(2,)], "id int"))
    rows = {r["id"]: r["n"] for r in lake.table("t").collect()}
    assert rows == {1: None, 2: 42}  # pre-existing NULL untouched
    lake.drop_column_default("t", "n")
    lake.insert("t", spark.createDataFrame([(3,)], "id int"))
    assert {r["id"]: r["n"] for r in lake.table("t").collect()}[3] is None


def test_default_in_inline_buffer(lake, spark):
    lake.create_table(
        "t", "id int", options={"data_inlining_row_limit": 10}
    )
    lake.insert_rows("t", [{"id": 1}])
    lake.add_column("t", "tag", "string", default="'x'")
    lake.insert_rows("t", [{"id": 2}])           # default filled at write
    rows = {r["id"]: r["tag"] for r in lake.table("t").collect()}
    assert rows == {1: "x", 2: "x"}  # old inline row backfilled too
    lake.flush_inlined_data("t")
    rows = {r["id"]: r["tag"] for r in lake.table("t").collect()}
    assert rows == {1: "x", 2: "x"}


def test_default_expression_and_sql_surface(lake, spark):
    lake.execute("CREATE TABLE t (id INT)")
    lake.execute("INSERT INTO t VALUES (1)")
    lake.execute("ALTER TABLE t ADD COLUMN score DOUBLE DEFAULT 1.5 * 2")
    lake.execute("INSERT INTO t (id) VALUES (2)")
    rows = {r["id"]: r["score"] for r in lake.execute("SELECT * FROM t").collect()}
    assert rows == {1: 3.0, 2: 3.0}
    lake.execute("ALTER TABLE t ALTER COLUMN score SET DEFAULT 9.0")
    lake.execute("INSERT INTO t (id) VALUES (3)")
    assert {r["id"]: r["score"] for r in lake.execute("SELECT * FROM t").collect()}[3] == 9.0
    lake.execute("ALTER TABLE t ALTER COLUMN score DROP DEFAULT")
    lake.execute("INSERT INTO t (id) VALUES (4)")
    assert {r["id"]: r["score"] for r in lake.execute("SELECT * FROM t").collect()}[4] is None


def test_default_time_travel_and_vacuum(lake, spark):
    lake.create_table("t", "id int")
    lake.insert("t", spark.createDataFrame([(1,)], "id int"))
    v1 = lake.current_snapshot("t")
    lake.add_column("t", "n", "int", default="5")
    lake.insert("t", spark.createDataFrame([(2, 20)], "id int, n int"))
    # old version: historical schema has no n at all
    assert lake.table("t", version=v1).columns == ["id"]
    # vacuum rewrites old files under current schema — default materializes
    lake.vacuum("t", target_file_size=1 << 30)
    rows = {r["id"]: r["n"] for r in lake.table("t").collect()}
    assert rows == {1: 5, 2: 20}


def test_default_survives_freeze(lake, spark, tmp_path):
    lake.create_table("t", "id int")
    lake.insert("t", spark.createDataFrame([(1,)], "id int"))
    lake.add_column("t", "grade", "string", default="'c'")
    lake.insert("t", spark.createDataFrame([(2, "a")], "id int, grade string"))
    frozen = str(tmp_path / "f.ducklake")
    lake.freeze(frozen)
    fl = Lake.attach_frozen(spark, frozen)
    rows = {r["id"]: r["grade"] for r in fl.table("t").collect()}
    assert rows == {1: "c", 2: "a"}


def test_default_with_delete_vectors(lake, spark):
    """Per-file-age default fill must compose with the DV anti-join."""
    lake.create_table("t", "id int")
    lake.insert("t", spark.createDataFrame([(i,) for i in range(10)], "id int"))
    lake.add_column("t", "n", "int", default="1")
    lake.insert("t", spark.createDataFrame([(100, 2)], "id int, n int"))
    assert lake.delete("t", "id in (3, 4)") == 2
    rows = {r["id"]: r["n"] for r in lake.table("t").collect()}
    assert 3 not in rows and 4 not in rows
    assert rows[0] == 1 and rows[100] == 2
    # and DML over the defaulted column sees filled values
    assert lake.delete("t", "n = 2") == 1
