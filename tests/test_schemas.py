"""Schema namespaces (the reference is multi-schema throughout:
``ducklake_schema`` is a first-class metadata table —
src/pgducklake_freeze.cpp:35 — set_partition takes ('schema','t',...),
src/pgducklake_partition.cpp:31-95, and metadata_sync.sql exercises
qualified names end-to-end). A schema here is a subdirectory of the
lake root; 'main' is the root itself, so unqualified names and
``main.t`` address the same table."""

import duckdb
import pytest

from pg_ducklake_spark.errors import (
    AccessControlError,
    LakeError,
    TableNotFoundError,
)
from pg_ducklake_spark.sqlexec import execute


def test_create_list_drop_schema(lake):
    assert lake.list_schemas() == ["main"]
    lake.create_schema("analytics")
    assert lake.list_schemas() == ["main", "analytics"]
    assert lake.schema_exists("analytics")
    with pytest.raises(LakeError, match="already exists"):
        lake.create_schema("analytics")
    lake.create_schema("analytics", if_not_exists=True)  # no-op
    lake.drop_schema("analytics")
    assert lake.list_schemas() == ["main"]
    with pytest.raises(LakeError, match="does not exist"):
        lake.drop_schema("analytics")
    lake.drop_schema("analytics", if_exists=True)  # no-op


def test_main_schema_is_the_root(lake):
    lake.create_table("t", "a int")
    lake.insert_rows("t", [{"a": 1}, {"a": 2}])
    # 'main.t' and 't' are the same table
    assert lake.table("main.t").count() == 2
    lake.insert_rows("main.t", [{"a": 3}])
    assert lake.table("t").count() == 3
    assert lake.list_tables() == ["t"]
    assert lake.list_tables(schema="main") == ["t"]


def test_qualified_table_lifecycle(lake):
    lake.create_schema("raw")
    lake.create_table("raw.docs", "id int, body string")
    lake.insert_rows(
        "raw.docs", [{"id": 1, "body": "x"}, {"id": 2, "body": "y"}]
    )
    assert lake.table("raw.docs").count() == 2
    assert lake.list_tables(schema="raw") == ["docs"]
    assert lake.list_tables() == ["raw.docs"]
    # same bare name in a different schema is a different table
    lake.create_table("docs", "id int")
    lake.insert_rows("docs", [{"id": 9}])
    assert lake.table("docs").count() == 1
    assert lake.table("raw.docs").count() == 2
    assert sorted(lake.list_tables()) == ["docs", "raw.docs"]
    lake.drop_table("raw.docs")
    with pytest.raises(TableNotFoundError):
        lake.table("raw.docs")
    assert lake.table("docs").count() == 1


def test_create_table_requires_schema(lake):
    with pytest.raises(LakeError, match="does not exist"):
        lake.create_table("nope.t", "a int")
    with pytest.raises(LakeError, match="invalid"):
        lake.create_table("a.b.c", "x int")


def test_drop_schema_cascade(lake):
    lake.create_schema("s")
    lake.create_table("s.t1", "a int")
    lake.create_table("s.t2", "a int")
    with pytest.raises(LakeError, match="not empty"):
        lake.drop_schema("s")
    lake.drop_schema("s", cascade=True)
    assert lake.list_schemas() == ["main"]
    with pytest.raises(LakeError, match="cannot drop"):
        lake.drop_schema("main")


def test_rename_across_schemas(lake):
    lake.create_schema("a")
    lake.create_schema("b")
    lake.create_table("a.t", "x int")
    lake.insert_rows("a.t", [{"x": 7}])
    lake.rename_table("a.t", "b.t2")
    assert lake.table("b.t2").count() == 1
    with pytest.raises(TableNotFoundError):
        lake.table("a.t")
    with pytest.raises(LakeError, match="does not exist"):
        lake.rename_table("b.t2", "missing.t")


def test_sql_with_qualified_names(lake):
    lake.create_schema("stage")
    lake.create_table("stage.ev", "k int, v string")
    lake.insert_rows(
        "stage.ev",
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 2, "v": "c"}],
    )
    lake.create_table("dim", "k int, name string")
    lake.insert_rows("dim", [{"k": 1, "name": "one"}, {"k": 2, "name": "two"}])
    rows = lake.sql(
        "SELECT d.name, count(*) AS n FROM stage.ev e"
        " JOIN dim d ON e.k = d.k GROUP BY d.name ORDER BY d.name"
    ).collect()
    assert [(r["name"], r["n"]) for r in rows] == [("one", 1), ("two", 2)]


def test_sqlexec_schema_ddl_roundtrip(lake):
    execute(lake, "CREATE SCHEMA sales")
    execute(lake, "CREATE TABLE sales.orders (id int, amt double)")
    execute(lake, "INSERT INTO sales.orders VALUES (1, 10.5), (2, 2.0)")
    got = execute(lake, "SELECT sum(amt) AS s FROM sales.orders").collect()
    assert got[0]["s"] == 12.5
    execute(lake, "UPDATE sales.orders SET amt = 3.0 WHERE id = 2")
    execute(lake, "DELETE FROM sales.orders WHERE id = 1")
    got = execute(lake, "SELECT sum(amt) AS s FROM sales.orders").collect()
    assert got[0]["s"] == 3.0
    with pytest.raises(LakeError, match="not empty"):
        execute(lake, "DROP SCHEMA sales")
    execute(lake, "DROP SCHEMA sales CASCADE")
    assert lake.list_schemas() == ["main"]
    execute(lake, "CREATE SCHEMA IF NOT EXISTS sales")
    execute(lake, "DROP SCHEMA IF EXISTS sales")
    execute(lake, "DROP SCHEMA IF EXISTS sales")  # idempotent


def test_time_travel_on_qualified_table(lake):
    lake.create_schema("h")
    lake.create_table("h.t", "a int")
    lake.insert_rows("h.t", [{"a": 1}])
    v1 = lake.current_snapshot("h.t")
    lake.insert_rows("h.t", [{"a": 2}])
    assert lake.time_travel("h.t", v1).count() == 1
    got = lake.sql(f"SELECT count(*) AS n FROM time_travel('h.t', {v1})")
    assert got.collect()[0]["n"] == 1


def test_schema_ddl_requires_admin(spark, tmp_path):
    from pg_ducklake_spark import Lake

    admin = Lake(spark, str(tmp_path / "l"))
    admin.create_schema("s")
    writer = Lake(spark, str(tmp_path / "l"), role="writer")
    with pytest.raises(AccessControlError):
        writer.create_schema("w")
    with pytest.raises(AccessControlError):
        writer.drop_schema("s")


def test_freeze_exports_ducklake_schema(lake, tmp_path, spark):
    from pg_ducklake_spark.freeze import FrozenLake, freeze_lake

    lake.create_schema("ext")
    lake.create_table("ext.t", "a int, b string")
    lake.insert_rows("ext.t", [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    lake.create_table("plain", "a int")
    lake.insert_rows("plain", [{"a": 5}])
    out = str(tmp_path / "lake.ducklake")
    freeze_lake(lake, out)

    # raw-duckdb contract: ducklake_schema exists and joins to the tables
    con = duckdb.connect(out, read_only=True)
    schemas = dict(
        con.execute(
            "SELECT schema_name, schema_id FROM ducklake_schema"
        ).fetchall()
    )
    assert schemas["main"] == 0 and "ext" in schemas
    names = con.execute(
        "SELECT s.schema_name, t.table_name FROM ducklake_table t"
        " JOIN ducklake_schema s USING (schema_id) ORDER BY 1, 2"
    ).fetchall()
    assert ("ext", "t") in names and ("main", "plain") in names
    con.close()

    frozen = FrozenLake(spark, out)
    assert sorted(frozen.list_tables()) == ["ext.t", "plain"]
    assert frozen.table("ext.t").count() == 2
    assert {r["b"] for r in frozen.table("ext.t").collect()} == {"x", "y"}
    assert frozen.table("plain").count() == 1


def test_two_part_procedure_overloads(lake):
    """Reference forms: CALL set_partition('schema','t', ...) and
    list_files('schema','t') (src/pgducklake_partition.cpp:31-95)."""
    execute(lake, "CREATE SCHEMA s")
    execute(lake, "CREATE TABLE s.t (a int, b string)")
    execute(lake, "CALL ducklake.set_partition('s', 't', 'b')")
    assert lake.get_partition("s.t") == ["b"]
    execute(lake, "INSERT INTO s.t VALUES (1, 'x'), (2, 'y')")
    n = lake.sql("SELECT count(*) AS n FROM list_files('s', 't')").collect()
    assert n[0]["n"] >= 1
    execute(lake, "CALL ducklake.flush_inlined_data('s', 't')")  # no-op ok
    # single-table form still works alongside
    execute(lake, "CREATE TABLE flat (a int)")
    execute(lake, "CALL ducklake.set_partition('flat', 'a')")
    assert lake.get_partition("flat") == ["a"]


def test_schema_scoped_options_precedence(spark, lake):
    """r7: set_option(schema=) sits between lake and table scope —
    the one settings layer the reference notes as absent
    (docs/ducklake_feature_coverage.md:78)."""
    import pytest

    from pg_ducklake_spark.errors import LakeError

    lake.create_schema("analytics")
    lake.create_table("analytics.t", "a int")
    lake.create_table("plain", "a int")
    lake.set_option("parquet_compression", "zstd")  # lake scope
    assert lake.options("plain")["parquet_compression"] == "zstd"
    assert lake.options("analytics.t")["parquet_compression"] == "zstd"
    lake.set_option("parquet_compression", "gzip", schema="analytics")
    assert lake.options("analytics.t")["parquet_compression"] == "gzip"
    assert lake.options("plain")["parquet_compression"] == "zstd"
    lake.set_option("parquet_compression", "snappy", table="analytics.t")
    assert lake.options("analytics.t")["parquet_compression"] == "snappy"
    # schema scope persists across a reopen (it is a snapshot log)
    from pg_ducklake_spark import Lake

    re2 = Lake(spark, lake.path)
    lake2_opts = re2.options("analytics.t")
    assert lake2_opts["parquet_compression"] == "snappy"
    lake.create_table("analytics.u", "a int")
    assert re2.options("analytics.u")["parquet_compression"] == "gzip"
    with pytest.raises(LakeError):
        lake.set_option("x", 1, table="plain", schema="analytics")
    with pytest.raises(LakeError):
        lake.set_option("x", 1, schema="nope")
    # schema-options logs never surface as tables
    assert all(not t.startswith("_") for t in lake.list_tables())
