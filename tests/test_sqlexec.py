"""``Lake.execute`` — the reference's SQL-prompt surface routed to the
Lake API (statement shapes from test/regression/sql/*.sql)."""

import pytest

from pg_ducklake_spark.errors import LakeError, TableNotFoundError
from pg_ducklake_spark.sqlexec import split_top_level


def test_create_insert_select_roundtrip(lake):
    assert lake.execute("CREATE TABLE t (id INT, name STRING) USING ducklake") is None
    n = lake.execute("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert n == 3
    rows = lake.execute("SELECT * FROM t ORDER BY id").collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "a"), (2, "b"), (3, "c")]


def test_insert_select_and_column_list(lake):
    lake.execute("CREATE TABLE src (id INT, v DOUBLE)")
    lake.execute("INSERT INTO src VALUES (1, 1.5), (2, 2.5)")
    lake.execute("CREATE TABLE dst (id INT, v DOUBLE, tag STRING)")
    # column-list insert: unmentioned columns become NULL
    n = lake.execute("INSERT INTO dst (id, v) SELECT id, v * 2 FROM src")
    assert n == 2
    rows = lake.execute("SELECT * FROM dst ORDER BY id").collect()
    assert rows[0]["v"] == 3.0 and rows[0]["tag"] is None


def test_update_delete_row_counts(lake):
    """dml_row_count.sql: UPDATE/DELETE report affected counts."""
    lake.execute("CREATE TABLE t (id INT, v INT)")
    lake.execute("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    assert lake.execute("UPDATE t SET v = v + 1 WHERE id <= 2") == 2
    assert lake.execute("DELETE FROM t WHERE v > 35") == 1
    rows = lake.execute("SELECT sum(v) AS s FROM t").collect()
    assert rows[0]["s"] == 11 + 21 + 30


def test_ctas_and_drop(lake):
    lake.execute("CREATE TABLE t (id INT)")
    lake.execute("INSERT INTO t VALUES (1), (2)")
    n = lake.execute("CREATE TABLE t2 AS SELECT id * 10 AS id FROM t")
    assert n == 2
    assert {r["id"] for r in lake.execute("SELECT * FROM t2").collect()} == {10, 20}
    lake.execute("DROP TABLE t2")
    with pytest.raises(TableNotFoundError):
        lake._state("t2")
    lake.execute("DROP TABLE IF EXISTS t2")


def test_alter_statements(lake):
    lake.execute("CREATE TABLE t (id INT)")
    lake.execute("INSERT INTO t VALUES (1)")
    lake.execute("ALTER TABLE t ADD COLUMN v DOUBLE")
    lake.execute("ALTER TABLE t RENAME COLUMN v TO val")
    lake.execute("ALTER TABLE t ALTER COLUMN id TYPE BIGINT")
    assert [f.name for f in lake._state("t").schema.fields] == ["id", "val"]
    assert lake._state("t").schema["id"].dataType.simpleString() == "bigint"
    lake.execute("ALTER TABLE t DROP COLUMN val")
    lake.execute("ALTER TABLE t RENAME TO t_new")
    assert lake.table("t_new").columns == ["id"]


def test_partition_sort_statements(lake):
    lake.execute("CREATE TABLE t (id INT, ts TIMESTAMP)")
    lake.execute("ALTER TABLE t SET PARTITIONED BY (year(ts), month(ts))")
    assert lake.get_partition("t") == ["year(ts)", "month(ts)"]
    lake.execute("ALTER TABLE t RESET PARTITIONED BY")
    assert lake.get_partition("t") == []
    lake.execute("ALTER TABLE t SET SORTED BY (id DESC NULLS LAST)")
    assert lake.get_sort("t")[0]["direction"] == "DESC"


def test_view_macro_statements(lake):
    lake.execute("CREATE TABLE t (id INT, v DOUBLE)")
    lake.execute("INSERT INTO t VALUES (1, 2.0), (2, 4.0)")
    lake.execute("CREATE MACRO twice(x) AS x * 2")
    lake.execute("CREATE VIEW v1 AS SELECT id, twice(v) AS dv FROM t")
    rows = lake.execute("SELECT sum(dv) AS s FROM v1").collect()
    assert rows[0]["s"] == 12.0
    lake.execute("DROP VIEW v1")
    lake.execute("DROP MACRO twice")
    assert lake.views() == {} and lake.macros() == {}


def test_call_and_set_statements(lake):
    lake.execute("CREATE TABLE t (id INT)")
    lake.execute("CALL set_option('data_inlining_row_limit', 100, table_name => 't')")
    assert lake.options("t")["data_inlining_row_limit"] == 100
    lake.execute("INSERT INTO t VALUES (1)")
    assert lake._state("t").inline_rows  # went to the inline buffer
    lake.execute("CALL flush_inlined_data('t')")
    assert not lake._state("t").inline_rows
    lake.execute("VACUUM t")
    # A17 session GUC via SET
    lake.execute("SET ducklake.as_of_timestamp = '2030-01-01T00:00:00+00:00'")
    assert lake.as_of_timestamp == "2030-01-01T00:00:00+00:00"
    lake.execute("SET ducklake.as_of_timestamp = NULL")
    assert lake.as_of_timestamp is None


def test_values_with_expressions_and_strings(lake):
    lake.execute("CREATE TABLE t (id INT, s STRING)")
    lake.execute(
        "INSERT INTO t VALUES (1 + 1, upper('a,b')), (10, 'it''s')"
    )
    rows = lake.execute("SELECT * FROM t ORDER BY id").collect()
    assert (rows[0]["id"], rows[0]["s"]) == (2, "A,B")
    assert rows[1]["s"] == "it's"


def test_unsupported_statements_raise(lake):
    with pytest.raises(LakeError):
        lake.execute("GRANT ALL ON t TO someone")
    with pytest.raises(LakeError):
        lake.execute("CREATE INDEX ix ON t (id)")


def test_split_top_level():
    assert split_top_level("a = f(1, 2), b = 'x,y', c = (1, 2)") == [
        "a = f(1, 2)", "b = 'x,y'", "c = (1, 2)"
    ]


def test_guc_set_show_reset(lake):
    """gucs.sql: SET / SHOW / RESET on session options."""
    # default
    rows = lake.execute("SHOW ducklake.vacuum_delete_threshold").collect()
    assert rows[0][0] == "0.1"
    # SET (reference GUC name aliases to rewrite_delete_threshold)
    lake.execute("SET ducklake.vacuum_delete_threshold = 0.5")
    assert lake.options()["rewrite_delete_threshold"] == 0.5
    rows = lake.execute("SHOW ducklake.vacuum_delete_threshold").collect()
    assert rows[0][0] == "0.5"
    # RESET back to default
    lake.execute("RESET ducklake.vacuum_delete_threshold")
    assert lake.options()["rewrite_delete_threshold"] == 0.1
    # engine-native option names work too
    lake.execute("SET ducklake.data_inlining_row_limit = 10")
    assert lake.options()["data_inlining_row_limit"] == 10
    lake.execute("RESET ducklake.data_inlining_row_limit")
    assert lake.options()["data_inlining_row_limit"] == 0
    # as_of_timestamp surfaces through SHOW; empty when unset
    assert lake.execute("SHOW ducklake.as_of_timestamp").collect()[0][0] == ""
    lake.execute("SET ducklake.as_of_timestamp = '2030-01-01T00:00:00+00:00'")
    assert lake.execute("SHOW ducklake.as_of_timestamp").collect()[0][0] == (
        "2030-01-01T00:00:00+00:00"
    )
    lake.execute("RESET ducklake.as_of_timestamp")
    assert lake.as_of_timestamp is None
    # unknown option names are rejected
    with pytest.raises(LakeError):
        lake.execute("SET ducklake.nonsense = 1")
    with pytest.raises(LakeError):
        lake.execute("SHOW ducklake.nonsense")


def test_temp_table_rejected(lake):
    """temp_table.sql: TEMP tables are not supported on the lake AM."""
    with pytest.raises(LakeError, match="temporary tables"):
        lake.execute("CREATE TEMP TABLE tt (a int, b int) USING ducklake")
    with pytest.raises(LakeError, match="temporary tables"):
        lake.execute("CREATE TEMPORARY TABLE tt (a int) USING ducklake")


def test_begin_commit_publishes_atomically(lake):
    """transaction.sql:3-6 — BEGIN; INSERT; COMMIT publishes the batch;
    the insert is invisible between BEGIN and COMMIT."""
    lake.execute("CREATE TABLE t (id INT)")
    lake.execute("INSERT INTO t VALUES (1)")
    lake.execute("BEGIN")
    lake.execute("INSERT INTO t VALUES (2), (3)")
    # staged, not yet visible
    assert lake.execute("SELECT count(*) AS n FROM t").collect()[0]["n"] == 1
    lake.execute("COMMIT")
    assert lake.execute("SELECT count(*) AS n FROM t").collect()[0]["n"] == 3


def test_rollback_discards_staged_writes(lake):
    lake.execute("CREATE TABLE t (id INT)")
    lake.execute("BEGIN")
    lake.execute("INSERT INTO t VALUES (1), (2)")
    lake.execute("ROLLBACK")
    assert lake.execute("SELECT count(*) AS n FROM t").collect()[0]["n"] == 0
    # the lake is usable afterwards; a new autocommit insert lands
    lake.execute("INSERT INTO t VALUES (9)")
    assert lake.execute("SELECT count(*) AS n FROM t").collect()[0]["n"] == 1


def test_txn_statement_errors(lake):
    lake.execute("CREATE TABLE t (id INT)")
    with pytest.raises(LakeError, match="no transaction"):
        lake.execute("COMMIT")
    with pytest.raises(LakeError, match="no transaction"):
        lake.execute("ROLLBACK")
    lake.execute("START TRANSACTION")
    with pytest.raises(LakeError, match="already in progress"):
        lake.execute("BEGIN")
    lake.execute("ABORT")


def test_begin_commit_multi_table_atomic(lake):
    """Multi-table BEGIN..COMMIT goes through the two-phase marker:
    both tables' rows appear, and both snapshots share the marker."""
    lake.execute("CREATE TABLE a (id INT)")
    lake.execute("CREATE TABLE b (id INT)")
    lake.execute("BEGIN")
    lake.execute("INSERT INTO a VALUES (1)")
    lake.execute("INSERT INTO b VALUES (2)")
    lake.execute("COMMIT")
    assert lake.execute("SELECT count(*) AS n FROM a").collect()[0]["n"] == 1
    assert lake.execute("SELECT count(*) AS n FROM b").collect()[0]["n"] == 1


def test_duckdb_pg_type_spellings(lake, spark):
    """DuckDB/PG DDL type names the reference accepts
    (docs/data_types.md) parse at the SQL prompt: bare VARCHAR/TEXT,
    VARCHAR(n), BYTEA, INT8/FLOAT8, UUID."""
    lake.execute(
        "CREATE TABLE ty (id INT8, g VARCHAR, s VARCHAR(10), t TEXT,"
        " b BYTEA, u UUID, f FLOAT8)"
    )
    assert dict(lake.table("ty").dtypes) == {
        "id": "bigint", "g": "string", "s": "string", "t": "string",
        "b": "binary", "u": "string", "f": "double",
    }
    lake.execute(
        "INSERT INTO ty VALUES (1, 'x', 'abc', 'tt', NULL,"
        " '0000-1111', 1.5)"
    )
    [row] = lake.execute("SELECT * FROM ty").collect()
    assert (row["id"], row["s"], row["f"]) == (1, "abc", 1.5)


def test_column_named_like_a_type_survives(lake, spark):
    # A column legitimately NAMED "text" with a valid Spark schema must
    # not be rewritten by the spelling normalization.
    lake.create_table("ty2", "text string, n int")
    assert lake.table("ty2").columns == ["text", "n"]


def test_create_or_replace_table_and_truncate(lake, spark):
    lake.execute("CREATE TABLE t9 (a INT)")
    lake.execute("INSERT INTO t9 VALUES (1), (2)")
    lake.execute("CREATE OR REPLACE TABLE t9 AS SELECT 5 AS b")
    assert [tuple(r) for r in lake.execute("SELECT * FROM t9").collect()] == [(5,)]
    # plain-column form too
    lake.execute("CREATE OR REPLACE TABLE t9 (c BIGINT)")
    assert lake.table("t9").columns == ["c"]
    lake.execute("INSERT INTO t9 VALUES (7), (8), (9)")
    assert lake.execute("TRUNCATE t9") == 3
    assert lake.table("t9").count() == 0
    # CREATE OR REPLACE on a missing table just creates
    lake.execute("CREATE OR REPLACE TABLE t10 (d INT)")
    assert lake.table("t10").columns == ["d"]


def test_analyze_routes_to_stats(lake, spark):
    lake.execute("CREATE TABLE ta (a INT, s TEXT)")
    lake.execute("INSERT INTO ta VALUES (1, 'x'), (2, 'y'), (2, 'y')")
    stats = lake.execute("ANALYZE ta")
    assert stats["row_count"] == 3
    assert lake.table_stats("ta")["row_count"] == 3


def test_checkpoint_statement(lake, spark):
    lake.execute("CREATE TABLE tc (a INT)")
    lake.execute("INSERT INTO tc VALUES (1)")
    out = lake.execute("CHECKPOINT tc")
    assert isinstance(out, dict)
    assert lake.table("tc").count() == 1


def test_copy_to_and_from(lake, spark, tmp_path):
    lake.execute("CREATE TABLE tcp (a INT, s TEXT)")
    lake.execute("INSERT INTO tcp VALUES (1, 'x'), (2, 'y')")
    out = str(tmp_path / "out.parquet")
    assert lake.execute(f"COPY tcp TO '{out}'") == 2
    assert spark.read.parquet(out).count() == 2
    # round-trip back in (parquet)
    lake.execute("CREATE TABLE tcp2 (a INT, s TEXT)")
    assert lake.execute(f"COPY tcp2 FROM '{out}'") == 2
    assert sorted(tuple(r) for r in lake.table("tcp2").collect()) == [
        (1, "x"), (2, "y")
    ]
    # csv export with explicit format option
    outc = str(tmp_path / "out_csv")
    assert lake.execute(f"COPY tcp TO '{outc}' (FORMAT csv)") == 2
    got = spark.read.option("header", "true").csv(outc)
    assert got.count() == 2


def test_copy_query_to(lake, spark, tmp_path):
    lake.execute("CREATE TABLE tcq (a INT)")
    lake.execute("INSERT INTO tcq VALUES (1), (2), (3)")
    out = str(tmp_path / "q.parquet")
    n = lake.execute(f"COPY (SELECT a * 10 AS b FROM tcq WHERE a > 1) TO '{out}'")
    assert n == 2
    assert sorted(r["b"] for r in spark.read.parquet(out).collect()) == [20, 30]


def test_time_travel_table_function_in_sql(lake, spark):
    """A16 SQL surface: FROM time_travel('t', version) — the
    reference's table function (time_travel.sql:8-34), incl. the
    historical SCHEMA and a view created over it keeping its creation
    shape (time_travel.sql:21-23)."""
    lake.execute("CREATE TABLE tv (a INT)")
    lake.execute("INSERT INTO tv VALUES (1)")
    v = lake.current_snapshot("tv")
    lake.execute("INSERT INTO tv VALUES (2)")
    got = lake.execute(f"SELECT * FROM time_travel('tv', {v}) ORDER BY a")
    assert [r["a"] for r in got.collect()] == [1]
    # historical schema: travel to before an ADD COLUMN
    lake.execute("ALTER TABLE tv ADD COLUMN b TEXT")
    got2 = lake.execute(f"SELECT * FROM time_travel('tv', {v})")
    assert got2.columns == ["a"]
    # view over the table function pins the historical result
    lake.execute(f"CREATE VIEW tv_old AS SELECT * FROM time_travel('tv', {v})")
    lake.execute("INSERT INTO tv VALUES (3, 'z')")
    assert [r["a"] for r in lake.execute("SELECT * FROM tv_old").collect()] == [1]


def test_change_feed_table_functions_in_sql(lake, spark):
    """A18/A19 SQL surface: table_changes / table_insertions /
    table_deletions / snapshots / list_files as table functions
    (data_change_feed.sql:17-43, sql/pg_ducklake--0.1.0.sql:344-449)."""
    lake.execute("CREATE TABLE tf (a INT)")
    lake.execute("INSERT INTO tf VALUES (1)")
    v1 = lake.current_snapshot("tf")
    lake.execute("INSERT INTO tf VALUES (2)")
    lake.execute("DELETE FROM tf WHERE a = 1")
    v3 = lake.current_snapshot("tf")
    feed = lake.execute(
        f"SELECT a, _change_type FROM table_changes('tf', {v1 + 1}, {v3})"
        " ORDER BY a, _change_type"
    ).collect()
    assert [(r["a"], r["_change_type"]) for r in feed] == [
        (1, "delete"), (2, "insert")
    ]
    ins = lake.execute(
        f"SELECT a FROM table_insertions('tf', {v1 + 1}, {v3})"
    ).collect()
    assert [r["a"] for r in ins] == [2]
    dels = lake.execute(
        f"SELECT a FROM table_deletions('tf', {v1 + 1}, {v3})"
    ).collect()
    assert [r["a"] for r in dels] == [1]
    assert lake.execute("SELECT COUNT(*) AS n FROM snapshots('tf')").collect()[0]["n"] >= 3
    assert lake.execute("SELECT COUNT(*) AS n FROM list_files('tf')").collect()[0]["n"] >= 1
