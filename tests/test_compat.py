"""DuckDB-SQL compat macros: the same query text must produce the same
values on ``lake.sql`` (macro-expanded Spark) and on real DuckDB."""

import math

import duckdb
import pytest


@pytest.fixture()
def engines(spark, lake):
    lake.create_table("d", "id int, s string, ts timestamp, l array<int>")
    rows = [
        (1, "hello world", "2024-03-01T10:20:30", [3, 1, 2, 1]),
        (2, "Spark rocks", "2024-06-30T23:59:59.500000", [10, -5]),
        (3, None, None, None),
    ]
    lake.insert(
        "d",
        spark.createDataFrame(
            [(i, s, __import__("datetime").datetime.fromisoformat(t) if t else None, l)
             for i, s, t, l in rows],
            "id int, s string, ts timestamp, l array<int>",
        ),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (id INT, s VARCHAR, ts TIMESTAMP, l INT[])"
    )
    for i, s, t, l in rows:
        con.execute("INSERT INTO d VALUES (?, ?, ?, ?)", [i, s, t, l])
    return lake, con


CASES = [
    "SELECT id, regexp_matches(s, 'o.ld') AS r FROM d ORDER BY id",
    "SELECT id, starts_with(s, 'hel') AS r FROM d ORDER BY id",
    "SELECT id, ends_with(s, 'cks') AS r FROM d ORDER BY id",
    "SELECT id, string_split(s, ' ') AS r FROM d ORDER BY id",
    "SELECT id, list_contains(l, 2) AS r FROM d ORDER BY id",
    "SELECT id, array_length(l) AS r FROM d ORDER BY id",
    "SELECT id, list_sort(l) AS r FROM d ORDER BY id",
    "SELECT id, list_distinct(l) AS r FROM d ORDER BY id",
    "SELECT id, list_unique(l) AS r FROM d ORDER BY id",
    "SELECT id, list_min(l) AS r, list_max(l) AS r2 FROM d ORDER BY id",
    "SELECT id, list_sum(l) AS r FROM d ORDER BY id",
    "SELECT id, epoch(ts) AS r FROM d ORDER BY id",
    "SELECT id, epoch_ms(ts) AS r FROM d ORDER BY id",
]


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(sorted(x for x in v if x is not None)) if v else ()
    return v


@pytest.mark.parametrize("sql", CASES, ids=[c.split("(")[0].split(",")[1].strip() for c in CASES])
def test_compat_macro_matches_duckdb(engines, sql):
    lake, con = engines
    spark_rows = [tuple(_norm(v) for v in r) for r in lake.sql(sql).collect()]
    duck_rows = [tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()]
    assert spark_rows == duck_rows, f"{sql}\nspark={spark_rows}\nduck={duck_rows}"


def test_user_macro_shadows_compat(lake, spark):
    lake.create_table("t", "l array<int>")
    lake.insert("t", spark.createDataFrame([([1, 2, 3],)], "l array<int>"))
    # user redefines list_sum with different semantics — user wins
    lake.create_macro("list_sum", ["x"], "size(x) * 100")
    assert lake.sql("SELECT list_sum(l) AS r FROM t").collect()[0]["r"] == 300


def test_compat_does_not_shadow_spark_builtin(lake, spark):
    """Names Spark already has (len, string_agg) are not in the compat
    table, so Spark semantics stay untouched."""
    from pg_ducklake_spark.functions.compat import DUCKDB_COMPAT_MACROS

    for name in ("len", "string_agg", "date_part", "regexp_extract", "split"):
        assert name not in DUCKDB_COMPAT_MACROS
    lake.create_table("t", "s string")
    lake.insert("t", spark.createDataFrame([("abc",)], "s string"))
    assert lake.sql("SELECT len(s) AS n FROM t").collect()[0]["n"] == 3
