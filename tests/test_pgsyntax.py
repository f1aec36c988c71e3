"""PG/DuckDB surface-syntax rewrites (pgsyntax.py): the reference's
insert_unnest.sql / ctas.sql shapes through the SQL prompt."""

import pytest

from pg_ducklake_spark.pgsyntax import rewrite
from pg_ducklake_spark.sqlexec import execute


def test_rewrite_units():
    assert rewrite("SELECT ARRAY[1, 2, 3]") == "SELECT array(1, 2, 3)"
    assert (
        rewrite("SELECT ARRAY['a', ARRAY['b']]")
        == "SELECT array('a', array('b'))"
    )
    # trailing ::text[] array cast dropped
    assert rewrite("ARRAY['d', 'e']::text[]") == "array('d', 'e')"
    # quote-aware: brackets inside strings untouched
    assert rewrite("SELECT 'ARRAY[1]'") == "SELECT 'ARRAY[1]'"
    assert (
        rewrite("SELECT * FROM UNNEST(array(1, 2))")
        == "SELECT * FROM (SELECT explode(array(1, 2)) AS unnest)"
    )
    # PG: the alias names the column
    assert (
        rewrite("SELECT u FROM unnest(array(1)) AS u")
        == "SELECT u FROM (SELECT explode(array(1)) AS u) u"
    )
    assert (
        rewrite("SELECT generate_series FROM generate_series(1, 5)")
        == "SELECT generate_series FROM"
        " (SELECT explode(sequence(1, 5)) AS generate_series)"
    )
    assert (
        rewrite("SELECT i FROM generate_series(1, 5) i WHERE i > 2")
        == "SELECT i FROM (SELECT explode(sequence(1, 5)) AS i) i"
        " WHERE i > 2"
    )
    # zipping multi-unnest
    assert (
        rewrite("SELECT UNNEST(a), UNNEST(b)")
        == "SELECT inline(arrays_zip(a, b)) "
    )
    # mixed projection is NOT rewritten (PG row expansion unsupported)
    assert "unnest" in rewrite("SELECT unnest(a), x FROM t").lower()


def test_insert_unnest_single(lake):
    """insert_unnest.sql test 1: INSERT ... SELECT * FROM UNNEST."""
    execute(lake, "CREATE TABLE iu (id INT)")
    execute(lake, "INSERT INTO iu SELECT * FROM UNNEST(ARRAY[1, 2, 3])")
    assert [r.id for r in lake.table("iu").orderBy("id").collect()] == [1, 2, 3]


def test_insert_unnest_zip(lake):
    """insert_unnest.sql test 1-2: zipping multi-column UNNEST plus the
    ::text[] array-cast spelling."""
    execute(lake, "CREATE TABLE iu (id INT, val TEXT)")
    execute(
        lake,
        "INSERT INTO iu SELECT UNNEST(ARRAY[1, 2, 3]),"
        " UNNEST(ARRAY['a', 'b', 'c'])",
    )
    execute(
        lake,
        "INSERT INTO iu SELECT UNNEST(ARRAY[4, 5]),"
        " UNNEST(ARRAY['d', 'e']::text[])",
    )
    got = {(r.id, r.val) for r in lake.table("iu").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}


def test_unnest_zip_pads_with_nulls(lake):
    """PG zips parallel unnests to the LONGEST input, padding NULLs."""
    execute(lake, "CREATE TABLE iu (id INT, val STRING)")
    execute(
        lake,
        "INSERT INTO iu SELECT UNNEST(ARRAY[1, 2, 3]), UNNEST(ARRAY['a'])",
    )
    got = {(r.id, r.val) for r in lake.table("iu").collect()}
    assert got == {(1, "a"), (2, None), (3, None)}


def test_generate_series_from_clause(lake):
    got = lake.sql(
        "SELECT count(*) AS n, sum(i) AS s FROM generate_series(1, 100) i"
    ).collect()[0]
    assert (got.n, got.s) == (100, 5050)
    # DuckDB column naming without an alias
    got = lake.sql(
        "SELECT max(generate_series) AS m FROM generate_series(1, 5)"
    ).collect()[0]
    assert got.m == 5


def test_unnest_from_clause_over_table(lake):
    lake.create_table("t", "id int, arr array<int>")
    lake.insert_rows = lake.insert_rows  # keep linters quiet
    from pyspark.sql import Row

    lake.insert(
        "t",
        lake.spark.createDataFrame(
            [Row(id=1, arr=[10, 20]), Row(id=2, arr=[30])],
            "id int, arr array<int>",
        ),
    )
    got = lake.sql(
        "SELECT sum(unnest) AS s FROM"
        " (SELECT explode(arr) AS unnest FROM t)"
    ).collect()[0]
    assert got.s == 60
