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


def test_rewrite_distinct_on_units():
    got = rewrite("SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, x DESC")
    assert "row_number() OVER (PARTITION BY k ORDER BY k, x DESC)" in got
    assert got.startswith("SELECT k, v FROM (SELECT *,")
    assert got.rstrip().endswith("WHERE __pg_rn = 1 ORDER BY k, x DESC")
    # no ORDER BY: the keys order the window (deterministic keeper)
    got = rewrite("SELECT DISTINCT ON (a, b) a, b, c FROM t WHERE c > 0")
    assert "PARTITION BY a, b ORDER BY a, b" in got
    assert "WHERE c > 0" in got
    # LIMIT survives outside the wrap
    got = rewrite("SELECT DISTINCT ON (k) k FROM t ORDER BY k LIMIT 7")
    assert got.rstrip().endswith("LIMIT 7")
    # inside a subquery
    got = rewrite("SELECT * FROM (SELECT DISTINCT ON (a) a FROM t) s")
    assert "__pg_rn" in got and got.startswith("SELECT * FROM (")


def test_rewrite_qualify_units():
    got = rewrite(
        "SELECT k, v FROM t QUALIFY row_number() OVER (PARTITION BY k"
        " ORDER BY v) = 1 ORDER BY k"
    )
    assert got.startswith("SELECT * EXCEPT (__pg_q) FROM (SELECT k, v, (")
    assert got.rstrip().endswith("WHERE __pg_q ORDER BY k")
    # GROUP BY stays inside the wrap, window evaluates post-agg
    got = rewrite(
        "SELECT k, sum(v) AS s FROM t GROUP BY k"
        " QUALIFY row_number() OVER (ORDER BY sum(v) DESC) <= 2"
    )
    assert "GROUP BY k) __pg_qual WHERE __pg_q" in got
    # QUALIFY in a string literal untouched
    assert rewrite("SELECT 'QUALIFY x' AS s FROM t") == "SELECT 'QUALIFY x' AS s FROM t"


def test_rewrite_regex_op_units():
    assert rewrite("SELECT x ~ 'p' FROM t") == "SELECT x  RLIKE  'p' FROM t"
    assert rewrite("WHERE a !~ 'p'") == "WHERE a  NOT RLIKE  'p'"
    assert rewrite("WHERE a ~* '.*P.*'") == "WHERE a  RLIKE '(?i).*P.*'"
    assert rewrite("WHERE a !~* 'P'") == "WHERE a  NOT RLIKE '(?i)P'"
    # unary bitwise NOT untouched (keyword / operator context)
    assert rewrite("SELECT ~5") == "SELECT ~5"
    assert rewrite("SELECT 1 + ~x FROM t") == "SELECT 1 + ~x FROM t"
    # operators inside string literals untouched
    assert rewrite("SELECT 'a ~ b'") == "SELECT 'a ~ b'"
    # closing paren / literal on the left is an operand
    assert "RLIKE" in rewrite("WHERE lower(a) ~ 'p'")
    assert "RLIKE" in rewrite("WHERE 'abc' ~ 'p'")
    # non-literal pattern after ~* stays (can't inject (?i) textually)
    assert rewrite("WHERE a ~* b") == "WHERE a ~* b"


def test_distinct_on_and_qualify_sql(lake):
    """PG DISTINCT ON and DuckDB QUALIFY through the live SQL prompt."""
    lake.create_table("dq", "k int, v string, x int")
    from pyspark.sql import Row

    lake.insert(
        "dq",
        lake.spark.createDataFrame(
            [Row(k=1, v="a", x=5), Row(k=1, v="b", x=9),
             Row(k=2, v="c", x=3), Row(k=2, v="d", x=3)],
            "k int, v string, x int",
        ),
    )
    got = lake.sql(
        "SELECT DISTINCT ON (k) k, v FROM dq ORDER BY k, x DESC, v"
    ).collect()
    assert [(r.k, r.v) for r in got] == [(1, "b"), (2, "c")]
    got = lake.sql(
        "SELECT k, v FROM dq QUALIFY row_number() OVER"
        " (PARTITION BY k ORDER BY x DESC, v) = 1 ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in got] == [(1, "b"), (2, "c")]
    got = lake.sql(
        "SELECT count(*) AS n FROM dq WHERE v ~ '[ab]' AND v !~* 'C.*'"
    ).collect()[0]
    assert got.n == 2


def test_rewrite_set_op_branches_parenthesized():
    """ADVICE r6 (medium): when DISTINCT ON / QUALIFY sits in a set-op
    branch, the rewritten block must be parenthesized — the old splice
    glued the synthesized tail straight onto UNION ('...k, vUNION ALL')
    and hung an ORDER BY inside an unparenthesized branch."""
    got = rewrite(
        "SELECT DISTINCT ON (k) k FROM t ORDER BY k, v UNION ALL SELECT 1"
    )
    assert "vUNION" not in got and "__pg_rnUNION" not in got
    assert got.lstrip().startswith("(")
    assert ") UNION ALL SELECT 1" in got
    got = rewrite(
        "SELECT k FROM t QUALIFY row_number() OVER (ORDER BY k) = 1"
        " UNION ALL SELECT 1"
    )
    assert "__pg_qUNION" not in got
    assert ") UNION ALL SELECT 1" in got
    # non-branch rewrites keep their unwrapped shape
    got = rewrite("SELECT DISTINCT ON (k) k FROM t")
    assert not got.lstrip().startswith("(")


def test_rewrite_backtick_identifiers_untouched():
    """ADVICE r6: backtick-quoted identifiers are quoted spans — a `~`
    or keyword inside one must not be rewritten."""
    assert rewrite("SELECT `a~b` FROM t") == "SELECT `a~b` FROM t"
    assert rewrite("SELECT `x ~* y`, a ~ 'p' FROM t") == (
        "SELECT `x ~* y`, a  RLIKE  'p' FROM t"
    )
    assert rewrite("SELECT `ARRAY[`, ARRAY[1] FROM t") == (
        "SELECT `ARRAY[`, array(1) FROM t"
    )


def test_qualify_alias_inlined_in_window():
    """ADVICE r6: Spark rejects lateral column aliases inside window
    expressions, so ``QUALIFY ... OVER (ORDER BY alias)`` inlines the
    alias's defining expression; references outside OVER are left to
    lateral alias resolution."""
    got = rewrite(
        "SELECT v * 2 AS dbl FROM t"
        " QUALIFY row_number() OVER (ORDER BY dbl DESC) <= 2"
    )
    assert "OVER (ORDER BY (v * 2) DESC)" in got
    # outside the OVER span the alias reference is untouched
    got = rewrite(
        "SELECT v * 2 AS dbl FROM t"
        " QUALIFY dbl > 3 AND row_number() OVER (ORDER BY dbl) = 1"
    )
    assert "dbl > 3" in got and "OVER (ORDER BY (v * 2))" in got


def test_qualify_alias_inline_skips_qualified_refs():
    """ADVICE r7 (medium): a qualified reference ``t.price`` inside
    OVER(...) names the BASE column on relation ``t`` — inlining the
    select-list alias there produced ``t.(price * 0.9)``, a parse
    error. Qualified tokens (preceded or followed by '.') are skipped;
    bare alias tokens still inline."""
    got = rewrite(
        "SELECT price * 0.9 AS price FROM t"
        " QUALIFY row_number() OVER (ORDER BY t.price) = 1"
    )
    assert "OVER (ORDER BY t.price)" in got and "t.(" not in got
    # bare reference in the same query still inlines
    got = rewrite(
        "SELECT price * 0.9 AS price FROM t"
        " QUALIFY row_number() OVER (ORDER BY price, t.price) = 1"
    )
    assert "OVER (ORDER BY (price * 0.9), t.price)" in got
    # alias token used as a qualifier is also left alone
    got = rewrite(
        "SELECT v AS s FROM t"
        " QUALIFY row_number() OVER (PARTITION BY s.k ORDER BY v) = 1"
    )
    assert "PARTITION BY s.k" in got


def test_set_op_branch_and_alias_window_sql(lake):
    """The two ADVICE rewrites end-to-end through the SQL prompt."""
    lake.create_table("so", "k int, v int")
    from pyspark.sql import Row

    lake.insert(
        "so",
        lake.spark.createDataFrame(
            [Row(k=1, v=10), Row(k=1, v=20), Row(k=2, v=5)], "k int, v int"
        ),
    )
    got = lake.sql(
        "SELECT DISTINCT ON (k) k, v FROM so ORDER BY k, v DESC"
        " UNION ALL SELECT 9, 9"
    ).collect()
    assert sorted((r.k, r.v) for r in got) == [(1, 20), (2, 5), (9, 9)]
    got = lake.sql(
        "SELECT k, v * 2 AS dbl FROM so"
        " QUALIFY row_number() OVER (ORDER BY dbl DESC) = 1"
    ).collect()
    assert [(r.k, r.dbl) for r in got] == [(1, 40)]
