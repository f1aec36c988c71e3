"""Persisted views + scalar macros (≙ ducklake_view / ducklake_macro*;
schema-pinned views per test/regression/sql/time_travel.sql:21-23)."""

import pytest

from pg_ducklake_spark.errors import (
    LakeError,
    ReadOnlyError,
    TableAlreadyExistsError,
)
from pg_ducklake_spark.views import expand_macros


def _seed(lake):
    lake.create_table("t", "id int, v double, tag string")
    lake.insert_rows(
        "t",
        [
            {"id": 1, "v": 10.0, "tag": "a"},
            {"id": 2, "v": 20.0, "tag": "b"},
            {"id": 3, "v": 30.0, "tag": "a"},
        ],
    )


def test_create_and_query_view(lake):
    _seed(lake)
    lake.create_view("v_a", "SELECT id, v FROM t WHERE tag = 'a'")
    rows = lake.sql("SELECT sum(v) AS s FROM v_a").collect()
    assert rows[0]["s"] == 40.0
    assert set(lake.views()) == {"v_a"}
    # views compose with tables in one statement
    n = lake.sql("SELECT count(*) AS n FROM v_a JOIN t USING (id)").collect()
    assert n[0]["n"] == 2


def test_view_schema_pinned_at_creation(lake):
    """A SELECT * view must NOT grow columns added to the base table
    later (the reference pins view schema at creation)."""
    _seed(lake)
    lake.create_view("v_all", "SELECT * FROM t")
    assert lake.view("v_all").columns == ["id", "v", "tag"]
    lake.add_column("t", "extra", "int")
    assert lake.view("v_all").columns == ["id", "v", "tag"]
    # base table does see the new column
    assert "extra" in lake.table("t").columns


def test_view_replace_and_drop(lake):
    _seed(lake)
    lake.create_view("v1", "SELECT id FROM t")
    with pytest.raises(LakeError):
        lake.create_view("v1", "SELECT v FROM t")
    lake.create_view("v1", "SELECT v FROM t", or_replace=True)
    assert lake.view("v1").columns == ["v"]
    lake.drop_view("v1")
    assert lake.views() == {}
    with pytest.raises(LakeError):
        lake.drop_view("v1")
    lake.drop_view("v1", if_exists=True)


def test_view_table_name_collision(lake):
    _seed(lake)
    lake.create_view("v1", "SELECT id FROM t")
    with pytest.raises(TableAlreadyExistsError):
        lake.create_table("v1", "x int")
    with pytest.raises(TableAlreadyExistsError):
        lake.create_view("t", "SELECT 1 AS one")


def test_scalar_macro_expansion(lake):
    _seed(lake)
    lake.create_macro("double_it", ["x"], "x * 2")
    rows = lake.sql("SELECT double_it(v) AS d FROM t ORDER BY id").collect()
    assert [r["d"] for r in rows] == [20.0, 40.0, 60.0]


def test_macro_precedence_and_nesting(lake):
    _seed(lake)
    lake.create_macro("add1", ["x"], "x + 1")
    lake.create_macro("square", ["x"], "x * x")
    # argument with operators must keep precedence: square(1 + 2) == 9
    rows = lake.sql("SELECT square(1 + 2) AS s, square(add1(2)) AS n").collect()
    assert rows[0]["s"] == 9
    assert rows[0]["n"] == 9
    # macro calling a macro in its body
    lake.create_macro("plus2", ["y"], "add1(add1(y))")
    assert lake.sql("SELECT plus2(5) AS p").collect()[0]["p"] == 7


def test_macro_in_view_definition(lake):
    _seed(lake)
    lake.create_macro("bump", ["x"], "x + 100")
    lake.create_view("v_bumped", "SELECT id, bump(v) AS bv FROM t")
    rows = lake.sql("SELECT max(bv) AS m FROM v_bumped").collect()
    assert rows[0]["m"] == 130.0


def test_macro_arity_and_strings():
    macros = {"f": {"parameters": ["a", "b"], "body": "a || b"}}
    out = expand_macros("SELECT f('x,y', 'z')", macros)
    assert out == "SELECT (('x,y') || ('z'))"
    with pytest.raises(LakeError):
        expand_macros("SELECT f(1)", macros)
    # calls inside string literals are untouched
    assert expand_macros("SELECT 'f(1,2)'", macros) == "SELECT 'f(1,2)'"
    # qualified names are not macro calls
    assert expand_macros("SELECT s.f(1,2)", {"f": macros["f"]}) == "SELECT s.f(1,2)"


def test_macro_recursion_capped(lake):
    lake.create_macro("loop_a", ["x"], "loop_a(x)")
    with pytest.raises(LakeError):
        lake.sql("SELECT loop_a(1) AS v")


def test_table_macro_in_from(lake):
    """r12 (VERDICT #6): CREATE MACRO .. AS TABLE — a FROM-position
    invocation expands to a parenthesized derived table through the
    same quote-aware, arity-checked expander as scalar macros."""
    _seed(lake)
    lake.create_macro(
        "top_v", ["k"], "SELECT id, v FROM t ORDER BY v DESC LIMIT k",
        table=True,
    )
    rows = lake.sql("SELECT * FROM top_v(2) ORDER BY id").collect()
    assert [(r["id"], r["v"]) for r in rows] == [(2, 20.0), (3, 30.0)]
    # with an alias, joined back against a table
    rows = lake.sql(
        "SELECT x.id, t.tag FROM top_v(1) AS x JOIN t ON x.id = t.id"
    ).collect()
    assert [(r["id"], r["tag"]) for r in rows] == [(3, "a")]
    assert lake.macros()["top_v"]["kind"] == "table"


def test_table_macro_nesting_and_arity(lake):
    """Table macros may call scalar macros in their bodies; zero-arg
    table macros work; arity mismatches raise."""
    _seed(lake)
    lake.create_macro("bump", ["x"], "x + 100")
    lake.create_macro(
        "bumped", [], "SELECT id, bump(v) AS bv FROM t", table=True,
    )
    rows = lake.sql("SELECT sum(bv) AS s FROM bumped()").collect()
    assert rows[0]["s"] == 360.0
    with pytest.raises(LakeError):
        lake.sql("SELECT * FROM bumped(1)")
    # a table macro calling a TABLE macro (FROM-position nesting)
    lake.create_macro(
        "bumped_top", ["k"],
        "SELECT * FROM bumped() ORDER BY bv DESC LIMIT k", table=True,
    )
    rows = lake.sql("SELECT bv FROM bumped_top(1)").collect()
    assert rows[0]["bv"] == 130.0


def test_table_macro_sql_prompt_and_freeze(lake, spark, tmp_path):
    """CREATE MACRO .. AS TABLE routes through Lake.execute, and the
    kind survives the frozen .ducklake round trip (macro_type column in
    ducklake_macro_impl)."""
    _seed(lake)
    lake.execute(
        "CREATE MACRO tag_counts(which) AS TABLE "
        "SELECT tag, count(*) AS n FROM t WHERE tag = which GROUP BY tag"
    )
    rows = lake.execute("SELECT * FROM tag_counts('a')").collect()
    assert [(r["tag"], r["n"]) for r in rows] == [("a", 2)]
    frozen = str(tmp_path / "tm.ducklake")
    lake.freeze(frozen)
    from pg_ducklake_spark import Lake

    fl = Lake.attach_frozen(spark, frozen)
    assert fl.macros()["tag_counts"]["kind"] == "table"
    rows = fl.sql("SELECT n FROM tag_counts('b')").collect()
    assert rows[0]["n"] == 1
    # raw-duckdb parity: the metadata tables carry the kind
    import duckdb

    con = duckdb.connect(frozen, read_only=True)
    kind = con.execute(
        "SELECT i.macro_type FROM ducklake_macro m JOIN ducklake_macro_impl i"
        " USING (macro_id) WHERE m.macro_name = 'tag_counts'"
    ).fetchone()[0]
    con.close()
    assert kind == "table"


def test_views_macros_survive_freeze(lake, spark, tmp_path):
    _seed(lake)
    lake.create_macro("pct", ["x"], "x / 100.0")
    lake.create_view("v_pct", "SELECT id, pct(v) AS p FROM t")
    frozen = str(tmp_path / "out.ducklake")
    lake.freeze(frozen)
    from pg_ducklake_spark import Lake

    fl = Lake.attach_frozen(spark, frozen)
    rows = fl.sql("SELECT sum(p) AS s FROM v_pct").collect()
    assert rows[0]["s"] == pytest.approx(0.6)
    rows = fl.sql("SELECT pct(50) AS h").collect()
    assert rows[0]["h"] == 0.5
    with pytest.raises(ReadOnlyError):
        fl.create_view("nope", "SELECT 1")


def test_view_read_only_lake_rejects_ddl(lake, spark):
    _seed(lake)
    lake.create_view("v1", "SELECT id FROM t")
    from pg_ducklake_spark import Lake

    ro = Lake.attach(spark, lake.path, read_only=True)
    # reads work, DDL rejected
    assert ro.sql("SELECT count(*) AS n FROM v1").collect()[0]["n"] == 3
    with pytest.raises(ReadOnlyError):
        ro.create_view("v2", "SELECT 1")
    with pytest.raises(ReadOnlyError):
        ro.drop_view("v1")
