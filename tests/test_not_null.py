"""NOT NULL enforcement on the write paths (PG-frontend parity: the
reference enforces declared constraints at insert; the repo previously
exported ``nulls_allowed`` via freeze but never checked it). The
parquet path enforces in-projection via raise_error — no extra pass —
and the inline fast path checks driver-side."""

import duckdb
import pytest

from pg_ducklake_spark.errors import LakeError


def _capture(excinfo) -> str:
    return str(excinfo.value)


def test_parquet_insert_rejects_null(spark, lake):
    lake.create_table("t", "a int not null, b string")
    lake.insert(
        "t", spark.createDataFrame([(1, "x")], "a int, b string")
    )  # valid row fine
    with pytest.raises(Exception, match="not-null constraint"):
        lake.insert(
            "t", spark.createDataFrame([(None, "y")], "a int, b string")
        )
    # failed insert must not have committed anything
    assert lake.table("t").count() == 1


def test_insert_missing_not_null_column_rejected(spark, lake):
    lake.create_table("t", "a int not null, b string")
    with pytest.raises(Exception, match="not-null constraint"):
        lake.insert("t", spark.createDataFrame([("y",)], "b string"))


def test_inline_insert_rejects_null(lake):
    lake.create_table(
        "t", "a int not null, b string",
        options={"data_inlining_row_limit": 10},
    )
    lake.insert_rows("t", [{"a": 1, "b": "x"}])
    with pytest.raises(LakeError, match="not-null constraint"):
        lake.insert_rows("t", [{"a": None, "b": "y"}])
    with pytest.raises(LakeError, match="not-null constraint"):
        lake.insert_rows("t", [{"b": "y"}])  # omitted == NULL
    assert lake.table("t").count() == 1


def test_update_to_null_rejected(spark, lake):
    lake.create_table("t", "a int not null, b string")
    lake.insert(
        "t", spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    )
    with pytest.raises(Exception, match="not-null constraint"):
        lake.update("t", {"a": "NULL"}, "b = 'x'")
    assert lake.table("t").filter("a IS NULL").count() == 0


def test_inline_update_to_null_rejected(spark, lake):
    lake.create_table(
        "t", "a int not null, b string",
        options={"data_inlining_row_limit": 10},
    )
    lake.insert_rows("t", [{"a": 1, "b": "x"}])
    with pytest.raises(Exception, match="not-null constraint"):
        lake.update("t", {"a": "NULL"}, "b = 'x'")
    assert [r.a for r in lake.table("t").collect()] == [1]


def test_default_satisfies_not_null(lake):
    lake.create_table(
        "t", "a int not null, b string",
        options={"data_inlining_row_limit": 10},
    )
    lake.set_column_default("t", "a", "7")
    lake.insert_rows("t", [{"b": "x"}])  # omitted -> default 7, not NULL
    assert lake.table("t").collect()[0].a == 7


def test_freeze_exports_nulls_allowed(spark, lake, tmp_path):
    from pg_ducklake_spark.freeze import freeze_lake

    lake.create_table("t", "a int not null, b string")
    lake.insert("t", spark.createDataFrame([(1, "x")], "a int, b string"))
    out = str(tmp_path / "m.ducklake")
    freeze_lake(lake, out)
    con = duckdb.connect(out, read_only=True)
    na = dict(
        con.execute(
            "SELECT column_name, nulls_allowed FROM ducklake_column"
        ).fetchall()
    )
    con.close()
    assert na == {"a": False, "b": True}

# ---- ALTER TABLE ... SET / DROP NOT NULL (r11, VERDICT r10 #4) ----


def test_set_not_null_validates_then_enforces(spark, lake):
    lake.create_table("t", "a int, b string")
    lake.insert(
        "t", spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    )
    lake.execute("ALTER TABLE t ALTER COLUMN a SET NOT NULL")
    assert lake.declared_schema("t")["a"].nullable is False
    # the flipped constraint is live on the write path
    with pytest.raises(Exception, match="not-null constraint"):
        lake.insert(
            "t", spark.createDataFrame([(None, "z")], "a int, b string")
        )
    assert lake.table("t").count() == 2


def test_set_not_null_rejected_when_rows_violate(spark, lake):
    lake.create_table("t", "a int, b string")
    lake.insert(
        "t", spark.createDataFrame([(1, "x"), (None, "y")], "a int, b string")
    )
    with pytest.raises(LakeError, match="contains null"):
        lake.execute("ALTER TABLE t ALTER COLUMN a SET NOT NULL")
    assert lake.declared_schema("t")["a"].nullable is True
    # deleting the violating row unblocks the flip (scan sees live rows
    # only — DV-masked deletes excluded)
    lake.delete("t", "a IS NULL")
    lake.execute("ALTER TABLE t ALTER COLUMN a SET NOT NULL")
    assert lake.declared_schema("t")["a"].nullable is False


def test_drop_not_null_allows_nulls_again(spark, lake):
    lake.create_table("t", "a int not null, b string")
    lake.insert("t", spark.createDataFrame([(1, "x")], "a int, b string"))
    lake.execute("ALTER TABLE t ALTER COLUMN a DROP NOT NULL")
    assert lake.declared_schema("t")["a"].nullable is True
    lake.insert("t", spark.createDataFrame([(None, "y")], "a int, b string"))
    assert lake.table("t").filter("a IS NULL").count() == 1


def test_set_not_null_time_travel_keeps_old_schema(spark, lake):
    lake.create_table("t", "a int, b string")
    lake.insert("t", spark.createDataFrame([(1, "x")], "a int, b string"))
    v_before = lake.current_snapshot("t")
    lake.set_not_null("t", "a")
    assert lake.declared_schema("t", version=v_before)["a"].nullable is True
    assert lake.declared_schema("t")["a"].nullable is False


def test_set_not_null_unknown_column_and_idempotence(spark, lake):
    lake.create_table("t", "a int not null, b string")
    with pytest.raises(LakeError, match="not found"):
        lake.set_not_null("t", "nope")
    with pytest.raises(LakeError, match="not found"):
        lake.drop_not_null("t", "nope")
    v = lake.current_snapshot("t")
    lake.set_not_null("t", "a")  # already NOT NULL: no-op, no snapshot
    assert lake.current_snapshot("t") == v


def test_set_not_null_checks_inline_buffer(spark, lake):
    lake.create_table(
        "t", "a int, b string", options={"data_inlining_row_limit": 10}
    )
    lake.insert_rows("t", [{"a": None, "b": "x"}])  # buffered, not flushed
    with pytest.raises(LakeError, match="contains null"):
        lake.execute("ALTER TABLE t ALTER COLUMN a SET NOT NULL")
