"""Tags / COMMENT metadata (≙ ducklake_tag / ducklake_column_tag —
two of the 28 frozen metadata tables, src/pgducklake_freeze.cpp:38-39.
The reference's PG frontend marks COMMENT unsupported on its table AM,
so the SQL surface here exceeds reference parity; the frozen-export
contract is matched either way)."""

import duckdb
import pytest

from pg_ducklake_spark.errors import AccessControlError, LakeError
from pg_ducklake_spark.sqlexec import execute


def test_table_and_column_comments(lake):
    lake.create_table("t", "a int, b string")
    lake.comment_on("t", "fact table")
    lake.comment_on_column("t", "a", "the key")
    assert lake.tags("t") == {"comment": "fact table"}
    assert lake.column_tags("t") == {"a": {"comment": "the key"}}
    lake.comment_on("t", None)  # clear
    lake.comment_on_column("t", "a", None)
    assert lake.tags("t") == {}
    assert lake.column_tags("t") == {}


def test_arbitrary_tags_and_errors(lake):
    lake.create_table("t", "a int")
    lake.set_tag("t", "owner", "data-eng")
    lake.set_tag("t", "pii", "false")
    assert lake.tags("t") == {"owner": "data-eng", "pii": "false"}
    with pytest.raises(LakeError, match="does not exist"):
        lake.set_column_tag("t", "nope", "k", "v")


def test_comment_survives_column_rename(lake):
    lake.create_table("t", "a int, b string")
    lake.comment_on_column("t", "a", "the key")
    lake.rename_column("t", "a", "a2")
    assert lake.column_tags("t") == {"a2": {"comment": "the key"}}


def test_sql_comment_on(lake):
    execute(lake, "CREATE TABLE t (a int, b string)")
    execute(lake, "COMMENT ON TABLE t IS 'it''s a table'")
    execute(lake, "COMMENT ON COLUMN t.b IS 'body text'")
    assert lake.tags("t")["comment"] == "it's a table"
    assert lake.column_tags("t")["b"]["comment"] == "body text"
    execute(lake, "COMMENT ON TABLE t IS NULL")
    assert lake.tags("t") == {}


def test_sql_comment_on_qualified(lake):
    execute(lake, "CREATE SCHEMA s")
    execute(lake, "CREATE TABLE s.t (a int)")
    execute(lake, "COMMENT ON TABLE s.t IS 'x'")
    execute(lake, "COMMENT ON COLUMN s.t.a IS 'y'")
    assert lake.tags("s.t")["comment"] == "x"
    assert lake.column_tags("s.t")["a"]["comment"] == "y"


def test_comments_require_admin(spark, tmp_path):
    from pg_ducklake_spark import Lake

    admin = Lake(spark, str(tmp_path / "l"))
    admin.create_table("t", "a int")
    writer = Lake(spark, str(tmp_path / "l"), role="writer")
    with pytest.raises(AccessControlError):
        writer.comment_on("t", "nope")


def test_tags_survive_checkpoint_and_freeze(lake, tmp_path):
    from pg_ducklake_spark.freeze import freeze_lake

    lake.create_table("t", "a int, b string")
    lake.set_tag("t", "comment", "doc")
    lake.set_column_tag("t", "b", "comment", "col doc")
    lake.insert_rows("t", [])  # no-op ok
    lake.checkpoint("t")
    # replay through the checkpoint keeps tags
    lake._logs.clear()
    assert lake.tags("t") == {"comment": "doc"}
    out = str(tmp_path / "m.ducklake")
    freeze_lake(lake, out)
    con = duckdb.connect(out, read_only=True)
    assert con.execute("SELECT key, value FROM ducklake_tag").fetchall() == [
        ("comment", "doc")
    ]
    assert con.execute(
        "SELECT column_name, key, value FROM ducklake_column_tag"
    ).fetchall() == [("b", "comment", "col doc")]
    con.close()


def test_drop_column_clears_its_tags(lake):
    """PG drops dependent comments with the column; a re-added column of
    the same name must start untagged (fuzz_schema seed 11)."""
    lake.create_table("t", "a int, v string")
    lake.set_column_tag("t", "v", "comment", "c-doc")
    lake.set_column_tag("t", "a", "comment", "keep")
    lake.drop_column("t", "v")
    assert lake.column_tags("t") == {"a": {"comment": "keep"}}
    lake.add_column("t", "v", "string")
    assert "v" not in lake.column_tags("t")
    # survives replay
    lake._logs.clear()
    assert lake.column_tags("t") == {"a": {"comment": "keep"}}
