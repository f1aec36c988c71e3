"""Mirrors data_change_feed.sql: insertions/deletions/changes by version
and timestamp; the 4 change_type values; range validation."""

import pytest

from pg_ducklake_spark.errors import SnapshotNotFoundError


@pytest.fixture()
def t(spark, lake):
    lake.create_table("t", "a int, b string")  # v1
    lake.insert(
        "t", spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")], "a int, b string")
    )  # v2
    lake.update("t", {"b": "'TWO'"}, "a = 2")  # v3
    lake.delete("t", "a = 3")  # v4
    return lake


def test_table_changes_all_types(t):
    ch = t.table_changes("t", 1, 4).collect()
    types = sorted({r._change_type for r in ch})
    assert types == ["delete", "insert", "update_postimage", "update_preimage"]
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append((r.a, r.b))
    assert sorted(by_type["insert"]) == [(1, "one"), (2, "two"), (3, "three")]
    assert by_type["update_preimage"] == [(2, "two")]
    assert by_type["update_postimage"] == [(2, "TWO")]
    assert by_type["delete"] == [(3, "three")]


def test_commit_version_column(t):
    ch = t.table_changes("t", 3, 3).collect()
    assert {r._commit_version for r in ch} == {3}
    assert {r._change_type for r in ch} == {"update_preimage", "update_postimage"}


def test_insertions_and_deletions(t):
    ins = t.table_insertions("t", 1, 4)
    assert "_change_type" not in ins.columns
    assert sorted((r.a, r.b) for r in ins.collect()) == [
        (1, "one"), (2, "TWO"), (2, "two"), (3, "three")]
    dels = t.table_deletions("t", 3, 4)
    assert sorted((r.a, r.b) for r in dels.collect()) == [(2, "two"), (3, "three")]


def test_changes_by_timestamp(t):
    snaps = {r.snapshot_id: r.snapshot_time for r in t.snapshots("t").collect()}
    ch = t.table_changes("t", snaps[2].isoformat(), snaps[2].isoformat())
    assert {r._change_type for r in ch.collect()} == {"insert"}


def test_invalid_range(t):
    with pytest.raises(SnapshotNotFoundError):
        t.table_changes("t", 3, 2)
    with pytest.raises(SnapshotNotFoundError):
        t.table_changes("t", 1, 99)


def test_inline_changes_in_feed(spark, lake):
    lake.create_table("t", "a int", options={"data_inlining_row_limit": 10})
    lake.insert_rows("t", [{"a": 1}, {"a": 2}])  # v2 inline insert
    lake.delete("t", "a = 1")  # v3 inline delete
    ch = lake.table_changes("t", 2, 3).collect()
    got = sorted((r._change_type, r.a) for r in ch)
    assert got == [("delete", 1), ("insert", 1), ("insert", 2)]


def test_flush_and_optimize_not_in_feed(spark, lake):
    lake.create_table("t", "a int", options={"data_inlining_row_limit": 10})
    lake.insert_rows("t", [{"a": 1}])
    lake.insert("t", spark.createDataFrame([(2,)], "a int"))
    lake.flush_inlined_data("t")
    lake.vacuum("t", target_file_size=1 << 20)
    last = lake.current_snapshot("t")
    ch = lake.table_changes("t", 1, last).collect()
    assert sorted(r._change_type for r in ch) == ["insert", "insert"]


def test_dv_delete_changes_derived_across_vintages(spark, lake):
    """r11: DV-mode DELETE writes positions only — the feed
    reconstructs deleted rows from the delta positions. The
    reconstruction must resolve the data files' OWN vintage: renamed
    columns map back, a column added (with DEFAULT) after the file was
    written fills its default, repeated deletes only report the DELTA
    (cumulative DV carry-forward must not re-report earlier rows)."""
    lake.create_table("t", "a int, b string")  # v1
    lake.insert(
        "t",
        spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
            "a int, b string",
        ),
    )  # v2 — file written under (a, b)
    lake.rename_column("t", "b", "label")  # v3
    lake.add_column("t", "score", "int", default="7")  # v4
    lake.delete("t", "a = 2")  # v5 — first DV on the old-vintage file
    lake.delete("t", "a = 4")  # v6 — cumulative DV carries a=2 forward
    # no CDF change files on the DV path: the delete file is the record
    import glob, os

    assert not glob.glob(
        os.path.join(lake._table_dir("t"), "_change_data", "*")
    ), "DV-mode DELETE must not materialize change rows"
    d5 = [tuple(r)[:3] for r in lake.table_deletions("t", 5, 5).collect()]
    d6 = [tuple(r)[:3] for r in lake.table_deletions("t", 6, 6).collect()]
    assert d5 == [(2, "two", 7)]
    assert d6 == [(4, "four", 7)]
    # full feed: both deletes, nothing double-reported
    ch = lake.table_changes("t", 1, 6).filter("_change_type = 'delete'")
    assert sorted(tuple(r)[:3] for r in ch.collect()) == [
        (2, "two", 7), (4, "four", 7),
    ]
