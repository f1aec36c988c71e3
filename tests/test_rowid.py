"""rowid virtual row-lineage column (r7): upstream DuckLake semantics
(rowid = data_file.row_id_start + row_index; the reference itself lists
rowid unsupported, docs/ducklake_feature_coverage.md:54). Covered:
uniqueness, stability across non-rewriting snapshots and restarts,
inline-row ids from the shared counter, DV subtraction, and a
change-feed join that resolves deleted rows by rowid."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark import Lake
from pg_ducklake_spark.errors import LakeError


def _rows(df):
    return {(r.rowid, r.k, r.v) for r in df.collect()}


def test_rowid_unique_and_stable_across_appends(spark, lake):
    lake.create_table("t", "k int, v string")
    lake.insert(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    )
    first = _rows(lake.table("t", with_rowid=True))
    assert len({rid for rid, *_ in first}) == 2
    lake.insert(
        "t", spark.createDataFrame([(3, "c"), (4, "d")], "k int, v string")
    )
    after = _rows(lake.table("t", with_rowid=True))
    # appends never re-id existing rows
    assert first <= after
    assert len({rid for rid, *_ in after}) == 4


def test_rowid_persisted_in_snapshot_log(spark, lake):
    """ADVICE r7: writers stamp row_id_start at commit (upstream stores
    it in ducklake_data_file) — the log itself carries the lineage, so
    checkpoint replay and full-log replay cannot diverge."""
    lake.create_table("t", "k int, v string")
    lake.insert(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    )
    lake.insert("t", spark.createDataFrame([(3, "c")], "k int, v string"))
    log = lake._log("t")
    starts = []
    for v in log.versions():
        for d in log.read_snapshot(v).get("add", []):
            assert d.get("row_id_start") is not None
            starts.append((d["row_id_start"], d["rows"]))
    # ranges are disjoint and ordered
    starts.sort()
    for (s1, n1), (s2, _n2) in zip(starts, starts[1:]):
        assert s1 + n1 <= s2
    # persisted ids == served ids
    served = sorted(r.rowid for r in lake.table("t", with_rowid=True).collect())
    assert served == sorted(
        rid for s, n in starts for rid in range(s, s + n)
    )


def test_rowid_no_shift_when_pending_txn_resolves(spark, lake):
    """With persisted row_id_start, a write that lands while a
    multi-table transaction is still invisible reserves ids past the
    pending ranges — resolution neither shifts nor overlaps ids."""
    lake.create_table("a", "k int, v string")
    lake.create_table("b", "k int, v string")
    lake.insert("a", spark.createDataFrame([(1, "x")], "k int, v string"))
    import os

    from pg_ducklake_spark.catalog import TXN_DIR

    with lake.transaction():
        lake.insert(
            "a", spark.createDataFrame([(2, "p"), (3, "q")], "k int, v string")
        )
        lake.insert("b", spark.createDataFrame([(9, "z")], "k int, v string"))
    marker_dir = os.path.join(lake.path, TXN_DIR)
    markers = [f for f in os.listdir(marker_dir) if f.endswith(".commit")]
    assert markers
    hidden = os.path.join(marker_dir, markers[0] + ".hidden")
    os.rename(os.path.join(marker_dir, markers[0]), hidden)
    lake2 = Lake.attach(spark, lake.path, read_only=False)  # replays WITHOUT the marker
    assert lake2.table("a").count() == 1  # txn invisible
    ids_before = {
        (r.k, r.rowid) for r in lake2.table("a", with_rowid=True).collect()
    }
    lake2.insert("a", spark.createDataFrame([(4, "w")], "k int, v string"))
    os.rename(hidden, os.path.join(marker_dir, markers[0]))  # resolve
    lake3 = Lake.attach(spark, lake.path, read_only=False)
    rows = lake3.table("a", with_rowid=True).collect()
    assert sorted(r.k for r in rows) == [1, 2, 3, 4]
    ids = [r.rowid for r in rows]
    assert len(set(ids)) == 4  # no overlap between pending and new write
    after = {(r.k, r.rowid) for r in rows}
    assert ids_before <= after  # no shift of already-visible ids


def test_rowid_ranges_disjoint_under_concurrent_writers(spark, lake):
    """Commit-time stamping must survive the commit race: concurrent
    writers (separate Lake instances = separate replay caches) re-stamp
    on every os.link collision, so the persisted ranges stay disjoint
    and every row keeps a unique id."""
    import threading

    lake.create_table("t", "k int, v string")
    lakes = [Lake.attach(spark, lake.path, read_only=False) for _ in range(4)]
    errs = []

    def work(w, lk):
        try:
            for i in range(4):
                lk.insert(
                    "t",
                    spark.createDataFrame(
                        [(w * 100 + i * 10 + j, f"w{w}") for j in range(3)],
                        "k int, v string",
                    ),
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=work, args=(w, lk))
        for w, lk in enumerate(lakes)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    log = lake._log("t")
    ranges = []
    for v in log.versions():
        for d in log.read_snapshot(v).get("add", []):
            assert d.get("row_id_start") is not None
            ranges.append((d["row_id_start"], d["rows"]))
    ranges.sort()
    for (s1, n1), (s2, _n2) in zip(ranges, ranges[1:]):
        assert s1 + n1 <= s2, f"overlapping rowid ranges {ranges}"
    fresh = Lake.attach(spark, lake.path, read_only=False)
    rows = fresh.table("t", with_rowid=True).collect()
    assert len(rows) == 48 and len({r.rowid for r in rows}) == 48


def test_rowid_checkpoint_replay_matches_full_replay(spark, lake):
    """The ADVICE r7 divergence scenario: with files REMOVED before a
    checkpoint (DV-threshold rewrite), a pre-r8 checkpoint compacted
    ids so a corrupt-checkpoint fallback to full replay silently
    re-identified rows. With commit-time persisted row_id_start, the
    checkpoint and a from-scratch log replay must agree exactly."""
    import glob
    import os

    from pg_ducklake_spark.catalog import CHECKPOINT_EVERY

    lake.create_table(
        "t", "k int, v string", options={"rewrite_delete_threshold": 0.01}
    )
    # enough commits to roll a checkpoint, with deletes that REWRITE
    # files (threshold 1%) so early rowid ranges become gaps
    n = 0
    while lake.current_snapshot("t") < CHECKPOINT_EVERY + 2:
        lake.insert(
            "t",
            spark.createDataFrame(
                [(n * 10 + i, f"v{n}") for i in range(4)], "k int, v string"
            ),
        )
        if n % 3 == 2:
            lake.delete("t", f"k = {n * 10}")  # rewrites that file
        n += 1
    log = lake._log("t")
    assert glob.glob(os.path.join(log.log_dir, "*.ckpt.json")), "no checkpoint rolled"
    with_ckpt = {(r.k, r.rowid) for r in lake.table("t", with_rowid=True).collect()}
    # force full-log replay: drop every checkpoint and the cached state
    for f in glob.glob(os.path.join(log.log_dir, "*.ckpt.json")):
        os.unlink(f)
    from pg_ducklake_spark import Lake

    fresh = Lake.attach(spark, lake.path, read_only=False)
    full = {(r.k, r.rowid) for r in fresh.table("t", with_rowid=True).collect()}
    assert full == with_ckpt


def test_rowid_stable_across_restart(spark, lake):
    lake.create_table("t", "k int, v string")
    for batch in ([(1, "a")], [(2, "b"), (3, "c")]):
        lake.insert(
            "t", spark.createDataFrame(batch, "k int, v string")
        )
    before = _rows(lake.table("t", with_rowid=True))
    reopened = Lake(spark, lake.path)
    assert _rows(reopened.table("t", with_rowid=True)) == before


def test_rowid_covers_inline_rows_without_collision(spark, lake):
    lake.create_table(
        "t", "k int, v string", options={"data_inlining_row_limit": 10}
    )
    lake.insert_rows("t", [{"k": 1, "v": "inline1"}, {"k": 2, "v": "inline2"}])
    lake.flush_inlined_data("t")
    lake.insert_rows("t", [{"k": 3, "v": "inline3"}])
    got = _rows(lake.table("t", with_rowid=True))
    assert len(got) == 3
    assert len({rid for rid, *_ in got}) == 3  # file ∪ inline ids disjoint


def test_rowid_skips_deleted_positions(spark, lake):
    lake.create_table("t", "k int, v string")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "k int, v string"
        ),
    )
    v1 = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    lake.delete("t", "k IN (2, 5)")
    v2 = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    # survivors keep their ids (DV mode does not rewrite the file)
    assert v2 == {k: rid for k, rid in v1.items() if k not in (2, 5)}


def test_rowid_change_feed_join(spark, lake):
    """The lineage use-case: resolve the change feed's deleted rows back
    to their pre-delete rowids by joining on the key."""
    lake.create_table("t", "k int, v string")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "k int, v string"
        ),
    )
    v_before = lake.current_snapshot("t")
    pre = lake.table("t", with_rowid=True, version=v_before)
    lake.delete("t", "k >= 6")
    feed = lake.table_changes("t", v_before)
    deleted = feed.filter(F.col("_change_type").like("delete%")).select("k")
    gone = pre.join(deleted, "k").select("rowid", "k").collect()
    assert sorted(r.k for r in gone) == [6, 7]
    # and the same rowids are absent from the current view
    now_ids = {r.rowid for r in lake.table("t", with_rowid=True).collect()}
    assert not ({r.rowid for r in gone} & now_ids)


def test_rowid_name_clash_rejected(spark, lake):
    lake.create_table("t", "rowid int, v string")
    with pytest.raises(LakeError):
        lake.table("t", with_rowid=True)


def test_scan_with_rowid_prunes_and_filters(spark, lake):
    lake.create_table("t", "k int, v string")
    for lo in (0, 100):
        lake.insert(
            "t",
            spark.createDataFrame(
                [(lo + i, f"v{lo+i}") for i in range(5)], "k int, v string"
            ),
        )
    got = lake.scan("t", "k >= 100", with_rowid=True).collect()
    assert sorted(r.k for r in got) == [100, 101, 102, 103, 104]
    all_ids = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    assert {r.k: r.rowid for r in got} == {
        k: rid for k, rid in all_ids.items() if k >= 100
    }


def test_rowid_through_freeze(spark, lake, tmp_path):
    """A frozen lake reconstructs the same rowids from the exported
    row_id_start column (upstream keeps it in ducklake_data_file)."""
    lake.create_table(
        "t", "k int, v string", options={"data_inlining_row_limit": 2}
    )
    lake.insert(
        "t",
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "k int, v string"
        ),
    )
    lake.insert_rows("t", [{"k": 99, "v": "inline"}])
    lake.delete("t", "k = 3")
    live = {(r.k, r.rowid) for r in lake.table("t", with_rowid=True).collect()}
    out = str(tmp_path / "r.ducklake")
    lake.freeze(out)
    frozen = Lake.attach_frozen(spark, out)
    got = {(r.k, r.rowid) for r in frozen.table("t", with_rowid=True).collect()}
    assert got == live
    # and the plain read is unchanged
    assert frozen.table("t").count() == 6


def test_rowid_survives_schema_evolution(spark, lake):
    """Renames and added columns are metadata-only: rowids of existing
    rows do not move."""
    lake.create_table("t", "k int, v string")
    lake.insert(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    )
    before = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    lake.rename_column("t", "v", "val")
    lake.add_column("t", "extra", "int")
    after = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    assert after == before
    # a historical read reproduces the same ids too
    v1 = {r.k: r.rowid
          for r in lake.table("t", with_rowid=True, version=2).collect()}
    assert v1 == before
