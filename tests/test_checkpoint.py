"""Catalog checkpoints: cold-start replay is bounded by the checkpoint
interval; state round-trips exactly through the rollup."""

import os

from pg_ducklake_spark import Lake
from pg_ducklake_spark.catalog import CHECKPOINT_EVERY, SnapshotLog


def test_checkpoint_written_and_used(spark, lake, tmp_path):
    lake.create_table("t", "a int", options={"data_inlining_row_limit": 10})
    n_commits = CHECKPOINT_EVERY + 5
    for i in range(n_commits - 1):  # -1: create was commit #1
        lake.insert_rows("t", [{"a": i}])
    log_dir = os.path.join(lake._table_dir("t"), "_ducklake_log")
    ckpts = [f for f in os.listdir(log_dir) if f.endswith(".ckpt.json")]
    assert len(ckpts) == 1
    assert int(ckpts[0].split(".")[0]) == CHECKPOINT_EVERY

    # a fresh attach replays from the checkpoint, state identical
    fresh = Lake.attach(spark, lake.path, read_only=False)
    st_fresh = fresh._state("t")
    st_orig = lake._state("t")
    assert st_fresh.snapshot_id == st_orig.snapshot_id == n_commits
    assert len(st_fresh.inline_rows) == len(st_orig.inline_rows) == n_commits - 1
    assert [s.snapshot_id for s in st_fresh.history] == list(range(1, n_commits + 1))
    assert fresh.table("t").count() == n_commits - 1

    # time travel below and above the checkpoint both work
    assert fresh.table("t", version=CHECKPOINT_EVERY - 1).count() == CHECKPOINT_EVERY - 2
    assert fresh.table("t", version=CHECKPOINT_EVERY + 2).count() == CHECKPOINT_EVERY + 1


def test_corrupt_checkpoint_falls_back(spark, lake):
    lake.create_table("t", "a int", options={"data_inlining_row_limit": 10})
    for i in range(CHECKPOINT_EVERY):
        lake.insert_rows("t", [{"a": i}])
    log_dir = os.path.join(lake._table_dir("t"), "_ducklake_log")
    ckpt = [f for f in os.listdir(log_dir) if f.endswith(".ckpt.json")][0]
    with open(os.path.join(log_dir, ckpt), "w") as f:
        f.write("{corrupt")
    log = SnapshotLog(lake._table_dir("t"))
    state = log.replay()
    assert state.snapshot_id == CHECKPOINT_EVERY + 1
    assert len(state.inline_rows) == CHECKPOINT_EVERY
