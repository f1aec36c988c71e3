"""Extension-settings parity (r8, upstream ducklake settings +
ducklake_settings(); ducklake_feature_coverage.md:80-83 lists both as
unsupported in the reference): the commit-retry policy knobs
(max_retry_count / retry_wait_ms / retry_backoff) honored by the
optimistic-commit loop, and the settings() instance-metadata function
incl. its SQL binding and the frozen export rows."""

import json
import os
import time

import duckdb
import pytest

from pg_ducklake_spark.errors import ConcurrentModificationError, LakeError


def test_settings_function_and_scopes(spark, lake):
    rows = {r.name: (r.value, r.scope) for r in lake.settings().collect()}
    assert rows["data_path"] == (lake.path, "instance")
    assert rows["read_only"] == ("false", "instance")
    assert rows["max_retry_count"] == ("20", "default")
    lake.set_option("max_retry_count", 5)
    lake.set_option("parquet_compression", "zstd")
    rows = {r.name: (r.value, r.scope) for r in lake.settings().collect()}
    assert rows["max_retry_count"] == ("5", "lake")
    assert rows["parquet_compression"] == ("zstd", "lake")
    # SQL table-function binding (both spellings)
    got = lake.sql(
        "SELECT value FROM ducklake_settings() WHERE name = 'max_retry_count'"
    ).collect()
    assert got[0].value == "5"
    got = lake.sql(
        "SELECT count(*) AS n FROM settings() WHERE scope = 'instance'"
    ).collect()
    assert got[0].n == 4


def test_retry_knobs_are_lake_scope_only(spark, lake):
    lake.create_table("t", "x int")
    with pytest.raises(LakeError, match="lake-scope"):
        lake.set_option("retry_wait_ms", 5, table="t")
    with pytest.raises(LakeError, match="lake-scope"):
        lake.set_option("retry_backoff", 2.0, schema="main")


def test_commit_retry_honors_configured_policy(spark, lake, monkeypatch):
    """Induce persistent commit contention (every next-version slot
    pre-claimed) and observe the configured attempt count and the
    geometric backoff schedule."""
    lake.create_table("t", "x int")
    lake.set_option("max_retry_count", 3)
    lake.set_option("retry_wait_ms", 8)
    lake.set_option("retry_backoff", 2.0)
    log = lake._log("t")
    # every link into the snapshot log collides, as if another writer
    # always wins the slot race
    real_link = os.link

    def contended_link(src, dst, *a, **kw):
        if os.path.dirname(dst) == log.log_dir:
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", contended_link)
    sleeps: list[float] = []

    class _TimeShim:
        def sleep(self, s):
            sleeps.append(s)

        def __getattr__(self, item):
            return getattr(time, item)

    import pg_ducklake_spark.catalog as _cat

    monkeypatch.setattr(_cat, "time", _TimeShim())
    with pytest.raises(ConcurrentModificationError, match="after 3 retries"):
        lake.insert(
            "t", spark.createDataFrame([(1,)], "x int")
        )
    assert sleeps == [0.008, 0.016, 0.032]  # wait_ms * backoff^attempt


def test_settings_rows_in_frozen_export(spark, lake, tmp_path):
    lake.create_table("t", "x int")
    lake.insert("t", spark.createDataFrame([(1,)], "x int"))
    lake.set_option("retry_backoff", 3.0)
    out = str(tmp_path / "s.ducklake")
    lake.freeze(out)
    con = duckdb.connect(out, read_only=True)
    meta = dict(
        con.execute("SELECT key, value FROM ducklake_metadata").fetchall()
    )
    con.close()
    assert meta["setting:retry_backoff"] == "3.0"
    assert meta["setting:max_retry_count"] == "20"  # default travels too


def test_settings_inside_string_literal_untouched(spark, lake):
    """ADVICE r8: the settings() SQL binding must not rewrite matches
    inside string literals or -- comments."""
    got = lake.sql(
        "SELECT 'call settings() later' AS msg -- settings() here too"
    ).collect()
    assert got[0].msg == "call settings() later"
    # and the real call still binds in the same statement
    got = lake.sql(
        "SELECT 'settings()' AS lit, count(*) AS n FROM settings()"
    ).collect()
    assert got[0].lit == "settings()" and got[0].n >= 4


def test_commit_explicit_max_retries_beats_policy(spark, lake, monkeypatch):
    """ADVICE r8: an explicit commit(max_retries=...) must win over the
    wired retry policy instead of being silently overwritten."""
    import os as _os

    lake.create_table("t", "x int")
    lake.set_option("max_retry_count", 10)
    log = lake._log("t")
    real_link = os.link

    def contended_link(src, dst, *a, **kw):
        if _os.path.dirname(dst) == log.log_dir:
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(os, "link", contended_link)
    attempts: list[float] = []

    class _TimeShim:
        def sleep(self, s):
            attempts.append(s)

        def __getattr__(self, item):
            return getattr(time, item)

    import pg_ducklake_spark.catalog as _cat

    monkeypatch.setattr(_cat, "time", _TimeShim())
    with pytest.raises(ConcurrentModificationError, match="after 2 retries"):
        log.commit({"add": [], "remove": []}, max_retries=2)
    assert len(attempts) == 2  # caller's limit, not the policy's 10
