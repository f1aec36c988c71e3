"""MERGE INTO (upsert) — the Spark-native bonus operator, plus the
quick parity wins: require_commit_message enforcement, variant columns,
salted joins."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import LakeError


@pytest.fixture()
def t(spark, lake):
    lake.create_table("t", "k int, v string, n double")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k int, v string, n double"
        ),
    )
    return lake


def _src(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, n double")


def test_merge_upsert(spark, t):
    res = t.merge(
        "t",
        _src(spark, [(2, "B", 20.0), (4, "d", 4.0)]),
        on=["k"],
        when_matched_update={"v": "source.v", "n": "source.n"},
    )
    assert res == {"num_updated": 1, "num_deleted": 0, "num_inserted": 1}
    got = {r.k: (r.v, r.n) for r in t.table("t").collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_merge_update_expression_mixes_sides(spark, t):
    t.merge(
        "t",
        _src(spark, [(1, "x", 100.0)]),
        on=["k"],
        when_matched_update={"n": "target.n + source.n"},
        when_not_matched_insert=False,
    )
    got = {r.k: r.n for r in t.table("t").collect()}
    assert got[1] == 101.0 and got[2] == 2.0


def test_merge_delete_when_matched(spark, t):
    res = t.merge(
        "t",
        _src(spark, [(1, None, 0.0), (99, None, 0.0)]),
        on=["k"],
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert res["num_deleted"] == 1 and res["num_inserted"] == 0
    assert sorted(r.k for r in t.table("t").collect()) == [2, 3]


def test_merge_insert_only(spark, t):
    res = t.merge("t", _src(spark, [(3, "zz", 0.0), (5, "e", 5.0)]), on=["k"])
    assert res == {"num_updated": 0, "num_deleted": 0, "num_inserted": 1}
    got = {r.k: r.v for r in t.table("t").collect()}
    assert got[3] == "c" and got[5] == "e"  # matched row untouched


def test_merge_duplicate_source_keys_raise(spark, t):
    with pytest.raises(LakeError, match="duplicate keys"):
        t.merge(
            "t",
            _src(spark, [(1, "x", 0.0), (1, "y", 0.0)]),
            on=["k"],
            when_matched_update={"v": "source.v"},
        )


def test_merge_change_feed(spark, t):
    v = t.current_snapshot("t")
    t.merge(
        "t",
        _src(spark, [(2, "B", 20.0), (4, "d", 4.0)]),
        on=["k"],
        when_matched_update={"v": "source.v", "n": "source.n"},
    )
    ch = t.table_changes("t", v + 1, v + 1).collect()
    got = sorted((r._change_type, r.k) for r in ch)
    assert got == [
        ("insert", 4),
        ("update_postimage", 2),
        ("update_preimage", 2),
    ]


def test_merge_over_dv_deleted_rows(spark, t):
    """DV-deleted rows are not matchable: merging their key inserts."""
    t.delete("t", "k = 2")  # dv delete
    res = t.merge(
        "t",
        _src(spark, [(2, "new", 9.0)]),
        on=["k"],
        when_matched_update={"v": "source.v"},
    )
    assert res["num_inserted"] == 1 and res["num_updated"] == 0
    got = {r.k: r.v for r in t.table("t").collect()}
    assert got[2] == "new"


def test_require_commit_message_enforced(spark, t):
    t.set_option("require_commit_message", True, table="t")
    with pytest.raises(LakeError, match="commit message"):
        t.insert("t", _src(spark, [(9, "x", 0.0)]))
    with pytest.raises(LakeError, match="commit message"):
        t.delete("t", "k = 1")
    assert t.insert("t", _src(spark, [(9, "x", 0.0)]), message="add 9") == 1
    snaps = {r.snapshot_id: r.commit_message for r in t.snapshots("t").collect()}
    assert snaps[t.current_snapshot("t")] == "add 9"


def test_variant_column_roundtrip(spark, lake):
    """A25: real Spark VariantType through the lake (parquet tier)."""
    from pyspark.sql import types as T

    lake.create_table(
        "t", T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.VariantType())])
    )
    df = spark.createDataFrame([(1,), (2,)], "id long").select(
        "id",
        F.parse_json(
            F.when(F.col("id") == 1, '{"a": [1, {"b": 2}]}').otherwise('"scalar"')
        ).alias("v"),
    )
    lake.insert("t", df)
    got = lake.sql(
        "SELECT id, variant_get(v, '$.a[1].b', 'int') AS b, to_json(v) AS j "
        "FROM t ORDER BY id"
    ).collect()
    assert got[0].b == 2 and got[1].j == '"scalar"'
    # no-inline tier: variant refuses the inline buffer
    lake.set_option("data_inlining_row_limit", 10, table="t")
    with pytest.raises((ValueError, LakeError)):
        lake.insert_rows("t", [{"id": 3, "v": "{}"}])


def test_salted_join_equivalence(spark):
    from pg_ducklake_spark.operators.skew import salted_join, skew_profile

    big = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(2, 1), (3, 2)], "key int, payload int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "warm")], "key int, label string")
    plain = big.join(small, "key").groupBy("key", "label").count()
    salted = salted_join(big, small, "key", salt=8).groupBy("key", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    prof = skew_profile(big, "key", top=1).collect()[0]
    assert prof.key == 1 and prof.n == 1000


def test_merge_inline_guard_not_truncated(spark, lake):
    """A merge source with thousands of distinct keys still detects a
    matching unflushed inline row (the guard is a semi-join against the
    broadcast inline buffer — no driver collect, no key-count cap)."""
    lake.create_table("ti", "k int, v string")
    lake.set_option("data_inlining_row_limit", 10, table="ti")
    lake.insert_rows("ti", [{"k": 4999, "v": "inline"}])
    src = spark.range(5000).select(
        F.col("id").cast("int").alias("k"), F.lit("s").alias("v")
    )
    with pytest.raises(LakeError, match="flush"):
        lake.merge("ti", src, on=["k"], when_matched_update={"v": "source.v"})
    # a large source with NO matching key passes the guard and merges
    src2 = spark.range(10_000, 12_000).select(
        F.col("id").cast("int").alias("k"), F.lit("s").alias("v")
    )
    res = lake.merge("ti", src2, on=["k"])
    assert res["num_inserted"] == 2000


def test_merge_small_gate_is_bounded(spark):
    """_small never full-counts the source: limit(threshold+1) probes."""
    from pg_ducklake_spark.operators.merge import _small

    assert _small(spark.range(10).withColumnRenamed("id", "k"))
    assert not _small(
        spark.range(200_000).withColumnRenamed("id", "k"), threshold_rows=1000
    )


def test_merge_many_key_upsert_counts(spark, lake):
    """End-to-end merge with a multi-thousand-key source: update +
    insert counts and values come out exact."""
    lake.create_table("tb", "k int, v string")
    lake.insert(
        "tb",
        spark.range(3000).select(
            F.col("id").cast("int").alias("k"), F.lit("old").alias("v")
        ),
    )
    src = spark.range(1000, 5000).select(
        F.col("id").cast("int").alias("k"), F.lit("new").alias("v")
    )
    res = lake.merge("tb", src, on=["k"], when_matched_update={"v": "source.v"})
    assert res == {"num_updated": 2000, "num_deleted": 0, "num_inserted": 2000}
    got = lake.table("tb")
    assert got.count() == 5000
    assert got.filter("v = 'new'").count() == 4000
