"""operators/bloom.py — distributed Bloom filter build/probe/prune.
Guarantees under test: zero false negatives, bounded word-table size,
pruning = superset of the true semi-join, and cross-batch mergeability
(bit_or of two filters == filter of the union)."""

from pyspark.sql import functions as F

from pg_ducklake_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_prune,
)


def test_no_false_negatives_and_bounded_words(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    bloom = bloom_build(keys, "k", m=1 << 12, k=4)
    assert bloom.count() <= (1 << 12) // 32
    probed = bloom_contains(keys, "k", bloom, m=1 << 12, k=4)
    assert probed.filter(~F.col("bloom_hit")).count() == 0  # all members hit


def test_prune_is_superset_of_semijoin(spark):
    keys = spark.range(0, 300).select((F.col("id") * 3).alias("k"))
    facts = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("v")
    )
    bloom = bloom_build(keys, "k", m=1 << 13, k=4)
    pruned = bloom_prune(facts, "k", bloom, m=1 << 13, k=4)
    true_semi = facts.join(keys, "k", "left_semi")
    n_pruned, n_true, n_facts = pruned.count(), true_semi.count(), facts.count()
    assert n_true <= n_pruned < n_facts  # superset, and it actually pruned
    # exactness after the real join: pruned ∘ semi == semi
    assert pruned.join(keys, "k", "left_semi").count() == n_true


def test_duplicate_rows_survive_probe(spark):
    """r8 regression (VERDICT r8 item 1): the probe must preserve row
    multiplicity. Facts with repeated (key, payload) tuples — pruned ∘
    semi must equal the plain semi in COUNT and SUM, not just distinct
    membership."""
    keys = spark.range(0, 50).select((F.col("id") * 2).alias("k"))
    # 10 identical copies of every fact row: (k, v) repeats exactly.
    facts = (
        spark.range(0, 200)
        .select((F.col("id") % 20).alias("k"), F.lit(7).alias("v"))
    )
    bloom = bloom_build(keys, "k", m=1 << 12, k=4)
    pruned = bloom_prune(facts, "k", bloom, m=1 << 12, k=4)
    exact = pruned.join(keys, "k", "left_semi")
    true_semi = facts.join(keys, "k", "left_semi")
    got = exact.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    want = true_semi.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (want["n"], want["s"])
    assert got["n"] == 100  # 10 even keys in [0,20) × 10 copies each


def test_null_keys_miss(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    facts = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "k bigint, v string"
    )
    bloom = bloom_build(keys, "k", m=1 << 12, k=4)
    probed = bloom_contains(facts, "k", bloom, m=1 << 12, k=4)
    rows = {r["v"]: r["bloom_hit"] for r in probed.collect()}
    assert rows["a"] is True and rows["b"] is False and rows["c"] is False


def test_oversized_filter_broadcast_fallback(spark, monkeypatch):
    """Force the > LITERAL_MAX_WORDS path: k broadcast probes must give
    the same answers (incl. duplicates) as the literal projection."""
    from pg_ducklake_spark.operators import bloom as bl

    keys = spark.range(0, 100).select((F.col("id") * 3).alias("k"))
    facts = spark.range(0, 400).select(
        (F.col("id") % 40).alias("k"), (F.col("id") % 5).alias("v")
    )
    bloom = bloom_build(keys, "k", m=1 << 12, k=4)
    lit_rows = sorted(
        (r["k"], r["v"], r["bloom_hit"])
        for r in bloom_contains(facts, "k", bloom, m=1 << 12, k=4).collect()
    )
    monkeypatch.setattr(bl, "LITERAL_MAX_WORDS", 1)
    bc_rows = sorted(
        (r["k"], r["v"], r["bloom_hit"])
        for r in bloom_contains(facts, "k", bloom, m=1 << 12, k=4).collect()
    )
    assert lit_rows == bc_rows
    assert len(bc_rows) == 400  # multiplicity preserved on the join path


def test_filters_merge_by_bit_or(spark):
    """Partial filters built on disjoint batches OR together into the
    filter of the union — the property that lets 1000 executors build
    one bloom with a single metadata-sized exchange."""
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 200).select(F.col("id").alias("k"))
    both = a.unionByName(b)
    merged = (
        bloom_build(a, "k", m=1 << 12)
        .unionByName(bloom_build(b, "k", m=1 << 12))
        .groupBy("word")
        .agg(F.expr("bit_or(wv)").alias("wv"))
    )
    direct = bloom_build(both, "k", m=1 << 12)
    diff = merged.join(direct, "word", "full_outer").filter(
        ~(merged.wv.eqNullSafe(direct.wv))
    )
    assert diff.count() == 0
