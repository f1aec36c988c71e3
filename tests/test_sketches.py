"""HLL cardinality and count-min heavy-hitter sketch behavior.

Cross-engine value parity is the oracle harness's job
(tools/check_correctness.py); these tests pin the sketches' own
mathematical guarantees on real data."""

from pg_ducklake_spark.plans import QUERIES


def test_hll_estimate_within_error_bound(spark, sf_dir):
    import math

    rows = QUERIES["stats_hll_distinct"](spark, sf_dir).collect()
    assert rows, "expected per-event-type rows"
    m = 512
    for r in rows:
        assert r["n_exact"] > 0
        assert 0 <= r["empty_registers"] <= m
        # The query emits the RAW estimate plus the (S, V) register
        # summaries; the standard small-range correction (linear
        # counting when raw < 2.5m and V > 0) is the consumer's job —
        # apply it here exactly as a client would.
        est = r["hll_raw"]
        if est < 2.5 * m and r["empty_registers"] > 0:
            est = m * math.log(m / r["empty_registers"])
        # HLL stderr at m=512 is ~4.6%; 25% is a generous CI that
        # still catches a broken register pipeline (off by 2x+)
        assert abs(est - r["n_exact"]) <= max(
            0.25 * r["n_exact"], 10
        ), f"{r['event_type']}: est {est} vs exact {r['n_exact']}"


def test_hll_register_sum_consistency(spark, sf_dir):
    # register_sum = s_present + empty * 2^24; with all registers empty
    # it would be 512 * 2^24 — every populated register strictly lowers it
    for r in QUERIES["stats_hll_distinct"](spark, sf_dir).collect():
        assert r["register_sum"] < 512 * (1 << 24)
        assert r["register_sum"] >= (1 << 24) * r["empty_registers"]


def test_hll_registers_merge_associatively(spark, sf_dir):
    """The property that makes HLL distributed: registers built on any
    partition of the data max-merge to exactly the whole-data sketch.
    Split events by parity of event_id, build registers per half, merge
    with max, compare against the one-pass registers."""
    from pyspark.sql import functions as F

    from pg_ducklake_spark.plans import t
    from pg_ducklake_spark.plans.sketches import _HLL_M, _rho

    ev = t(spark, sf_dir, "events")

    def regs(df):
        hashed = df.select(
            "event_type",
            F.expr(
                "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT)"
            ).alias("h"),
        )
        return (
            hashed.select(
                "event_type",
                (F.col("h") % _HLL_M).alias("bucket"),
                F.expr(_rho(f"(h DIV {_HLL_M})")).alias("rho"),
            )
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("reg"))
        )

    whole = {
        (r["event_type"], r["bucket"]): r["reg"] for r in regs(ev).collect()
    }
    a = regs(ev.filter(F.col("event_id") % 2 == 0))
    b = regs(ev.filter(F.col("event_id") % 2 == 1))
    merged = {}
    for r in a.collect() + b.collect():
        k = (r["event_type"], r["bucket"])
        merged[k] = max(merged.get(k, 0), r["reg"])
    assert merged == whole


def test_cms_never_undercounts(spark, sf_dir):
    rows = QUERIES["text_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 10
    counts = [r["exact_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], (
            f"CMS undercounted {r['token']}"
        )
        assert r["overcount"] == r["cms_estimate"] - r["exact_count"]


def test_bloom_no_false_negatives(spark, sf_dir):
    """The Bloom contract: every true member hits; the surplus over
    truth is a bounded false-positive count (audited per segment)."""
    rows = QUERIES["stats_bloom_membership"](spark, sf_dir).collect()
    assert rows, "no segments"
    total_probes = total_members = total_hits = total_fp = 0
    for r in rows:
        # hits = members + false positives exactly (no false negatives)
        assert r["n_bloom_hits"] == r["n_members"] + r["n_false_positives"]
        assert r["n_members"] <= r["n_probes"]
        total_probes += r["n_probes"]
        total_members += r["n_members"]
        total_hits += r["n_bloom_hits"]
        total_fp += r["n_false_positives"]
    non_members = total_probes - total_members
    if non_members >= 100:
        # 2^17 bits / k=4 over the fixture key set: fp rate stays small
        assert total_fp / non_members < 0.10
