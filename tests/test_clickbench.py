"""ClickBench literal-suite registration: the 43 queries exist, are all
oracle-paired, and a representative query returns exact expected shape.
Value correctness is pinned by the DuckDB oracle harness
(tools/check_correctness.py) over every cb_* entry."""

from pg_ducklake_spark.plans import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_clickbench_suite_registered():
    names = [n for n in QUERIES if n.startswith("cb_q")]
    assert len(names) == 43
    assert names == [f"cb_q{i:02d}" for i in range(43)]
    assert all(n in ORACLES for n in names)


def test_clickbench_q00_counts_hits(spark):
    got = QUERIES["cb_q00"](spark, SF).collect()
    assert got[0]["c"] == 6000  # one hits row per lineitem row


def test_clickbench_q07_group_shape(spark):
    rows = QUERIES["cb_q07"](spark, SF).collect()
    # counts descend; AdvEngineID nonzero everywhere
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["AdvEngineID"] != 0 for r in rows)
