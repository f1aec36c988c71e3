"""Count-discipline guard (VERDICT r8 item 3): a new ``@query`` cannot
ship without bumping this manifest constant in the same commit — and the
bump is the reviewer's cue that the full oracle sweep
(``tools/check_correctness.py``) was re-run over the grown library.

Round 8 shipped a red query precisely because one landed after the last
sweep; this makes that path loud."""

# Bump ONLY together with a clean full-sweep run at sf0.01.
QUERY_MANIFEST_COUNT = 214


def test_query_count_matches_manifest():
    from pg_ducklake_spark.plans import QUERIES

    assert len(QUERIES) == QUERY_MANIFEST_COUNT, (
        f"plan library has {len(QUERIES)} queries but the manifest says "
        f"{QUERY_MANIFEST_COUNT} — re-run tools/check_correctness.py over "
        "the full library, then bump QUERY_MANIFEST_COUNT in this commit"
    )


def test_readme_counts_match_manifest():
    """VERDICT r9 #6: no hard-coded count in the tree may disagree with
    a guard. The README advertises the oracle-gate query count; this
    pins it to the manifest (and the suite count is deliberately NOT in
    the README — it points here instead)."""
    import os
    import re

    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as fh:
        text = fh.read()
    m = re.search(r"DuckDB-oracle gate: (\d+) queries", text)
    assert m, "README no longer advertises the oracle-gate count"
    assert int(m.group(1)) == QUERY_MANIFEST_COUNT
    assert not re.search(r"# \d+ tests", text), (
        "README hard-codes a pytest count again — point at "
        "tests/test_manifest.py instead"
    )


def test_every_oracle_names_a_query():
    from pg_ducklake_spark.plans import ORACLES, QUERIES

    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f"oracles without a queries() twin: {sorted(orphans)}"


def test_entry_exposes_full_library():
    """The driver sees __spark_entry__.queries(), not plans.QUERIES —
    the rotation must be a permutation, never a subset."""
    import __spark_entry__ as E
    from pg_ducklake_spark.plans import QUERIES

    assert set(E.queries()) == set(QUERIES)
    assert set(E.oracle_sql()) == set(E.queries())


def test_rotation_orders_by_staleness():
    """VERDICT r9 #8: after the recheck-first block, queries() must be
    ordered least-recently-driver-sampled first (non-decreasing
    last-sampled round), computed from the committed CORRECTNESS
    files — so every query gets re-verified on a bounded cadence."""
    import __spark_entry__ as E

    last = E._last_sampled_round()
    names = list(E.queries())
    n_recheck = len([n for n in E._RECHECK_FIRST if n in names])
    rounds = [last.get(n, 0) for n in names[n_recheck:]]
    assert rounds == sorted(rounds), (
        "rotation is not least-recently-sampled first"
    )
    # the committed history really distinguishes rounds (the sort is
    # doing work, not sorting a constant)
    assert len(set(rounds)) > 1
