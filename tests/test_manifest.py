"""Count-discipline guard (VERDICT r8 item 3): a new ``@query`` cannot
ship without bumping this manifest constant in the same commit — and the
bump is the reviewer's cue that the full oracle sweep
(``tools/check_correctness.py``) was re-run over the grown library.

Round 8 shipped a red query precisely because one landed after the last
sweep; this makes that path loud."""

# Bump ONLY together with a clean full-sweep run at sf0.01.
QUERY_MANIFEST_COUNT = 213


def test_query_count_matches_manifest():
    from pg_ducklake_spark.plans import QUERIES

    assert len(QUERIES) == QUERY_MANIFEST_COUNT, (
        f"plan library has {len(QUERIES)} queries but the manifest says "
        f"{QUERY_MANIFEST_COUNT} — re-run tools/check_correctness.py over "
        "the full library, then bump QUERY_MANIFEST_COUNT in this commit"
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
