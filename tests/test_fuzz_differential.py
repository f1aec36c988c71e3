"""Seeded random differential SQL: the same generated text must produce
identical normalized results on Spark SQL and DuckDB (see
tools/fuzz_differential.py for the grammar and its constraints)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_random_queries_agree_across_engines(spark, sf_dir):
    from fuzz_differential import run

    failures = run(sf_dir, n=30, seed=20260814, spark=spark)
    assert not failures, failures[:3]
