"""Seeded random schema-evolution differential: a Lake table and a
DuckDB mirror receive the same DDL+DML sequence and must agree on
columns and contents after every op, including historical-schema time
travel (see tools/fuzz_schema.py)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_random_schema_evolution_agrees_with_mirror(spark):
    from fuzz_schema import run

    problems = run(ops=18, seed=20260814, spark=spark)
    assert not problems, problems
