"""Seeded random DML differential: a Lake table and a DuckDB mirror
receive the same mutation sequence and must agree after every op,
including time-travel replays (see tools/fuzz_dml.py)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_random_dml_sequence_agrees_with_mirror(spark):
    from fuzz_dml import run

    problems = run(ops=20, seed=20260814, spark=spark)
    assert not problems, problems
