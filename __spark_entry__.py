"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full oracle-paired plan library from
``pg_ducklake_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_ducklake_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pg_ducklake_spark.plans.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _driver_checked_names() -> set[str]:
    """Names that already appeared in any driver CORRECTNESS_r*.json —
    used to rotate never-sampled queries to the front so the driver's
    fixed-size sample covers the whole library across rounds."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(f) as fh:
                d = json.load(fh)
        except Exception:
            continue
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            checked.update(qs.keys())
    return checked


# Names fixed since their last driver sample — lead the ordering so the
# next CORRECTNESS file re-verifies the fix (VERDICT r8 item 6).
_RECHECK_FIRST = ("pipe_bloom_prejoin", "stats_bloom_membership")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 —
    recheck-listed names first, then never-driver-sampled names
    (self-rotating: the set recomputes from the committed CORRECTNESS
    files each round)."""
    checked = _driver_checked_names()
    recheck = [n for n in _RECHECK_FIRST if n in QUERIES]
    fresh = [n for n in QUERIES if n not in checked and n not in recheck]
    rest = [n for n in QUERIES if n in checked and n not in recheck]
    return {n: QUERIES[n] for n in recheck + fresh + rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    return dict(ORACLES)
