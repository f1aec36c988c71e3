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


def _last_sampled_round() -> dict[str, int]:
    """Query name -> highest round number whose driver
    CORRECTNESS_r{N}.json sampled it (0 = never sampled). Drives the
    staleness rotation: every query in the library has been sampled at
    least once by r9, so 'never-checked first' degenerated to arbitrary
    order — least-recently-sampled first gives every query a bounded
    re-verification cadence instead (VERDICT r9 #8)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                d = json.load(fh)
        except Exception:
            continue
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            for name in qs:
                if rnd > last.get(name, 0):
                    last[name] = rnd
    return last


# Names fixed/rewritten since their last driver sample — lead the
# ordering so the next CORRECTNESS file re-verifies the change on the
# driver's own harness (r11: the windows-kernel NULL guard, the BPE
# vocab-reduce widening, and the two re-pinned SCALEBENCH queries —
# spans and sq8 — belong at the front regardless of staleness).
_RECHECK_FIRST = (
    # r13: the three queries CORRECTNESS_r12 crashed via the
    # rebalance() conf-probe bug (plans/__init__.py — spark.conf.get
    # with an unparseable "" fallback on plain sessions) are re-fronted
    # so the one-line fix is driver-re-verified this round, plus one
    # representative per other rebalance-tagged family that was latently
    # affected (text_*, dedup simhash/spans/semantic/components, sim_*,
    # pii, graph via _spark_edges).
    "text_distinctive_terms",
    "pipe_length_buckets",
    "pipe_train_eval_split",
    "dedup_simhash_pairs",
    "dedup_substring_spans",
    "dedup_semantic_prune",
    "sim_lsh_bucket_topk",
    "text_pii_scan",
    "graph_triangle_census",
    "text_cms_heavy_hitters",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 —
    recheck-listed names first, then least-recently-driver-sampled
    first (never-sampled sorts as round 0, i.e. most stale). Ties keep
    the library's registration order; the ordering recomputes from the
    committed CORRECTNESS files each round, so the driver's fixed-size
    sample sweeps the whole library on a bounded cadence."""
    last = _last_sampled_round()
    recheck = [n for n in _RECHECK_FIRST if n in QUERIES]
    pos = {n: i for i, n in enumerate(QUERIES)}
    rest = sorted(
        (n for n in QUERIES if n not in recheck),
        key=lambda n: (last.get(n, 0), pos[n]),
    )
    return {n: QUERIES[n] for n in recheck + rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    return dict(ORACLES)
