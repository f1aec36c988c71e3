"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_ducklake_spark.plans import QUERIES
from pg_ducklake_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "events_by_type",
    "events_daily",
    "events_sessionized_gap",
    "rel_window_rank",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_quality_scores",
    "sim_bruteforce_topk",
    "sim_lsh_bucket_topk",
    "ts_asof_join",
    "stats_price_quantity_corr",
    "pipe_filter_dedup_stats",
]


WARMUP = 2
ITERS = 3


def main() -> None:
    """Mirrors the reference's benchmark methodology (2 warmup + timed
    iterations, report averages — test/benchmark/bench_direct_insert.sh:
    17-19): warm runs measure the queries, not JIT/codegen compilation."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in QUERIES]
    for _ in range(WARMUP):
        for name in names:
            QUERIES[name](spark, sf_dir).collect()
    sums = dict.fromkeys(names, 0.0)
    for _ in range(ITERS):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            sums[name] += time.time() - t0
    times = {n: round(v / ITERS, 4) for n, v in sums.items()}
    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_sweep_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "warmup_iters": WARMUP,
                "timed_iters": ITERS,
            }
        )
    )


if __name__ == "__main__":
    main()
