"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total exec sec>, "unit": "sec",
   "queries": {name: sec, ...}, "plan_build_sec": <total build sec>,
   "sf": <sf>}

Methodology (mirrors the reference's warmup+avg shape,
test/benchmark/bench_direct_insert.sh:17-19):
- Each query's DataFrame is built once (Python plan construction +
  Catalyst analysis happen here); that client-side cost is reported
  separately as ``plan_build_sec`` because it is a constant per query
  — it does not grow with data volume, so at the 100 TB design point
  it amortizes to noise. The DuckDB-oracle counterpart
  (tools/bench_oracle.py) re-binds its SQL per iteration; DuckDB's
  bind+plan is ~1 ms/query, so excluding Spark's plan build keeps the
  *engine execution* comparison apples-to-apples.
- 2 warmup executions (JIT/codegen compile, OS page cache — both
  engines get the same warmth), then ``value`` = sum over queries of
  the mean wall time of 3 timed ``collect()`` executions: every scan,
  shuffle, join, and result transfer re-runs each iteration.
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
    # Full north-star families (dedup / similarity / text / time-series /
    # pipeline / event analytics) — the engine's flagship surface.
    "dedup_exact_groups",
    "dedup_simhash_pairs",
    "sim_embedding_near_dup",
    "pipe_crossmodal_dup_check",
    "pipe_embedding_quality_corr",
    "pipe_source_quota_cap",
    "ts_asof_gap_stats",
    "ts_range_join_conversions",
    "ts_time_bucket_rollup",
    "text_langid_confusion",
    "text_token_counts",
    "text_fingerprint_dups",
    "text_char_ngram_profile",
    "text_repetition_scores",
    "stats_value_moments",
    "events_value_quantiles",
    "events_retention",
    "events_purchase_funnel",
]


WARMUP = 2
ITERS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in QUERIES]
    # Session warmup: the first analysis after session start pays JVM
    # parser/analyzer class-loading (~3 s) — a once-per-process cost,
    # not a per-query one; absorb it before any query is measured.
    spark.sql("SELECT 1").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").limit(1).collect()
    dfs = {}
    build = {}
    for name in names:
        t0 = time.time()
        dfs[name] = QUERIES[name](spark, sf_dir)
        build[name] = time.time() - t0
    for _ in range(WARMUP):
        for name in names:
            dfs[name].collect()
    sums = dict.fromkeys(names, 0.0)
    for _ in range(ITERS):
        for name in names:
            t0 = time.time()
            dfs[name].collect()
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
                "plan_build_sec": round(sum(build.values()), 4),
                "total_incl_plan_build": round(total + sum(build.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "warmup_iters": WARMUP,
                "timed_iters": ITERS,
                "timed": "execution (DataFrame built once per query; "
                "client plan-construction reported in plan_build_sec)",
            }
        )
    )


if __name__ == "__main__":
    main()
