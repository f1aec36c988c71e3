"""Config-sweep harness for the headline bench.

Runs the bench.py headline sweep (reduced iteration count for fast
turnaround) under several Spark runtime-config combinations and prints
per-combo totals, so the shipped bench.py configuration is chosen by
measurement, not guesswork. All knobs tried here are *runtime* SQL confs
(settable per-session), so whatever wins can be applied inside bench.py
without rebuilding the JVM session.

Usage: python tools/bench_tune.py [sf_dir] [--iters N] [--warmup N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE

COMBOS = {
    # r4 shipped config: AQE off, shuffle=32 (from session), 4MB splits.
    "r4_shipped": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    },
    "aqe_on_sp32": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    },
    "aqe_off_sp8": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    },
    "aqe_on_sp8": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    },
    "aqe_off_sp8_split16m": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    },
    "aqe_off_sp8_split128m": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    },
    "aqe_off_sp4_split128m": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    },
    "aqe_off_sp16_split128m": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    },
    "aqe_on_sp8_split16m_par1st_off": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    },
}


def run_sweep(spark, sf_dir, names, warmup, iters):
    from pg_ducklake_spark.plans import QUERIES

    for _ in range(warmup):
        for name in names:
            QUERIES[name](spark, sf_dir).collect()
    totals = dict.fromkeys(names, 0.0)
    for _ in range(iters):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            totals[name] += time.time() - t0
    return {n: round(v / iters, 4) for n, v in totals.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--combos", default=None, help="comma-list of combo names")
    args = ap.parse_args()

    from pg_ducklake_spark.plans import QUERIES, TABLES, t as _t
    from pg_ducklake_spark.session import get_spark

    spark = get_spark("bench-tune")
    spark.sql("SELECT 1").collect()
    for tbl in TABLES:
        if os.path.exists(f"{args.sf_dir}/{tbl}.parquet"):
            _t(spark, args.sf_dir, tbl)

    names = [n for n in HEADLINE if n in QUERIES]
    combo_names = args.combos.split(",") if args.combos else list(COMBOS)
    results = {}
    for cname in combo_names:
        conf = COMBOS[cname]
        for k, v in conf.items():
            spark.conf.set(k, v)
        times = run_sweep(spark, args.sf_dir, names, args.warmup, args.iters)
        total = round(sum(times.values()), 4)
        results[cname] = {"total": total, "queries": times}
        print(json.dumps({"combo": cname, "total": total}), flush=True)
    best = min(results, key=lambda c: results[c]["total"])
    print(json.dumps({"best": best, "results": results}))


if __name__ == "__main__":
    main()
