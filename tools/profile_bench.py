"""Per-query build/exec breakdown of the headline bench (guide §1).

Usage: python tools/profile_bench.py [name_filter ...]

Same session settings and per-query conf as bench.py, 2 warmups then 3
timed iterations; prints per-query BUILD (DataFrame construction, incl.
any jobs a query runs while building) and EXEC (collect) means, sorted
by total descending — the round's target list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pg_ducklake_spark.plans import QUERIES, TABLES, t as _t
from pg_ducklake_spark.session import get_spark


def main() -> None:
    filters = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    spark.sql("SELECT 1").collect()
    for tbl in TABLES:
        if os.path.exists(f"{sf_dir}/{tbl}.parquet"):
            _t(spark, sf_dir, tbl)
    names = [n for n in bench.HEADLINE if n in QUERIES]
    if filters:
        names = [n for n in names if any(f in n for f in filters)]
    for _ in range(2):
        for name in names:
            bench._apply_query_conf(spark, name)
            QUERIES[name](spark, sf_dir).collect()
    build = dict.fromkeys(names, 0.0)
    exc = dict.fromkeys(names, 0.0)
    iters = 3
    for _ in range(iters):
        for name in names:
            bench._apply_query_conf(spark, name)
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            build[name] += t1 - t0
            exc[name] += t2 - t1
    rows = sorted(
        ((build[n] / iters, exc[n] / iters, n) for n in names),
        key=lambda r: -(r[0] + r[1]),
    )
    print(f"{'query':35s} {'build':>8} {'exec':>8} {'total':>8}")
    for b, e, n in rows:
        print(f"{n:35s} {b:8.3f} {e:8.3f} {b + e:8.3f}")
    print(
        json.dumps(
            {
                "build_total": round(sum(build.values()) / iters, 3),
                "exec_total": round(sum(exc.values()) / iters, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
