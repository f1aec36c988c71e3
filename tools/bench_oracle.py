"""Time the DuckDB-oracle side of the headline bench queries.

This is the local stand-in for "BASELINE at the same scale factor"
(BASELINE.md: bench target = within 2x of a DuckDB-executed run of the
same queries on the same data). Mirrors bench.py methodology: 2 warmup +
3 timed iterations over /root/testdata/sf0.1 (or argv[1]).

Usage: python tools/bench_oracle.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE, ITERS, WARMUP
from pg_ducklake_spark.plans import ORACLES, TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    names = [n for n in HEADLINE if n in ORACLES]
    skipped = [n for n in HEADLINE if n not in ORACLES]
    for _ in range(WARMUP):
        for name in names:
            con.execute(ORACLES[name]).fetchall()
    sums = dict.fromkeys(names, 0.0)
    for _ in range(ITERS):
        for name in names:
            t0 = time.time()
            con.execute(ORACLES[name]).fetchall()
            sums[name] += time.time() - t0
    times = {n: round(v / ITERS, 4) for n, v in sums.items()}
    print(
        json.dumps(
            {
                "metric": "oracle_headline_sweep_total",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "skipped": skipped,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
