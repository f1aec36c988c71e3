"""Direct-insert micro-benchmark — the ``append_batch`` analog of the
reference's test/benchmark/bench_direct_insert.sh (batch sizes
100/1k/10k, 2 warmup + 5 timed iterations, avg ms + rows/sec + speedup
of the inline fast path vs the Spark parquet-write path).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_ducklake_spark import Lake
from pg_ducklake_spark.session import get_spark

BATCHES = [100, 1000, 10000]
WARMUP = 2
ITERS = 5


def main() -> None:
    spark = get_spark("bench_direct_insert")
    root = tempfile.mkdtemp(prefix="bench_di_")
    results = {}
    try:
        for n in BATCHES:
            cols = {
                "a": list(range(n)),
                "b": [f"val{i}" for i in range(n)],
                "c": [i * 0.5 for i in range(n)],
            }
            timings = {}
            for mode, limit in (("direct", 1_000_000), ("engine", 0)):
                lake = Lake(spark, f"{root}/{mode}_{n}")
                lake.create_table(
                    "t", "a bigint, b string, c double",
                    options={"data_inlining_row_limit": limit},
                )
                for _ in range(WARMUP):
                    lake.append_batch("t", cols)
                t0 = time.time()
                for _ in range(ITERS):
                    lake.append_batch("t", cols)
                avg_ms = (time.time() - t0) / ITERS * 1000
                timings[mode] = avg_ms
            results[str(n)] = {
                "direct_avg_ms": round(timings["direct"], 2),
                "direct_rows_per_sec": round(n / (timings["direct"] / 1000), 1),
                "engine_avg_ms": round(timings["engine"], 2),
                "engine_rows_per_sec": round(n / (timings["engine"] / 1000), 1),
                "speedup": round(timings["engine"] / timings["direct"], 2),
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "append_batch_direct_insert",
                "unit": "ms",
                "batches": results,
                "warmup_iters": WARMUP,
                "timed_iters": ITERS,
            }
        )
    )


if __name__ == "__main__":
    main()
