"""Local replica of the driver's duckdb-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (exact string normalization — if
this passes, any value-hash scheme passes).

Usage: python tools/check_correctness.py [--plain-session] [sf_dir] [name_filter ...]

``--plain-session`` runs the sweep on a STOCK SparkSession (builder with
only a master, zero package confs) instead of ``get_spark``. This is the
driver-contract lane: get_spark's defaults (maxPartitionBytes, Arrow,
UDS, …) can mask bugs that only fire on an unconfigured session — the
r12 gate failure (rebalance()'s conf probe crashing when
spark.sql.files.maxPartitionBytes is unset) shipped precisely because
every builder-side check ran through get_spark.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pg_ducklake_spark.plans import ORACLES, QUERIES, TABLES
from pg_ducklake_spark.session import get_spark


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exactness is the goal
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:
        pass
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_value(r[i]) for i in order) for r in rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--plain-session"]
    plain = "--plain-session" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]
    if plain:
        from pyspark.sql import SparkSession

        # Environment only (not a Spark conf): Python workers must be
        # able to import this package for the mapInPandas kernels, same
        # as any external harness that has the repo on its sys.path.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        if repo_root not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
            )
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
        spark = (
            SparkSession.builder.appName("check_correctness_plain")
            .master(f"local[{cpus}]")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_correctness")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    n_pass = n_fail = n_nooracle = 0
    failures: list[str] = []
    for name, fn in QUERIES.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in ORACLES:
            n_nooracle += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sn, dn = norm_rows(scols, srows), norm_rows(dcols, drows)
            if sn != dn:
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_nooracle} rows-only"
        + (f"; failing: {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
