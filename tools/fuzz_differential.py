"""Randomized differential testing: generate seeded random SQL from a
dialect-shared grammar, run the IDENTICAL text on Spark SQL and DuckDB
over the same parquet tables, and compare normalized results.

This complements the curated 171-query oracle gate with breadth the
hand-written queries can't reach: random predicate/aggregate/group-by
/join combinations surface dialect or execution divergences (null
ordering, type coercion, empty-group behavior, join duplicates) that a
fixed suite misses.

Grammar constraints keep the shared text honestly comparable:
- SUM/AVG only over integer columns (double sums are order-dependent
  and would need the engine-specific exact-aggregate machinery);
  MIN/MAX/COUNT/COUNT DISTINCT over anything.
- No LIMIT (the comparator is order-insensitive; LIMIT without a total
  order is legitimately nondeterministic).
- Numeric predicate literals are drawn from each column's actual
  min/max (sampled once via DuckDB) so filters hit data often but not
  always — empty results are compared too.
- Joins only along the schema's FK edges, inner only.

Usage: python tools/fuzz_differential.py [sf_dir] [--n N] [--seed S]
Prints one line per mismatch and a summary; exit code 1 on any
mismatch.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = {
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "float",
        "l_extendedprice": "float", "l_discount": "float", "l_tax": "float",
        "l_returnflag": "str", "l_linestatus": "str", "l_shipdate": "ts",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
        "o_totalprice": "float", "o_orderdate": "ts",
        "o_orderpriority": "str",
    },
    "customer": {
        "c_custkey": "int", "c_name": "str", "c_nationkey": "int",
        "c_acctbal": "float", "c_mktsegment": "str",
    },
    "part": {
        "p_partkey": "int", "p_name": "str", "p_brand": "str",
        "p_type": "str", "p_size": "int", "p_retailprice": "float",
    },
    "supplier": {
        "s_suppkey": "int", "s_name": "str", "s_nationkey": "int",
        "s_acctbal": "float",
    },
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "region": {"r_regionkey": "int", "r_name": "str"},
    "documents": {
        "doc_id": "int", "text": "str", "lang": "str", "source": "str",
        "n_chars": "int",
    },
}

# FK edges for the join variant: (left_table, left_col, right_table, right_col)
JOINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

_OPS_NUM = ["<", "<=", ">", ">=", "=", "<>"]


class Gen:
    def __init__(self, rng: random.Random, stats: dict):
        self.rng = rng
        self.stats = stats  # (table, col) -> (lo, hi) or [sample values]

    def pred(self, table: str, alias: str) -> str:
        rng = self.rng
        cols = [(c, k) for c, k in TABLES[table].items()]
        col, kind = rng.choice(cols)
        q = f"{alias}.{col}" if alias else col
        if kind == "int":
            lo, hi = self.stats[(table, col)]
            v = rng.randint(int(lo), max(int(hi), int(lo)))
            return f"{q} {rng.choice(_OPS_NUM)} {v}"
        if kind == "float":
            lo, hi = self.stats[(table, col)]
            v = round(rng.uniform(lo, hi), 2)
            return f"{q} {rng.choice(_OPS_NUM)} {v}"
        if kind == "ts":
            y = rng.randint(1992, 1999)
            m = rng.randint(1, 12)
            return f"{q} {rng.choice(['<', '>='])} TIMESTAMP '{y}-{m:02d}-01 00:00:00'"
        vals = self.stats[(table, col)]
        if vals and rng.random() < 0.6:
            v = rng.choice(vals).replace("'", "''")
            return f"{q} {rng.choice(['=', '<>'])} '{v}'"
        letter = rng.choice("ABCDEFGHIJKLMNOPRST")
        return f"{q} LIKE '{letter}%'"

    def aggs(self, table: str, alias: str, n: int) -> list[str]:
        rng = self.rng
        out = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
        cols = list(TABLES[table].items())
        for i in range(n):
            col, kind = rng.choice(cols)
            q = f"{alias}.{col}" if alias else col
            choice = rng.random()
            if choice < 0.3:
                out.append(f"CAST(COUNT(DISTINCT {q}) AS BIGINT) AS agg_{i}")
            elif choice < 0.6:
                out.append(f"MIN({q}) AS agg_{i}")
            elif choice < 0.9 or kind not in ("int",):
                out.append(f"MAX({q}) AS agg_{i}")
            else:
                out.append(f"CAST(SUM({q}) AS BIGINT) AS agg_{i}")
        return out

    def query(self) -> str:
        rng = self.rng
        join = rng.random() < 0.35
        if join:
            lt, lc, rt, rc = rng.choice(JOINS)
            frm = f"{lt} a JOIN {rt} b ON a.{lc} = b.{rc}"
            galias, gtable = ("a", lt) if rng.random() < 0.5 else ("b", rt)
            palias, ptable = ("a", lt) if rng.random() < 0.5 else ("b", rt)
        else:
            gtable = ptable = rng.choice(list(TABLES))
            galias = palias = ""
            frm = gtable
        str_cols = [c for c, k in TABLES[gtable].items() if k == "str"]
        group: list[str] = []
        if str_cols and rng.random() < 0.7:
            group = rng.sample(str_cols, k=min(len(str_cols), rng.randint(1, 2)))
        gq = [f"{galias}.{c}" if galias else c for c in group]
        sel = gq + self.aggs(gtable if not join else ptable,
                             palias, rng.randint(1, 3))
        preds = [self.pred(ptable, palias) for _ in range(rng.randint(0, 2))]
        sql = "SELECT " + ", ".join(sel) + " FROM " + frm
        if preds:
            sql += " WHERE " + f" {self.rng.choice(['AND', 'OR'])} ".join(preds)
        if gq:
            sql += " GROUP BY " + ", ".join(gq)
            if rng.random() < 0.3:
                sql += " HAVING COUNT(*) > " + str(rng.randint(0, 3))
        return sql


def collect_stats(con) -> dict:
    stats = {}
    for tbl, cols in TABLES.items():
        for col, kind in cols.items():
            if kind in ("int", "float"):
                lo, hi = con.execute(
                    f"SELECT MIN({col}), MAX({col}) FROM {tbl}"
                ).fetchone()
                stats[(tbl, col)] = (lo or 0, hi or 1)
            elif kind == "str":
                vals = [
                    r[0]
                    for r in con.execute(
                        f"SELECT DISTINCT {col} FROM {tbl}"
                        f" WHERE {col} IS NOT NULL ORDER BY {col} LIMIT 5"
                    ).fetchall()
                ]
                stats[(tbl, col)] = vals
    return stats


def run(sf_dir: str, n: int, seed: int, spark=None) -> list[tuple[str, str]]:
    """Returns a list of (sql, problem) mismatches; empty = all agree."""
    from check_correctness import norm_rows

    from pg_ducklake_spark.plans import t as read_table

    if spark is None:
        from pg_ducklake_spark.session import get_spark

        spark = get_spark("fuzz_differential")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{tbl}.parquet')"
        )
        read_table(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    gen = Gen(random.Random(seed), collect_stats(con))
    failures: list[tuple[str, str]] = []
    for i in range(n):
        sql = gen.query()
        try:
            sdf = spark.sql(sql)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # dialect gap on the Spark side
            failures.append((sql, f"spark error: {e}"))
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((sql, f"duckdb error: {e}"))
            continue
        problem = None
        if len(srows) != len(drows):
            problem = f"rowcount spark={len(srows)} duck={len(drows)}"
        else:
            sn, dn = norm_rows(scols, srows), norm_rows(dcols, drows)
            if sn != dn:
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:2]
                problem = f"values differ, e.g. {diff}"
        if problem:
            failures.append((sql, problem))
    return failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--seed", type=int, default=20260814)
    args = ap.parse_args()
    failures = run(args.sf_dir, args.n, args.seed)
    for sql, problem in failures:
        print(f"MISMATCH: {problem}\n  {sql}")
    print(f"{args.n - len(failures)}/{args.n} agree (seed={args.seed})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
