"""Randomized differential SCHEMA EVOLUTION: apply a seeded random
sequence of DDL (ADD COLUMN [DEFAULT], DROP COLUMN, RENAME COLUMN,
widening ALTER TYPE) interleaved with DML (inserts, predicate updates/
deletes) to a Lake table AND mirror every op onto a plain DuckDB table,
comparing column lists and full contents after every step. Time travel
is then spot-checked at random earlier snapshots: the lake must return
the HISTORICAL column set and values (reference semantics:
test/regression/sql/time_travel.sql:13-18 — a version before ADD
COLUMN has the old shape), compared against a DuckDB replay of the op
log truncated at that step.

This exercises the orderings no curated test tries — e.g. add-with-
default over files written three schemas ago, rename-then-update via
the new name, widen-then-insert-then-drop — with an independent engine
as the referee for both current state and every historical snapshot.

Usage: python tools/fuzz_schema.py [--ops N] [--seed S] [--seeds a,b,c]
Exit code 1 on any divergence.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

_DUCK_TYPES = {"bigint": "BIGINT", "int": "INTEGER", "string": "VARCHAR",
               "double": "DOUBLE"}


def _lit(typ: str, rng: random.Random) -> tuple[object, str]:
    """(python value, SQL literal) for one random value of ``typ``."""
    if typ in ("bigint", "int"):
        v = rng.randint(0, 999)
        return v, str(v)
    if typ == "double":
        # 2-decimal values: exact in both engines, no float drift.
        v = rng.randint(0, 99999) / 100.0
        return v, repr(v)
    v = rng.choice(["red", "green", "blue", "cyan", "plum"])
    return v, f"'{v}'"


class Mirror:
    """DuckDB referee: same table, same op log, replayable."""

    def __init__(self):
        self.con = duckdb.connect()
        self.log: list[str] = []
        self.apply("CREATE TABLE f (id BIGINT, g VARCHAR, v BIGINT)")

    def apply(self, sql: str) -> None:
        self.con.execute(sql)
        self.log.append(sql)

    def state(self, con=None):
        con = con or self.con
        cols = [d[0] for d in con.execute("SELECT * FROM f LIMIT 0").description]
        rows = con.execute("SELECT * FROM f").fetchall()
        return cols, sorted(rows, key=repr)

    def replay(self, upto: int):
        con = duckdb.connect()
        for sql in self.log[: upto + 1]:  # +1: the CREATE TABLE
            con.execute(sql)
        return self.state(con)


def run(ops: int, seed: int, spark=None, verbose: bool = False,
        qualified: bool = False) -> list[str]:
    """``qualified=True`` runs the identical op sequence against a
    schema-namespaced table (``ns.f``), so every DDL/DML/time-travel/
    vacuum path is fuzzed through the round-6 namespace routing too."""
    from pg_ducklake_spark import Lake

    if spark is None:
        from pg_ducklake_spark.session import get_spark

        spark = get_spark("fuzz_schema")
    rng = random.Random(seed)
    tmp = tempfile.mkdtemp(prefix=f"fuzz_schema_{seed}_")
    problems: list[str] = []
    try:
        lake = Lake(spark, tmp)
        T = "ns.f" if qualified else "f"
        if qualified:
            lake.create_schema("ns")
        lake.create_table(
            T, "id bigint, g string, v bigint",
            options={"data_inlining_row_limit": 3},
        )
        mirror = Mirror()
        # (name, spark_type) in current order; id is never altered.
        cols: list[tuple[str, str]] = [("id", "bigint"), ("g", "string"),
                                       ("v", "bigint")]
        next_id = 0
        next_col = 0
        expected_tags: dict = {}
        expected_coltags: dict = {}
        # op-log index -> lake snapshot id, only for mirrored ops
        versions: list[tuple[int, int]] = []

        def lake_state(version=None):
            df = lake.table(T, version=version)
            return list(df.columns), sorted(
                (tuple(r) for r in df.collect()), key=repr
            )

        def record():
            versions.append((len(mirror.log) - 1, lake.current_snapshot(T)))

        for step in range(ops):
            mutable = [c for c in cols if c[0] != "id"]
            op = rng.choices(
                ["insert", "insert_inline", "add", "add_default", "drop",
                 "rename", "widen", "update", "delete", "vacuum", "flush",
                 "comment"],
                weights=[24, 10, 10, 10, 8 if len(mutable) > 1 else 0,
                         10, 6, 12, 10, 5, 5, 6],
            )[0]
            if op == "insert":
                n = rng.randint(2, 8)
                rows, lits = [], []
                for i in range(n):
                    vals, sqls = [next_id + i], [str(next_id + i)]
                    for _, typ in cols[1:]:
                        v, s = _lit(typ, rng)
                        vals.append(v)
                        sqls.append(s)
                    rows.append(tuple(vals))
                    lits.append("(" + ", ".join(sqls) + ")")
                next_id += n
                schema = ", ".join(f"{c} {t}" for c, t in cols)
                lake.insert(T, spark.createDataFrame(rows, schema))
                mirror.apply("INSERT INTO f VALUES " + ", ".join(lits))
                record()
            elif op == "insert_inline":
                # Under the inline limit: rows land in the buffer, so a
                # later rename must re-key buffered values too.
                vals, sqls = {"id": next_id}, [str(next_id)]
                for c, typ in cols[1:]:
                    v, s = _lit(typ, rng)
                    vals[c] = v
                    sqls.append(s)
                next_id += 1
                lake.insert_rows(T, [vals])
                mirror.apply(
                    "INSERT INTO f VALUES (" + ", ".join(sqls) + ")"
                )
                record()
            elif op in ("add", "add_default"):
                typ = rng.choice(["bigint", "string", "double"])
                name = f"c{next_col}"
                next_col += 1
                if op == "add_default":
                    _, lit = _lit(typ, rng)
                    lake.add_column(T, name, typ, default=lit)
                    mirror.apply(
                        f"ALTER TABLE f ADD COLUMN {name}"
                        f" {_DUCK_TYPES[typ]} DEFAULT {lit}"
                    )
                else:
                    lake.add_column(T, name, typ)
                    mirror.apply(
                        f"ALTER TABLE f ADD COLUMN {name} {_DUCK_TYPES[typ]}"
                    )
                cols.append((name, typ))
                record()
            elif op == "drop":
                name = rng.choice(mutable)[0]
                lake.drop_column(T, name)
                mirror.apply(f"ALTER TABLE f DROP COLUMN {name}")
                cols = [c for c in cols if c[0] != name]
                expected_coltags.pop(name, None)
                record()
            elif op == "rename":
                old = rng.choice(mutable)[0]
                new = f"c{next_col}"
                next_col += 1
                lake.rename_column(T, old, new)
                mirror.apply(f"ALTER TABLE f RENAME COLUMN {old} TO {new}")
                cols = [(new, t) if c == old else (c, t) for c, t in cols]
                if old in expected_coltags:
                    expected_coltags[new] = expected_coltags.pop(old)
                record()
            elif op == "widen":
                ints = [c for c in mutable if c[1] == "int"]
                target = rng.choice(ints) if ints else None
                if target is None:
                    # nothing to widen: add an int column instead so the
                    # widen path stays reachable later.
                    name = f"c{next_col}"
                    next_col += 1
                    lake.add_column(T, name, "int")
                    mirror.apply(f"ALTER TABLE f ADD COLUMN {name} INTEGER")
                    cols.append((name, "int"))
                else:
                    lake.alter_column_type(T, target[0], "bigint")
                    mirror.apply(
                        f"ALTER TABLE f ALTER {target[0]} SET DATA TYPE BIGINT"
                    )
                    cols = [
                        (c, "bigint") if c == target[0] else (c, t)
                        for c, t in cols
                    ]
                record()
            elif op == "update":
                nums = [c for c in mutable if c[1] in ("bigint", "int")]
                if not nums:
                    continue
                col = rng.choice(nums)[0]
                delta = rng.randint(1, 50)
                pred = f"id % {rng.randint(2, 5)} = 0"
                lake.update(T, {col: f"{col} + {delta}"}, pred)
                mirror.apply(
                    f"UPDATE f SET {col} = {col} + {delta} WHERE {pred}"
                )
                record()
            elif op == "delete":
                pred = f"id % {rng.randint(3, 7)} = {rng.randint(1, 2)}"
                lake.delete(T, pred)
                mirror.apply(f"DELETE FROM f WHERE {pred}")
                record()
            elif op == "comment":
                # COMMENT/tag metadata (round-6): tracked locally —
                # the interplay under test is persistence across the
                # other ops and re-keying under column rename.
                if rng.random() < 0.5:
                    val = rng.choice([None, "t-doc", "owner:x"])
                    lake.comment_on(T, val)
                    if val is None:
                        expected_tags.pop("comment", None)
                    else:
                        expected_tags["comment"] = val
                else:
                    col = rng.choice(mutable)[0]
                    val = rng.choice([None, "c-doc"])
                    lake.comment_on_column(T, col, val)
                    cur = expected_coltags.setdefault(col, {})
                    if val is None:
                        cur.pop("comment", None)
                    else:
                        cur["comment"] = val
                    if not cur:
                        expected_coltags.pop(col, None)
            elif op == "vacuum":
                lake.vacuum(T)  # no mirror: must not change contents
            else:
                lake.flush_inlined_data()  # ditto

            if verbose:
                print(f'  step {step}: {mirror.log[-1][:400]}' if op not in ('vacuum','flush') else f'  step {step}: {op}')
            if lake.tags(T) != expected_tags or (
                lake.column_tags(T) != expected_coltags
            ):
                problems.append(
                    f"step {step} ({op}): tags diverge"
                    f" lake={lake.tags(T)}/{lake.column_tags(T)}"
                    f" expected={expected_tags}/{expected_coltags}"
                )
                break
            got_cols, got = lake_state()
            want_cols, want = mirror.state()
            if got_cols != want_cols:
                problems.append(
                    f"step {step} ({op}): columns diverge"
                    f" lake={got_cols} duck={want_cols}"
                )
                break
            if got != want:
                diff = next(
                    ((a, b) for a, b in zip(got, want) if a != b),
                    (got[:2], want[:2]),
                ) if len(got) == len(want) else (got[:2], want[:2])
                problems.append(
                    f"step {step} ({op}): lake={len(got)} rows"
                    f" duck={len(want)}; first diff: {diff}"
                )
                break

        # Historical-schema time travel: at a random earlier mirrored op
        # the lake must reproduce the mirror's replayed column set AND
        # values — including columns later dropped/renamed.
        if not problems and len(versions) >= 2:
            for k in rng.sample(range(len(versions)), min(4, len(versions))):
                log_idx, snap = versions[k]
                got_cols, got = lake_state(version=snap)
                want_cols, want = mirror.replay(log_idx)
                if got_cols != want_cols or got != want:
                    problems.append(
                        f"time travel snap {snap} (op log {log_idx}):"
                        f" lake cols={got_cols} rows={len(got)};"
                        f" replay cols={want_cols} rows={len(want)}"
                    )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", type=int, default=25)
    ap.add_argument("--seed", type=int, default=20260814)
    ap.add_argument("--seeds", type=str, default=None)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    seeds = (
        [int(s) for s in args.seeds.split(",")] if args.seeds else [args.seed]
    )
    bad = 0
    for s in seeds:
        # every seed runs twice: flat table, then schema-qualified
        for qualified in (False, True):
            problems = run(args.ops, s, verbose=args.verbose,
                           qualified=qualified)
            tag = " [ns.f]" if qualified else ""
            for p in problems:
                print(f"seed {s}{tag} DIVERGED: {p}")
            bad += len(problems)
            if not problems:
                print(
                    f"seed {s}{tag}: {args.ops} ops +"
                    " historical-schema + tag checks agree"
                )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
