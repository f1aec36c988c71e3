"""Property-based tests (hypothesis) over the driver-side machinery:
inline-value JSON round trips, macro expansion, statement splitting,
and snapshot-log crash consistency. No Spark jobs — these pin the pure
logic the distributed paths are built on."""

from __future__ import annotations

import datetime as dt
import decimal
import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from pg_ducklake_spark.catalog import (
    FileEntry,
    SnapshotLog,
    from_json_value,
    to_json_value,
)
from pg_ducklake_spark.sqlexec import split_top_level
from pg_ducklake_spark.views import expand_macros

settings.register_profile("ci", max_examples=200, deadline=None)
settings.load_profile("ci")


# ---------------------------------------------------------- JSON round trips

_scalar_cases = [
    (st.integers(min_value=-(2**62), max_value=2**62), T.LongType()),
    (st.floats(allow_nan=False), T.DoubleType()),
    (st.text(max_size=40), T.StringType()),
    (st.booleans(), T.BooleanType()),
    (st.binary(max_size=64), T.BinaryType()),
    (
        st.datetimes(
            min_value=dt.datetime(1900, 1, 1), max_value=dt.datetime(2200, 1, 1)
        ),
        T.TimestampNTZType(),
    ),
    (st.dates(), T.DateType()),
    (
        st.decimals(
            allow_nan=False, allow_infinity=False, places=4,
            min_value=-(10**10), max_value=10**10,
        ),
        T.DecimalType(20, 4),
    ),
]


@given(st.data())
def test_inline_value_json_roundtrip(data):
    """to_json_value → json → from_json_value is the identity for every
    inlinable type (the inline buffer's durability contract)."""
    strat, dtype = data.draw(st.sampled_from(_scalar_cases))
    v = data.draw(st.one_of(st.none(), strat))
    encoded = json.loads(json.dumps(to_json_value(v, dtype)))
    back = from_json_value(encoded, dtype)
    if isinstance(v, decimal.Decimal):
        assert back is not None and decimal.Decimal(back) == v
    else:
        assert back == v


@given(st.lists(st.integers(min_value=-100, max_value=100), max_size=8))
def test_inline_array_roundtrip(xs):
    dtype = T.ArrayType(T.LongType())
    encoded = json.loads(json.dumps(to_json_value(xs, dtype)))
    assert from_json_value(encoded, dtype) == xs


# ---------------------------------------------------------- macro expansion

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda n: n != "f2"  # "f2(3, 4)" appears as a literal argument below
)


@given(
    name=_ident,
    args=st.lists(
        st.sampled_from(["1", "x + 2", "'a,b'", "f2(3, 4)", "'it''s'"]),
        min_size=1, max_size=3,
    ),
)
def test_macro_expansion_balanced_and_complete(name, args):
    """Expanding m(...) with a pass-through body keeps parens balanced
    and substitutes every parameter exactly."""
    params = [f"p{i}" for i in range(len(args))]
    body = " + ".join(params)
    macros = {name: {"parameters": params, "body": body}}
    sql = f"SELECT {name}({', '.join(args)}) AS v"
    out = expand_macros(sql, macros)
    assert out.count("(") == out.count(")")
    assert name + "(" not in out  # fully expanded
    for a in args:
        assert a in out


@given(st.sampled_from([
    "SELECT 'm(1)'", "SELECT s.m(1)", "SELECT matched(1)", "SELECT 1",
]))
def test_macro_expansion_leaves_non_calls_alone(sql):
    macros = {"m": {"parameters": ["x"], "body": "x"}}
    assert expand_macros(sql, macros) == sql


# ---------------------------------------------------------- split_top_level


@given(
    st.lists(
        st.sampled_from(["a", "f(1, 2)", "'x,y'", "(1, (2, 3))", "'it''s, ok'"]),
        min_size=1, max_size=5,
    )
)
def test_split_top_level_inverts_join(parts):
    assert split_top_level(", ".join(parts)) == parts


# ---------------------------------------------------------- crash consistency


def test_partial_commit_artifacts_are_ignored(tmp_path):
    """A writer that died mid-commit leaves .tmp files; replay and the
    next commit must be unaffected (atomic hard-link commit contract)."""
    log = SnapshotLog(str(tmp_path / "t"))
    log.commit({"operation": "CREATE TABLE",
                "schema": T.StructType([T.StructField("a", T.LongType())]).jsonValue(),
                "schema_version": 1, "metrics": {}})
    log.commit({"operation": "INSERT",
                "add": [FileEntry("data/x", 10, 100, 0).to_json()],
                "metrics": {}})
    # simulate torn writes: stray tmp files + a corrupt checkpoint
    open(os.path.join(log.log_dir, ".tmp-deadbeef.json"), "w").write("{trunc")
    open(os.path.join(log.log_dir, f"{2:020d}.ckpt.json"), "w").write("{broken")
    fresh = SnapshotLog(str(tmp_path / "t"))
    state = fresh.replay()
    assert state.snapshot_id == 2 and "data/x" in state.files
    v3 = fresh.commit({"operation": "INSERT", "add": [], "metrics": {}})
    assert v3 == 3


# ------------------------------------------------- sketch hash machinery


@given(st.integers(min_value=0, max_value=(1 << 23) - 1))
def test_hll_rho_ladder_matches_bit_length(w):
    """The generated integer CASE ladder must equal 24 - bit_length(w)
    for every 23-bit suffix (rho = leading zeros + 1)."""
    import duckdb

    from pg_ducklake_spark.plans.sketches import _rho

    got = duckdb.connect().execute(f"SELECT {_rho(str(w))}").fetchone()[0]
    assert got == 24 - w.bit_length()


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=30))
def test_h32_sql_matches_python_md5(s):
    """sql_h32's positional base-16 expansion must equal the first 8
    md5 hex chars as an integer — the contract every md5-derived
    operator (minhash, CMS, HLL, sampling) builds on."""
    import hashlib

    import duckdb

    from pg_ducklake_spark.functions.hashing import sql_h32

    expected = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    lit = "'" + s.replace("'", "''") + "'"
    got = duckdb.connect().execute(f"SELECT {sql_h32(lit)}").fetchone()[0]
    assert got == expected


# ---------------------------------------------------------------------------
# pgsyntax rewriter properties
# ---------------------------------------------------------------------------


_SQL_CHARS = st.characters(
    min_codepoint=32, max_codepoint=126, blacklist_characters="'\"[]()"
)


@given(st.text(alphabet=_SQL_CHARS, min_size=0, max_size=60))
def test_pgsyntax_identity_on_plain_sql(s):
    """SQL containing none of the rewritten forms passes through
    byte-identical."""
    from pg_ducklake_spark.pgsyntax import rewrite

    import re as _re

    if _re.search(r"\b(array|unnest|generate_series)\b", s, _re.I):
        return
    if "~" in s:  # the PG regex operators rewrite on plain text by design
        return
    assert rewrite(s) == s


@given(st.text(alphabet=_SQL_CHARS, min_size=0, max_size=60))
def test_pgsyntax_tilde_without_operands_is_identity(s):
    """A ``~`` with no left operand (unary bitwise NOT) or no right
    operand (trailing junk) must pass through byte-identical — only a
    genuine binary ``expr ~ expr`` becomes RLIKE."""
    from pg_ducklake_spark.pgsyntax import rewrite

    for frag in (f"select ~{s}" if "~" not in s else "select ~1",
                 "select 0~", "select 0 !~* ", "select a ~"):
        assert rewrite(frag) == frag


@given(
    st.lists(st.integers(min_value=-99, max_value=99), min_size=1, max_size=5),
    st.text(alphabet=_SQL_CHARS, min_size=0, max_size=20),
)
def test_pgsyntax_array_literal_and_string_safety(xs, tail):
    """ARRAY[..] rewrites to array(..) with elements intact; the same
    spelling INSIDE a string literal is never touched; and the rewrite
    is idempotent."""
    from pg_ducklake_spark.pgsyntax import rewrite

    lits = ", ".join(str(x) for x in xs)
    sql = f"SELECT ARRAY[{lits}], 'ARRAY[{lits}]'"
    out = rewrite(sql)
    assert out == f"SELECT array({lits}), 'ARRAY[{lits}]'"
    assert rewrite(out) == out  # idempotent


@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=4))
def test_pgsyntax_nested_arrays(xs):
    from pg_ducklake_spark.pgsyntax import rewrite

    inner = ", ".join(f"ARRAY[{x}]" for x in xs)
    out = rewrite(f"SELECT ARRAY[{inner}]")
    expected_inner = ", ".join(f"array({x})" for x in xs)
    assert out == f"SELECT array({expected_inner})"
