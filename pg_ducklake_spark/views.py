"""Persisted views and scalar SQL macros.

The reference catalog versions views and macros alongside tables
(metadata tables ``ducklake_view``, ``ducklake_macro``,
``ducklake_macro_impl``, ``ducklake_macro_parameters`` —
src/pgducklake_freeze.cpp:32-61), and its regression suite pins the
"view over a table function keeps the schema it was created with"
behavior (test/regression/sql/time_travel.sql:21-23).

Spark mapping:

- **Views** are stored as (sql, pinned column list) in the lake's
  catalog log and re-registered as temp views by ``Lake.sql`` — the
  defining query is re-planned per statement (ordinary view
  semantics) but the *output columns are pinned at creation*: a
  ``SELECT *`` view does not grow new columns when the base table
  does, matching the reference. Catalyst still collapses the view
  subquery into the outer plan, so a filter above a view reaches the
  parquet scan — no materialization, no extra shuffle, scale-safe.

- **Macros** are DuckDB-style SQL macros: a parameterized body
  textually expanded (with balanced-paren, quote-aware argument
  parsing) before planning. Expansion is recursive with a depth cap
  so macros can call macros. Because expansion happens before
  Catalyst sees the query, macro bodies cost exactly what the
  inlined text costs — scalar bodies stay inside whole-stage
  codegen, and a *table* macro (``CREATE MACRO .. AS TABLE``, kind
  'table'; r12) expands a FROM-position call into a parenthesized
  derived table that Catalyst collapses into the outer plan, so
  filters above it still push into the base scans. The expander is
  kind-agnostic: both kinds substitute parameters the same way and
  wrap the body in parens — ``(expr)`` in expression position,
  ``(SELECT ...)`` as a derived table.
"""

from __future__ import annotations

import re

from pg_ducklake_spark.errors import LakeError

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
MAX_MACRO_DEPTH = 16


def check_ident(name: str, kind: str) -> None:
    if not _IDENT.match(name):
        raise LakeError(f"invalid {kind} name {name!r}")


def _find_call(sql: str, name: str, start: int = 0) -> tuple[int, int] | None:
    """Next ``name(`` occurrence outside string literals; returns
    (name_start, open_paren_index) or None."""
    pat = re.compile(rf"\b{re.escape(name)}\s*\(", re.I)
    i = start
    n = len(sql)
    while i < n:
        m = pat.search(sql, i)
        if not m:
            return None
        # reject matches inside single-quoted literals
        quotes = sql.count("'", 0, m.start()) - sql.count("\\'", 0, m.start())
        if quotes % 2 == 1:
            i = m.start() + 1
            continue
        # reject qualified calls like x.name(...)
        j = m.start() - 1
        while j >= 0 and sql[j].isspace():
            j -= 1
        if j >= 0 and sql[j] == ".":
            i = m.end()
            continue
        return m.start(), m.end() - 1
    return None


def _split_args(sql: str, open_paren: int) -> tuple[list[str], int]:
    """Parse ``(a, f(b, c), 'x,y')`` → (["a", "f(b, c)", "'x,y'"], idx
    one past the closing paren). Quote- and nesting-aware."""
    depth = 0
    args: list[str] = []
    buf: list[str] = []
    i = open_paren
    n = len(sql)
    in_str = False
    while i < n:
        ch = sql[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                # '' is an escaped quote inside a literal
                if i + 1 < n and sql[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == "(":
            depth += 1
            if depth > 1:
                buf.append(ch)
        elif ch == ")":
            depth -= 1
            if depth == 0:
                arg = "".join(buf).strip()
                if arg or args:
                    args.append(arg)
                return args, i + 1
            buf.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    raise LakeError(f"unbalanced parentheses in macro call at {sql[open_paren:open_paren+40]!r}")


def _substitute(body: str, params: list[str], args: list[str]) -> str:
    """Replace each parameter token in the macro body with its
    parenthesized argument (parenthesized so ``a + b`` arguments keep
    precedence — the classic macro-hygiene rule)."""
    out = body
    for p, a in zip(params, args):
        out = re.sub(rf"\b{re.escape(p)}\b", f"({a})", out)
    return f"({out})"


def expand_macros(sql: str, macros: dict[str, dict]) -> str:
    """Textually expand every macro invocation in ``sql``; recursive
    (macros may call macros) with a depth cap."""
    if not macros:
        return sql
    for _ in range(MAX_MACRO_DEPTH):
        changed = False
        for name, mdef in macros.items():
            pos = 0
            while True:
                hit = _find_call(sql, name, pos)
                if hit is None:
                    break
                start, open_paren = hit
                args, end = _split_args(sql, open_paren)
                params = list(mdef["parameters"])
                if len(args) != len(params):
                    raise LakeError(
                        f"macro {name}() takes {len(params)} argument(s), "
                        f"got {len(args)}"
                    )
                repl = _substitute(mdef["body"], params, args)
                sql = sql[:start] + repl + sql[end:]
                pos = start + len(repl)
                changed = True
        if not changed:
            return sql
    raise LakeError(
        f"macro expansion exceeded depth {MAX_MACRO_DEPTH} "
        "(mutually recursive macros?)"
    )
