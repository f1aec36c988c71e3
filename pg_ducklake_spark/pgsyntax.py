"""PG/DuckDB surface-syntax → Spark SQL rewrites.

The reference's users write PostgreSQL/DuckDB SQL (insert_unnest.sql,
ctas.sql, readme_examples.sql); Spark SQL lacks three surface forms
they rely on, rewritten here textually before planning (the same
bind-time rewrite layer as the macro expander, zero runtime cost):

* ``ARRAY[1, 2, 3]`` literals → ``array(1, 2, 3)`` (and a trailing
  ``::text[]``-style array cast is dropped — the elements already
  carry their types in every reference usage);
* ``FROM unnest(expr) [AS a]`` → a one-column subquery over the
  ``explode`` generator (PG semantics: the alias names the COLUMN);
  projection-position ``SELECT unnest(a), unnest(b)`` — PG's zipping
  multi-unnest — becomes ``inline(arrays_zip(a, b))``, which pads to
  the longest input with NULLs exactly like PG;
* ``FROM generate_series(a, b[, s]) [AS i]`` → an ``explode(sequence)``
  subquery (PG: the alias names the column; unaliased, the column is
  ``generate_series`` like DuckDB).

All scanning is quote-aware and parenthesis-balanced; anything not
matching these shapes passes through untouched. The supported subset is
exactly the reference's test surface — a mixed unnest/scalar projection
(PG row-expansion) is NOT rewritten and will fail loudly in Spark's
analyzer rather than silently misread.
"""

from __future__ import annotations

import re


def _skip_string(s: str, i: int) -> int:
    """i points at an opening quote; return index just past the close."""
    q = s[i]
    i += 1
    while i < len(s):
        if s[i] == q:
            if i + 1 < len(s) and s[i + 1] == q:  # escaped ''
                i += 2
                continue
            return i + 1
        i += 1
    return i


def _match_bracket(s: str, i: int, open_ch: str, close_ch: str) -> int:
    """i points at ``open_ch``; return index of the matching close."""
    depth = 0
    while i < len(s):
        c = s[i]
        if c in "'\"":
            i = _skip_string(s, i)
            continue
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced {open_ch}...{close_ch}")


_ARRAY_LIT = re.compile(r"\bARRAY\s*\[", re.I)
_ARRAY_CAST = re.compile(r"^\s*::\s*\w+\s*\[\s*\]")


def _search_outside_strings(pattern: "re.Pattern", sql: str, pos: int = 0):
    """First match of ``pattern`` at or after ``pos`` that is not inside
    a quoted string."""
    i = pos
    while i < len(sql):
        c = sql[i]
        if c in "'\"":
            i = _skip_string(sql, i)
            continue
        m = pattern.match(sql, i)
        if m:
            return m
        i += 1
    return None


def _rewrite_array_literals(sql: str) -> str:
    while True:
        m = _search_outside_strings(_ARRAY_LIT, sql)
        if m is None:
            return sql
        open_i = sql.index("[", m.start())
        close_i = _match_bracket(sql, open_i, "[", "]")
        inner = sql[open_i + 1 : close_i]
        rest = sql[close_i + 1 :]
        cast = _ARRAY_CAST.match(rest)
        if cast:
            rest = rest[cast.end():]
        sql = sql[: m.start()] + "array(" + inner + ")" + rest


_FROM_TVF = re.compile(
    r"\bFROM\s+(?P<fn>unnest|generate_series)\s*\(", re.I
)
_ALIAS = re.compile(r"^\s*(?:AS\s+)?(?P<a>[A-Za-z_][A-Za-z0-9_]*)", re.I)
_KEYWORDS = {
    "where", "group", "order", "limit", "having", "union", "join",
    "inner", "left", "right", "full", "cross", "on", "as", "select",
    "window", "qualify", "except", "intersect",
}


def _rewrite_from_tvfs(sql: str) -> str:
    pos = 0
    while True:
        m = _FROM_TVF.search(sql, pos)
        if m is None:
            return sql
        fn = m.group("fn").lower()
        open_i = sql.index("(", m.end() - 1)
        close_i = _match_bracket(sql, open_i, "(", ")")
        args = sql[open_i + 1 : close_i]
        rest = sql[close_i + 1 :]
        default_col = "unnest" if fn == "unnest" else "generate_series"
        am = _ALIAS.match(rest)
        col = default_col
        alias = ""
        if am and am.group("a").lower() not in _KEYWORDS:
            col = am.group("a")  # PG: the alias names the column
            alias = " " + am.group("a")
            rest = rest[am.end():]
        gen = (
            f"explode({args})" if fn == "unnest"
            else f"explode(sequence({args}))"
        )
        repl = f"FROM (SELECT {gen} AS {col}){alias}"
        sql = sql[: m.start()] + repl + rest
        pos = m.start() + len(repl)


_SELECT_HEAD = re.compile(r"\bSELECT\s+", re.I)
_UNNEST_ITEM = re.compile(r"^\s*unnest\s*\(", re.I)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, depth, buf, i = [], 0, [], 0
    while i < len(s):
        c = s[i]
        if c in "'\"":
            j = _skip_string(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _select_list_end(sql: str, start: int) -> int:
    """Index where the select list ends: the top-level FROM (or end)."""
    i, depth = start, 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"":
            i = _skip_string(sql, i)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
            if depth < 0:
                return i  # closing a subquery this SELECT lives in
        elif depth == 0 and sql[i : i + 5].upper() == "FROM " and (
            i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
        ):
            return i
        i += 1
    return len(sql)


def _rewrite_projection_unnest(sql: str) -> str:
    out = []
    pos = 0
    while True:
        m = _SELECT_HEAD.search(sql, pos)
        if m is None:
            out.append(sql[pos:])
            return "".join(out)
        list_start = m.end()
        list_end = _select_list_end(sql, list_start)
        items = _split_top_level(sql[list_start:list_end])
        if items and all(_UNNEST_ITEM.match(it) for it in items):
            args = []
            ok = True
            for it in items:
                im = _UNNEST_ITEM.match(it)
                open_i = it.index("(", im.end() - 1)
                close_i = _match_bracket(it, open_i, "(", ")")
                if it[close_i + 1 :].strip():
                    ok = False  # trailing alias/expr — leave untouched
                    break
                args.append(it[open_i + 1 : close_i].strip())
            if ok:
                if len(args) == 1:
                    new_list = f"explode({args[0]}) AS unnest"
                else:
                    new_list = f"inline(arrays_zip({', '.join(args)}))"
                out.append(sql[pos:list_start])
                out.append(new_list + " ")
                pos = list_end
                continue
        out.append(sql[pos:list_end])
        pos = list_end


def rewrite(sql: str) -> str:
    """Apply all PG/DuckDB surface rewrites (idempotent)."""
    sql = _rewrite_array_literals(sql)
    sql = _rewrite_from_tvfs(sql)
    sql = _rewrite_projection_unnest(sql)
    return sql
