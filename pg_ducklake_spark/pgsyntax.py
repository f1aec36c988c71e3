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
  ``generate_series`` like DuckDB);
* ``SELECT DISTINCT ON (keys) list ... ORDER BY o`` (PG's
  first-row-per-group idiom) → a ``row_number() OVER (PARTITION BY keys
  ORDER BY o)`` subquery filtered to 1 — one shuffle on the keys, the
  exact decorrelation a 100 TB plan wants (no self-join);
* ``QUALIFY pred`` (DuckDB's post-window filter) → the predicate is
  materialized as a boolean select-list column in a subquery and
  filtered outside (``SELECT * EXCEPT (__pg_q) ... WHERE __pg_q``);
  select-list aliases referenced by the predicate OUTSIDE window
  expressions resolve via Spark's lateral column aliases; references
  INSIDE ``OVER (...)`` are inlined with the alias's defining
  expression (Spark rejects lateral aliases in window expressions —
  UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS_IN_WINDOW);
* PG regex operators: ``expr ~ pat`` → ``expr RLIKE pat``, ``!~`` →
  ``NOT RLIKE``; the case-insensitive forms ``~* 'pat'`` / ``!~* 'pat'``
  (literal pattern only) → ``RLIKE '(?i)pat'``. Binary context is
  detected from the preceding token so Spark's unary bitwise ``~``
  (``SELECT ~5``) passes through untouched. NOTE: this is *PostgreSQL*
  semantics (partial match), matching the reference's PG prompt; DuckDB
  binds ``~`` to regexp_full_match, so cross-engine shared text should
  anchor patterns as ``.*pat.*`` where the distinction matters.

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
        if c in "'\"`":
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
        if c in "'\"`":
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
        if c in "'\"`":
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
        if c in "'\"`":
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


_BLOCK_END_KW = re.compile(r"\b(UNION|INTERSECT|EXCEPT)\b", re.I)


def _block_end(sql: str, pos: int) -> int:
    """End of the query block containing ``pos``: the closing paren of
    the enclosing subquery, a top-level set operator, or end of text."""
    i, depth = pos, 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            i = _skip_string(sql, i)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0:
            m = _BLOCK_END_KW.match(sql, i)
            if m and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                return i
        i += 1
    return len(sql)


_KW_RE = re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET|QUALIFY)\b", re.I)


def _find_clause(sql: str, start: int, end: int, name: str) -> int | None:
    """Offset of top-level clause ``name`` within [start, end)."""
    i, depth = start, 0
    while i < end:
        c = sql[i]
        if c in "'\"`":
            i = _skip_string(sql, i)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0:
            m = _KW_RE.match(sql, i)
            if m and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                if m.group(1).upper().split()[0] == name:
                    return i
                i = m.end()
                continue
        i += 1
    return None


def _ends_at_set_op(sql: str, end: int) -> bool:
    """True when a query-block rewrite stops at a top-level UNION /
    INTERSECT / EXCEPT: the replacement block must then be wrapped in
    parentheses — splicing it bare would glue the synthesized tail
    ("... ORDER BY k, v" / "WHERE __pg_q") straight onto the set
    operator ("vUNION ALL ...") and, even with a space, would hang an
    ORDER BY inside a set-op branch where it needs parens."""
    return end < len(sql) and _BLOCK_END_KW.match(sql, end) is not None


_DISTINCT_ON = re.compile(r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.I)


def _rewrite_distinct_on(sql: str) -> str:
    """``SELECT DISTINCT ON (K) L FROM R [ORDER BY O] [LIMIT N]`` →
    row_number window subquery.  PG keeps the first row of each K-group
    in O order; without an ORDER BY the keeper is arbitrary, so K itself
    is used for determinism.  Supported subset: no GROUP BY in the block
    (the inner query selects ``*``)."""
    while True:
        m = _search_outside_strings(_DISTINCT_ON, sql)
        if m is None:
            return sql
        open_i = sql.index("(", m.start())
        close_i = _match_bracket(sql, open_i, "(", ")")
        keys = sql[open_i + 1 : close_i].strip()
        list_start = close_i + 1
        from_i = _select_list_end(sql, list_start)
        sel_list = sql[list_start:from_i].strip()
        end = _block_end(sql, from_i)
        order_i = _find_clause(sql, from_i, end, "ORDER")
        limit_i = _find_clause(sql, from_i, end, "LIMIT")
        body_end = min(x for x in (order_i, limit_i, end) if x is not None)
        body = sql[from_i:body_end].rstrip()  # FROM ... WHERE ...
        if order_i is not None:
            ord_end = limit_i if limit_i is not None else end
            order_list = re.sub(
                r"^ORDER\s+BY\s*", "", sql[order_i:ord_end].strip(), flags=re.I
            )
        else:
            order_list = keys
        tail = sql[limit_i:end].strip() if limit_i is not None else ""
        repl = (
            f"SELECT {sel_list} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {keys} ORDER BY {order_list}) AS __pg_rn "
            f"{body}) __pg_don WHERE __pg_rn = 1 "
            f"ORDER BY {order_list}"
        )
        if tail:
            repl += " " + tail
        if _ends_at_set_op(sql, end):
            repl = "(" + repl + ") "
        sql = sql[: m.start()] + repl + sql[end:]


_QUALIFY = re.compile(r"\bQUALIFY\b", re.I)
_SELECT_KW = re.compile(r"\bSELECT\b", re.I)
_AS_ALIAS = re.compile(r"^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", re.I | re.S)
_OVER_KW = re.compile(r"\bOVER\s*\(", re.I)


def _select_list_aliases(sel_list: str) -> dict[str, str]:
    """``expr AS name`` entries of a select list (AS-form only — bare
    aliases are left to the analyzer)."""
    out: dict[str, str] = {}
    for item in _split_top_level(sel_list):
        m = _AS_ALIAS.match(item.strip())
        if m:
            out[m.group(2).lower()] = m.group(1).strip()
    return out


def _subst_aliases_in_windows(pred: str, aliases: dict[str, str]) -> str:
    """Replace select-list alias references INSIDE ``OVER (...)`` spans
    of a QUALIFY predicate with their defining expressions.

    Spark rejects lateral column aliases inside window expressions
    (UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS_IN_WINDOW), so the common
    DuckDB idiom ``QUALIFY row_number() OVER (ORDER BY alias)`` would
    fail at analysis without this. Substitution is limited to the OVER
    spans: outside them Spark's lateral alias resolution applies and
    correctly prefers a base column over the alias on a name clash —
    inside them the alias reference could only ever fail, so inlining
    the definition is a strict improvement. (If an alias shadows a base
    column, the substituted expression wins inside the window — a
    documented divergence of this textual layer.)"""
    if not aliases:
        return pred
    pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in aliases) + r")\b", re.I
    )

    def sub_span(span: str) -> str:
        # word-level replace outside quoted strings
        out, i = [], 0
        while i < len(span):
            c = span[i]
            if c in "'\"`":
                j = _skip_string(span, i)
                out.append(span[i:j])
                i = j
                continue
            m = pat.match(span, i)
            if m:
                # Skip qualified references: ``t.price`` names a base
                # column on relation ``t`` (substituting the alias body
                # would produce ``t.(expr)`` — a parse error), and
                # ``price.field`` uses the token as a qualifier.
                prev_dot = i > 0 and span[i - 1] == "."
                next_dot = m.end() < len(span) and span[m.end()] == "."
                if not prev_dot and not next_dot:
                    out.append("(" + aliases[m.group(1).lower()] + ")")
                    i = m.end()
                    continue
            out.append(c)
            i += 1
        return "".join(out)

    out, i = [], 0
    while i < len(pred):
        c = pred[i]
        if c in "'\"`":
            j = _skip_string(pred, i)
            out.append(pred[i:j])
            i = j
            continue
        m = _OVER_KW.match(pred, i)
        if m and not (i > 0 and (pred[i - 1].isalnum() or pred[i - 1] == "_")):
            open_i = pred.index("(", m.start())
            close_i = _match_bracket(pred, open_i, "(", ")")
            out.append(pred[i : open_i + 1])
            out.append(sub_span(pred[open_i + 1 : close_i]))
            out.append(")")
            i = close_i + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _rewrite_qualify(sql: str) -> str:
    """DuckDB ``QUALIFY pred`` → subquery + WHERE on a materialized
    boolean column.  The predicate's window functions evaluate in the
    inner select list (after GROUP BY/HAVING, like QUALIFY); ORDER
    BY/LIMIT move outside the wrap.  Select-list aliases referenced
    inside the predicate's OVER clauses are inlined (Spark's lateral
    column aliases don't reach into window expressions); references
    outside OVER clauses resolve via lateral column aliases."""
    while True:
        q = _search_outside_strings(_QUALIFY, sql)
        if q is None:
            return sql
        # Block start: the most recent SELECT at the QUALIFY's depth.
        i, depth = 0, 0
        sel_at_depth: dict[int, int] = {}
        while i < q.start():
            c = sql[i]
            if c in "'\"`":
                i = _skip_string(sql, i)
                continue
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            else:
                m = _SELECT_KW.match(sql, i)
                if m and not (i > 0 and (sql[i - 1].isalnum() or sql[i - 1] == "_")):
                    sel_at_depth[depth] = i
                    i = m.end()
                    continue
            i += 1
        sel_i = sel_at_depth.get(depth)
        if sel_i is None:  # malformed; leave for the analyzer
            return sql
        end = _block_end(sql, q.end())
        order_i = _find_clause(sql, q.end(), end, "ORDER")
        limit_i = _find_clause(sql, q.end(), end, "LIMIT")
        pred_end = min(x for x in (order_i, limit_i, end) if x is not None)
        pred = sql[q.end() : pred_end].strip()
        tail = sql[pred_end:end].strip()
        list_start = sel_i + len("SELECT ")
        from_i = _select_list_end(sql, list_start)
        pred = _subst_aliases_in_windows(
            pred, _select_list_aliases(sql[list_start:from_i])
        )
        inner = (
            sql[sel_i:from_i].rstrip()
            + f", ({pred}) AS __pg_q "
            + sql[from_i : q.start()].rstrip()
        )
        repl = f"SELECT * EXCEPT (__pg_q) FROM ({inner}) __pg_qual WHERE __pg_q"
        if tail:
            repl += " " + tail
        if _ends_at_set_op(sql, end):
            repl = "(" + repl + ") "
        sql = sql[:sel_i] + repl + sql[end:]


# ``~`` is binary (regex) when the preceding token is an identifier,
# literal, or closing bracket — not a keyword/operator (Spark's unary
# bitwise NOT: ``SELECT ~5``).
_UNARY_CONTEXT_KW = {
    "select", "where", "and", "or", "not", "when", "then", "else", "on",
    "by", "having", "case", "in", "like", "ilike", "as", "from", "join",
    "set", "qualify", "distinct", "all", "between", "return", "returning",
}
_PAT_LIT = re.compile(r"\s*'")


def _prev_token_is_operand(sql: str, i: int) -> bool:
    j = i - 1
    while j >= 0 and sql[j] in " \t\n\r":
        j -= 1
    if j < 0:
        return False
    c = sql[j]
    if c in ")]'\"`":
        return True
    if c.isalnum() or c == "_":
        k = j
        while k >= 0 and (sql[k].isalnum() or sql[k] == "_"):
            k -= 1
        word = sql[k + 1 : j + 1].lower()
        return word not in _UNARY_CONTEXT_KW
    return False


# Typed timestamp literals. DuckDB/PG ``TIMESTAMP '...'`` is a
# WITHOUT-time-zone value; Spark parses the same spelling as
# TIMESTAMP_LTZ, which re-interprets the wall clock in the session
# timezone (a value inside a DST gap silently shifts — 2024-03-10
# 02:30 under America/New_York becomes 03:30). Rewrite the keyword to
# TIMESTAMP_NTZ so the literal is taken verbatim; ``TIMESTAMPTZ '...'``
# (a PG spelling Spark's parser rejects outright) becomes Spark's
# TIMESTAMP, which IS the instant type. Only the literal form (keyword
# directly followed by a quoted string) is touched — a column named
# timestamp, CAST targets, and aliases pass through. \s* (not \s+): PG
# and DuckDB both accept the no-space spelling TIMESTAMP'2024-01-01',
# which Spark would otherwise silently parse as TIMESTAMP_LTZ — the
# exact wall-clock-shift class this rewrite exists to stop. The
# replacement always emits a trailing space, so both spellings
# normalize to the spaced form.
_TS_LIT = re.compile(r"\bTIMESTAMP(?P<tz>TZ)?\s*(?=')", re.I)


def _rewrite_timestamp_literals(sql: str) -> str:
    out = []
    i = 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        m = _TS_LIT.match(sql, i)
        if m:
            out.append("TIMESTAMP " if m.group("tz") else "TIMESTAMP_NTZ ")
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _rewrite_regex_ops(sql: str) -> str:
    out, i = [], 0
    while i < len(sql):
        c = sql[i]
        if c in "'\"`":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        op = None
        for cand in ("!~*", "!~", "~*", "~"):
            if sql.startswith(cand, i):
                op = cand
                break
        if op is None or not _prev_token_is_operand(sql, i):
            out.append(c)
            i += 1
            continue
        after = i + len(op)
        # A binary regex op needs a RIGHT operand too: a literal,
        # identifier, or parenthesized expression. A trailing ~ (or one
        # followed by another operator) is not ours to rewrite —
        # `SELECT 0~` must pass through byte-identical.
        k = after
        while k < len(sql) and sql[k] in " \t\n\r":
            k += 1
        if k >= len(sql) or not (sql[k] in "'\"(_" or sql[k].isalnum()):
            out.append(c)
            i += 1
            continue
        neg = "NOT " if op.startswith("!") else ""
        if op.endswith("*"):
            lm = _PAT_LIT.match(sql, after)
            if lm is None:  # non-literal pattern: can't inject (?i)
                out.append(c)
                i += 1
                continue
            lit_end = _skip_string(sql, lm.end() - 1)
            pat = sql[lm.end() : lit_end - 1]
            out.append(f" {neg}RLIKE '(?i){pat}'")
            i = lit_end
        else:
            out.append(f" {neg}RLIKE ")
            i = after
    return "".join(out)


def rewrite(sql: str) -> str:
    """Apply all PG/DuckDB surface rewrites (idempotent)."""
    sql = _rewrite_array_literals(sql)
    sql = _rewrite_from_tvfs(sql)
    sql = _rewrite_projection_unnest(sql)
    sql = _rewrite_distinct_on(sql)
    sql = _rewrite_qualify(sql)
    sql = _rewrite_regex_ops(sql)
    sql = _rewrite_timestamp_literals(sql)
    return sql
