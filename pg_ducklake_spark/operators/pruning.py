"""Metadata file skipping: prune a table's file list with per-file
min/max stats and partition values before Spark ever plans the scan.

This is the engine-side half of the reference's stats machinery
(``ducklake_file_column_stats`` / ``ducklake_file_partition_value``,
SURVEY.md §4.2); Spark's parquet footer pushdown then prunes row groups
within the surviving files. Only top-level conjuncts of the form
``col <op> literal`` are used — anything else simply doesn't prune
(never wrong, only less effective), and the full predicate is always
re-applied by the caller.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from pg_ducklake_spark.catalog import TableState

_CONJUNCT = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?P<op>=|==|!=|<>|<=|>=|<|>)\s*"
    r"(?P<lit>'[^']*'|-?\d+(?:\.\d+)?)\s*$"
)


def _split_conjuncts(where: str) -> list[str]:
    """Split on top-level ANDs (no paren/quote nesting awareness beyond
    the basics — non-matching conjuncts are ignored anyway)."""
    parts, depth, buf, i = [], 0, [], 0
    s = where
    in_str = False
    while i < len(s):
        c = s[i]
        if in_str:
            buf.append(c)
            if c == "'":
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            buf.append(c)
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0 and s[i : i + 5].upper() in (" AND ",):
            parts.append("".join(buf))
            buf = []
            i += 5
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _parse_lit(lit: str) -> Any:
    if lit.startswith("'"):
        return lit[1:-1]
    return float(lit) if "." in lit else int(lit)


def _file_may_match(entry, col: str, op: str, lit: Any) -> bool:
    # Partition values are exact: prune equality/inequality on them first.
    pv = entry.partition_values.get(f"_p_{col}")
    if pv is not None and isinstance(lit, str):
        if op in ("=", "=="):
            return pv == lit
        if op in ("!=", "<>"):
            return pv != lit
    st = entry.stats.get(col)
    if not st or st.get("min") is None or st.get("max") is None:
        return True  # no stats → cannot prune
    mn, mx = st["min"], st["max"]
    if isinstance(lit, (int, float)) and isinstance(mn, str):
        return True  # type mismatch → don't prune
    if isinstance(lit, str) and not isinstance(mn, str):
        return True
    try:
        if op in ("=", "=="):
            return mn <= lit <= mx
        if op in ("!=", "<>"):
            return not (mn == mx == lit)
        if op == "<":
            return mn < lit
        if op == "<=":
            return mn <= lit
        if op == ">":
            return mx > lit
        if op == ">=":
            return mx >= lit
    except TypeError:
        return True
    return True


def prune_files(state: "TableState", where: str) -> list[str]:
    """Relative paths of files that may contain predicate matches."""
    conjuncts = []
    for part in _split_conjuncts(where):
        m = _CONJUNCT.match(part)
        if m:
            conjuncts.append(
                (m.group("col"), m.group("op"), _parse_lit(m.group("lit")))
            )
    keep = []
    for path, entry in state.files.items():
        # Stats are recorded under insert-time column names; a renamed
        # column's stats live under its physical name in older files.
        if all(
            _file_may_match(
                entry,
                state.physical_name(c, entry.begin_snapshot),
                o,
                l,
            )
            for c, o, l in conjuncts
        ):
            keep.append(path)
    return keep
