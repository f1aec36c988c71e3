"""DuckDB-SQL compatibility macros.

The reference's users write DuckDB SQL (every query is executed by
DuckDB — SURVEY.md §0), so queries they bring along use DuckDB function
names. For every such name Spark SQL *lacks*, this table provides a
built-in scalar macro (expanded by ``views.expand_macros`` before
planning, exactly like user macros — zero runtime cost, stays inside
whole-stage codegen). Names Spark already has (``string_agg``, ``len``,
``date_part``, ``regexp_extract`` …) are deliberately absent: Spark's
own builtin must win, and expansion never shadows it.

User-defined macros take precedence over this table (``Lake.sql``
merges with the user's catalog on top).
"""

from __future__ import annotations


def _m(params: list[str], body: str) -> dict:
    return {"parameters": params, "body": body, "builtin": True}


DUCKDB_COMPAT_MACROS: dict[str, dict] = {
    # --- string predicates -------------------------------------------------
    "regexp_matches": _m(["s", "p"], "regexp_like(s, p)"),
    "starts_with": _m(["s", "p"], "startswith(s, p)"),
    "ends_with": _m(["s", "p"], "endswith(s, p)"),
    "string_split": _m(["s", "sep"], "split(s, sep)"),
    "string_split_regex": _m(["s", "pat"], "split(s, pat)"),
    # --- list_* family → array_* ------------------------------------------
    "list_contains": _m(["l", "x"], "array_contains(l, x)"),
    "list_has": _m(["l", "x"], "array_contains(l, x)"),
    "array_length": _m(["l"], "size(l)"),
    "list_sort": _m(["l"], "sort_array(l)"),
    "list_reverse_sort": _m(["l"], "sort_array(l, false)"),
    "list_distinct": _m(["l"], "array_distinct(l)"),
    "list_unique": _m(["l"], "size(array_distinct(l))"),
    "list_min": _m(["l"], "array_min(l)"),
    "list_max": _m(["l"], "array_max(l)"),
    "list_sum": _m(
        ["l"], "aggregate(l, cast(0.0 as double), (acc, x) -> acc + cast(x as double))"
    ),
    "list_avg": _m(
        ["l"],
        "aggregate(l, cast(0.0 as double), (acc, x) -> acc + cast(x as double))"
        " / size(l)",
    ),
    # --- epoch family ------------------------------------------------------
    "epoch": _m(["ts"], "cast(unix_micros(cast(ts as timestamp)) as double)"
                        " / 1000000.0"),
    "epoch_ms": _m(["ts"], "unix_millis(cast(ts as timestamp))"),
    "epoch_us": _m(["ts"], "unix_micros(cast(ts as timestamp))"),
}
