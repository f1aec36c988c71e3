"""PII detection, redaction, and deny-list screening operators.

The pre-training compliance pass: find personally-identifying strings
(emails, IPv4 addresses, phone numbers, SSN-shaped ids) in a text
column, count them per document, and redact them to typed placeholders.
Everything is built-in regexp column arithmetic (JVM-side, whole-stage
codegen) — no Python UDFs — so a 100 TB corpus scan stays a single
map-only stage with full predicate pushdown on the surrounding plan.

Pattern dialect: the patterns below restrict themselves to the syntax
subset where Java regex (Spark) and RE2 (DuckDB, used by the oracle)
agree — character classes, bounded repetition, alternation; no
backreferences, no lookaround — so the same pattern string is usable on
both engines for oracle verification.

Reference analog: the reference has no PII operators (its surface stops
at the SQL layer, CLAUDE.md:118-121); this extends the north-star
pipeline operator set like dedup/similarity (BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered dict: redaction applies in this order on every engine, so
# overlapping matches resolve identically.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
    "phone": (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
}


def pii_count(text_col: Column | str, kind: str) -> Column:
    """Number of matches of one PII category in a text column."""
    pattern, _ = PII_PATTERNS[kind]
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


def pii_scan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``pii_<kind>`` count column per category plus a
    ``has_pii`` flag. Map-only; scales by partition."""
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"pii_{kind}", pii_count(text_col, kind))
    flag = None
    for kind in PII_PATTERNS:
        c = F.col(f"pii_{kind}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def pii_redact(text_col: Column | str) -> Column:
    """Text with every PII category replaced by its typed placeholder,
    applied in PII_PATTERNS order (email → ipv4 → phone)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pattern, placeholder in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def denylist_filter(
    df: DataFrame,
    blocked: list[str],
    text_col: str = "text",
    keep: bool = True,
) -> DataFrame:
    """Drop (or select, keep=False) documents containing any blocked
    token (exact whitespace-token match, not substring — 'class' does
    not block 'classic'). Map-only array intersection, codegen'd."""
    toks = F.split(F.lower(text_col), " ")
    hit = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in blocked]))
    return df.filter(~hit if keep else hit)
