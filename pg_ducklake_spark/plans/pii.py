"""PII scan / redaction / deny-list queries over ``documents``.

The synthetic corpus contains no real PII (letters-only tokens), so the
scan queries first derive a PII-laden text column deterministically from
``doc_id`` — the same arithmetic on both engines, the exact trick the
literal ClickBench suite uses to derive a hits-shaped table from
lineitem — then exercise the real operators (operators/pii.py) against
a DuckDB oracle running the same regexes (Java-regex/RE2-common subset).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.operators.pii import PII_PATTERNS, pii_count, pii_redact
from pg_ducklake_spark.plans import query, rebalance, t

_EMAIL, _EMAIL_SUB = PII_PATTERNS["email"]
_IPV4, _IPV4_SUB = PII_PATTERNS["ipv4"]
_PHONE, _PHONE_SUB = PII_PATTERNS["phone"]


def _derived_text(cast_type: str) -> str:
    """SQL deriving PII-laden text from (text, doc_id); identical
    token-for-token on both engines except the string cast spelling
    (Spark STRING vs DuckDB VARCHAR)."""
    s = lambda e: f"CAST({e} AS {cast_type})"  # noqa: E731
    return (
        "text"
        f" || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || {s('doc_id')}"
        " || '@example.com' ELSE '' END"
        f" || CASE WHEN doc_id % 4 = 0 THEN ' ip ' || {s('doc_id % 223 + 1')}"
        f" || '.' || {s('doc_id % 191 + 1')} || '.' || {s('doc_id % 97')}"
        f" || '.' || {s('doc_id % 251')} ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'"
        f" || lpad({s('doc_id % 1000')}, 3, '0')"
        f" || '-' || lpad({s('doc_id % 10000')}, 4, '0') ELSE '' END"
    )


_SPARK_DERIVED = _derived_text("STRING")
_DUCK_DERIVED = _derived_text("VARCHAR")


def _duck_count(kind: str, col: str = "pii_text") -> str:
    pattern = PII_PATTERNS[kind][0]
    return f"CAST(len(regexp_extract_all({col}, '{pattern}', 0)) AS BIGINT)"


@query(
    "text_pii_scan",
    oracle=f"""
    WITH pii AS (SELECT source, {_DUCK_DERIVED} AS pii_text FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN {_duck_count('email')} > 0
                           OR {_duck_count('ipv4')} > 0
                           OR {_duck_count('phone')} > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(SUM({_duck_count('email')}) AS BIGINT) AS n_emails,
           CAST(SUM({_duck_count('ipv4')}) AS BIGINT) AS n_ipv4,
           CAST(SUM({_duck_count('phone')}) AS BIGINT) AS n_phones
    FROM pii
    GROUP BY source
    ORDER BY source
    """,
)
def text_pii_scan(spark, sf_dir):
    """Per-source PII inventory: how many documents carry each PII
    category and how many instances, using the real regexp scanners
    (operators/pii.py) over deterministically PII-seeded text.

    Scale shape: map-only regex scan fused into the parquet read, then
    one partial-aggregated groupBy on the low-cardinality source key —
    exactly one small shuffle at 100 TB."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    pii = docs.select("source", F.expr(_SPARK_DERIVED).alias("pii_text"))
    counts = {k: pii_count("pii_text", k) for k in ("email", "ipv4", "phone")}
    has = (counts["email"] > 0) | (counts["ipv4"] > 0) | (counts["phone"] > 0)
    return (
        pii.select(
            "source",
            has.cast("long").alias("hit"),
            counts["email"].alias("e"),
            counts["ipv4"].alias("i"),
            counts["phone"].alias("p"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").alias("docs_with_pii"),
            F.sum("e").alias("n_emails"),
            F.sum("i").alias("n_ipv4"),
            F.sum("p").alias("n_phones"),
        )
        .orderBy("source")
    )


def _duck_redacted() -> str:
    """DuckDB expression applying the same ordered redaction chain."""
    expr = "pii_text"
    for pattern, placeholder in PII_PATTERNS.values():
        expr = f"regexp_replace({expr}, '{pattern}', '{placeholder}', 'g')"
    return expr


def _placeholder_count(col: str, placeholder: str) -> str:
    n = len(placeholder)
    return (
        f"CAST((length({col}) - length(replace({col}, '{placeholder}', '')))"
        f" / {n} AS BIGINT)"
    )


@query(
    "text_pii_redact_stats",
    oracle=f"""
    WITH pii AS (SELECT source, {_DUCK_DERIVED} AS pii_text FROM documents),
    red AS (SELECT source, {_duck_redacted()} AS redacted FROM pii)
    SELECT source,
           CAST(SUM({_placeholder_count('redacted', _EMAIL_SUB)})
                AS BIGINT) AS n_emails_redacted,
           CAST(SUM({_placeholder_count('redacted', _IPV4_SUB)})
                AS BIGINT) AS n_ipv4_redacted,
           CAST(SUM({_placeholder_count('redacted', _PHONE_SUB)})
                AS BIGINT) AS n_phones_redacted,
           CAST(SUM({_duck_count('email', 'redacted')}
               + {_duck_count('ipv4', 'redacted')}
               + {_duck_count('phone', 'redacted')}) AS BIGINT) AS residual_matches
    FROM red
    GROUP BY source
    ORDER BY source
    """,
)
def text_pii_redact_stats(spark, sf_dir):
    """Redaction audit: placeholder counts per source after
    ``pii_redact`` plus a residual-match column that must be all-zero
    (no PII survives the redaction chain). Map-only + one small
    groupBy, same scale shape as the scan."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    red = docs.select(
        "source",
        pii_redact(F.expr(_SPARK_DERIVED)).alias("redacted"),
    )

    def ph_count(placeholder: str):
        return (
            (
                F.length("redacted")
                - F.length(F.expr(f"replace(redacted, '{placeholder}', '')"))
            )
            / len(placeholder)
        ).cast("long")

    residual = (
        pii_count("redacted", "email")
        + pii_count("redacted", "ipv4")
        + pii_count("redacted", "phone")
    )
    return (
        red.select(
            "source",
            ph_count(_EMAIL_SUB).alias("e"),
            ph_count(_IPV4_SUB).alias("i"),
            ph_count(_PHONE_SUB).alias("p"),
            residual.alias("r"),
        )
        .groupBy("source")
        .agg(
            F.sum("e").alias("n_emails_redacted"),
            F.sum("i").alias("n_ipv4_redacted"),
            F.sum("p").alias("n_phones_redacted"),
            F.sum("r").alias("residual_matches"),
        )
        .orderBy("source")
    )


_DENYLIST = ["slow", "error", "vector"]


@query(
    "text_denylist_screen",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN list_has_any(string_split(lower(text), ' '),
                         [{", ".join(repr(w) for w in _DENYLIST)}])
                    THEN 1 ELSE 0 END) AS BIGINT) AS blocked_docs,
           CAST(SUM(CASE WHEN list_has_any(string_split(lower(text), ' '),
                         [{", ".join(repr(w) for w in _DENYLIST)}])
                    THEN 0 ELSE 1 END) AS BIGINT) AS kept_docs,
           ROUND(CAST(SUM(CASE WHEN list_has_any(string_split(lower(text), ' '),
                         [{", ".join(repr(w) for w in _DENYLIST)}])
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS blocked_pct
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_denylist_screen(spark, sf_dir):
    """Deny-list screening report: per-source blocked/kept counts for a
    fixed blocked-token list (exact token match via array overlap —
    'class' never blocks 'classic'). One map-only membership test, one
    low-cardinality groupBy."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    toks = F.split(F.lower("text"), " ")
    hit = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in _DENYLIST]))
    return (
        docs.select("source", hit.cast("long").alias("hit"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").alias("blocked_docs"),
            (F.count(F.lit(1)) - F.sum("hit")).alias("kept_docs"),
            F.round(
                F.sum("hit").cast("double") / F.count(F.lit(1)), 4
            ).alias("blocked_pct"),
        )
        .orderBy("source")
    )
