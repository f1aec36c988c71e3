"""PII scan/redaction + deny-list operators (operators/pii.py).

The oracle-paired queries (plans/pii.py) only see corpus-derived PII
shapes; these tests pin the scanners against realistic free-form text —
mixed categories in one document, boundary cases, and the guarantee
that redaction leaves zero residual matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.operators.pii import (
    PII_PATTERNS,
    denylist_filter,
    pii_count,
    pii_redact,
    pii_scan,
)

ROWS = [
    (1, "reach me at alice.smith+spam@mail-server.co.uk or 555-867-5309"),
    (2, "server 10.0.254.3 proxied via 192.168.1.1; admin@example.com"),
    (3, "no pii here, just text with an at sign @ and dots . . ."),
    (4, "double email a@b.io c@d.org and ip 8.8.8.8"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def test_pii_scan_counts(spark):
    rows = {r["doc_id"]: r for r in pii_scan(_df(spark)).collect()}
    assert (rows[1]["pii_email"], rows[1]["pii_ipv4"], rows[1]["pii_phone"]) == (1, 0, 1)
    assert (rows[2]["pii_email"], rows[2]["pii_ipv4"], rows[2]["pii_phone"]) == (1, 2, 0)
    assert (rows[3]["pii_email"], rows[3]["pii_ipv4"], rows[3]["pii_phone"]) == (0, 0, 0)
    assert (rows[4]["pii_email"], rows[4]["pii_ipv4"], rows[4]["pii_phone"]) == (2, 1, 0)
    assert rows[1]["has_pii"] and rows[2]["has_pii"] and rows[4]["has_pii"]
    assert not rows[3]["has_pii"] and not rows[5]["has_pii"]


def test_pii_redact_no_residual(spark):
    red = _df(spark).select("doc_id", pii_redact("text").alias("text"))
    # Re-scanning redacted text finds nothing.
    rescanned = pii_scan(red)
    assert all(not r["has_pii"] for r in rescanned.collect())
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert texts[1] == "reach me at [EMAIL] or [PHONE]"
    assert texts[2] == "server [IP] proxied via [IP]; [EMAIL]"
    assert texts[3] == ROWS[2][1]  # untouched
    assert texts[4] == "double email [EMAIL] [EMAIL] and ip [IP]"


def test_pii_count_is_long(spark):
    df = _df(spark).select(pii_count("text", "email").alias("c"))
    assert dict(df.dtypes)["c"] == "bigint"


def test_denylist_exact_token_match(spark):
    df = spark.createDataFrame(
        [(1, "a classic essay"), (2, "a class essay"), (3, "CLASS dismissed")],
        ["doc_id", "text"],
    )
    kept = denylist_filter(df, ["class"]).select("doc_id").collect()
    # 'classic' is not blocked (token match, not substring); matching is
    # case-insensitive via lower().
    assert sorted(r["doc_id"] for r in kept) == [1]
    blocked = denylist_filter(df, ["class"], keep=False).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in blocked) == [2, 3]


def test_patterns_are_re2_safe():
    # The oracle runs these on DuckDB's RE2: no backreferences or
    # lookaround may creep in.
    for pattern, _ in PII_PATTERNS.values():
        assert "(?=" not in pattern and "(?!" not in pattern
        assert "\\1" not in pattern
