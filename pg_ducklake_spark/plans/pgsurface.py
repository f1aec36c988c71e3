"""PG/DuckDB surface-syntax queries with SHARED oracle text.

The reference's prompt is PostgreSQL: its users write ``DISTINCT ON``,
``QUALIFY`` (DuckDB extension, reachable through the reference's DuckDB
execution engine) and the PG regex operators ``~`` / ``!~`` as a matter
of course (the reference routes every SELECT through DuckDB —
src/pgducklake_hooks.cpp — so both dialect families reach it). Here each
query's text is shared VERBATIM between the engines: DuckDB executes it
natively, Spark executes ``pgsyntax.rewrite(text)`` — so the oracle
match pins the *rewriter's semantics*, not a hand-built twin plan.

Dialect caveats honored in the shared text:

- DuckDB binds ``~`` to regexp_full_match while PG (and the Spark
  rewrite, via RLIKE) use partial match, so every pattern is wrapped
  ``.*pat.*`` where both semantics coincide (document text is
  single-line, FIXTURES.md);
- ``~*`` / ``!~*`` exist in PG but not DuckDB — they are unit-tested on
  the Spark side (test_pgsyntax.py) and kept out of the shared text;
- aggregates carry ``CAST(... AS BIGINT)`` (DuckDB HUGEINT hazard,
  plans/clickbench.py:20).

Scale notes: DISTINCT ON rewrites to one row_number window — a single
shuffle on the partition keys, no self-join; QUALIFY is a filter over
the already-computed window column (no extra exchange); the regex scan
is map-only JVM regex inside whole-stage codegen.
"""

from __future__ import annotations

from pg_ducklake_spark.pgsyntax import rewrite
from pg_ducklake_spark.plans import query, t

_DISTINCT_ON_SQL = """
SELECT DISTINCT ON (o_custkey)
       o_custkey, o_orderkey AS latest_orderkey,
       o_orderpriority AS latest_priority
FROM orders
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
"""

_QUALIFY_SQL = """
SELECT user_id, event_type, total FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS total
  FROM events GROUP BY user_id, event_type) g
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY total DESC, event_type) = 1
ORDER BY user_id
"""

_REGEX_SQL = """
SELECT source,
       CAST(SUM(CASE WHEN text ~ '.*value.*' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_value,
       CAST(SUM(CASE WHEN text !~ '.*table.*' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_table,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE source !~ '.*src1[0-9].*'
GROUP BY source
ORDER BY source
"""


def _spark_shared(spark, sf_dir, sql_text, tables):
    for name in tables:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(rewrite(sql_text))


@query("pg_distinct_on_latest", oracle=_DISTINCT_ON_SQL)
def pg_distinct_on_latest(spark, sf_dir):
    """Latest order per customer via PG ``DISTINCT ON`` — shared text;
    Spark runs the row_number-window rewrite (one o_custkey shuffle)."""
    return _spark_shared(spark, sf_dir, _DISTINCT_ON_SQL, ["orders"])


@query("pg_qualify_top_event", oracle=_QUALIFY_SQL)
def pg_qualify_top_event(spark, sf_dir):
    """Each user's most frequent event type via ``QUALIFY`` — shared
    text; Spark materializes the predicate as a boolean column."""
    return _spark_shared(spark, sf_dir, _QUALIFY_SQL, ["events"])


@query("pg_regex_operators", oracle=_REGEX_SQL)
def pg_regex_operators(spark, sf_dir):
    """PG regex operators ``~`` / ``!~`` over documents — shared text;
    Spark rewrites to RLIKE (patterns ``.*``-wrapped so DuckDB's
    full-match semantics coincide)."""
    return _spark_shared(spark, sf_dir, _REGEX_SQL, ["documents"])
