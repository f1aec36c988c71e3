"""Importance-weighted sampling over ``documents``.

Extends the deterministic hash-threshold sampling family
(operators/text.py::sample_stratified, driver-proven as
``pipe_stratified_sample``) from fixed per-stratum fractions to
per-document weights: a document survives with probability equal to its
quality score. Same scale properties — purely map-side, no RNG state,
no shuffle for the sampling decision itself, reproducible across
engines/runs/partitionings — because the "randomness" is the md5-derived
h32 of the document id (functions/hashing.py) and the weight is a
deterministic column expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.functions.hashing import h32, sql_h32
from pg_ducklake_spark.plans import query, rebalance, t
from pg_ducklake_spark.plans.text import _DUCK_QUALITY, _SPARK_QUALITY

# Keep iff h32(doc_id) mod 10000 < floor(quality * 10000): acceptance
# probability == quality, exact on both engines (floor-then-cast avoids
# DuckDB's round-on-cast vs Spark's truncate-on-cast divergence).
_DUCK_KEEP = (
    f"({sql_h32('CAST(doc_id AS VARCHAR)')} % 10000)"
    f" < CAST(floor(({_DUCK_QUALITY}) * 10000) AS BIGINT)"
)


@query(
    "pipe_importance_sample",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN {_DUCK_KEEP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           ROUND(CAST(SUM(CASE WHEN {_DUCK_KEEP} THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS kept_pct,
           CAST(SUM(CASE WHEN {_DUCK_KEEP}
                    THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def pipe_importance_sample(spark, sf_dir):
    """Quality-proportional document sampling: P(keep) = quality score,
    decided by deterministic hash threshold — the data-mixing primitive
    for up/down-weighting sources by quality at 100 TB without an RNG
    or a shuffle. Reports per-source retention and surviving tokens."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    quality = F.expr(_SPARK_QUALITY)
    keep = (h32(F.col("doc_id").cast("string")) % 10_000) < F.floor(
        quality * 10_000
    ).cast("long")
    n_toks = F.size(F.split("text", " ")).cast("long")
    return (
        docs.select(
            "source",
            keep.cast("long").alias("kept"),
            F.when(keep, n_toks).otherwise(F.lit(0)).alias("kept_toks"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.round(
                F.sum("kept").cast("double") / F.count(F.lit(1)), 4
            ).alias("kept_pct"),
            F.sum("kept_toks").alias("kept_tokens"),
        )
        .orderBy("source")
    )


@query(
    "pipe_mixture_weights",
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w
      FROM per_source
    ),
    tot AS (SELECT ((CAST(SUM(CAST(((CAST(FLOOR((w) * 10000000000 + 0.5) AS BIGINT)) - ((((CAST(FLOOR((w) * 10000000000 + 0.5) AS BIGINT)) % 1000000000) + 1000000000) % 1000000000)) / 1000000000 AS BIGINT)) AS DOUBLE) * 1000000000 + CAST(SUM((((CAST(FLOOR((w) * 10000000000 + 0.5) AS BIGINT)) % 1000000000) + 1000000000) % 1000000000) AS DOUBLE)) / 10000000000) AS total FROM weighted)
    SELECT w.source, w.n_tokens,
           ROUND(w.w / t.total, 6) AS share,
           CAST(FLOOR(w.w / t.total * 1000000000) AS BIGINT)
             AS planned_tokens
    FROM weighted w CROSS JOIN tot t
    ORDER BY w.source
    """,
)
def pipe_mixture_weights(spark, sf_dir):
    """Temperature-scaled training-mixture plan (alpha = 0.5): each
    source's sampling weight is sqrt(its token count), normalized —
    the standard up-weighting of small sources (multilingual LM
    mixing; e.g. XLM-R's temperature sampling) — plus the planned
    token allocation under a 1B-token budget.

    Exactness: sqrt is IEEE-correctly-rounded (identical on both
    engines), and the normalizing total uses the exact fixed-point
    sum (functions/exact.py), so it is summation-order-independent —
    shares and the floor'd allocations match bit-for-bit. Scale
    shape: one map-side-combined per-source aggregate over the
    corpus; everything after operates on |sources| rows (the
    broadcast single-row total, same layout as graph_triangle_census's
    summary join)."""
    from pg_ducklake_spark.functions import dsum

    docs = rebalance(t(spark, sf_dir, "documents"))
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("long"))
        .cast("long")
        .alias("n_tokens")
    )
    weighted = per_source.select(
        "source", "n_tokens", F.sqrt(F.col("n_tokens").cast("double")).alias("w")
    )
    tot = weighted.agg(dsum("w").alias("total"))
    return (
        weighted.crossJoin(F.broadcast(tot))  # bcast-ok: 1-row total
        .select(
            "source",
            "n_tokens",
            F.round(F.col("w") / F.col("total"), 6).alias("share"),
            F.floor(F.col("w") / F.col("total") * F.lit(1000000000))
            .cast("long")
            .alias("planned_tokens"),
        )
        .orderBy("source")
    )
