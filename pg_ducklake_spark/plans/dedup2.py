"""Exact-substring window dedup over ``documents``.

The "long shared verbatim span" detector from Lee et al.,
*Deduplicating Training Data Makes Language Models Better* (ACL 2022):
two documents sharing any run of K consecutive tokens are near-dups
even when their Jaccard similarity is low (boilerplate headers, quoted
paragraphs). A true suffix array is a single-node construction; the
distributed equivalent is a rolling K-token window hash + equi-join —
candidate generation never leaves equi-join land, so it scales exactly
like the shingle/MinHash family (plans/dedup.py).

Hashes are the md5-derived h32 (functions/hashing.py) so the DuckDB
oracle computes bit-identical join keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.functions.hashing import sql_h32
from pg_ducklake_spark.plans import query, rebalance, scoped_persist, t

_K = 8  # window length in tokens

_SPARK_WIN_ELEMS = ", ".join(f"element_at(toks, i + {j})" for j in range(_K))
# Typed empty ELSE arm: a bare array() is ARRAY<NULL> and the coercion
# knocks the expression out of whole-stage codegen (see plans/dedup.py).
_SPARK_WINDOWS = f"""
CASE WHEN size(toks) >= {_K} THEN
  array_distinct(transform(
    sequence(1, size(toks) - {_K - 1}),
    i -> CAST(conv(substring(md5(concat_ws(' ', {_SPARK_WIN_ELEMS})), 1, 8),
                   16, 10) AS BIGINT)))
ELSE CAST(array() AS ARRAY<BIGINT>) END
"""

_DUCK_WIN_ELEMS = ", ".join(f"toks[i + {j}]" for j in range(_K))
# DuckDB range(1, n) is [1, n); start i runs 1 .. len-K+1.
_DUCK_WINDOWS = f"""
list_distinct(list_transform(
  range(1, greatest(len(toks) - {_K - 2}, 1)),
  i -> {sql_h32(f"concat_ws(' ', {_DUCK_WIN_ELEMS})")}))
"""


@query(
    "dedup_substring_windows",
    oracle=f"""
    WITH win AS (
      SELECT doc_id, {_DUCK_WINDOWS.strip()} AS ws
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents) tk
    ),
    ex AS (SELECT doc_id, unnest(ws) AS wh FROM win)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ex a JOIN ex b ON a.wh = b.wh AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    HAVING COUNT(*) >= 3
    ORDER BY doc_a, doc_b
    """,
)
def dedup_substring_windows(spark, sf_dir):
    """Document pairs sharing ≥3 distinct 8-token verbatim windows.

    Plan: tokenize → per-doc distinct rolling-window hashes (map-only,
    codegen'd) → explode → prune windows seen in only one doc (lossless
    — a singleton window can never join) → self-equi-join on the window
    hash → pair count. At 100 TB the df-capped variant of the same
    pruning (drop boilerplate windows above a document-frequency cap,
    as in pipe_contamination_check) bounds the join's key skew."""
    docs = t(spark, sf_dir, "documents")
    windowed = rebalance(docs.select("doc_id", "text")).select(
        "doc_id",
        F.expr("split(lower(text), ' ')").alias("toks"),
    ).select("doc_id", F.expr(_SPARK_WINDOWS).alias("ws"))
    # explode_outer fence: plain explode pushes a size()>0 pre-filter
    # below the Generate that re-evaluates the window expression per
    # row, interpreted (plans/dedup.py:197-199). scoped_persist (r10):
    # the df-prune branch AND the join both consume this frame — the
    # per-window md5+conv transform evaluates in the interpreted
    # lambda path, so recomputing it per consumer doubled the
    # dominant cost.
    exploded = scoped_persist(
        windowed.select("doc_id", F.explode_outer("ws").alias("wh")).filter(
            F.col("wh").isNotNull()
        ),
        "dedup_substring_windows",
    )
    shared = (
        exploded.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("wh")
    )
    joinable = exploded.join(shared, "wh")
    a = joinable.select(F.col("doc_id").alias("doc_a"), "wh")
    b = joinable.select(F.col("doc_id").alias("doc_b"), "wh")
    return (
        a.join(b, ["wh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .select("doc_a", "doc_b", "n_shared")
        .orderBy("doc_a", "doc_b")
    )
