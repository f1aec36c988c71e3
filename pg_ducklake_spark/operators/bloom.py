"""Distributed Bloom filter: build once, broadcast, prune anywhere.

The lakehouse semi-join pruning tool at 100 TB: a key set of ANY size
compiles into a fixed ``m/32``-row table of exact BIGINT words (32 used
bits each — no sign-bit traps on either engine), built by one
map-side-combined ``bit_or`` aggregate. Probing joins that word table
broadcast and filters map-side — replacing a shuffle semi-join with a
scan-side filter, the same trade Spark's runtime bloom join makes, but
materialized so it can be reused across queries, persisted, or shipped
to another engine.

Hashing is the house cross-engine recipe (functions/hashing.py): k
seeded universal hashes over the md5-derived h32, so a filter built
here is bit-identical to one built by the DuckDB oracle SQL — which is
what lets ``stats_bloom_membership`` hash-match across engines.

Guarantees: no false negatives (every true member hits); false-positive
rate ≈ (1 - e^(-k·n/m))^k. Reference scope: the reference engine has no
bloom surface; this is part of the training-data-pipeline extension
family (SURVEY.md north-star operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_ducklake_spark.functions.hashing import MERSENNE31, minhash_coeffs

DEFAULT_M = 1 << 17  # bits
DEFAULT_K = 4


def _h32_str(col: Column) -> Column:
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("long")


def _positions(col: Column, m: int, k: int, seed: int) -> Column:
    """Array of the k bit positions for one key."""
    h = _h32_str(col)
    return F.array(
        *[
            ((h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)) % F.lit(m)
            for a, b in minhash_coeffs(k, seed=seed)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = 7,
) -> DataFrame:
    """Compile ``df[key_col]``'s value set into a Bloom word table
    ``(word: long, wv: long)`` with ≤ ``m/32`` rows. One shuffle whose
    map side partial-aggregates to at most m/32 rows per task — the
    exchange is metadata-sized no matter how many keys feed it."""
    return (
        df.select(F.explode(_positions(F.col(key_col), m, k, seed)).alias("pos"))
        .select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(b)").alias("wv"))
    )


def bloom_contains(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = 7,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: does ``key_col`` hit the
    filter?  The k probe positions explode, join the broadcast word
    table, and fold back with min() — rows re-group on their original
    columns, so the explode never leaves the map side of one exchange
    keyed by the probe row."""
    cols = df.columns
    probed = (
        df.withColumn("_pos", F.explode(_positions(F.col(key_col), m, k, seed)))
        .join(  # probe side: word table bounded by construction
            F.broadcast(bloom),  # bcast-ok: ≤ m/32 words by construction
            (F.col("_pos") / 32).cast("long") == F.col("word"),
            "left",
        )
        .withColumn(
            "_bit",
            F.when(
                F.col("wv").isNotNull()
                & (
                    F.expr(
                        "wv & shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT))"
                    )
                    != 0
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy(*cols)
        .agg((F.min("_bit") == 1).alias(out_col))
    )
    return probed


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    seed: int = 7,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the set (superset of the
    true semi-join — follow with the real join for exactness; the
    pruning happens before the shuffle the join would pay)."""
    out = bloom_contains(df, key_col, bloom, m, k, seed)
    return out.filter(F.col("bloom_hit")).drop("bloom_hit")
