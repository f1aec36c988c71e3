"""Distributed Bloom filter: build once, broadcast, prune anywhere.

The lakehouse semi-join pruning tool at 100 TB: a key set of ANY size
compiles into a fixed ``m/32``-row table of exact BIGINT words (32 used
bits each — no sign-bit traps on either engine), built by one
map-side-combined ``bit_or`` aggregate. Probing inlines that word
table as a plan literal and bit-tests in a pure projection — zero
exchanges above the fact scan, replacing a shuffle semi-join with a
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


# Largest word table we will inline as a plan literal: 1<<17 words =
# 4 Mbit filter = ~1 MiB of BIGINTs in the plan. Beyond that, fall back
# to k broadcast hash joins (still map-side, never a fact shuffle).
LITERAL_MAX_WORDS = 1 << 17

# 1<<i for i in 0..31 as a literal array — F.shiftleft only takes a
# Python int shift, so column-valued shifts index this instead.
_BIT_MASKS = [1 << i for i in range(32)]


def _bit_mask(pos: Column) -> Column:
    """2^(pos % 32) as a BIGINT column."""
    return F.element_at(
        F.lit(_BIT_MASKS), (pos % 32).cast("int") + 1
    ).cast("long")


def _dense_words(bloom: DataFrame, m: int) -> list[int]:
    """Collect the word table into a dense ``m/32``-length array.

    Bounded by contract: ``bloom_build`` emits at most ``m/32`` rows no
    matter how many keys fed it, so this collect is metadata-sized
    (4096 longs at the default m) — the same class as the repo's other
    bounded-by-construction collects."""
    n_words = (m + 31) // 32
    arr = [0] * n_words
    for row in bloom.collect():  # bounded: ≤ m/32 rows by construction
        arr[int(row["word"])] = int(row["wv"])
    return arr


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
    filter?

    Pure projection — no explode, no join, no exchange: the word table
    (≤ ``m/32`` longs by construction) is collected once and inlined as
    an array literal, and the k bit tests fold with ``forall`` inside
    whole-stage codegen. Row multiplicity is untouched (duplicate fact
    rows stay duplicated — r8's groupBy(*cols) re-fold collapsed them),
    and the probe works over any column types since nothing re-groups.
    For filters too large to inline (> ``LITERAL_MAX_WORDS`` words) the
    probe degrades to k broadcast hash joins of the word table — still
    map-side, the fact side never shuffles."""
    n_words = (m + 31) // 32
    if n_words <= LITERAL_MAX_WORDS:
        words = F.lit(_dense_words(bloom, m))
        # Null keys produce null positions, and element_at(<literal
        # array>, NULL) NPEs in Spark 4.1's codegen — the when() guard
        # short-circuits so element_at never sees a null index.
        hit = F.forall(
            _positions(F.col(key_col), m, k, seed),
            lambda p: F.when(p.isNull(), F.lit(False)).otherwise(
                F.element_at(words, (p / 32).cast("int") + 1).bitwiseAND(
                    _bit_mask(p)
                )
                != 0
            ),
        )
        return df.withColumn(out_col, F.coalesce(hit, F.lit(False)))

    # Oversized filter: k broadcast probes, one per hash. Each join is a
    # BroadcastHashJoin on the ≤ m/32-row word table; the fact side
    # stays map-side and duplicates survive because nothing re-groups.
    h = _h32_str(F.col(key_col))
    out = df
    bit_tests: list[Column] = []
    for i, (a, b) in enumerate(minhash_coeffs(k, seed=seed)):
        pos = ((h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)) % F.lit(m)
        wcol, pcol = f"_blw{i}", f"_blp{i}"
        out = out.withColumn(pcol, pos).join(
            F.broadcast(  # bcast-ok: ≤ m/32 words by construction
                bloom.select(
                    F.col("word").alias(f"_blword{i}"), F.col("wv").alias(wcol)
                )
            ),
            (F.col(pcol) / 32).cast("long") == F.col(f"_blword{i}"),
            "left",
        ).drop(f"_blword{i}")
        bit_tests.append(
            F.col(wcol).isNotNull()
            & (F.col(wcol).bitwiseAND(_bit_mask(F.col(pcol))) != 0)
        )
    hit = bit_tests[0]
    for t_ in bit_tests[1:]:
        hit = hit & t_
    out = out.withColumn(out_col, F.coalesce(hit, F.lit(False)))
    return out.drop(*[f"_blw{i}" for i in range(k)], *[f"_blp{i}" for i in range(k)])


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
