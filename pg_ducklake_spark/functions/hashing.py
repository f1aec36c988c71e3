"""Cross-engine deterministic hashing primitives.

Engine-native hash functions (Spark's murmur3/xxhash64, DuckDB's
``hash()``) do not agree across engines, so every hash used in a
dedup/similarity operator that must be oracle-verifiable is derived from
**md5** — identical everywhere — by interpreting the first 8 hex chars
as a 32-bit unsigned integer:

    h32(s) = int(md5(s)[0:8], 16)        ∈ [0, 2^32)

Spark computes it with ``conv(substr(md5(s),1,8),16,10)``. DuckDB has no
``conv``, so the oracle SQL expands the same base-16 positional sum
textually (generated here). MinHash permutations are the classic
universal-hash family h_i(x) = (a_i·x + b_i) mod p with p = 2^31-1 and
seeded-constant a_i, b_i — all products stay < 2^63 so int64 math is
exact and identical on both engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1


def h32(col: Column | str) -> Column:
    """Spark: first 8 md5 hex chars of a string column as BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def sql_h32(expr: str) -> str:
    """DuckDB SQL computing the same value as :func:`h32` (no conv())."""
    terms = []
    for i in range(1, 9):
        mult = 16 ** (8 - i)
        terms.append(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"
            f" * CAST({mult} AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def minhash_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k seeded (a, b) pairs for the universal-hash family (a in [1, 1e6))."""
    rng = random.Random(seed)
    return [(rng.randrange(1, 1_000_000), rng.randrange(0, MERSENNE31)) for _ in range(k)]


def minhash_col(h: Column, a: int, b: int) -> Column:
    """Spark: one permuted hash (a*h + b) mod (2^31-1)."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


def sql_minhash(h_expr: str, a: int, b: int) -> str:
    """DuckDB SQL equivalent of :func:`minhash_col`."""
    return f"(({h_expr}) * CAST({a} AS BIGINT) + CAST({b} AS BIGINT)) % {MERSENNE31}"


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes for sign-LSH over embeddings.

    Components are small exact-in-binary rationals (k/64) so literal
    round-trips through SQL text parse to identical doubles everywhere.
    """
    rng = random.Random(seed)
    return [
        [rng.randrange(-32, 33) / 64.0 for _ in range(dim)] for _ in range(n_planes)
    ]
