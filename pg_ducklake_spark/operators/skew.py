"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; ``salted_join`` is the explicit tool for the pathological case —
a shuffle join where a handful of keys dominate (the classic 100 TB
killer). The hot side gets a random salt in [0, salt); the small side
is replicated ``salt`` times; the join key becomes (key, salt), fanning
each hot key across ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with key salting.

    ``small`` is replicated ``salt``× (use only when |small| · salt is
    manageable — that's the same precondition as any salting scheme).
    Output columns = big's ∪ small's minus the duplicate key.
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Per-key row counts with share-of-total — the diagnosis step
    before reaching for salting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"))
        .limit(top)
    )
