"""Connected components over a pair-edge list — the clustering step
between near-duplicate PAIR detection (Jaccard / MinHash / SimHash,
operators/dedup.py) and canonical-document selection: duplicates chain
(a~b, b~c without a~c), so keep-one-per-pair under-deletes; keep one
per COMPONENT is the correct training-data dedup contract.

Algorithm: iterative minimum-label propagation with pointer jumping —
each round every node takes the min component id over itself and its
neighbors, then labels are compressed by one pointer-jump
(comp ← comp[comp]), giving O(log n) rounds on chain-shaped graphs
instead of O(diameter). Every round is two shuffles (one neighbor join,
one jump join) on the node id; nothing ever touches the driver except
the convergence counter. This is the standard distributed CC layout
(the large-star/small-star family); at 100 TB the edge list is the
scale carrier and rounds stay join-shaped throughout.

Determinism: the result maps every node to the MINIMUM node id
reachable from it — a pure graph property, independent of execution
order, partitioning, or iteration count at convergence. That is what
makes a SQL oracle possible (a recursive CTE computes the same min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    edges_unique: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum reachable node id. Raises if the
    label propagation has not converged after ``max_iter`` rounds
    (~2^max_iter-diameter graphs — unreachable in practice).

    ``edges_unique=True`` declares the input a duplicate-free
    ordered-pair list (src < dst, one row per pair) — the contract
    every pair generator in this library meets by construction. The
    symmetric expansion of such a list cannot collide, so the
    dedup shuffle before the loop is skipped outright (guide §2.4:
    a ``distinct`` on already-unique data is a pure exchange tax).
    Duplicate edges would not change the result (min over repeated
    neighbors), only the per-round join volume — so the flag is a
    pure plan-shape switch."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    if not edges_unique:
        sym = sym.distinct()
    # One materialization job for the symmetric edge set; every round
    # re-reads it from local blocks.
    sym = sym.localCheckpoint(eager=True)
    # Seed with the FIRST propagation folded in: comp0 = min(node, min
    # neighbor). Equivalent to one free label-propagation round — the
    # loop below then only runs for multi-hop structures.
    comp = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("mn"))
        .select("node", F.least("node", "mn").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(comp.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp")
            .withColumn("old", F.lit(None).cast("long"))
        )
        # Carry the previous label THROUGH the union-aggregate (each
        # node has exactly one comp row, so max(old) recovers it) —
        # convergence is then read off the checkpointed result with a
        # cheap local scan instead of a separate join-against-old job
        # (that join was a full shuffle per round, doubling the
        # per-round fixed cost at bench scale).
        new = (
            comp.select(
                "node", "comp", F.col("comp").cast("long").alias("old")
            )
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.max("old").alias("old"))
        )
        # pointer jump: comp ← comp[comp] (path compression)
        jump = new.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        # localCheckpoint, not persist: each round's plan references the
        # previous round's twice, so lineage grows exponentially and a
        # few dozen rounds OOM the driver during analysis. Checkpointing
        # materializes the round AND truncates the plan — the required
        # idiom for iterative DataFrame algorithms.
        #
        # Convergence rides the SAME job via observe(): the checkpoint
        # materialization is a full pass over the round's rows anyway,
        # so counting label changes there (CollectMetrics fires on the
        # eager-checkpoint action) replaces the per-round isEmpty scan
        # job — one job per round instead of two (r12, guide §2.4: the
        # per-job fixed cost scales with round count on high-round
        # graphs; the result rows are untouched).
        obs = Observation()
        new = (
            new.join(jump, "comp", "left")
            .select(
                "node", F.coalesce("comp2", "comp").alias("comp"), "old"
            )
            .observe(
                obs,
                F.sum(
                    (F.col("comp") != F.col("old")).cast("long")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = bool(obs.get["changed"] or 0)
        comp = new.select("node", "comp")
        if not changed:
            return comp
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
