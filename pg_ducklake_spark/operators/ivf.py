"""IVF (inverted-file) approximate nearest neighbor over embedding
columns: k-means centroids partition the corpus into cells; a query
probes only the ``nprobe`` nearest cells.

This is the second scale path next to sign-LSH (operators/similarity):
LSH needs no training but fixes its bucket geometry; IVF adapts cells
to the data distribution (higher recall at the same probe cost).
Training uses Spark ML KMeans (seeded — deterministic for a fixed
dataset/partitioning); assignment + search are pure DataFrame joins:

    index = ivf_build(spark, corpus, k=64)
    hits  = ivf_search(index, queries, topk=10, nprobe=4)

Scale notes: centroids are tiny (k × dim) and broadcast everywhere;
assignment is one scan; search shuffles only on cell id — at 1B+
vectors this is the standard distributed-IVF layout (train on a
sample, assign in one pass, co-partition by cell).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_ducklake_spark.operators.similarity import cosine, dot


@dataclass
class IvfIndex:
    spark: SparkSession
    centroids: DataFrame  # (cell bigint, centroid array<double>) — small
    assigned: DataFrame  # corpus + cell
    id_col: str
    vec_col: str
    k: int


def _assign(df: DataFrame, centroid_rows: list[tuple[int, list[float]]],
            vec_col: str) -> DataFrame:
    """Nearest-centroid (max cosine) cell per row, computed map-side.

    The centroid matrix is embedded as an array literal and the argmax
    runs per row via array_max over (sim, -cell) structs — ZERO shuffle
    (the crossJoin+window alternative shuffles corpus × k rows keyed by
    the whole row, which dies at a billion vectors). Ties break to the
    smaller cell id via the negated-cell struct field."""
    cents = F.array(
        *[
            F.struct(
                F.lit(cell).cast("long").alias("cell"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("centroid"),
            )
            for cell, vec in centroid_rows
        ]
    )
    v = F.col(vec_col)
    vnorm = F.sqrt(dot(v, v))

    def sim_struct(c):
        d = dot(v, c["centroid"])
        cn = F.sqrt(dot(c["centroid"], c["centroid"]))
        return F.struct(
            (d / (vnorm * cn)).alias("sim"), (-c["cell"]).alias("negcell")
        )

    best = F.array_max(F.transform(cents, sim_struct))
    return df.withColumn("cell", (-best["negcell"]).cast("long"))


def ivf_build(
    spark: SparkSession,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> IvfIndex:
    """Train centroids (optionally on a sample — the 100 TB path) and
    assign every corpus vector to its cell."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = corpus if sample_fraction is None else corpus.sample(
        fraction=sample_fraction, seed=seed
    )
    feats = train.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feats)
    centroid_rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids = spark.createDataFrame(
        centroid_rows, "cell bigint, centroid array<double>"
    )
    # Pre-cast the vector to double and precompute its L2 norm ONCE per
    # corpus row at build time: candidate scoring recomputing
    # sqrt(dot(v,v)) per (query, candidate) pair tripled the fold work
    # — the per-pair cosine is now one multiply-add fold plus a divide.
    # float→double is exact and sqrt is a pure function, so the scored
    # values are bit-identical to the per-pair recompute (the SQL-oracle
    # gate on sim_ivf_topk pins this).
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    assigned = (
        _assign(corpus, centroid_rows, vec_col)
        .withColumn("_dvec", vd)
        .withColumn("_nrm", F.sqrt(dot(F.col("_dvec"), F.col("_dvec"))))
        .persist()
    )
    return IvfIndex(spark, centroids, assigned, id_col, vec_col, k)


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    topk: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors per query, probing the nprobe nearest
    cells. Returns (q_id, neighbor_id, cosine, rnk)."""
    q = queries.select(
        F.col(index.id_col).alias("q_id"),
        F.transform(F.col(index.vec_col), lambda x: x.cast("double")).alias(
            "q_vec"
        ),
    ).withColumn("_qnrm", F.sqrt(dot(F.col("q_vec"), F.col("q_vec"))))
    qs = q.crossJoin(F.broadcast(index.centroids)).withColumn(  # bcast-ok: k centroids
        "_sim", cosine("q_vec", "centroid")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        qs.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("q_id", "q_vec", "_qnrm", "cell")
    )
    # probes is bounded (|queries| × nprobe rows) but post-window, so
    # Catalyst has no size estimate — broadcast it so the assigned
    # corpus streams through unshuffled (at scale, a shuffle of the
    # whole corpus on cell id is the cost IVF exists to avoid).
    cand = index.assigned.join(F.broadcast(probes), "cell").filter(  # bcast-ok: q*nprobe-bounded probe set
        F.col(index.id_col) != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc(F.col(index.id_col))
    )
    # One fold per pair; both norms come precomputed (build time for the
    # corpus, probe time for the bounded query side). Same a/(b*c)
    # expression tree as cosine() — values bit-identical.
    score = dot(F.col("q_vec"), F.col("_dvec")) / (
        F.col("_qnrm") * F.col("_nrm")
    )
    return (
        cand.withColumn("cosine", score)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("q_id", F.col(index.id_col).alias("neighbor_id"), "cosine", "rnk")
    )


def ivf_recall_vs_exact(
    index: IvfIndex, queries: DataFrame, topk: int = 10, nprobe: int = 4
) -> float:
    """Recall@k of the IVF result against exact brute force — the tuning
    loop for (k, nprobe)."""
    from pg_ducklake_spark.operators.similarity import cosine_topk

    exact = cosine_topk(
        index.assigned.drop("cell"), queries, index.id_col, index.vec_col, k=topk
    ).select("q_id", "neighbor_id")
    approx = ivf_search(index, queries, topk, nprobe).select("q_id", "neighbor_id")
    inter = exact.join(approx, ["q_id", "neighbor_id"]).count()
    denom = exact.count()
    return inter / denom if denom else 1.0
