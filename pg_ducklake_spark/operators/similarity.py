"""Reusable similarity-search operators over embedding columns
(array<float>). Parameterized library surface; oracle-verified fixed
variants in plans/similarity.py.

Dot products stay JVM-side as an aggregate(zip_with(...)) fold — in
pairwise scoring it measured FASTER than an unrolled 64-term sum at
every corpus size tried (the unrolled form's generated code blows the
JIT inlining budget: 6.4 s vs 1.7 s on a 1M-pair sweep) and it plans in
~1 ms. The LSH variants turn O(Q·N) scans into bucket equi-joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions.hashing import hyperplanes


def dot(a: str | Column, b: str | Column, dim: int | None = None) -> Column:
    """Element-ordered dot product. Omit ``dim`` for the fold form —
    the measured-faster default in pairwise scoring (module docstring);
    pass ``dim`` only where the unrolled flat sum is wanted explicitly
    (per-row, low-volume uses such as :func:`normalize`). Both are
    left-associated double adds, so values are bit-identical."""
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        # Unrolled as ONE SQL string: the same left-associated
        # codegen-able tree, built with a single JVM round trip instead
        # of ~4·dim Column calls (client plan-construction cost only).
        return F.expr(
            " + ".join(
                f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
                for i in range(dim)
            )
        )
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        # Unrolled: left-associated like the fold below, but codegen-able.
        out = a.getItem(0).cast("double") * b.getItem(0).cast("double")
        for i in range(1, dim):
            out = out + a.getItem(i).cast("double") * b.getItem(i).cast("double")
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: str | Column, b: str | Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (F.sqrt(dot(a, a, dim)) * F.sqrt(dot(b, b, dim)))


def normalize(
    df: DataFrame, vec_col: str, out_col: str | None = None, dim: int | None = None
) -> DataFrame:
    """L2-normalize once so downstream cosine = plain dot product (saves
    two norms per pair at query time)."""
    out = out_col or vec_col
    nrm = F.sqrt(dot(vec_col, vec_col, dim))
    return df.withColumn(
        out,
        F.transform(F.col(vec_col), lambda x: (x.cast("double") / nrm).cast("double")),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k: broadcast the query set against one corpus scan.

    Scale contract: |queries| must be broadcastable (≲ 10⁵ vectors);
    the corpus streams through unshuffled. For huge query sets use
    ann_lsh_topk instead.

    Pairwise scoring uses the fold dot (see module docstring), so
    ``dim`` is not probed — no extra driver job per call.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).filter(  # bcast-ok: capped query batch
        F.col(id_col) != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc(F.col(id_col))
    )
    return (
        scored.withColumn("cosine", cosine("q_vec", vec_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "cosine", "rnk")
    )


def cosine_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    margin: int = 32,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Exact cosine top-k with a BLAS selection stage: the query×corpus
    score matrix is computed per Arrow batch as one float64 GEMM
    (``mapInPandas``, the operators/pq.py pattern — DuckDB's vectorizer
    is what the SQL fold loses to at sf10), then only the per-batch
    top ``k+margin`` candidates get their cosine recomputed with the
    left-associated scalar fold that is bit-identical to the SQL/DuckDB
    oracle expression. Selection is BLAS-fast, VALUES are exact.

    Exactness note: a true top-k member is only missed if BLAS
    pairwise-summation error (~1e-13 relative) reorders it below
    k+margin within its batch — with margin=32 that needs 32+ scores
    inside a ~1e-13 window of the k-th, which continuous embeddings do
    not produce. The re-ranked values themselves are exact regardless.

    Scale shape: corpus streams through unshuffled (one GEMM per
    batch); the shuffled remainder is |batches|·|q|·(k+margin) rows —
    k-bounded, corpus-independent. The query batch is driver-collected
    and closure-shipped, capped like pq_search."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"cosine_topk_blas query batch exceeds max_query_rows="
            f"{max_query_rows}; chunk the query set"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    # Spark returns float32 array elements as exact Python doubles —
    # this matrix IS the CAST(x AS DOUBLE) the oracle applies.
    q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)

    def _fold(vals) -> float:
        acc = 0.0
        for v in vals:
            acc += v
        return acc

    # exact per-query norms: left-associated fold, like the oracle
    q_nrm_exact = np.array(
        [_fold([x * x for x in q]) ** 0.5 for q in q_mat]
    )
    q_nrm_blas = np.sqrt((q_mat * q_mat).sum(1))

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    kk_want = k + margin

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            c_mat = np.array(pdf[vec_col].tolist(), dtype=np.float32).astype(
                np.float64
            )
            c_nrm = np.sqrt((c_mat * c_mat).sum(1))
            scores = (q_mat @ c_mat.T) / (
                q_nrm_blas[:, None] * np.maximum(c_nrm, 1e-300)[None, :]
            )
            kk = min(kk_want + 1, scores.shape[1])  # +1 absorbs self-match
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = {"q_id": [], "neighbor_id": [], "cosine": []}
            for qi in range(len(q_ids)):
                q = q_mat[qi]
                qn = q_nrm_exact[qi]
                for n in top[qi]:
                    if ids[n] == q_ids[qi]:
                        continue
                    c = c_mat[n]
                    dot = _fold([x * y for x, y in zip(q, c)])
                    cn = _fold([y * y for y in c]) ** 0.5
                    rows["q_id"].append(q_ids[qi])
                    rows["neighbor_id"].append(int(ids[n]))
                    rows["cosine"].append(dot / (qn * cn))
            yield pd.DataFrame(rows)

    cand = corpus.select(id_col, vec_col).mapInPandas(score_batches, out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "cosine", "rnk")
    )


def lsh_bucket(df: DataFrame, vec_col: str, n_planes: int = 8, seed: int = 7,
               dim: int | None = None) -> DataFrame:
    """Sign-LSH bucket id (2^n_planes buckets) from seeded hyperplanes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim, seed)
    # One SQL string for the whole bucket id: same left-associated
    # literal-coefficient tree (CAST('<repr>' AS DOUBLE) round-trips the
    # exact binary64 value), one JVM call instead of ~5·planes·dim.
    terms = []
    for j, plane in enumerate(planes):
        d = " + ".join(
            f"CAST({vec_col}[{i}] AS DOUBLE) * CAST('{plane[i]!r}' AS DOUBLE)"
            for i in range(dim)
        )
        terms.append(f"IF(({d}) >= 0, {1 << j}, 0)")
    return df.withColumn("_lsh_bucket", F.expr(" + ".join(terms)))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates only within the query's LSH bucket —
    an equi-join on bucket id that scales to billions of vectors (the
    IVF-style scale path; recall grows with fewer planes / multiple
    probes)."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = lsh_bucket(corpus, vec_col, n_planes, seed, dim)
    qb = lsh_bucket(queries, vec_col, n_planes, seed, dim).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        "_lsh_bucket",
    )
    scored = cb.join(qb, "_lsh_bucket").filter(F.col(id_col) != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc(F.col(id_col)))
    return (
        scored.withColumn("cosine", cosine("q_vec", vec_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", F.col(id_col).alias("neighbor_id"), "cosine", "rnk")
    )
