"""Scalar-quantization (SQ8) ANN — the uniform-quantizer scale path for
embedding search, completing the FAISS index family next to sign-LSH
(similarity.py), IVF (ivf.py), PQ (pq.py) and IVF-PQ (ivfpq.py).

SQ8 stores each dimension as one byte on a per-dimension uniform grid
(d=64 → 64 bytes/vector, 4× vs float32), so candidate scoring reads
codes, not floats, and — unlike PQ — needs no trained codebooks: the
quantizer is just per-dimension (min, scale). The approximate inner
product against a query folds into ONE dense GEMM per Arrow batch:

    dot(q, dequant(c)) = q·vmin + Σ_d (q_d · scale_d) · c_d
                       = bias_q + codes @ w_q

(matching the asymmetric scoring of FAISS ``IndexScalarQuantizer``
with QT_8bit; Jégou et al.'s ADC specialized to a diagonal codebook).

Layout mirrors operators/pq.py:
- **train**: per-dimension min/max of the L2-normalized corpus,
  computed EXACTLY with one distributed aggregate (128 column mins/
  maxes — no sample, no driver data);
- **encode**: Arrow-batched pandas UDF, vectorized clip/round;
- **search**: mapInPandas GEMM per batch emits per-batch top-k per
  query (map-side pruning), one global top-k window, optional exact
  cosine re-rank of the shortlist (two-stage retrieval, same hydrate
  strategy as PQ).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class Sq8Index:
    vmin: np.ndarray  # (d,) float32 — per-dimension grid origin
    scale: np.ndarray  # (d,) float32 — per-dimension step (max-min)/255
    d: int
    id_col: str
    vec_col: str


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def sq8_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> Sq8Index:
    """Exact per-dimension (min, max) of the normalized corpus via one
    distributed aggregate — 2·d agg expressions, no sample bias, no
    driver-side data beyond the 2·d scalars."""
    unit = (
        f"transform({vec_col}, x -> CAST(x AS DOUBLE)"
        f" / greatest(sqrt(aggregate(transform({vec_col},"
        f" v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (a, v) -> a + v)), 1e-300))"
    )
    row = (
        corpus.select(F.expr(unit).alias("u"))
        .agg(
            *[F.min(F.col("u")[i]).alias(f"lo{i}") for i in range(dim)],
            *[F.max(F.col("u")[i]).alias(f"hi{i}") for i in range(dim)],
        )
        .collect()[0]
    )
    vmin = np.array([row[f"lo{i}"] for i in range(dim)], dtype=np.float32)
    vmax = np.array([row[f"hi{i}"] for i in range(dim)], dtype=np.float32)
    scale = (vmax - vmin) / 255.0
    scale[scale == 0] = 1.0  # constant dimension → any code maps back to vmin
    return Sq8Index(vmin, scale, dim, id_col, vec_col)


def sq8_encode(
    index: Sq8Index, corpus: DataFrame, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(id, [keep_cols...,] codes array<int>) — one Arrow-batched pass,
    vectorized round/clip onto the per-dimension grid."""
    from pyspark.sql.functions import pandas_udf

    vmin, scale = index.vmin, index.scale

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        mat = _normalize(np.array(vecs.tolist(), dtype=np.float32))
        codes = np.clip(
            np.rint((mat - vmin[None, :]) / scale[None, :]), 0, 255
        ).astype(np.int32)
        return pd.Series(list(codes))

    return corpus.select(
        F.col(index.id_col),
        *[F.col(c) for c in keep_cols],
        encode(F.col(index.vec_col)).alias("codes"),
    )


def sq8_search(
    index: Sq8Index,
    encoded: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Top-k by dequantized inner product per query → (q_id,
    neighbor_id, score, rnk). With ``rerank`` (and the float
    ``corpus``), the top ``rerank×topk`` candidates are re-scored with
    exact cosine — compressed codes prune, floats only touch the
    shortlist. The query batch is driver-materialized (its weight
    matrix ships in the task closure); ``max_query_rows`` makes misuse
    fail loudly instead of OOMing the driver."""
    q_rows = queries.select(index.id_col, index.vec_col).limit(
        max_query_rows + 1
    ).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"sq8_search query batch exceeds max_query_rows={max_query_rows}; "
            "split the query set into chunks (the per-query weight matrix is "
            "driver-built and broadcast in the task closure)"
        )
    q_ids = [r[0] for r in q_rows]
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float32))
    # score(q, c) = q·vmin + codes @ (q ⊙ scale)
    bias = (q_mat @ index.vmin).astype(np.float32)  # (Q,)
    weights = (q_mat * index.scale[None, :]).astype(np.float32)  # (Q, d)
    n_keep = topk * (rerank or 1)
    id_col = index.id_col

    # The id fields mirror the caller's id column type (ADVICE r6: a
    # hardcoded LongType made non-integer ids fail deep inside Arrow
    # conversion instead of carrying through like the join logic does).
    id_type = encoded.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_batches(batches):
        for pdf in batches:
            codes = np.array(pdf["codes"].tolist(), dtype=np.float32)
            ids = pdf[id_col].to_numpy()
            scores = codes @ weights.T + bias[None, :]  # (n, Q) one GEMM
            scores = scores.T  # (Q, n)
            kk = min(n_keep + 1, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = {"q_id": [], "neighbor_id": [], "score": []}
            for qi, q_id in enumerate(q_ids):
                sel = top[qi]
                rows["q_id"].extend([q_id] * len(sel))
                rows["neighbor_id"].extend(ids[sel].tolist())
                rows["score"].extend(scores[qi, sel].astype(float).tolist())
            yield pd.DataFrame(rows)

    partial = encoded.mapInPandas(score_batches, out_schema).filter(
        F.col("q_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    shortlist = (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n_keep)
        .drop("rnk")
    )
    if rerank and corpus is not None:
        from pg_ducklake_spark.operators.similarity import cosine

        qv = queries.select(
            F.col(index.id_col).alias("q_id"),
            F.col(index.vec_col).alias("_q_vec"),
        )
        cv = corpus.select(
            F.col(index.id_col).alias("neighbor_id"),
            F.col(index.vec_col).alias("_n_vec"),
        )
        # Same hydrate strategy as pq_search: pruned production
        # shortlists are q×k-bounded → broadcast them against one
        # unshuffled corpus scan; corpus-covering (oracle-mode) rerank
        # budgets make the shortlist corpus-sized → shuffle join.
        if n_keep * max(len(q_ids), 1) <= 1_000_000:
            shortlist = cv.join(
                F.broadcast(shortlist.join(F.broadcast(qv), "q_id")),  # bcast-ok: q*k-bounded shortlist x capped query batch
                "neighbor_id",
            )
        else:
            shortlist = shortlist.join(F.broadcast(qv), "q_id").join(  # bcast-ok: capped query batch
                cv, "neighbor_id"
            )
        shortlist = shortlist.withColumn(
            "score", cosine("_q_vec", "_n_vec")
        ).drop("_q_vec", "_n_vec")
    w2 = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        shortlist.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= topk)
        .select("q_id", "neighbor_id", "score", "rnk")
    )


def sq8_recall_vs_exact(
    index: Sq8Index,
    encoded: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    rerank: int | None = None,
) -> float:
    from pg_ducklake_spark.operators.similarity import cosine_topk

    exact = cosine_topk(
        corpus, queries, index.id_col, index.vec_col, k=topk
    ).select("q_id", "neighbor_id")
    approx = sq8_search(
        index, encoded, queries, topk, rerank=rerank, corpus=corpus
    ).select("q_id", "neighbor_id")
    inter = exact.join(approx, ["q_id", "neighbor_id"]).count()
    denom = exact.count()
    return inter / denom if denom else 1.0
