"""Product-quantization ANN — the third scale path for embedding
search (next to sign-LSH and IVF, operators/similarity.py / ivf.py).

PQ compresses each d-dim vector to ``m`` one-byte codes (d=64, m=8 →
64 floats → 8 bytes, 32×), so a billion-vector corpus's codes fit in
cluster memory and candidate scoring never re-reads the float vectors.
Search uses asymmetric distance computation (ADC): per query, one
m×256 lookup table of subspace inner products; each candidate's score
is m table gathers — no float math per candidate.

Layout mirrors the standard distributed design (Jégou et al., "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011):

- **train** driver-side on a bounded sample (k-means per subspace,
  seeded — deterministic);
- **encode** distributed via an Arrow-batched pandas UDF (vectorized
  argmin over the 256-row codebook, no per-row Python);
- **search** via mapInPandas over the code column: per batch, a numpy
  gather produces scores for all queries at once and only the
  per-batch top-k per query is emitted (map-side pruning), then one
  global top-k window. Optional exact re-rank of ``rerank × topk``
  ADC candidates against the float vectors (two-stage retrieval).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class PqIndex:
    codebooks: np.ndarray  # (m, k, dsub) float32
    m: int
    dsub: int
    k: int
    id_col: str
    vec_col: str


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _kmeans(data: np.ndarray, k: int, iters: int, rng: np.random.Generator):
    """Plain seeded Lloyd's — runs on a driver-side sample only."""
    k = min(k, len(data))
    centroids = data[rng.choice(len(data), size=k, replace=False)].copy()
    for _ in range(iters):
        # (n, k) squared distances via ||x||² - 2x·c + ||c||²
        d2 = (
            (data**2).sum(1)[:, None]
            - 2.0 * data @ centroids.T
            + (centroids**2).sum(1)[None, :]
        )
        assign = d2.argmin(1)
        for j in range(k):
            pts = data[assign == j]
            if len(pts):
                centroids[j] = pts.mean(0)
    return centroids


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    sample_rows: int = 20000,
    iters: int = 15,
    seed: int = 42,
) -> PqIndex:
    """Train per-subspace codebooks on a bounded driver-side sample
    (vectors are L2-normalized first so ADC inner product ≈ cosine)."""
    n = corpus.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = (
        corpus.sample(fraction=frac, seed=seed) if frac < 1.0 else corpus
    ).select(vec_col).collect()
    mat = _normalize(np.array([r[0] for r in sample], dtype=np.float32))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.stack(
        [
            _kmeans(np.ascontiguousarray(mat[:, i * dsub : (i + 1) * dsub]),
                    k, iters, rng)
            for i in range(m)
        ]
    ).astype(np.float32)
    return PqIndex(books, m, dsub, books.shape[1], id_col, vec_col)


def pq_encode(
    index: PqIndex, corpus: DataFrame, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(id, [keep_cols...,] codes array<int>) — one Arrow-batched pass,
    vectorized argmin against each subspace codebook. ``keep_cols``
    rides extra columns (e.g. an IVF cell id) through the encoding."""
    from pyspark.sql.functions import pandas_udf

    books, m, dsub = index.codebooks, index.m, index.dsub

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        mat = _normalize(np.array(vecs.tolist(), dtype=np.float32))
        out = np.empty((len(mat), m), dtype=np.int32)
        for i in range(m):
            sub = mat[:, i * dsub : (i + 1) * dsub]
            cb = books[i]
            d2 = (
                (sub**2).sum(1)[:, None]
                - 2.0 * sub @ cb.T
                + (cb**2).sum(1)[None, :]
            )
            out[:, i] = d2.argmin(1)
        return pd.Series(list(out))

    return corpus.select(
        F.col(index.id_col),
        *[F.col(c) for c in keep_cols],
        encode(F.col(index.vec_col)).alias("codes"),
    )


def pq_search(
    index: PqIndex,
    encoded: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Top-k by ADC score per query → (q_id, neighbor_id, score, rnk).
    With ``rerank`` (and the float ``corpus``), the top ``rerank×topk``
    ADC candidates are re-scored with exact cosine — the standard
    two-stage layout: compressed codes prune, floats only touch the
    shortlist.

    The query batch is materialized on the driver (its LUT ships in the
    task closure), so it must be small; ``max_query_rows`` makes a
    misuse fail loudly instead of OOMing the driver — chunk the query
    set and call per chunk for larger batches."""
    q_rows = queries.select(index.id_col, index.vec_col).limit(
        max_query_rows + 1
    ).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"pq_search query batch exceeds max_query_rows={max_query_rows}; "
            "split the query set into chunks (the per-query ADC LUT is "
            "driver-built and broadcast in the task closure)"
        )
    q_ids = [r[0] for r in q_rows]
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float32))
    books, m, dsub = index.codebooks, index.m, index.dsub
    # LUT[q, i, code] = <q_sub_i, codebook_i[code]>
    lut = np.stack(
        [
            np.stack(
                [q[i * dsub : (i + 1) * dsub] @ books[i].T for i in range(m)]
            )
            for q in q_mat
        ]
    ).astype(np.float32)
    n_keep = topk * (rerank or 1)
    id_col = index.id_col

    # id fields mirror the caller's id column type (see sq8.py — a
    # hardcoded LongType fails deep in Arrow conversion for non-integer
    # ids).
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
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            # scores[q, n] = Σ_i lut[q, i, codes[n, i]] — one gather
            scores = lut[:, np.arange(m)[None, :], codes].sum(2)
            # +1: the query row itself may sit in this batch's top set
            # and is dropped by the self-match filter afterwards
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
        # Hydrate: in pruned production mode the shortlist is bounded
        # (≤ |queries| × rerank×topk rows), so broadcast it against ONE
        # unshuffled corpus scan — without the hint Catalyst has no
        # size estimate for the post-mapInPandas side and plans a
        # sort-merge join that shuffles the entire float corpus, the
        # exact cost PQ exists to avoid. The corpus-covering rerank
        # budgets used to make results provably exact (oracle mode)
        # make the shortlist corpus-sized — keep the shuffle join
        # there; a broadcast would ship ~|corpus|×|queries| rows.
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


def pq_recall_vs_exact(
    index: PqIndex,
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
    approx = pq_search(
        index, encoded, queries, topk, rerank=rerank, corpus=corpus
    ).select("q_id", "neighbor_id")
    inter = exact.join(approx, ["q_id", "neighbor_id"]).count()
    denom = exact.count()
    return inter / denom if denom else 1.0
