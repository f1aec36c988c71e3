"""IVF-PQ: the composed billion-scale ANN architecture (FAISS's
IndexIVFPQ; Jégou et al. 2011 §V) — IVF cells prune WHICH vectors are
scored, PQ codes prune WHAT is read to score them.

The two indexes already exist here separately (operators/ivf.py,
operators/pq.py); this module composes them the standard way:

- build: assign every vector to its IVF cell (broadcast centroids,
  map-side argmax) and PQ-encode it (Arrow-batched pandas UDF); the
  search structure is ONE slim table (id, cell, 8-byte codes) — 32×
  smaller than the float corpus.
- search: probe cells are computed DRIVER-SIDE (queries and centroids
  are both tiny — no Spark job, unlike standalone ivf_search's
  crossJoin+window), then a single mapInPandas pass over the code
  table scores, per Arrow batch, only the rows whose cell is probed
  by each query (numpy mask + LUT gather) and emits per-batch top-k;
  one global top-k window finishes. Optional exact re-rank hydrates
  the float vectors for the bounded shortlist only.

At 100 TB: the code table streams (no shuffle until the tiny top-k
exchange), the LUT ships in the task closure, and cell probing cuts
scored rows by nprobe/n_cells — the exact candidate-volume lever the
SCALEBENCH slope measures for IVF and PQ individually.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_ducklake_spark.operators.ivf import IvfIndex, ivf_build
from pg_ducklake_spark.operators.pq import (
    PqIndex,
    _normalize,
    pq_encode,
    pq_train,
)


@dataclass
class IvfPqIndex:
    ivf: IvfIndex
    pq: PqIndex
    encoded: DataFrame  # (id, cell, codes) — the search structure
    id_col: str
    vec_col: str


def ivfpq_build(
    spark: SparkSession,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
    m: int = 8,
    k: int = 256,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> IvfPqIndex:
    """Train both quantizers and materialize the (id, cell, codes)
    search table. Training is sample-bounded (the 100 TB path);
    assignment + encoding are one distributed pass each."""
    ivf = ivf_build(
        spark, corpus, id_col=id_col, vec_col=vec_col, k=n_cells,
        seed=seed, sample_fraction=sample_fraction,
    )
    pq = pq_train(
        corpus, id_col=id_col, vec_col=vec_col, m=m, k=k, seed=seed
    )
    encoded = pq_encode(pq, ivf.assigned, keep_cols=("cell",)).persist()
    return IvfPqIndex(ivf, pq, encoded, id_col, vec_col)


def _probe_cells(
    index: IvfPqIndex, q_ids: list, q_mat: np.ndarray, nprobe: int
) -> dict:
    """Driver-side probe selection: max-cosine cells per query over the
    (tiny) centroid matrix — ties to the smaller cell id, matching
    ivf_search's window ordering."""
    cents = np.array(
        [
            c
            for _, c in sorted(
                (r["cell"], r["centroid"])
                for r in index.ivf.centroids.collect()
            )
        ],
        dtype=np.float64,
    )
    cn = np.linalg.norm(cents, axis=1)
    cn[cn == 0] = 1.0
    qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    sims = (q_mat / qn) @ (cents / cn[:, None]).T  # (nq, n_cells)
    out = {}
    for qi, q_id in enumerate(q_ids):
        # sort by (-sim, cell) — deterministic tie-break to smaller cell
        order = sorted(range(sims.shape[1]), key=lambda c: (-sims[qi, c], c))
        out[q_id] = set(order[:nprobe])
    return out


def ivfpq_search(
    index: IvfPqIndex,
    queries: DataFrame,
    topk: int = 10,
    nprobe: int = 4,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Top-k per query over the probed cells' PQ codes →
    (q_id, neighbor_id, score, rnk). With ``rerank`` and the float
    ``corpus``, the ADC shortlist is re-scored with exact cosine."""
    q_rows = queries.select(index.id_col, index.vec_col).limit(
        max_query_rows + 1
    ).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"ivfpq_search query batch exceeds max_query_rows="
            f"{max_query_rows}; chunk the query set (LUT and probe map "
            "are driver-built and ship in the task closure)"
        )
    q_ids = [r[0] for r in q_rows]
    q_raw = np.array([r[1] for r in q_rows], dtype=np.float32)
    probes = _probe_cells(index, q_ids, q_raw.astype(np.float64), nprobe)
    q_mat = _normalize(q_raw)
    books, m, dsub = index.pq.codebooks, index.pq.m, index.pq.dsub
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
    probe_lists = {q: np.array(sorted(cells)) for q, cells in probes.items()}

    # id fields mirror the caller's id column type (see sq8.py — a
    # hardcoded LongType fails deep in Arrow conversion for non-integer
    # ids).
    id_type = index.encoded.schema[id_col].dataType
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
            cells = pdf["cell"].to_numpy()
            ids = pdf[id_col].to_numpy()
            rows = {"q_id": [], "neighbor_id": [], "score": []}
            for qi, q_id in enumerate(q_ids):
                mask = np.isin(cells, probe_lists[q_id])
                if not mask.any():
                    continue
                sub = codes[mask]
                sub_ids = ids[mask]
                scores = lut[qi, np.arange(m)[None, :], sub].sum(1)
                kk = min(n_keep + 1, len(scores))
                top = np.argpartition(-scores, kk - 1)[:kk]
                rows["q_id"].extend([q_id] * len(top))
                rows["neighbor_id"].extend(sub_ids[top].tolist())
                rows["score"].extend(scores[top].astype(float).tolist())
            yield pd.DataFrame(rows)

    partial = index.encoded.mapInPandas(score_batches, out_schema).filter(
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
        # Bounded shortlist → broadcast against one unshuffled corpus
        # scan (same hydrate layout and budget guard as pq_search).
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


def ivfpq_recall_vs_exact(
    index: IvfPqIndex,
    queries: DataFrame,
    corpus: DataFrame,
    topk: int = 10,
    nprobe: int = 4,
    rerank: int | None = None,
) -> float:
    """Recall@k against exact brute force — the (n_cells, nprobe, m,
    rerank) tuning loop."""
    from pg_ducklake_spark.operators.similarity import cosine_topk

    exact = cosine_topk(
        corpus, queries, index.id_col, index.vec_col, k=topk
    ).select("q_id", "neighbor_id")
    approx = ivfpq_search(
        index, queries, topk=topk, nprobe=nprobe, rerank=rerank,
        corpus=corpus if rerank else None,
    ).select("q_id", "neighbor_id")
    inter = exact.join(approx, ["q_id", "neighbor_id"]).count()
    denom = exact.count()
    return inter / denom if denom else 1.0
