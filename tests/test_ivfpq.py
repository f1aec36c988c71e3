"""IVF-PQ composed ANN: probe masking, determinism, exactness in
exhaustive mode, and the recall/probe trade."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.operators.ivfpq import (
    ivfpq_build,
    ivfpq_recall_vs_exact,
    ivfpq_search,
)
from pg_ducklake_spark.plans import t


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").persist()


@pytest.fixture(scope="module")
def index(spark, emb):
    return ivfpq_build(spark, emb, n_cells=8, m=8, k=64, seed=42)


def test_encoded_table_shape(index, emb):
    rows = index.encoded.limit(5).collect()
    assert {"vec_id", "cell", "codes"} <= set(index.encoded.columns)
    for r in rows:
        assert 0 <= r["cell"] < 8
        assert len(r["codes"]) == 8
    assert index.encoded.count() == emb.count()


def test_search_is_deterministic_and_ranked(index, emb):
    q = emb.filter(F.col("vec_id") < 3)
    a = ivfpq_search(index, q, topk=5, nprobe=4).collect()
    b = ivfpq_search(index, q, topk=5, nprobe=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_q = {}
    for r in a:
        by_q.setdefault(r["q_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != r["q_id"] for r in rows)


def test_exhaustive_probe_with_full_rerank_is_exact(spark, index, emb):
    """nprobe = all cells + corpus-covering rerank ≡ brute force: the
    same provable-oracle construction sim_ivf_topk / sim_pq_topk use,
    here for the composed index."""
    q = emb.filter(F.col("vec_id") < 3)
    n = emb.count()
    rec = ivfpq_recall_vs_exact(
        index, q, emb, topk=5, nprobe=8, rerank=(n // 5) + 1
    )
    assert rec == 1.0


def test_probed_recall_reasonable_and_monotone(index, emb):
    q = emb.filter(F.col("vec_id") < 5)
    r1 = ivfpq_recall_vs_exact(index, q, emb, topk=5, nprobe=2, rerank=4)
    r2 = ivfpq_recall_vs_exact(index, q, emb, topk=5, nprobe=8, rerank=4)
    assert r2 >= r1
    assert r2 >= 0.6  # full probe + 4x rerank recovers most of exact
