"""IVF ANN index: build/search/recall over the embeddings table."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(spark, emb):
    from pg_ducklake_spark.operators.ivf import ivf_build

    return ivf_build(spark, emb, k=8, seed=42)


def test_ivf_assignment_covers_corpus(emb, index):
    assert index.assigned.count() == emb.count()
    cells = index.assigned.select("cell").distinct().count()
    assert 1 < cells <= 8


def test_ivf_search_shape(emb, index):
    from pg_ducklake_spark.operators.ivf import ivf_search

    queries = emb.filter(F.col("vec_id") < 3)
    hits = ivf_search(index, queries, topk=5, nprobe=2).collect()
    per_q = {}
    for h in hits:
        per_q.setdefault(h.q_id, []).append(h)
    for q, lst in per_q.items():
        assert len(lst) <= 5
        sims = [h.cosine for h in sorted(lst, key=lambda x: x.rnk)]
        assert sims == sorted(sims, reverse=True)
        assert all(h.neighbor_id != q for h in lst)


def test_ivf_recall_improves_with_nprobe(spark, emb, index):
    from pg_ducklake_spark.operators.ivf import ivf_recall_vs_exact

    queries = emb.filter(F.col("vec_id") < 10)
    r1 = ivf_recall_vs_exact(index, queries, topk=5, nprobe=1)
    r_all = ivf_recall_vs_exact(index, queries, topk=5, nprobe=8)
    assert r_all >= r1
    assert r_all == pytest.approx(1.0)  # probing all cells == exact
    assert r1 > 0.2  # single-probe finds a usable fraction
