"""Product-quantization ANN: code shape, determinism, recall vs exact
brute force (with and without the exact re-rank stage)."""

import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.operators.pq import (
    pq_encode,
    pq_recall_vs_exact,
    pq_search,
    pq_train,
)
from pg_ducklake_spark.plans import t


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").persist()


@pytest.fixture(scope="module")
def index(emb):
    return pq_train(emb, m=8, k=256, seed=42)


def test_encode_shape_and_determinism(emb, index):
    enc = pq_encode(index, emb)
    rows = enc.orderBy("vec_id").limit(5).collect()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < index.k for r in rows for c in r["codes"])
    rows2 = pq_encode(index, emb).orderBy("vec_id").limit(5).collect()
    assert [r["codes"] for r in rows] == [r["codes"] for r in rows2]


def test_search_returns_ranked_topk(emb, index):
    enc = pq_encode(index, emb)
    queries = emb.filter(F.col("vec_id") < 3)
    out = pq_search(index, enc, queries, topk=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == [1, 2, 3, 4, 5]
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_recall_adc_reasonable_and_rerank_high(emb, index):
    enc = pq_encode(index, emb).persist()
    queries = emb.filter(F.col("vec_id") < 8)
    adc = pq_recall_vs_exact(index, enc, emb, queries, topk=10)
    assert adc >= 0.5, f"raw ADC recall too low: {adc}"
    rr = pq_recall_vs_exact(index, enc, emb, queries, topk=10, rerank=4)
    assert rr >= 0.8, f"reranked recall too low: {rr}"
    assert rr >= adc


def test_compression_ratio(emb, index):
    """The point of PQ: 64 float32 (256 B) → 8 codes (8 B)."""
    assert index.m * 1 <= 8  # 8 bytes of codes
    assert index.dsub * index.m == len(emb.select("embedding").first()[0])


def test_pq_search_query_cap_raises(spark):
    """Oversized query batches fail loudly instead of OOMing the driver."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pg_ducklake_spark.operators.pq import pq_encode, pq_search, pq_train

    corpus = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), i -> CAST(hash(id, i) % 97 AS DOUBLE))"
        ).alias("embedding"),
    )
    index = pq_train(corpus, m=4, k=8, seed=1)
    enc = pq_encode(index, corpus)
    with _pytest.raises(ValueError, match="max_query_rows"):
        pq_search(index, enc, corpus, topk=2, max_query_rows=10)
