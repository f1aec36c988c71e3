"""Scalar-quantization ANN: code shape, determinism, quantization error
bound, recall vs exact brute force (with and without re-rank)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.operators.sq8 import (
    sq8_encode,
    sq8_recall_vs_exact,
    sq8_search,
    sq8_train,
)
from pg_ducklake_spark.plans import t


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").persist()


@pytest.fixture(scope="module")
def index(emb):
    return sq8_train(emb)


def test_encode_shape_and_determinism(emb, index):
    enc = sq8_encode(index, emb)
    rows = enc.orderBy("vec_id").limit(5).collect()
    assert all(len(r["codes"]) == 64 for r in rows)
    assert all(0 <= c <= 255 for r in rows for c in r["codes"])
    rows2 = sq8_encode(index, emb).orderBy("vec_id").limit(5).collect()
    assert [r["codes"] for r in rows] == [r["codes"] for r in rows2]


def test_grid_covers_corpus_and_roundtrip_error_bounded(emb, index):
    """Every normalized component must land on the grid, and dequantize
    back within half a step."""
    rows = emb.orderBy("vec_id").limit(20).collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    assert (mat >= index.vmin[None, :] - 1e-5).all()
    assert (mat <= index.vmin[None, :] + 255 * index.scale[None, :] + 1e-5).all()
    codes = np.clip(np.rint((mat - index.vmin) / index.scale), 0, 255)
    deq = index.vmin + codes * index.scale
    assert np.abs(deq - mat).max() <= index.scale.max() * 0.5 + 1e-5


def test_search_returns_ranked_topk(emb, index):
    enc = sq8_encode(index, emb)
    queries = emb.filter(F.col("vec_id") < 3)
    out = sq8_search(index, enc, queries, topk=5).collect()
    by_q = {}
    for r in out:
        assert r["q_id"] != r["neighbor_id"]
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == [1, 2, 3, 4, 5]
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_recall_high_without_rerank(emb, index):
    """8-bit uniform quantization of unit vectors barely moves cosine
    order — plain code-space recall@10 should be near-perfect."""
    enc = sq8_encode(index, emb)
    queries = emb.filter(F.col("vec_id") < 5)
    assert sq8_recall_vs_exact(index, enc, emb, queries, topk=10) >= 0.9


def test_rerank_covering_corpus_is_exact(emb, index):
    enc = sq8_encode(index, emb)
    queries = emb.filter(F.col("vec_id") < 5)
    r = sq8_recall_vs_exact(index, enc, emb, queries, topk=10, rerank=1_000_000)
    assert r == 1.0


def test_query_batch_cap_fails_loudly(emb, index):
    enc = sq8_encode(index, emb)
    with pytest.raises(ValueError, match="max_query_rows"):
        sq8_search(index, enc, emb, topk=5, max_query_rows=3)


def test_string_ids_carry_through(spark, emb):
    """ADVICE r6: the mapInPandas output schema must mirror the id
    column's type — string ids used to hit a hardcoded LongType and die
    inside Arrow conversion."""
    s_emb = emb.select(
        F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    idx = sq8_train(s_emb)
    enc = sq8_encode(idx, s_emb)
    qs = s_emb.filter(F.col("vec_id").isin("v0", "v1"))
    got = sq8_search(idx, enc, qs, topk=3).collect()
    assert got and all(isinstance(r.q_id, str) for r in got)
    assert all(isinstance(r.neighbor_id, str) for r in got)
    assert {r.q_id for r in got} == {"v0", "v1"}
