"""Retrieval / LM-scoring invariants the oracle comparison can't see
(the oracle proves Spark == DuckDB; these prove both compute a sensible
retrieval/LM result)."""

import math

from pyspark.sql import functions as F

from pg_ducklake_spark.plans import QUERIES, t
from pg_ducklake_spark.plans.retrieval import _BM25_QUERIES, _BM25_TOPK


def test_bm25_hits_contain_a_query_term(spark, sf_dir):
    rows = QUERIES["text_bm25_topk"](spark, sf_dir).collect()
    terms = {q: set() for q, _ in _BM25_QUERIES}
    for q, w in _BM25_QUERIES:
        terms[q].add(w)
    docs = {
        r["doc_id"]: r["text"].lower().split(" ")
        for r in t(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert r["score_micro"] > 0
        assert 1 <= r["rnk"] <= _BM25_TOPK
        # a positive BM25 score requires at least one matching term
        assert terms[r["query_id"]] & set(docs[r["doc_id"]])


def test_bm25_rank_orders_scores(spark, sf_dir):
    rows = QUERIES["text_bm25_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        scores = [r["score_micro"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_bigram_perplexity_bounds(spark, sf_dir):
    """Add-one smoothing bounds every bigram surprisal by ln(n1 + V):
    the per-doc mean can never exceed ln(total_bigrams + V)."""
    rows = QUERIES["text_bigram_perplexity"](spark, sf_dir).collect()
    assert len(rows) <= 20
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    v = toks.select("tok").distinct().count()
    n = toks.count()
    bound = math.log(n + v) * 1_000_000
    for r in rows:
        assert 0 < r["ppl_micro"] <= bound
        assert r["n_bigrams"] >= 1
    # descending perplexity, doc_id tiebreak
    keys = [(-r["ppl_micro"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_bpe_pair_counts_match_brute_force(spark, sf_dir):
    rows = QUERIES["text_bpe_pair_counts"](spark, sf_dir).collect()
    brute = {}
    for r in t(spark, sf_dir, "documents").collect():
        for w in r["text"].lower().split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    brute[w[i : i + 2]] = brute.get(w[i : i + 2], 0) + 1
    expected = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["n"]) for r in sorted(rows, key=lambda r: r["rnk"])]
    assert got == expected


def test_rrf_hybrid_fusion_invariants(spark, sf_dir):
    from pg_ducklake_spark.plans.retrieval import (
        _RRF_EXAMPLES, _RRF_K, _RRF_TOPK,
    )

    rows = QUERIES["sim_rrf_hybrid"](spark, sf_dir).collect()
    max_single = round(1_000_000_000 / (_RRF_K + 1))
    by_ex = {}
    for r in rows:
        assert r["doc_id"] not in _RRF_EXAMPLES or r["doc_id"] != r["example_id"]
        # a fused score is at most two first-rank contributions
        assert 0 < r["rrf_nano"] <= 2 * max_single
        by_ex.setdefault(r["example_id"], []).append(r)
    assert set(by_ex) == set(_RRF_EXAMPLES)
    for ex, rs in by_ex.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, _RRF_TOPK + 1))
        scores = [r["rrf_nano"] for r in rs]
        assert scores == sorted(scores, reverse=True)
