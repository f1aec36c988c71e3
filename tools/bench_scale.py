"""Scale-slope bench: the dedup / similarity operator families at
sf1-scale data (10× the driver's sf0.1 bench fixtures) and, for the
families whose sf1 cost is fixed-overhead-shaped, at sf10 (100×) —
Spark vs the same DuckDB oracle SQL on the same parquet.

The sf0.1 corpus is small enough that candidate-join volumes and
band-key skew never bite; this harness generates deterministic
sf1-scale documents (50k rows, same vocabulary/shape as the driver's
fixtures, with planted exact- and near-duplicate structure so the
dedup operators have real work) and embeddings (20k × 64-dim float32,
10 label clusters, planted near-identical pairs) into a cached temp
dir, then times every dedup_* / sim_* query on both engines.

The sf10 tier (500k docs / 200k embeddings) exists to answer one
question: do the families that look weak at sf1 (sub-second absolute
times, tiny outputs — i.e. per-query fixed cost, not data cost)
converge toward parity as the data grows?  Only the families >2× at
sf1 rerun at sf10; the rest keep sf1 as their largest measured scale.

Methodology mirrors bench.py / tools/bench_oracle.py: per query,
WARMUP full passes (JIT/codegen compile, page cache — both engines
identical warmth), then the mean of ITERS timed passes, each of which
rebuilds the Spark DataFrame and collects it (resp. re-executes the
DuckDB SQL) in the warmed process.

Usage: python tools/bench_scale.py [--tier sf1|sf10|pairs|both]
(``pairs`` = the sf10 single-pass tier for the pair-generating dedup
families; ``kernel`` = the kernel studies only; ``both`` runs every
unit in its own FRESH subprocess so each block is an idle measurement
— late-session numbers in one long JVM read 2-3× worse than the same
code idle.) Prints one JSON line:
{"sf1": {"spark": {...}, "duck": {...}, "ratio": {...},
"totals": {...}}, "sf10": {...}, "sf10_pairs": {...}, ...kernels}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1337
WARMUP = 3
ITERS = 3

TIERS = {
    "sf1": (50_000, 20_000, 1_000_000),
    "sf10": (500_000, 200_000, 10_000_000),
}

QUERIES_SF1 = [
    "dedup_exact_groups",
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_substring_spans",
    "dedup_components",
    "sim_bruteforce_topk",
    "sim_lsh_bucket_topk",
    "sim_embedding_near_dup",
    "sim_codebook_mix",
    "dedup_semantic_prune",
    "text_quality_classifier",
    "graph_degree_histogram",
    # Round-6/7 retrieval/LM family. The fixture vocabulary includes
    # the bare stems (v2) so text_bm25_topk's literal query terms hit
    # real Zipf-shaped postings; perplexity/BPE/RRF are
    # vocabulary-independent.
    "text_bigram_perplexity",
    "text_bm25_topk",
    "text_bpe_pair_counts",
    "sim_rrf_hybrid",
    # Sketch family over the generated events table (r7: the one
    # headline family without a measured scale slope until now).
    "stats_hll_distinct",
    "text_cms_heavy_hitters",
    # r8 (VERDICT r7 #8): twice noisy in driver bench runs at sf0.1 —
    # measured here so a clean idle number at a 10x scale is on record.
    "mm_feature_extraction",
]
# The sf1 perf-weak set (VERDICT r4: all sub-2 s absolute, fixed-cost
# shaped). sf10 is their "largest measured scale"; the data-bound
# families (ngram/minhash/simhash/components/near-dup — 0.21–1.8× at
# sf1) already demonstrated their slope and would push the harness to
# many minutes at sf10 without answering anything new.
QUERIES_SF10 = [
    "dedup_exact_groups",
    "dedup_exact_stats",
    # r9: the new span-inventory operator's data-bound slope (25M
    # anchored md5 windows at this tier).
    "dedup_substring_spans",
    "sim_bruteforce_topk",
    "sim_lsh_bucket_topk",
    "sim_codebook_mix",
    # r7: the families that are fixed-cost-shaped at sf1 (sub-2 s
    # absolute Spark times against sub-0.3 s DuckDB) get their slope
    # measured here — 500k docs / 10M events is where data cost should
    # overtake the per-query job overhead.
    "text_bm25_topk",
    "text_bigram_perplexity",
    "text_bpe_pair_counts",
    "stats_hll_distinct",
    "text_cms_heavy_hitters",
]

# The pair-GENERATING dedup flagships (VERDICT r9 #4): measured at sf10
# in their own tier because their DuckDB twins run minutes there (the
# quadratic/posting-list pair volume is real on both engines) — the
# standard WARMUP×ITERS loop would cost ~45 min of harness time without
# changing the answer. Protocol: one warm-up pass, one timed pass per
# engine (documented in run_pairs_tier).
QUERIES_SF10_PAIRS = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_components",
    "dedup_semantic_prune",
    "sim_embedding_near_dup",
]

# A realistically-sized vocabulary matters: with a tiny one, word
# trigrams repeat across most documents and the shingle equi-join
# degenerates toward all-pairs — a data-shape artifact, not a workload.
# ~8000 synthetic words give trigram document frequencies near 1, like
# real text.
_STEMS = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "shuffle stage plan codegen arrow parquet delta snapshot commit vacuum "
    "freeze bucket skew salt probe build broadcast exchange limit offset"
).split()
# v2: the bare stems are IN the vocabulary (weight ~= one suffix slot
# each) so text_bm25_topk's literal query terms ("table", "scan", ...)
# hit real postings with Zipf-plausible document frequencies.
_VOCAB = list(_STEMS) + [f"{s}{i}" for s in _STEMS for i in range(200)]


def _gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    langs = np.array(["en", "zh", "es", "fr", "de"])
    sources = np.array([f"src{i}" for i in range(20)])
    texts: list[str] = []
    base_count = int(n * 0.9)
    vocab = np.array(_VOCAB)
    lens = rng.integers(30, 70, size=base_count)
    # One big draw instead of per-document rng.choice calls: identical
    # distribution, ~20× faster generation at the sf10 row count.
    flat = vocab[rng.integers(0, len(vocab), size=int(lens.sum()))]
    off = 0
    for k in lens:
        texts.append(" ".join(flat[off : off + k]))
        off += int(k)
    # ~5% exact duplicates of earlier docs, ~5% near-duplicates (a few
    # words swapped) — the workload dedup operators exist for.
    while len(texts) < n:
        src = int(rng.integers(0, base_count))
        if rng.random() < 0.5:
            texts.append(texts[src])
        else:
            words = texts[src].split()
            for _ in range(max(1, len(words) // 20)):
                words[int(rng.integers(0, len(words)))] = str(
                    rng.choice(_VOCAB)
                )
            texts.append(" ".join(words))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n).tolist(), pa.string()),
            "source": pa.array(
                rng.choice(sources, size=n).tolist(), pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def _gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    n_labels = 10
    centers = rng.normal(scale=0.1, size=(n_labels, 64))
    labels = rng.integers(0, n_labels, size=n)
    vecs = (
        centers[labels] + rng.normal(scale=0.08, size=(n, 64))
    ).astype(np.float32)
    # plant ~0.2% near-identical pairs inside a label cluster
    n_dup = max(4, n // 500)
    for i in range(n_dup):
        src = int(rng.integers(0, n - n_dup))
        dst = n - n_dup + i
        labels[dst] = labels[src]
        vecs[dst] = vecs[src] + rng.normal(scale=1e-4, size=64).astype(
            np.float32
        )
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )


def _gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    """Same schema as the driver's events fixture (event_id, ts,
    user_id, event_type, value, props). user_id is Zipf-shaped (a few
    heavy users, a long tail) so the HLL register pass sees realistic
    per-bucket collision structure; 8 event types mirror the driver
    fixture's low-cardinality grouping key."""
    types = np.array(
        ["click", "view", "purchase", "login", "logout", "search",
         "scroll", "share"]
    )
    # Bounded Zipf over ~n/10 distinct users.
    n_users = max(1000, n // 10)
    raw = rng.zipf(1.3, size=n)
    user_id = (raw % n_users).astype(np.int64)
    ts0 = np.int64(1_700_000_000_000_000)  # fixed epoch, no wall clock
    ts = ts0 + rng.integers(0, 90 * 86400 * 1_000_000, size=n)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(
                types[rng.integers(0, len(types), size=n)].tolist(),
                pa.string(),
            ),
            "value": pa.array(rng.random(size=n), pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )


def ensure_fixture(doc_rows: int, emb_rows: int, event_rows: int) -> str:
    # v2: bare stems in the vocabulary + events table.
    cache = f"/tmp/spark_graft_scale_v2_{SEED}_{doc_rows}_{emb_rows}_{event_rows}"
    if os.path.isdir(cache) and os.path.exists(os.path.join(cache, "_DONE")):
        return cache
    os.makedirs(cache, exist_ok=True)
    rng = np.random.default_rng(SEED)
    # Several row groups per file so Spark's scan (and DuckDB's) can
    # parallelize — the multi-file layout a production writer emits.
    pq.write_table(
        _gen_documents(rng, doc_rows),
        os.path.join(cache, "documents.parquet"),
        row_group_size=max(10_000, doc_rows // 32),
    )
    pq.write_table(
        _gen_embeddings(rng, emb_rows),
        os.path.join(cache, "embeddings.parquet"),
        row_group_size=max(10_000, emb_rows // 32),
    )
    pq.write_table(
        _gen_events(rng, event_rows),
        os.path.join(cache, "events.parquet"),
        row_group_size=max(50_000, event_rows // 32),
    )
    open(os.path.join(cache, "_DONE"), "w").close()
    return cache


# Warmups exist to strip compile/JIT noise out of the timed passes;
# long queries drop to fewer passes (applied by the same rule to both
# engines) to keep the harness tractable. The long-query tier keeps ONE
# extra warmup after the classifying pass: the classifier fires on the
# FIRST pass, which for Spark includes whole-stage-codegen compilation —
# with zero further warmups the timed passes measured JIT, not steady
# state (r8 recorded text_bpe_pair_counts at 3.0 s via this rule while
# the same query, warmed, runs 1.11 s in the kernel study below).
# DuckDB's first pass is already near steady state, so the extra warmup
# is symmetric in form and corrects an asymmetry in effect.
_LONG_QUERY_S = 3.0


def _timed_loop(run) -> float:
    t0 = time.time()
    run()
    first = time.time() - t0
    warmup, iters = (1, 2) if first > _LONG_QUERY_S else (WARMUP - 1, ITERS)
    for _ in range(warmup):
        run()
    total = 0.0
    for _ in range(iters):
        t0 = time.time()
        run()
        total += time.time() - t0
    return round(total / iters, 3)


def _time_spark(build) -> float:
    return _timed_loop(lambda: build().collect())


def _time_duck(con, sql: str) -> float:
    return _timed_loop(lambda: con.execute(sql).fetchall())


def run_tier(spark, tier: str, names: list[str]) -> dict:
    from pg_ducklake_spark.plans import ORACLES, QUERIES

    doc_rows, emb_rows, event_rows = TIERS[tier]
    sf_dir = ensure_fixture(doc_rows, emb_rows, event_rows)

    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark_times: dict[str, float] = {}
    duck_times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        spark_times[name] = _time_spark(lambda: QUERIES[name](spark, sf_dir))
        rows[name] = len(QUERIES[name](spark, sf_dir).limit(100_000).collect())
        if name in ORACLES:
            duck_times[name] = _time_duck(con, ORACLES[name])

    # Pruned-mode ANN: sim_ivf_topk / sim_pq_topk queries() entries run
    # in EXHAUSTIVE mode (probe all cells / re-rank every candidate) so
    # their results are provably exact and SQL-oracle-able; benching
    # that mode measures the oracle harness, not the ANN path. Here
    # they run in pruned production mode (nprobe < k, bounded re-rank)
    # against the exact brute-force oracle timing — the
    # approximate-vs-exact trade every ANN deployment makes; recall of
    # the pruned path is asserted in tests/test_ivf.py /
    # tests/test_pq.py.
    from pg_ducklake_spark.operators.ivf import ivf_build, ivf_search
    from pg_ducklake_spark.operators.pq import pq_encode, pq_search, pq_train
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 5)

    index = ivf_build(spark, emb, k=32, seed=42)
    spark_times["sim_ivf_pruned(nprobe=4/32)"] = _time_spark(
        lambda: ivf_search(index, queries_df, topk=10, nprobe=4)
    )

    pidx = pq_train(emb, m=8, k=256, seed=42)
    enc = pq_encode(pidx, emb).persist()
    enc.count()
    spark_times["sim_pq_pruned(rerank=4)"] = _time_spark(
        lambda: pq_search(pidx, enc, queries_df, topk=10, rerank=4, corpus=emb)
    )
    enc.unpersist()

    from pg_ducklake_spark.operators.ivfpq import ivfpq_build, ivfpq_search

    cidx = ivfpq_build(spark, emb, n_cells=32, m=8, k=256, seed=42)
    cidx.encoded.count()
    spark_times["sim_ivfpq_pruned(nprobe=4/32,rerank=4)"] = _time_spark(
        lambda: ivfpq_search(
            cidx, queries_df, topk=10, nprobe=4, rerank=4, corpus=emb
        )
    )
    cidx.encoded.unpersist()

    from pg_ducklake_spark.operators.sq8 import sq8_encode, sq8_search, sq8_train

    sidx = sq8_train(emb)
    senc = sq8_encode(sidx, emb).persist()
    senc.count()
    spark_times["sim_sq8_pruned(rerank=4)"] = _time_spark(
        lambda: sq8_search(sidx, senc, queries_df, topk=10, rerank=4, corpus=emb)
    )
    senc.unpersist()

    from pg_ducklake_spark.plans import ORACLES as _O

    for pruned, oracle_of in (
        ("sim_ivf_pruned(nprobe=4/32)", "sim_ivf_topk"),
        ("sim_pq_pruned(rerank=4)", "sim_pq_topk"),
        # composed index vs the same exact brute-force oracle timing
        ("sim_ivfpq_pruned(nprobe=4/32,rerank=4)", "sim_ivf_topk"),
        ("sim_sq8_pruned(rerank=4)", "sim_sq8_topk"),
    ):
        duck_times[pruned] = _time_duck(con, _O[oracle_of])
    con.close()

    ratio = {
        n: round(spark_times[n] / duck_times[n], 2)
        for n in duck_times
        if duck_times[n] > 0
    }
    return {
        "doc_rows": doc_rows,
        "emb_rows": emb_rows,
        "event_rows": event_rows,
        "warmup_iters": WARMUP,
        "timed_iters": ITERS,
        "spark": spark_times,
        "duck": duck_times,
        "ratio": ratio,
        "rows": rows,
        "totals": {
            "spark": round(sum(spark_times.values()), 3),
            "duck": round(sum(duck_times.values()), 3),
            "ratio": round(
                sum(spark_times.values())
                / max(sum(duck_times.values()), 1e-9),
                2,
            ),
        },
    }


def run_pairs_tier(spark) -> dict:
    """sf10 for the pair-generating dedup families (VERDICT r9 #4):
    jaccard, minhash, simhash, components, semdedup, embedding
    near-dup — previously sf1-only, so their 100 TB story rested on
    sf1 ratios plus plan shape. Protocol: ONE warm-up pass, then
    median-of-3 on the Spark side (r11) and on any DuckDB twin whose
    first timed draw lands under 60 s (r12 — the cheap twins turned
    out to be the volatile side); twins in the 1.5–4 minute class
    stay single-pass (percent-level noise at those durations, and a
    3× loop would triple a ~25-minute tier for nothing). The warm-up
    pass also charges Spark's plan-internal scoped persists, matching
    how every other tier measures (warmed steady state on both
    engines)."""
    from pg_ducklake_spark.plans import ORACLES, QUERIES

    sf_dir = ensure_fixture(*TIERS["sf10"])
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark_times: dict[str, float] = {}
    spark_band: dict[str, list[float]] = {}
    duck_times: dict[str, float] = {}
    duck_band: dict[str, list[float]] = {}
    for name in QUERIES_SF10_PAIRS:
        QUERIES[name](spark, sf_dir).collect()  # warm-up
        # r11 (VERDICT r10 #7): the Spark side is cheap enough for
        # median-of-3 with a min/max band — these six numbers are the
        # north-star headline. DuckDB stays at one timed pass (its
        # sides run 1.5–4 min each; at those durations run-to-run
        # noise is percent-level).
        samples = []
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            samples.append(round(time.time() - t0, 3))
        spark_times[name] = sorted(samples)[1]
        spark_band[name] = [min(samples), max(samples)]
        con.execute(ORACLES[name]).fetchall()  # warm-up
        # r12 (VERDICT r11 #7): DuckDB is now the volatile side for the
        # cheap twins (the jaccard twin moved 21.9 s → 4.1 s between
        # identical-code rounds while Spark's band held 7.2–9.5 s) —
        # twins whose first timed draw lands under 60 s get
        # median-of-3 with a band; the 1.5–4 min twins stay
        # single-pass (percent-level noise at those durations).
        d_samples = []
        t0 = time.time()
        con.execute(ORACLES[name]).fetchall()
        d_samples.append(round(time.time() - t0, 3))
        if d_samples[0] < 60:
            for _ in range(2):
                t0 = time.time()
                con.execute(ORACLES[name]).fetchall()
                d_samples.append(round(time.time() - t0, 3))
        duck_times[name] = sorted(d_samples)[len(d_samples) // 2]
        duck_band[name] = [min(d_samples), max(d_samples)]
    con.close()
    return {
        "doc_rows": TIERS["sf10"][0],
        "emb_rows": TIERS["sf10"][1],
        "warmup_iters": 1,
        "timed_iters": "spark median-of-3, duck median-of-3 under 60s"
                       " else 1",
        "spark": spark_times,
        "spark_band": spark_band,
        "duck": duck_times,
        "duck_band": duck_band,
        "ratio": {
            n: round(spark_times[n] / duck_times[n], 2) for n in duck_times
        },
        "totals": {
            "spark": round(sum(spark_times.values()), 3),
            "duck": round(sum(duck_times.values()), 3),
            "ratio": round(
                sum(spark_times.values()) / sum(duck_times.values()), 2
            ),
        },
    }


def run_exact_kernel(spark) -> dict:
    """Data-bound slope of the exact-dedup kernel (md5 → groupBy →
    HAVING), with the output reduced to a scalar so neither engine's
    client materialization is in the measurement. The 5M-row variant
    replicates the 500k corpus 10× inside the query (both engines run
    the identical expansion), so the ratio column shows where the
    spark/duck ratio *asymptotes* once per-query fixed costs are fully
    amortized — the number that predicts relative behavior at 100 TB,
    where this operator is one map-side-combined shuffle on both
    engines."""
    from pyspark.sql import functions as F

    sf_dir = ensure_fixture(*TIERS["sf10"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = docs.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(9)))
    ).select((F.col("doc_id") * 10 + F.col("r")).alias("doc_id"), "text")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )

    def spark_kernel_md5(df, min_copies):
        return (
            df.select(F.md5("text").alias("d"), "doc_id")
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id"))
            .filter(F.col("n") > min_copies)
            .groupBy()
            .count()
        )

    def spark_kernel_arrow(df, min_copies):
        # r7 stretch (VERDICT r6 #7): hash the text column inside an
        # Arrow-batched mapInPandas (pandas' vectorized 64-bit string
        # hash, two independent keys -> 128 bits), so the per-row hash
        # cost moves out of the JVM expression interpreter — the
        # BLAS-kernel pattern. The trade: every text byte crosses the
        # Arrow boundary once.
        import pandas as pd
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("h1", T.LongType()),
                T.StructField("h2", T.LongType()),
                T.StructField("doc_id", T.LongType()),
            ]
        )

        def hash_batches(batches):
            for pdf in batches:
                h1 = pd.util.hash_pandas_object(
                    pdf["text"], index=False, hash_key="0123456789123456"
                )
                h2 = pd.util.hash_pandas_object(
                    pdf["text"], index=False, hash_key="6543210987654321"
                )
                yield pd.DataFrame(
                    {
                        "h1": h1.astype("int64"),
                        "h2": h2.astype("int64"),
                        "doc_id": pdf["doc_id"],
                    }
                )

        return (
            df.mapInPandas(hash_batches, schema)
            .groupBy("h1", "h2")
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id"))
            .filter(F.col("n") > min_copies)
            .groupBy()
            .count()
        )

    def spark_kernel_xx(df, min_copies):
        # The production plan (plans/dedup.py dedup_exact_groups):
        # group on a 128-bit seeded-xxhash64 pair — engine-native,
        # ~2.4x cheaper per row than md5, collision-safe past billions
        # of rows.
        return (
            df.select(
                F.xxhash64("text").alias("h1"),
                F.xxhash64("text", F.lit(1)).alias("h2"),
                "doc_id",
            )
            .groupBy("h1", "h2")
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id"))
            .filter(F.col("n") > min_copies)
            .groupBy()
            .count()
        )

    # r8 (VERDICT r7 #4): a 50M-row tier — 100× replication — where
    # DuckDB itself takes seconds, so the family queries' sf10 ratios
    # (6.99×/4.66× against sub-0.1 s DuckDB absolutes) are either shown
    # to amortize or pinned as engine per-row cost. md5 and the Arrow
    # detour are study lanes only; at 50M rows only the production
    # xx128 path and DuckDB run (md5/arrow at 50M would take minutes
    # without informing anything the 5M tier didn't).
    huge = docs.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(99)))
    ).select((F.col("doc_id") * 100 + F.col("r")).alias("doc_id"), "text")
    duck_500k = """SELECT count(*) FROM (
        SELECT md5(text) d, count(*) n, min(doc_id)
        FROM documents GROUP BY d HAVING count(*) > 1)"""
    duck_5m = """SELECT count(*) FROM (
        SELECT md5(text) d, count(*) n, min(doc_id*10+r)
        FROM documents, range(0,10) t(r) GROUP BY d HAVING count(*) > 10)"""
    duck_50m = """SELECT count(*) FROM (
        SELECT md5(text) d, count(*) n, min(doc_id*100+r)
        FROM documents, range(0,100) t(r) GROUP BY d HAVING count(*) > 100)"""
    out = {}
    for label, sdf, mc, dsql in (
        ("rows_500k", docs, 1, duck_500k),
        ("rows_5m", big, 10, duck_5m),
        ("rows_50m", huge, 100, duck_50m),
    ):
        s_xx = _time_spark(lambda: spark_kernel_xx(sdf, mc))
        d = _time_duck(con, dsql)
        out[label] = {
            "spark_xx128": s_xx,
            "duck": d,
            "ratio_xx128": round(s_xx / d, 2),
        }
        if label != "rows_50m":
            s_md5 = _time_spark(lambda: spark_kernel_md5(sdf, mc))
            s_ar = _time_spark(lambda: spark_kernel_arrow(sdf, mc))
            out[label].update(
                {
                    "spark_md5": s_md5,
                    "spark_arrow": s_ar,
                    "ratio_md5": round(s_md5 / d, 2),
                    "ratio_arrow": round(s_ar / d, 2),
                }
            )
    con.close()
    return out


def run_hll_kernel(spark) -> dict:
    """Pin the stats_hll_distinct residual (VERDICT r7 #2). The r8
    rewrite moved md5 + the rho CASE ladder behind the (type, user)
    dedup, so the only corpus-proportional work left is the exact-audit
    distinct itself. This study measures that floor in isolation: if
    Spark's bare two-phase distinct over the 10M-row events table
    already costs as much as DuckDB's ENTIRE query, the remaining ratio
    is engine aggregate throughput (plus two fixed stage launches), not
    a plan shape — the same bound the exact-dedup kernel study names
    for md5."""
    from pyspark.sql import functions as F

    from pg_ducklake_spark.plans import ORACLES, QUERIES

    sf_dir = ensure_fixture(*TIERS["sf10"])
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet')"
    )

    def spark_distinct_floor():
        return (
            ev.select("event_type", "user_id").distinct().groupBy().count()
        )

    # r10 md5-lane decomposition (VERDICT r9 #2): the same sketch with
    # the md5-h32 register hash swapped for an integer universal hash
    # ((u % p)*a + b) mod p — pure BIGINT arithmetic on both engines.
    # NOT the production recipe (measured estimate error 12–28% vs
    # md5's proper ~5% at p=9: the linear hash's arithmetic-progression
    # structure biases max-rho); it exists to price the md5 work per
    # engine. r10 measurement: dropping md5 saves Spark ~0.3 s and
    # DuckDB ~0.29 s — ABSOLUTE parity on the hash work — while
    # DuckDB's total collapses to ~0.066 s. So ratio_full ≈ 1.9×
    # decomposes as md5 at ~1.0× plus the distinct floor (6.5× on a
    # 0.04 s denominator); the full query sits within noise of
    # floor + md5, which is the engine bound, not a plan defect.
    P31 = (1 << 31) - 1
    A31, B31 = 486187739, 1000000007 % P31
    WB = 22  # 31-bit hash, 9 bucket bits -> 22-bit rho suffix

    def _ladder(w: str) -> str:
        whens = " ".join(
            f"WHEN {w} >= {1 << (b - 1)} THEN {b}" for b in range(WB, 0, -1)
        )
        return f"(CASE {whens} ELSE 0 END)"

    def spark_nomd5_full():
        regs = (
            ev.select("event_type", "user_id")
            .distinct()
            .select(
                "event_type",
                F.expr(f"((user_id % {P31}) * {A31} + {B31}) % {P31}").alias("h"),
            )
            .select(
                "event_type",
                (F.col("h") % 512).alias("bucket"),
                F.expr(f"({WB + 1} - {_ladder(f'(h DIV 512)')})").alias("rho"),
            )
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("reg"), F.count(F.lit(1)).alias("bu"))
        )
        return regs.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_regs"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {WB + 1} - reg)")
            ).alias("s_present"),
            F.sum("bu").alias("n_exact"),
        )

    duck_nomd5 = f"""
        WITH hashed AS (
          SELECT event_type, ((user_id % {P31}) * {A31} + {B31}) % {P31} AS h
          FROM (SELECT DISTINCT event_type, user_id FROM events)),
        regs AS (
          SELECT event_type, h % 512 AS bucket,
                 MAX({WB + 1} - {_ladder("(h // 512)")}) AS reg,
                 COUNT(*) AS bu
          FROM hashed GROUP BY event_type, h % 512)
        SELECT event_type, COUNT(*), SUM(CAST(1 AS BIGINT) << ({WB + 1} - reg)),
               SUM(bu)
        FROM regs GROUP BY event_type"""

    s_full = _time_spark(lambda: QUERIES["stats_hll_distinct"](spark, sf_dir))
    s_floor = _time_spark(spark_distinct_floor)
    s_nomd5 = _time_spark(spark_nomd5_full)
    d_full = _time_duck(con, ORACLES["stats_hll_distinct"])
    d_floor = _time_duck(
        con,
        "SELECT count(*) FROM (SELECT DISTINCT event_type, user_id FROM events)",
    )
    d_nomd5 = _time_duck(con, duck_nomd5)
    con.close()
    return {
        "spark_full": s_full,
        "spark_distinct_floor": s_floor,
        "spark_nomd5_full": s_nomd5,
        "duck_full": d_full,
        "duck_distinct_floor": d_floor,
        "duck_nomd5_full": d_nomd5,
        "ratio_full": round(s_full / d_full, 2),
        # the audit's dedup alone vs DuckDB's whole query: ≥1 means the
        # residual is engine distinct-aggregate throughput, not the
        # sketch plan
        "floor_vs_duck_full": round(s_floor / d_full, 2),
        # per-engine price of the md5 register hash (full minus the
        # integer-hash lane) — near-equal absolutes mean the md5 work
        # itself runs at parity and the ratio lives in the floor
        "md5_cost_spark": round(s_full - s_nomd5, 3),
        "md5_cost_duck": round(d_full - d_nomd5, 3),
    }


def run_spans_kernel(spark) -> dict:
    """Pin the dedup_substring_spans residual (VERDICT r9 #1) with its
    own decomposition instead of the exact-dedup analogy. Lanes:

    - expr_full: the r9 pure-expression plan (window build as
      slice + array_join inside transform/filter lambdas, md5 in the
      lambda). Spark evaluates higher-order-function lambdas per
      element in INTERPRETED mode — nothing in the window build
      reaches codegen — which is why this lane lost to the kernel.
    - kernel_full: the r10 production plan (Arrow-batched mapInPandas:
      one join per doc, prefix-sum slice per anchor, in-doc dedup,
      md5 in the kernel, plain-count aggregate).
    - kernel_slice_floor: the same kernel emitting spans WITHOUT md5,
      reduced to a scalar count — the window-construction floor.
    - duck twins for the full query and the window-build floor.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from pg_ducklake_spark.plans import ORACLES, QUERIES
    from pg_ducklake_spark.plans.dedup import _SPAN_L, _SPAN_W

    sf_dir = ensure_fixture(*TIERS["sf10"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )

    span_expr = (
        f"transform("
        f"  filter("
        f"    transform(sequence(1, size(toks)),"
        f"      i -> substring(array_join(slice(toks, i, {_SPAN_W}), ' '),"
        f"                     1, {_SPAN_L})),"
        f"    s -> length(s) = {_SPAN_L}),"
        f"  s -> md5(s))"
    )

    def expr_full():
        spans = (
            docs.filter(F.length("text") >= _SPAN_L)
            .select(
                "doc_id",
                F.expr("filter(split(text, ' '), x -> x <> '')").alias("toks"),
            )
            .filter(F.size("toks") > 0)
            .select("doc_id", F.explode(F.expr(span_expr)).alias("span_md5"))
        )
        return (
            spans.groupBy("span_md5")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.min("doc_id").cast("long").alias("first_doc"),
            )
            .filter(F.col("n_docs") > 1)
            .orderBy(F.desc("n_docs"), F.asc("first_doc"), F.asc("span_md5"))
            .limit(20)
        )

    def slice_kernel(batches):
        for pdf in batches:
            n_spans = 0
            for txt in pdf["text"].values:
                toks = [tk for tk in txt.split(" ") if tk]
                if not toks:
                    continue
                joined = " ".join(toks)
                n = len(joined)
                seen = set()
                pos = 0
                for tk in toks:
                    if pos + _SPAN_L <= n:
                        w = joined[pos : pos + _SPAN_L]
                        if w not in seen:
                            seen.add(w)
                            n_spans += 1
                    pos += len(tk) + 1
            yield pd.DataFrame({"n": pd.Series([n_spans], dtype="int64")})

    def kernel_slice_floor():
        return (
            docs.filter(F.length("text") >= _SPAN_L)
            .select("text")
            .mapInPandas(slice_kernel, "n long")
            .groupBy()
            .sum("n")
        )

    s_kernel = _time_spark(
        lambda: QUERIES["dedup_substring_spans"](spark, sf_dir)
    )
    s_expr = _time_spark(expr_full)
    s_floor = _time_spark(kernel_slice_floor)
    d_full = _time_duck(con, ORACLES["dedup_substring_spans"])
    d_floor = _time_duck(
        con,
        f"""SELECT COUNT(*) FROM (
          SELECT unnest(list_filter(list_transform(range(1, len(toks) + 1),
            i -> substring(array_to_string(
                   toks[CAST(i AS INTEGER):CAST(i AS INTEGER) + {_SPAN_W - 1}],
                   ' '), 1, {_SPAN_L})),
            s -> len(s) = {_SPAN_L})) AS s
          FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') toks
                FROM documents WHERE len(text) >= {_SPAN_L}) t)""",
    )
    con.close()
    return {
        "spark_kernel_full": s_kernel,
        "spark_expr_full": s_expr,
        "spark_slice_floor": s_floor,
        "duck_full": d_full,
        "duck_windows_floor": d_floor,
        "ratio_kernel_full": round(s_kernel / d_full, 2),
        "ratio_expr_full": round(s_expr / d_full, 2),
        # the kernel's window build alone vs DuckDB's whole query
        "floor_vs_duck_full": round(s_floor / d_full, 2),
    }


def run_bpe_kernel(spark) -> dict:
    """Pin the text_bpe_pair_counts residual (VERDICT r7 #3). The plan
    Zipf-collapses the token stream into (word, count) before any
    character work — the right shape — so the study isolates that first
    stage: explode(split(text)) + hash-aggregate over the ~25M-token
    stream, reduced to a scalar. If that floor alone exceeds DuckDB's
    ENTIRE query, the family ratio is the engine's Generate+aggregate
    throughput over short strings, not the vocabulary stages. Two
    alternative lanes are measured so the floor claim covers every
    formulation class tried:

    - words_arrow (pandas): str.split + explode + value_counts per
      batch — Python-boxed strings; loses to the JVM explode (1.7 s vs
      1.2 s full-query at sf10 when first measured).
    - words_arrowc (pyarrow-compute, r11 — VERDICT r10 #2): mapInArrow
      with pc.split_pattern + list_flatten + value_counts per
      RecordBatch — no Python loop, no pandas boxing, all C++
      vectorized. Measured at PARITY with the JVM explode (~0.7–0.9 s
      both at sf10, identical 9246-word result), so the floor is now
      "floor of all lanes including pyarrow-compute": the residual is
      text-byte throughput (scan + split + hash-agg of 25M short
      tokens), which DuckDB's perfect-hash aggregate simply does
      faster on one node — not a plan shape Spark can express better.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pg_ducklake_spark.plans import ORACLES, QUERIES

    sf_dir = ensure_fixture(*TIERS["sf10"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )

    def words_floor():
        return (
            docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
            .filter(F.length("word") >= 2)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n_word"))
            .groupBy()
            .count()
        )

    schema = T.StructType(
        [T.StructField("word", T.StringType()), T.StructField("c", T.LongType())]
    )

    def count_batches(batches):
        for pdf in batches:
            s = pdf["text"].str.lower().str.split(" ").explode()
            s = s[s.str.len() >= 2]
            vc = s.value_counts()
            yield pd.DataFrame({"word": vc.index, "c": vc.values})

    def words_arrow():
        return (
            docs.mapInPandas(count_batches, schema)
            .groupBy("word")
            .agg(F.sum("c").alias("n_word"))
            .groupBy()
            .count()
        )

    def count_batches_arrowc(batches):
        import pyarrow.compute as pc

        for rb in batches:
            col = rb.column(0)
            toks = pc.list_flatten(
                pc.split_pattern(pc.utf8_lower(col), " ")
            )
            vc = pc.value_counts(toks)
            words_a = vc.field("values")
            counts_a = vc.field("counts")
            mask = pc.greater_equal(pc.utf8_length(words_a), 2)
            yield pa.RecordBatch.from_arrays(
                [words_a.filter(mask), counts_a.filter(mask).cast(pa.int64())],
                ["word", "c"],
            )

    def words_arrowc():
        return (
            docs.mapInArrow(count_batches_arrowc, "word string, c long")
            .groupBy("word")
            .agg(F.sum("c").alias("n_word"))
            .groupBy()
            .count()
        )

    s_full = _time_spark(lambda: QUERIES["text_bpe_pair_counts"](spark, sf_dir))
    s_floor = _time_spark(words_floor)
    s_arrow = _time_spark(words_arrow)
    s_arrowc = _time_spark(words_arrowc)
    d_full = _time_duck(con, ORACLES["text_bpe_pair_counts"])
    d_floor = _time_duck(
        con,
        """SELECT count(*) FROM (
             SELECT token, count(*) FROM (
               SELECT unnest(string_split(lower(text), ' ')) AS token
               FROM documents) x
             WHERE len(token) >= 2 GROUP BY token)""",
    )
    con.close()
    return {
        "spark_full": s_full,
        "spark_words_floor": s_floor,
        "spark_words_arrow": s_arrow,
        "spark_words_arrowc": s_arrowc,
        "duck_full": d_full,
        "duck_words_floor": d_floor,
        "ratio_full": round(s_full / d_full, 2),
        # the Zipf-collapse stage alone vs DuckDB's whole query
        "floor_vs_duck_full": round(s_floor / d_full, 2),
        "arrowc_vs_duck_full": round(s_arrowc / d_full, 2),
        "status": (
            "closed (r12): the production query's words stage now runs "
            "the fastest measured lane (pyarrow-compute mapInArrow — "
            "fresh-process median-of-3 at sf10: 0.77 s vs 0.93 s JVM "
            "explode, full query 1.02-1.09 s vs 1.12-1.25 s); the "
            "residual vs DuckDB is single-node text tokenize + "
            "hash-agg throughput, pinned across JVM, pandas, and "
            "pyarrow lanes. Like HLL: oracle- and test-guarded, touch "
            "only on regression."
        ),
    }


def run_lake_dml(spark) -> dict:
    """Table-format layer at scale (VERDICT r10 #3): the lakehouse
    machinery itself — CTAS write, DV delete, read-after-delete,
    delete-ratio VACUUM rewrite — measured on the 10M-row sf10 events
    table against DuckDB doing the equivalent storage work (CTAS into
    native storage, DELETE, same scan, rewrite survivors to parquet).
    This is the surface the repo exists for; until r11 it had only
    toy-scale pytest timings.

    Protocol: DML steps are stateful, so each is timed ONCE on a fresh
    lake/connection (no warmup possible without redoing the state);
    the two idempotent scans get one warmup + median-of-3.

    The DuckDB twin implements the SAME table format, not a native
    DuckDB table: the reference (DuckLake) stores parquet data files
    plus positional delete files and subtracts positions at scan time
    — so the twin CTASes to parquet (PER_THREAD_OUTPUT), writes the
    DV as a (filename, file_row_number) parquet via DuckDB's own
    metadata columns, scans with an ANTI JOIN against it, and vacuums
    by rewriting survivors to parquet. A native-table twin would
    measure DuckDB's buffer-pool storage engine — a different product
    from the lakehouse layer this unit exists to price."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pg_ducklake_spark.lake import Lake

    sf_dir = ensure_fixture(*TIERS["sf10"])
    tmp = tempfile.mkdtemp(prefix="lakedml_")
    spark_times: dict[str, float] = {}
    duck_times: dict[str, float] = {}

    def _once(d: dict, key: str, fn) -> None:
        t0 = time.time()
        fn()
        d[key] = round(time.time() - t0, 3)

    def _scan_median(d: dict, key: str, fn) -> None:
        fn()  # warmup
        samples = []
        for _ in range(3):
            t0 = time.time()
            fn()
            samples.append(time.time() - t0)
        d[key] = round(sorted(samples)[1], 3)

    try:
        lake = Lake(spark, os.path.join(tmp, "lake"))
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        # Engine floors: the same physical work with NO lake machinery
        # — a raw df.write.parquet of the identical rows, a warm raw
        # aggregate, a raw positions-extract (the DELETE minus the
        # catalog), and a raw survivor rewrite (the VACUUM minus the
        # catalog). Every lake ratio should be read against these: the
        # cross-engine ratio bundles the single-node parquet
        # read/write floor gap (which scale-out amortizes) with true
        # lake overhead; the own-floor ratio isolates the latter.
        # The source read is warmed first so the floor write and the
        # lake CTAS see identical input warmth.
        ev.groupBy().count().collect()  # warm source pages
        # warm the parquet WRITER too (classloading + JIT): the first
        # write in a fresh JVM measured 2.7x its own steady state,
        # which made the "floor" read slower than the lake CTAS it is
        # supposed to bound
        ev.limit(200_000).write.parquet(f"{tmp}/spark_warmup")

        # Floors are idempotent (unlike the DML steps), so each is the
        # median of 3 writes into distinct dirs — single-task parquet
        # writes in particular have a wide GC-driven band (a one-draw
        # rewrite1 floor measured 7.3 s against vacuum's own 4.6 s,
        # i.e. slower than the step it is supposed to bound).
        def _write_median(key: str, fn) -> None:
            samples = []
            for i in range(3):
                t0 = time.time()
                fn(f"{tmp}/{key}_{i}")
                samples.append(time.time() - t0)
            spark_times[key] = round(sorted(samples)[1], 3)

        _write_median(
            "raw_write_floor", lambda p: ev.write.parquet(p)
        )
        raw = spark.read.parquet(f"{tmp}/raw_write_floor_0")
        _scan_median(
            spark_times, "raw_scan_floor",
            lambda: raw.groupBy()
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect(),
        )
        _write_median(
            "raw_delete_floor",
            lambda p: raw.select(
                F.col("_metadata.file_size").alias("fsz"),
                F.col("_metadata.row_index").alias("row_index"),
                "value",
            )
            .filter("value < 0.05")
            .drop("value")
            .write.parquet(p),
        )
        _write_median(
            "raw_rewrite_floor",
            lambda p: raw.filter("value >= 0.05").write.parquet(p),
        )
        # The single-file variant: VACUUM's contract is target-sized
        # output files, and the survivors fit ONE — Spark's unit of
        # write parallelism is the file, so this floor is a one-task
        # write (DuckDB parallelizes row groups inside a single file;
        # that intra-file parallelism is the cross-engine gap on this
        # step, not lake overhead).
        _write_median(
            "raw_rewrite1_floor",
            lambda p: raw.filter("value >= 0.05").repartition(1)
            .write.parquet(p),
        )
        # UPDATE floor: the CoW rewrite minus the catalog — survivors
        # with the SET expression applied, single target-size file
        # (post-vacuum the affected file set is one file, and the
        # lake's own rewrite is a one-file write).
        _write_median(
            "raw_update_floor",
            lambda p: raw.filter("value >= 0.05").withColumn(
                "value",
                F.expr(
                    "CASE WHEN value > 0.95 THEN value + 1.0"
                    " ELSE value END"
                ),
            ).repartition(1).write.parquet(p),
        )
        _once(spark_times, "write_ctas", lambda: lake.create_table_as("events", ev))
        _once(
            spark_times, "delete_dv",
            lambda: lake.delete("events", "value < 0.05"),
        )
        v_del = lake.current_snapshot("events")
        _scan_median(
            spark_times, "scan_after_delete",
            lambda: lake.table("events")
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect(),
        )
        # r12 (VERDICT #3a): the change-feed read of the DV-mode DELETE
        # snapshot — deleted rows are NOT materialized at write time
        # (the delete file is the change record); the feed reconstructs
        # them by semi-joining the delta positions into a pre-delete
        # vintage read of the touched files. This prices that
        # reconstruction at 10M rows.
        _scan_median(
            spark_times, "read_table_changes",
            lambda: lake.table_changes("events", v_del, v_del)
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect(),
        )
        _once(
            spark_times, "vacuum_rewrite",
            lambda: lake.vacuum("events", delete_threshold=0.01),
        )
        _scan_median(
            spark_times, "scan_after_vacuum",
            lambda: lake.table("events")
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect(),
        )
        # r12 (VERDICT #3b): UPDATE — CoW rewrite of the affected file
        # set (~5% of rows match, but they live in every file, so this
        # is a full rewrite of the post-vacuum table) plus the CDF
        # preimage/postimage write the twin also pays.
        _once(
            spark_times, "update_cow",
            lambda: lake.update(
                "events", {"value": "value + 1.0"}, "value > 0.95"
            ),
        )
        n_live = lake.table("events").count()
        s_sum = lake.table("events").groupBy().agg(
            F.sum("value").alias("s")
        ).collect()[0]["s"]

        # r12 probe (VERDICT #1): a mass delete between vacuums — 30%
        # deleted, NO vacuum — scanned through both DV anti-join
        # strategies. `broadcast` is the steady-state path (3M
        # positions, under the 64M guard); `guarded` forces the
        # over-threshold fallback (hint dropped, sort-merge/shuffled
        # hash under AQE) on the same data, proving the path a 2B-
        # position mass delete would take has no cliff and bounded
        # overhead. Spark-only rows: they price a guard, not a twin.
        lake.create_table_as("events_mass", ev)
        lake.delete("events_mass", "value < 0.35")
        exp_mass = lake.table("events_mass").count()
        _scan_median(
            spark_times, "mass_dv_scan_broadcast",
            lambda: lake.table("events_mass")
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect(),
        )
        guarded = Lake(spark, os.path.join(tmp, "lake"))
        guarded.DV_BROADCAST_MAX_POSITIONS = 0
        assert guarded.table("events_mass").count() == exp_mass
        _scan_median(
            spark_times, "mass_dv_scan_guarded",
            lambda: guarded.table("events_mass")
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect(),
        )

        con = duckdb.connect()
        ddata = f"{tmp}/duck_data"
        os.makedirs(ddata, exist_ok=True)
        _once(
            duck_times, "write_ctas",
            lambda: con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/events.parquet'))"
                f" TO '{ddata}' (FORMAT PARQUET, PER_THREAD_OUTPUT)"
            ),
        )
        _once(
            duck_times, "delete_dv",
            lambda: con.execute(
                f"COPY (SELECT filename, file_row_number FROM"
                f" read_parquet('{ddata}/*.parquet', filename=true,"
                f" file_row_number=true) WHERE value < 0.05)"
                f" TO '{tmp}/duck_dv.parquet' (FORMAT PARQUET)"
            ),
        )
        masked = (
            f"SELECT count(*) AS n, sum(value) AS s FROM read_parquet("
            f"'{ddata}/*.parquet', filename=true, file_row_number=true) d"
            f" ANTI JOIN read_parquet('{tmp}/duck_dv.parquet') v"
            f" USING (filename, file_row_number)"
        )
        _scan_median(
            duck_times, "scan_after_delete",
            lambda: con.execute(masked).fetchall(),
        )
        # change-feed twin: materialize the deleted rows by semi-joining
        # the delete positions into the data files (the same
        # reconstruction the lake's feed performs for a DV DELETE).
        changes = (
            f"SELECT count(*) AS n, sum(value) AS s FROM read_parquet("
            f"'{ddata}/*.parquet', filename=true, file_row_number=true) d"
            f" SEMI JOIN read_parquet('{tmp}/duck_dv.parquet') v"
            f" USING (filename, file_row_number)"
        )
        _scan_median(
            duck_times, "read_table_changes",
            lambda: con.execute(changes).fetchall(),
        )
        dclean = f"{tmp}/duck_clean"
        os.makedirs(dclean, exist_ok=True)
        # No PER_THREAD_OUTPUT here: VACUUM's contract is target-sized
        # output files (the survivors fit ONE target-size file at this
        # scale, and the lake writes exactly one), so the twin must
        # also produce a single file — 32 per-thread shards would
        # measure a different contract, not the same storage work.
        _once(
            duck_times, "vacuum_rewrite",
            lambda: con.execute(
                f"COPY (SELECT d.* EXCLUDE (filename, file_row_number)"
                f" FROM read_parquet('{ddata}/*.parquet', filename=true,"
                f" file_row_number=true) d"
                f" ANTI JOIN read_parquet('{tmp}/duck_dv.parquet') v"
                f" USING (filename, file_row_number))"
                f" TO '{dclean}/out.parquet' (FORMAT PARQUET)"
            ),
        )
        _scan_median(
            duck_times, "scan_after_vacuum",
            lambda: con.execute(
                f"SELECT count(*), sum(value) FROM"
                f" read_parquet('{dclean}/*.parquet')"
            ).fetchall(),
        )
        # UPDATE twin: CoW rewrite of the vacuumed table with the SET
        # expression applied, plus the preimage/postimage change rows
        # the lake's CDF write also pays — same storage work, one file.
        dupd = f"{tmp}/duck_upd"
        os.makedirs(dupd, exist_ok=True)

        def _duck_update() -> None:
            con.execute(
                f"COPY (SELECT * REPLACE (CASE WHEN value > 0.95 THEN"
                f" value + 1.0 ELSE value END AS value)"
                f" FROM read_parquet('{dclean}/*.parquet'))"
                f" TO '{dupd}/out.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                f"COPY (SELECT *, 'update_preimage' AS _change_type"
                f" FROM read_parquet('{dclean}/*.parquet')"
                f" WHERE value > 0.95"
                f" UNION ALL"
                f" SELECT * REPLACE (value + 1.0 AS value),"
                f" 'update_postimage' AS _change_type"
                f" FROM read_parquet('{dclean}/*.parquet')"
                f" WHERE value > 0.95)"
                f" TO '{tmp}/duck_upd_cdf.parquet' (FORMAT PARQUET)"
            )

        _once(duck_times, "update_cow", _duck_update)
        d_live, d_sum = con.execute(
            f"SELECT count(*), sum(value) FROM read_parquet('{dupd}/*.parquet')"
        ).fetchone()
        con.close()
        assert n_live == d_live, f"live-row divergence: {n_live} != {d_live}"
        assert math.isclose(s_sum, d_sum, rel_tol=1e-6), (
            f"post-update sum divergence: {s_sum} != {d_sum}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    shared = [k for k in duck_times if k in spark_times]
    s_tot = sum(spark_times[k] for k in shared)
    d_tot = sum(duck_times[k] for k in shared)
    return {
        "event_rows": TIERS["sf10"][2],
        "live_rows_after_delete": int(n_live),
        "protocol": (
            "DML steps (ctas/delete/vacuum/update) timed once; scans "
            "and the change-feed read warm median-of-3; raw_*_floor "
            "rows are spark-only engine floors (the duck twin's "
            "write_ctas/scan_after_vacuum ARE its raw floors by "
            "construction); totals cover the shared DML steps only"
        ),
        "spark": spark_times,
        "duck": duck_times,
        "ratio": {
            k: round(spark_times[k] / duck_times[k], 2) for k in shared
        },
        "lake_overhead_vs_own_floor": {
            "spark_write": round(
                spark_times["write_ctas"] / spark_times["raw_write_floor"], 2
            ),
            "spark_delete": round(
                spark_times["delete_dv"]
                / spark_times["raw_delete_floor"], 2
            ),
            "spark_masked_scan": round(
                spark_times["scan_after_delete"]
                / spark_times["raw_scan_floor"], 2
            ),
            "spark_vacuum": round(
                spark_times["vacuum_rewrite"]
                / spark_times["raw_rewrite1_floor"], 2
            ),
            "spark_update": round(
                spark_times["update_cow"]
                / spark_times["raw_update_floor"], 2
            ),
            "duck_masked_scan": round(
                duck_times["scan_after_delete"]
                / duck_times["scan_after_vacuum"], 2
            ),
        },
        "totals": {
            "spark": round(s_tot, 3),
            "duck": round(d_tot, 3),
            "ratio": round(s_tot / d_tot, 2),
        },
    }


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def _merge_median_runs(runs: list[dict]) -> dict:
    """Merge N fresh-process runs of the same tier into per-query
    medians with min/max bands (VERDICT r10 #1: committed numbers for
    high-variance units must be medians across fresh processes, not a
    single draw — sq8's 3.29× one-off vs its 0.93–1.35× probes)."""
    out = dict(runs[0])
    for key in ("spark", "duck"):
        per = {q: [r[key][q] for r in runs] for q in runs[0][key]}
        out[key] = {q: _median(v) for q, v in per.items()}
        out[f"{key}_band"] = {
            q: [min(v), max(v)] for q, v in per.items()
        }
    out["ratio"] = {
        q: round(out["spark"][q] / out["duck"][q], 2)
        for q in out["duck"]
        if out["duck"][q] > 0
    }
    out["fresh_processes"] = len(runs)
    out["totals"] = {
        "spark": round(sum(out["spark"].values()), 3),
        "duck": round(sum(out["duck"].values()), 3),
        "ratio": round(
            sum(out["spark"].values())
            / max(sum(out["duck"].values()), 1e-9),
            2,
        ),
    }
    return out


def _merge_lakedml(runs: list[dict]) -> dict:
    """Median-of-N fresh processes for the lake_dml unit. The DML
    steps are stateful (timed once per process), so the median across
    whole fresh processes is the only way to give them the same
    robustness as the sf10 tier; ratios / floors / totals are
    recomputed from the merged medians."""
    out = dict(runs[0])
    for key in ("spark", "duck"):
        per = {q: [r[key][q] for r in runs] for q in runs[0][key]}
        out[key] = {q: round(_median(v), 3) for q, v in per.items()}
        out[f"{key}_band"] = {q: [min(v), max(v)] for q, v in per.items()}
    s, d = out["spark"], out["duck"]
    shared = [k for k in d if k in s]
    out["ratio"] = {k: round(s[k] / d[k], 2) for k in shared}
    out["lake_overhead_vs_own_floor"] = {
        "spark_write": round(s["write_ctas"] / s["raw_write_floor"], 2),
        "spark_delete": round(s["delete_dv"] / s["raw_delete_floor"], 2),
        "spark_masked_scan": round(
            s["scan_after_delete"] / s["raw_scan_floor"], 2
        ),
        "spark_vacuum": round(
            s["vacuum_rewrite"] / s["raw_rewrite1_floor"], 2
        ),
        "spark_update": round(
            s["update_cow"] / s["raw_update_floor"], 2
        ),
        "duck_masked_scan": round(
            d["scan_after_delete"] / d["scan_after_vacuum"], 2
        ),
    }
    s_tot = sum(s[k] for k in shared)
    d_tot = sum(d[k] for k in shared)
    out["totals"] = {
        "spark": round(s_tot, 3),
        "duck": round(d_tot, 3),
        "ratio": round(s_tot / d_tot, 2),
    }
    out["fresh_processes"] = len(runs)
    return out


def _apply_coreport(out: dict) -> None:
    if "sf10" in out:
        # VERDICT r9 #5: every query whose sf10 ratio exceeds 2× must
        # co-report its largest-scale kernel measurement IN the sf10
        # block, so the tier ratio (often fixed cost on a sub-0.1 s
        # DuckDB denominator) stops being read as the headline scale
        # number. The kernel tiers replicate the data until DuckDB
        # itself takes real time — the ratio that survives there is the
        # one that predicts 100 TB.
        coreport = {
            "dedup_exact_groups": (
                "exact_dedup_kernel", "50M-row replicated kernel",
                lambda k: k["rows_50m"]["ratio_xx128"],
            ),
            "dedup_exact_stats": (
                "exact_dedup_kernel", "50M-row replicated kernel",
                lambda k: k["rows_50m"]["ratio_xx128"],
            ),
            "dedup_substring_spans": (
                "spans_kernel", "sf10 kernel decomposition",
                lambda k: k["ratio_kernel_full"],
            ),
            "text_bpe_pair_counts": (
                "bpe_kernel", "sf10 words-floor decomposition",
                lambda k: k["floor_vs_duck_full"],
            ),
            "stats_hll_distinct": (
                "hll_kernel", "sf10 floor + md5-lane decomposition",
                lambda k: k["floor_vs_duck_full"],
            ),
        }
        largest: dict[str, dict] = {}
        for q, r in out["sf10"]["ratio"].items():
            if r > 2 or q in coreport:
                block, label, get = coreport.get(q, (None, None, None))
                entry = {"sf10_ratio": r}
                if block and block in out:
                    entry["kernel_tier"] = label
                    entry["kernel_ratio"] = get(out[block])
                largest[q] = entry
        out["sf10"]["largest_scale_ratio"] = largest


# Units a ``--tier both`` run executes, each in a FRESH subprocess.
# r10: measurements taken late in one long session read 2-3× worse
# than the same code idle (heap history + GC state after ~2 h of
# tiers — the same artifact the r8/r9 verdicts kept resolving by
# "idle re-measure"). Per-unit processes make every block an idle
# measurement by construction; the fixture cache in /tmp is shared,
# so only the first unit pays generation. r11: the sf10 tier — home
# of the two single-draw outliers the r10 verdict flagged (sq8 3.29×
# vs a 1.35× probe; spans 2.52× vs the kernel study's 1.67×) — runs
# THREE fresh processes and commits the per-query median + min/max
# band (_merge_median_runs); lakedml is the new table-format unit.
_BOTH_UNITS = ("sf1", "sf10only", "sf10only", "sf10only", "kernel",
               "pairs", "lakedml", "lakedml", "lakedml")


def main() -> None:
    tier = "both"
    if "--tier" in sys.argv:
        tier = sys.argv[sys.argv.index("--tier") + 1]

    if tier == "both":
        import subprocess

        out: dict[str, dict] = {}
        sf10_runs: list[dict] = []
        lakedml_runs: list[dict] = []
        for unit in _BOTH_UNITS:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tier", unit],
                capture_output=True,
                text=True,
                check=True,
            )
            got = json.loads(proc.stdout.strip().splitlines()[-1])
            if unit == "sf10only":
                sf10_runs.append(got["sf10"])
            elif unit == "lakedml":
                lakedml_runs.append(got["lake_dml"])
            else:
                out.update(got)
        if sf10_runs:
            out["sf10"] = _merge_median_runs(sf10_runs)
        if lakedml_runs:
            out["lake_dml"] = _merge_lakedml(lakedml_runs)
        _apply_coreport(out)
        print(json.dumps(out))
        return

    from pg_ducklake_spark.session import get_spark

    # The session default heap (8g) models one executor SLOT; this
    # harness drives 32 cores of sf10 data through a single JVM, so it
    # gets the aggregate memory a 32-core executor actually ships with
    # (4-8 GB/core in any real deployment). At 8g the sf10 perplexity
    # pass thrashes cache eviction/GC — measured 10s isolated vs 46s
    # after the sf1 tier had fragmented the heap — and the GC storm
    # perturbs the DuckDB side of the pair too (13-54s spread for the
    # same SQL). DuckDB's own limit (80% of RAM) dwarfs this either way.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("bench_scale")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("SELECT 1").collect()

    out = {}
    if tier == "sf1":
        out["sf1"] = run_tier(spark, "sf1", QUERIES_SF1)
    if tier in ("sf10", "sf10only", "kernel"):
        # sf10 data is big enough that scan parallelism matters more
        # than task-count overhead; keep the session's 4 MB splits and
        # widen post-shuffle parallelism back to the cluster shape.
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        if tier != "kernel":
            out["sf10"] = run_tier(spark, "sf10", QUERIES_SF10)
        if tier != "sf10only":
            out["exact_dedup_kernel"] = run_exact_kernel(spark)
            out["hll_kernel"] = run_hll_kernel(spark)
            out["bpe_kernel"] = run_bpe_kernel(spark)
            out["spans_kernel"] = run_spans_kernel(spark)
    if tier == "pairs":
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        out["sf10_pairs"] = run_pairs_tier(spark)
    if tier == "lakedml":
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        out["lake_dml"] = run_lake_dml(spark)
    _apply_coreport(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
