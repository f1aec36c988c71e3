"""Scale-slope bench: the dedup / similarity operator families at
sf1-scale data (10× the driver's sf0.1 bench fixtures), Spark vs the
same DuckDB oracle SQL on the same parquet.

The sf0.1 corpus is small enough that candidate-join volumes and
band-key skew never bite; this harness generates a deterministic
sf1-scale documents (50k rows, same vocabulary/shape as the driver's
fixtures, with planted exact- and near-duplicate structure so the
dedup operators have real work) and embeddings (20k × 64-dim float32,
10 label clusters, planted near-identical pairs) into a cached temp
dir, then times every dedup_* / sim_* query on both engines.

Usage: python tools/bench_scale.py [--rows-docs N] [--rows-emb N]
Prints one JSON line: {"sf1": {"spark": {...}, "duck": {...},
"ratio": {...}, "totals": {...}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_ROWS = 50_000
EMB_ROWS = 20_000
SEED = 1337
CACHE_DIR = f"/tmp/spark_graft_sf1_{SEED}_{DOC_ROWS}_{EMB_ROWS}"

QUERIES_TO_RUN = [
    "dedup_exact_groups",
    "dedup_exact_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_components",
    "sim_bruteforce_topk",
    "sim_lsh_bucket_topk",
    "sim_embedding_near_dup",
]
# sim_ivf_topk / sim_pq_topk queries() entries run in EXHAUSTIVE mode
# (probe all cells / re-rank every candidate) so their results are
# provably exact and SQL-oracle-able; benching that mode measures the
# oracle harness, not the ANN path. Here they run in pruned
# production mode (nprobe < k, bounded re-rank) against the exact
# brute-force oracle timing — the approximate-vs-exact trade every ANN
# deployment makes; recall of the pruned path is asserted in
# tests/test_ivf.py / tests/test_pq.py.

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
_VOCAB = [f"{s}{i}" for s in _STEMS for i in range(200)]


def _gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    langs = np.array(["en", "zh", "es", "fr", "de"])
    sources = np.array([f"src{i}" for i in range(20)])
    texts: list[str] = []
    base_count = int(n * 0.9)
    for _ in range(base_count):
        k = rng.integers(30, 70)
        texts.append(" ".join(rng.choice(_VOCAB, size=k)))
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


def ensure_fixture(doc_rows: int = DOC_ROWS, emb_rows: int = EMB_ROWS) -> str:
    if os.path.isdir(CACHE_DIR) and os.path.exists(
        os.path.join(CACHE_DIR, "_DONE")
    ):
        return CACHE_DIR
    os.makedirs(CACHE_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(
        _gen_documents(rng, doc_rows),
        os.path.join(CACHE_DIR, "documents.parquet"),
    )
    pq.write_table(
        _gen_embeddings(rng, emb_rows),
        os.path.join(CACHE_DIR, "embeddings.parquet"),
    )
    open(os.path.join(CACHE_DIR, "_DONE"), "w").close()
    return CACHE_DIR


def main() -> None:
    from pg_ducklake_spark.plans import ORACLES, QUERIES
    from pg_ducklake_spark.session import get_spark

    sf_dir = ensure_fixture()
    spark = get_spark("bench_scale")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("SELECT 1").collect()

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark_times: dict[str, float] = {}
    duck_times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in QUERIES_TO_RUN:
        QUERIES[name](spark, sf_dir).collect()  # warm (JIT, page cache)
        t0 = time.time()
        got = QUERIES[name](spark, sf_dir).collect()
        spark_times[name] = round(time.time() - t0, 3)
        rows[name] = len(got)
        if name in ORACLES:
            con.execute(ORACLES[name]).fetchall()
            t0 = time.time()
            con.execute(ORACLES[name]).fetchall()
            duck_times[name] = round(time.time() - t0, 3)
    # Pruned-mode ANN (see note at QUERIES_TO_RUN).
    from pg_ducklake_spark.operators.ivf import ivf_build, ivf_search
    from pg_ducklake_spark.operators.pq import pq_encode, pq_search, pq_train
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 5)

    index = ivf_build(spark, emb, k=32, seed=42)
    ivf_search(index, queries_df, topk=10, nprobe=4).collect()
    t0 = time.time()
    ivf_search(index, queries_df, topk=10, nprobe=4).collect()
    spark_times["sim_ivf_pruned(nprobe=4/32)"] = round(time.time() - t0, 3)

    pidx = pq_train(emb, m=8, k=256, seed=42)
    enc = pq_encode(pidx, emb).persist()
    pq_search(pidx, enc, queries_df, topk=10, rerank=4, corpus=emb).collect()
    t0 = time.time()
    pq_search(pidx, enc, queries_df, topk=10, rerank=4, corpus=emb).collect()
    spark_times["sim_pq_pruned(rerank=4)"] = round(time.time() - t0, 3)
    from pg_ducklake_spark.plans import ORACLES as _O

    for pruned, oracle_of in (
        ("sim_ivf_pruned(nprobe=4/32)", "sim_ivf_topk"),
        ("sim_pq_pruned(rerank=4)", "sim_pq_topk"),
    ):
        con.execute(_O[oracle_of]).fetchall()
        t0 = time.time()
        con.execute(_O[oracle_of]).fetchall()
        duck_times[pruned] = round(time.time() - t0, 3)

    ratio = {
        n: round(spark_times[n] / duck_times[n], 2)
        for n in duck_times
        if duck_times[n] > 0
    }
    print(
        json.dumps(
            {
                "sf1": {
                    "doc_rows": DOC_ROWS,
                    "emb_rows": EMB_ROWS,
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
            }
        )
    )


if __name__ == "__main__":
    main()
