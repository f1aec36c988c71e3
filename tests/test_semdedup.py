"""SemDeDup cluster-scoped pruning + hashed linear quality classifier.

End-to-end tests run the registered plans on a tiny planted corpus
written as the same parquet layout the sweep uses, so the exact path
the driver exercises is the path under test; cross-engine value parity
is the oracle harness's job (tools/check_correctness.py)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_ducklake_spark.plans import QUERIES


def _write_corpus(path, vecs, docs):
    emb = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v[0] % 3 for v in vecs], pa.int64()),
        }
    )
    pq.write_table(emb, f"{path}/embeddings.parquet")
    doc = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([d[0] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([d[1] for d in docs], pa.string()),
            "n_chars": pa.array([len(d[0]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(doc, f"{path}/documents.parquet")


@pytest.fixture()
def planted_dir(tmp_path):
    dim = 64
    base = [0.0] * dim
    base[0] = 1.0
    dup = list(base)  # identical -> cosine 1.0 with base
    far = [0.0] * dim
    far[1] = -1.0  # orthogonal to base
    # a fourth vector near base but below tau=0.35: cos = 0.3
    near_miss = [0.0] * dim
    near_miss[0] = 0.3
    near_miss[1] = (1 - 0.09) ** 0.5
    vecs = [(1, base), (2, dup), (3, far), (4, near_miss)]
    docs = [
        ("alpha beta gamma", "srcA"),
        ("alpha beta gamma", "srcA"),
        ("single", "srcB"),  # 1 token: empty bigram slice path
        ("", "srcB"),  # empty text: split -> [''], still one token
    ]
    _write_corpus(str(tmp_path), vecs, docs)
    return str(tmp_path)


def test_semantic_prune_drops_planted_duplicate(spark, planted_dir):
    rows = {
        r["cell"]: r.asDict()
        for r in QUERIES["dedup_semantic_prune"](spark, planted_dir).collect()
    }
    assert sum(r["n_vecs"] for r in rows.values()) == 4
    assert sum(r["n_dropped"] for r in rows.values()) == 1  # only the exact dup
    for r in rows.values():
        assert r["n_kept"] + r["n_dropped"] == r["n_vecs"]
        assert 0.0 <= r["drop_rate"] <= 1.0


def test_semantic_prune_report_invariants_on_sf(spark, sf_dir):
    rows = QUERIES["dedup_semantic_prune"](spark, sf_dir).collect()
    assert rows, "expected at least one populated cell"
    cells = [r["cell"] for r in rows]
    assert cells == sorted(cells) and len(set(cells)) == len(cells)
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vecs"]
        assert 0 <= r["cell"] < 32


def test_quality_classifier_planted(spark, planted_dir):
    rows = {
        r["source"]: r.asDict()
        for r in QUERIES["text_quality_classifier"](spark, planted_dir).collect()
    }
    assert set(rows) == {"srcA", "srcB"}
    assert rows["srcA"]["n_docs"] == 2 and rows["srcB"]["n_docs"] == 2
    # identical docs score identically -> srcA keeps 0 or 2, never 1
    assert rows["srcA"]["n_keep"] in (0, 2)
    for r in rows.values():
        assert 0.0 <= r["keep_rate"] <= 1.0
        assert r["n_keep"] <= r["n_docs"]


def test_quality_classifier_deterministic(spark, sf_dir):
    a = QUERIES["text_quality_classifier"](spark, sf_dir).collect()
    b = QUERIES["text_quality_classifier"](spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_sem_cell_dropped_kernel_matches_bruteforce():
    """The banded GEMM kernel (r10) must agree with a brute-force
    exact-fold pair scan on a random cell — including blocking
    boundaries (n > block), the id_a < id_b triangle after an
    unsorted input, and duplicate vectors (certain-drop path)."""
    import numpy as np
    import pandas as pd

    from pg_ducklake_spark.plans import semdedup as S

    rng = np.random.default_rng(7)
    n, dim = 700, 8  # n > _SEM_BLOCK exercises >1 block
    old_block = S._SEM_BLOCK
    S._SEM_BLOCK = 256
    try:
        vecs = rng.normal(size=(n, dim))
        vecs[5] = vecs[300]  # planted duplicate across blocks
        vecs[650] = vecs[2] * 1.7  # same direction, different norm
        units = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        ids = rng.permutation(n) * 10 + 3  # unsorted, non-contiguous
        pdf = pd.DataFrame(
            {
                "cell": np.full(n, 4, dtype="int64"),
                "vec_id": ids.astype("int64"),
                "unit": list(units),
            }
        )
        got = S._sem_cell_dropped(pdf)
        # brute force: exact left fold per pair, id_a < id_b
        order = np.argsort(ids)
        u = units[order]
        dropped = set()
        for i in range(n):
            for j in range(i + 1, n):
                acc = 0.0
                for k in range(dim):
                    acc = acc + u[i, k] * u[j, k]
                if acc > S._SEM_TAU:
                    dropped.add(j)
        assert got["cell"].iloc[0] == 4
        assert int(got["n_dropped"].iloc[0]) == len(dropped)
        assert len(dropped) > 0  # the fixture really exercises drops
    finally:
        S._SEM_BLOCK = old_block
