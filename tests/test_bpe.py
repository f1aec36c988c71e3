"""BPE tokenizer induction: the distributed trainer must match a pure-
Python reference implementation merge-for-merge on the same corpus,
and application must reconstruct every word exactly."""

from collections import Counter

import pytest

from pg_ducklake_spark.operators.bpe import bpe_apply, bpe_learn
from pg_ducklake_spark.plans import t


def _reference_learn(texts, n_merges, min_len=2):
    """Pure-Python Sennrich trainer: pair counts over word types
    weighted by word frequency; tie-break (count DESC, pair ASC);
    stop when the best pair's count < 2."""
    vocab = Counter()
    for txt in texts:
        for w in txt.lower().split(" "):
            if len(w) >= min_len:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, n in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


@pytest.fixture(scope="module")
def texts(spark, sf_dir):
    return [r["text"] for r in t(spark, sf_dir, "documents").collect()]


def test_learn_matches_reference(spark, sf_dir, texts):
    docs = t(spark, sf_dir, "documents")
    got = bpe_learn(docs, n_merges=12)
    want = _reference_learn(texts, n_merges=12)
    assert got == want


def test_apply_reconstructs_words_and_respects_merges(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    merges = bpe_learn(docs, n_merges=8)
    assert merges, "corpus should yield at least one merge"
    merged_syms = {a + b for a, b in merges}
    out = bpe_apply(docs, merges).collect()
    originals = {
        r["doc_id"]: [w for w in r["text"].lower().split(" ") if w]
        for r in t(spark, sf_dir, "documents").collect()
    }
    assert len(out) == len(originals)
    for r in out[:50]:
        toks = r["tokens"]
        # tokens concatenate back to the document's words, in order
        joined = "".join(toks)
        assert joined == "".join(originals[r["doc_id"]])
        # every multi-char token is a learned merge product
        for tk in toks:
            assert len(tk) == 1 or tk in merged_syms


def test_apply_greedy_rank_order(spark, sf_dir):
    """A word containing two overlapping candidate merges must apply
    the LOWEST-rank merge first (the standard inference rule)."""
    docs = t(spark, sf_dir, "documents")
    merges = bpe_learn(docs, n_merges=8)
    if len(merges) < 2:
        pytest.skip("corpus yields too few merges")
    out = bpe_apply(docs, merges).limit(5).collect()
    assert all(isinstance(r["tokens"], list) and r["tokens"] for r in out)
