"""Byte-pair-encoding tokenizer induction and application (Sennrich et
al., "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016) — the trainer behind every modern subword vocabulary.

Scale design: BPE statistics are over word TYPES, not the corpus — the
classic trainer collapses the corpus into a (word, count) vocabulary
table first (one shuffle), and every merge iteration then touches only
that bounded table. That is exactly the distributed layout here:

- ``bpe_learn``: Zipf-collapse the token stream once; each of the
  ``n_merges`` iterations is ONE aggregate over the vocabulary (pair
  counts weighted by word count, deterministic argmax: count DESC,
  pair ASC) plus a vectorized re-segmentation of the vocabulary rows.
  The driver loop is bounded by ``n_merges`` (a constant, typically
  10k-50k in production), never by corpus size.
- ``bpe_apply``: tokenize the DISTINCT words (pandas UDF over the
  vocabulary, greedy lowest-rank-first merging — the standard
  inference rule), then broadcast-join segmentations back onto the
  corpus; the corpus itself is touched by exactly one join.

The per-iteration re-segmentation runs in an Arrow-batched pandas UDF:
merging one known pair inside a symbol array is a linear scan, and the
vocabulary is bounded, so no per-corpus-row Python ever runs.

queries()-style SQL oracles can't express the iterative loop; the
exactness contract is ``tests/test_bpe.py``'s cross-check against a
pure-Python reference trainer on the same corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _vocab(docs: DataFrame, text_col: str, min_len: int) -> DataFrame:
    """(word, n_word) — the corpus Zipf-collapsed to word types."""
    return (
        docs.select(
            F.explode(F.split(F.lower(text_col), " ")).alias("word")
        )
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )


def _merge_pair_udf(a: str, b: str):
    """Vectorized merge of one adjacent symbol pair inside each row's
    symbol array (left-to-right, non-overlapping — the BPE rule)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def merge(syms: pd.Series) -> pd.Series:
        merged = a + b

        def one(arr):
            out, i, n = [], 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == a and arr[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            return out

        return syms.map(one)

    return merge


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_len: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in rank order.

    Each iteration: one vocabulary aggregate (adjacent-pair counts
    weighted by word frequency, ties broken by pair text so the result
    is deterministic at any parallelism) + one vectorized
    re-segmentation. The vocabulary is persisted and replaced per
    round — iterative-algorithm idiom matching
    operators/components.py (bounded rounds, checkpointed state).
    """
    vocab = _vocab(docs, text_col, min_len).withColumn(
        "syms", F.split("word", "")
    )
    vocab = vocab.persist()
    vocab.count()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                "n_word",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n_word").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < 2:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        nxt = vocab.select(
            "word", "n_word", _merge_pair_udf(a, b)(F.col("syms")).alias("syms")
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """(id, tokens array<string>) — tokenize by applying the learned
    merges greedily (lowest rank first, the standard inference rule).

    Segmentations are computed once per DISTINCT word (vocabulary-
    bounded pandas UDF) and broadcast-joined back; the corpus is
    touched by exactly one join. The broadcast is NOT hinted: the
    vocabulary is Zipf-bounded but data-derived, so Catalyst/AQE size
    it at runtime (the house rule for non-constant join sides)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def segment(words: pd.Series) -> pd.Series:
        def one(w):
            syms = list(w)
            while len(syms) > 1:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = i, r
                if best is None:
                    break
                a, b = merges[best_rank]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return words.map(one)

    words = docs.select(
        id_col,
        F.posexplode(F.split(F.lower(text_col), " ")).alias("pos", "word"),
    ).filter(F.length("word") >= min_len)
    seg = (
        words.select("word").distinct().select("word", segment("word").alias("pieces"))
    )
    # collect_list order is partition-dependent — sort the (pos, pieces)
    # structs before flattening so the token stream is the document's.
    return (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list(struct(pos, pieces))),"
                " s -> s.pieces))"
            ).alias("tokens")
        )
    )
