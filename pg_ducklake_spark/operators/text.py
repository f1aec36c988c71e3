"""Reusable text-analysis operators: language ID, quality scoring,
token counting, fingerprints. Pure column expressions (codegen'd);
oracle-verified fixed variants in plans/text.py."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "et", "les", "de", "un", "est"],
    "es": ["el", "la", "los", "y", "de", "que", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "zh": ["的", "是", "了", "在", "我", "有", "和"],
}


def language_id(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "predicted_lang",
    stopwords: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-hit-rate language ID (argmax, lexicographic tiebreak)."""
    sw = stopwords or DEFAULT_STOPWORDS
    toks = F.split(F.lower(text_col), " ")

    def hit_count(words: list[str]):
        arr = F.array(*[F.lit(t) for t in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: hit_count(words) for lang, words in sw.items()}
    greatest = F.greatest(*scores.values())
    pred = None
    for lang in sorted(sw):
        cond = scores[lang] == greatest
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return df.withColumn(out_col, pred)


def token_count(text_col: str = "text", mode: str = "whitespace") -> Column:
    """Token count column: 'whitespace' split or 'bpe' (regex word/digit/
    symbol pieces — a BPE-ish proxy)."""
    if mode == "whitespace":
        return F.size(F.split(text_col, " ")).cast("long")
    return F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0)
        )
    ).cast("long")


def quality_score(text_col: str = "text") -> Column:
    """Composite quality ∈ [0,1]: length, alnum ratio, avg word length."""
    n_tokens = F.size(F.split(text_col, " ")).cast("double")
    n_chars = F.length(text_col).cast("double")
    punct = F.length(F.regexp_replace(text_col, "[a-zA-Z0-9 ]", "")).cast("double")
    return (
        0.3 * F.least(n_tokens / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - punct / F.greatest(n_chars, F.lit(1.0)))
        + 0.4 * F.least(n_chars / (n_tokens * 8.0), F.lit(1.0))
    )


def quality_filter(
    df: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """The pretraining keep/drop filter."""
    return df.filter(quality_score(text_col) >= threshold)


def fingerprint(text_col: str = "text") -> Column:
    """Order-insensitive bag-of-words fingerprint (md5 of the sorted
    distinct token set) — catches shuffled/duplicated content."""
    return F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.lower(text_col), " "))), " "
        )
    )


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-stop feature projection for pipeline use."""
    return df.withColumns(
        {
            "ws_tokens": token_count(text_col, "whitespace"),
            "bpe_tokens": token_count(text_col, "bpe"),
            "quality": quality_score(text_col),
            "fingerprint": fingerprint(text_col),
        }
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling by hash threshold — the
    training-data MIXING primitive (e.g. keep 100% of wiki, 10% of
    crawl): a row survives iff h32(id) % 10000 < fraction * 10000 for
    its stratum. Purely map-side (no shuffle, no RNG state), exactly
    reproducible across engines/runs/partitionings, and composable —
    re-sampling a sample with a smaller fraction yields the sample of
    the smaller fraction (thresholds nest)."""
    from pg_ducklake_spark.functions.hashing import h32

    thresh = F.lit(int(default_fraction * 10_000))
    for k, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == k, F.lit(int(frac * 10_000))
        ).otherwise(thresh)
    return df.filter(
        (h32(F.col(id_col).cast("string")) % 10_000) < thresh
    )
