"""Text-analysis operators over ``documents``: language ID, quality
scoring, token counting, fingerprinting.

All pure column arithmetic (JVM-side, whole-stage codegen — no Python
UDFs in the hot path) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions import davg, sql_davg
from pg_ducklake_spark.plans import query, rebalance, t

# n-gram-heuristic language ID: function-word hit rate per language.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "et", "les", "de", "un", "est"],
    "es": ["el", "la", "los", "y", "de", "que", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "zh": ["的", "是", "了", "在", "我", "有", "和"],
}
_LANGS = sorted(_STOPWORDS)


def _langid_sc_expr():
    """Single-pass language-score vector: ONE fold over the token
    array against a literal word → count-vector map (35 entries,
    constant-folded). Identical integer counts to the five-filter
    formulation at ~1/5 the interpreted per-token work (r12, guide
    §1.2); a word on several stopword lists contributes to each lane."""
    nl = len(_LANGS)
    vocab = sorted({w for ws in _STOPWORDS.values() for w in ws})
    entries = ", ".join(
        "'{0}', array({1})".format(
            w,
            ", ".join(
                f"CAST({1 if w in _STOPWORDS[lg] else 0} AS BIGINT)"
                for lg in _LANGS
            ),
        )
        for w in vocab
    )
    zeros = f"array_repeat(CAST(0 AS BIGINT), {nl})"
    return F.expr(
        f"aggregate(split(lower(text), ' '), {zeros}, "
        f"(acc, x) -> zip_with(acc, coalesce(element_at(map({entries}), x),"
        f" {zeros}), (a, b) -> a + b))"
    )


def _langid_pred_from_sc(sc_col="sc"):
    """Argmax language from the score vector, lexicographic tiebreak
    (first equal-to-max lane in sorted ``_LANGS`` order wins)."""
    mx = F.array_max(sc_col)
    expr = None
    for i, lg in enumerate(_LANGS):
        cond = F.col(sc_col).getItem(i) == mx
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return expr


def _duck_lang_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split(lower(text), ' '),"
        f" x -> list_contains([{words}], x))) AS BIGINT)"
    )


def _duck_predicted() -> str:
    # argmax with lexicographic tiebreak, via a chain of GREATEST checks.
    greatest = "GREATEST(" + ", ".join(f"score_{lg}" for lg in _LANGS) + ")"
    case = "CASE "
    for lg in _LANGS:
        case += f"WHEN score_{lg} = {greatest} THEN '{lg}' "
    return case + "END"


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"{_duck_lang_score(lg)} AS score_{lg}" for lg in _LANGS)}
      FROM documents
    )
    SELECT lang AS labeled, {_duck_predicted()} AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored
    GROUP BY 1, 2
    ORDER BY labeled, predicted
    """,
)
def text_langid_confusion(spark, sf_dir):
    """Heuristic language ID (stopword hit count, argmax with
    lexicographic tiebreak) → confusion matrix against the labeled lang.

    r12 (guide §1.2 per-task work): all five language scores come from
    ONE fold over the token array against a literal word → count-vector
    map (35 entries, constant-folded), instead of five filter() passes
    each scanning a 7-word array per token — the interpreted
    higher-order-function work per token drops from ~35 string compares
    to one hash lookup plus a 5-lane add. Scores are identical integer
    counts (a word on several stopword lists contributes to each lane,
    exactly as the per-language filters did), so the argmax and the
    confusion matrix are unchanged."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    scored = docs.select("lang", _langid_sc_expr().alias("sc"))
    return (
        scored.select(
            F.col("lang").alias("labeled"),
            _langid_pred_from_sc("sc").alias("predicted"),
        )
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("labeled", "predicted")
    )


_SPARK_QUALITY = """
  0.3 * least(CAST(size(split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
+ 0.3 * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE))
+ 0.4 * least(CAST(length(text) AS DOUBLE)
              / (CAST(size(split(text, ' ')) AS DOUBLE) * 8.0), 1.0)
"""

_DUCK_QUALITY = """
  0.3 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
+ 0.3 * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE))
+ 0.4 * least(CAST(length(text) AS DOUBLE)
              / (CAST(len(string_split(text, ' ')) AS DOUBLE) * 8.0), 1.0)
"""


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_davg(_DUCK_QUALITY)} AS avg_quality,
           CAST(COUNT(CASE WHEN ({_DUCK_QUALITY}) >= 0.5 THEN 1 END) AS BIGINT)
             AS n_keep
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_scores(spark, sf_dir):
    """Length / punctuation-ratio / word-length quality score, with a
    keep-threshold count per source — the classic pretraining filter."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    q = F.expr(_SPARK_QUALITY)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(_SPARK_QUALITY).alias("avg_quality"),
            F.count(F.when(q >= 0.5, 1)).alias("n_keep"),
        )
        .coalesce(1).sortWithinPartitions("source")
    )


@query(
    "text_token_counts",
    oracle=f"""
    SELECT lang,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
             AS ws_tokens,
           CAST(SUM(CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                         AS BIGINT)) AS BIGINT) AS bpe_ish_tokens,
           {sql_davg("CAST(n_chars AS DOUBLE)")} AS avg_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish regex token counts per language."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    ws = F.size(F.split("text", " ")).cast("long")
    bpe = F.size(
        F.expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")
    ).cast("long")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(ws).cast("long").alias("ws_tokens"),
            F.sum(bpe).cast("long").alias("bpe_ish_tokens"),
            davg("CAST(n_chars AS DOUBLE)").alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query(
    "text_fingerprint_dups",
    oracle="""
    SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM (
      SELECT doc_id,
             md5(list_aggregate(list_sort(list_distinct(
                 string_split(lower(text), ' '))), 'string_agg', ' ')) AS fp
      FROM documents) f
    GROUP BY fp
    HAVING COUNT(*) > 1
    ORDER BY n_docs DESC, first_doc ASC
    """,
)
def text_fingerprint_dups(spark, sf_dir):
    """Bag-of-words fingerprint (md5 of the sorted distinct token set):
    catches reordered/duplicated-content docs that exact dedup misses."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), " ")
    )
    return (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), F.asc("first_doc"))
    )


@query(
    "text_char_ngram_profile",
    oracle="""
    SELECT lang, trigram, CAST(n AS BIGINT) AS n
    FROM (
      SELECT lang, trigram, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, trigram ASC) AS rnk
      FROM (
        SELECT lang, substr(lower(text), i, 3) AS trigram
        FROM documents, range(1, 101) t(i)
        WHERE i <= length(text) - 2
      ) g
      GROUP BY lang, trigram
    ) ranked
    WHERE rnk <= 5
    ORDER BY lang, n DESC, trigram
    """,
)
def text_char_ngram_profile(spark, sf_dir):
    """Top character trigrams per language (first 100 chars of each doc)
    — the feature table an n-gram language classifier trains on."""
    from pyspark.sql import Window

    docs = rebalance(t(spark, sf_dir, "documents"))
    grams = docs.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, least(100, greatest(length(text) - 2, 1))),"
                " i -> substr(lower(text), i, 3))"
            )
        ).alias("trigram"),
        F.length("text").alias("_len"),
    ).filter(F.length("trigram") == 3)
    counted = grams.groupBy("lang", "trigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("trigram"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "trigram", F.col("n").cast("long").alias("n"))
        .orderBy("lang", F.desc("n"), "trigram")
    )


@query(
    "text_repetition_scores",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN dup_trigram_frac > 0.2 THEN 1 END) AS BIGINT)
             AS n_repetitive
    FROM (
      SELECT source,
             CASE WHEN len(toks) >= 3 THEN
               1.0 - CAST(len(list_distinct(list_transform(
                       range(1, greatest(len(toks) - 1, 1)),
                       i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))))
                     AS DOUBLE)
                     / CAST(len(toks) - 2 AS DOUBLE)
             ELSE 0.0 END AS dup_trigram_frac
      FROM (SELECT source, string_split(lower(text), ' ') AS toks
            FROM documents) tk) x
    GROUP BY source
    ORDER BY source
    """,
)
def text_repetition_scores(spark, sf_dir):
    """Intra-document repetition (duplicate-trigram fraction) — the
    Gopher-style repetition filter: a doc whose trigrams are mostly
    repeats of themselves is boilerplate/spam. Pure per-row array math,
    no shuffle before the per-source rollup."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    toks = F.split(F.lower("text"), " ")
    n = F.size(toks)
    distinct_tri = F.size(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            )
        )
    )
    frac = F.when(
        n >= 3,
        F.lit(1.0) - distinct_tri.cast("double") / (n - 2).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        docs.select("source", frac.alias("dup_trigram_frac"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("dup_trigram_frac") > 0.2, 1)).alias("n_repetitive"),
        )
        .coalesce(1)
        .sortWithinPartitions("source")
    )


# One SQL text, two engines: the Spark side expands the DuckDB compat
# macros (functions/compat.py) and runs the *same string* the DuckDB
# oracle runs verbatim — proving the compat surface end-to-end through
# the driver's hash gate.
_COMPAT_SQL = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN regexp_matches(text, 'shuffle|spark')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN starts_with(text, 'the ') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_the,
       CAST(SUM(list_unique(string_split(text, ' '))) AS BIGINT)
            AS total_unique_tokens,
       CAST(MAX(array_length(string_split(text, ' '))) AS BIGINT)
            AS max_tokens
FROM documents
WHERE ends_with(lang, 'n') OR list_contains(string_split(lang, '-'), 'en')
GROUP BY source
ORDER BY source
"""


@query("text_duckdb_compat_sql", oracle=_COMPAT_SQL)
def text_duckdb_compat_sql(spark, sf_dir):
    """DuckDB-dialect SQL executed unchanged: regexp_matches,
    starts_with/ends_with, string_split, list_unique, list_contains,
    array_length are all compat macros expanded before planning —
    every expression stays in whole-stage codegen."""
    from pg_ducklake_spark.functions.compat import DUCKDB_COMPAT_MACROS
    from pg_ducklake_spark.views import expand_macros

    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(expand_macros(_COMPAT_SQL, DUCKDB_COMPAT_MACROS))


# --------------------------------------- unigram-LM surprisal scoring


@query(
    "text_unigram_surprisal",
    # Per-token surprisal -ln p(token) under the corpus's own unigram
    # LM, fixed to integer micro-nats BEFORE any further aggregation so
    # every downstream sum is order-independent integer math — the only
    # doubles crossing the engine boundary are the (deterministic,
    # single-division) ln inputs and the final rounded averages.
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, token
      FROM (SELECT doc_id, source,
                   unnest(string_split(lower(text), ' ')) AS token
            FROM documents) x
      WHERE token <> ''
    ),
    freq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY token
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
    scored AS (
      SELECT t.doc_id, t.source,
             CAST(ROUND(ln(CAST(n_total AS DOUBLE) / CAST(n_tok AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS s_micro
      FROM toks t JOIN freq f ON t.token = f.token CROSS JOIN total
    ),
    per_doc AS (
      SELECT doc_id, source,
             CAST(ROUND(CAST(SUM(s_micro) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS score_micro
      FROM scored GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(score_micro) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 3) AS avg_surprisal,
           CAST(SUM(CASE WHEN score_micro > 9050000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_surprisal
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def text_unigram_surprisal(spark, sf_dir):
    """Quality scoring by unigram-LM surprisal (the CCNet/Gopher-style
    filter): score each document by the mean -ln p(token) under the
    corpus's own unigram distribution; report per-source averages and
    the count of high-surprisal (gibberish-leaning) documents.

    Scale shape: ONE shuffle of the token stream (window count over
    token — the unigram LM), the corpus total joined in as a broadcast
    scalar, then a per-doc hash aggregate. No driver-side vocab, no
    unpartitioned window; at 100 TB the vocabulary stays distributed
    state. Per-token surprisal is frozen to integer micro-nats before
    summing, so aggregation order cannot perturb the result.
    """
    base = t(spark, sf_dir, "documents")
    docs = rebalance(base.select("doc_id", "source", "text"), src=base)
    # explode_outer + notnull: the inner Generate's derived
    # size(split(...)) > 0 pre-filter is pushed below the rebalance
    # once per consuming branch (this stream feeds both the total and
    # the scored branch) — the outer Generate derives nothing pushable.
    toks = docs.select(
        "doc_id", "source",
        F.explode_outer(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token").isNotNull() & (F.col("token") != ""))
    w = Window.partitionBy("token")
    total = toks.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        toks.withColumn("n_tok", F.count(F.lit(1)).over(w))
        .crossJoin(F.broadcast(total))  # bcast-ok: 1-row total
        .withColumn(
            "s_micro",
            F.expr(
                "CAST(ROUND(ln(CAST(n_total AS DOUBLE) / CAST(n_tok AS DOUBLE))"
                " * 1000000.0) AS BIGINT)"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.expr(
            "CAST(ROUND(CAST(SUM(s_micro) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
        ).alias("score_micro")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "ROUND(CAST(SUM(score_micro) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 3)"
            ).alias("avg_surprisal"),
            F.expr(
                "CAST(SUM(CASE WHEN score_micro > 9050000 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_high_surprisal"),
        )
        .coalesce(1)
        .sortWithinPartitions("source")
    )


@query(
    "text_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks WHERE token <> '' GROUP BY lang, token
    ),
    ranked AS (
      SELECT lang, token, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, token ASC) AS rnk
      FROM counts
    )
    SELECT lang, CAST(rnk AS BIGINT) AS rnk, token, n
    FROM ranked WHERE rnk <= 10
    ORDER BY lang, rnk
    """,
)
def text_heavy_hitters(spark, sf_dir):
    """Top-10 most frequent tokens per language — the vocabulary
    heavy-hitter report used to spot boilerplate and template spam
    before training.

    Scale shape: explode -> (lang, token) hash-aggregate is ONE shuffle
    with map-side partial counts (token frequency follows Zipf, so the
    partial aggregate collapses most of the explode volume before the
    exchange); the per-lang top-k window then runs over the already
    tiny counts table. No driver-side data, no cross join — at 100 TB
    the exchange carries distinct (lang, token) pairs, not tokens."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("lang", "rnk", "token", "n")
        .coalesce(1)
        .sortWithinPartitions("lang", "rnk")
    )


@query(
    "text_type_token_ratio",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    filtered AS (SELECT source, token FROM toks WHERE token <> '')
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab_size,
           ROUND(CAST(COUNT(DISTINCT token) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS type_token_ratio
    FROM filtered
    GROUP BY source
    ORDER BY source
    """,
)
def text_type_token_ratio(spark, sf_dir):
    """Type-token ratio (vocabulary size / token volume) per source —
    the lexical-diversity screen that flags template-generated or
    looping sources (low TTR) before they enter a training mix.

    Scale shape: one explode feeding a per-source COUNT + exact
    COUNT(DISTINCT token). Spark plans the distinct as a two-phase
    expand/aggregate keyed on (source, token) — the duplicate collapse
    happens map-side, so the exchange carries distinct pairs. The ratio
    divides two exact BIGINTs, so rounding to 6 dp is engine-stable."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.countDistinct("token").alias("vocab_size"),
        )
        .withColumn(
            "type_token_ratio",
            F.round(
                F.col("vocab_size").cast("double")
                / F.col("total_tokens").cast("double"),
                6,
            ),
        )
        .select("source", "total_tokens", "vocab_size", "type_token_ratio")
        .coalesce(1)
        .sortWithinPartitions("source")
    )


@query(
    "text_distinctive_terms",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    clean AS (SELECT source, token FROM toks WHERE token <> ''),
    tf AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM clean GROUP BY source, token
    ),
    src_tot AS (
      SELECT source, CAST(SUM(tf) AS BIGINT) AS src_tokens FROM tf GROUP BY source
    ),
    term_tot AS (
      SELECT token, CAST(SUM(tf) AS BIGINT) AS tf_all FROM tf GROUP BY token
    ),
    all_tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS tot_tokens FROM tf),
    scored AS (
      SELECT tf.source, tf.token, tf.tf, tt.tf_all,
             ROUND(CAST(tf.tf * a.tot_tokens AS DOUBLE)
                   / CAST(tt.tf_all * st.src_tokens AS DOUBLE), 6) AS lift
      FROM tf
      JOIN term_tot tt ON tf.token = tt.token
      JOIN src_tot st ON tf.source = st.source
      CROSS JOIN all_tot a
    ),
    ranked AS (
      SELECT source, token, tf, tf_all, lift,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY lift DESC, token ASC) AS rnk
      FROM scored
    )
    SELECT source, token, tf, tf_all, lift, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    ORDER BY source, rnk
    """,
)
def text_distinctive_terms(spark, sf_dir):
    """Top-5 distinctive terms per source by corpus lift — the keyness
    profile a corpus browser shows next to each source: lift =
    (term rate within the source) / (term rate in the whole corpus),
    > 1 means over-represented. (A df-based idf is degenerate on this
    corpus — the synthetic vocabulary appears in every source — and
    ln() is libm-specific anyway; the lift ratio divides two exact
    BIGINT cross-products, so it is bit-identical across engines.)

    Scale shape: one (source, token) aggregate over the exploded
    tokens (map-side combined); the three totals all derive from the
    ALREADY-AGGREGATED tf table (vocabulary-sized), join back
    broadcast, and the per-source top-5 window runs over tf — nothing
    after the first aggregate touches corpus-scale data."""
    docs = rebalance(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    src_tot = tf.groupBy("source").agg(F.sum("tf").cast("long").alias("src_tokens"))
    term_tot = tf.groupBy("token").agg(F.sum("tf").cast("long").alias("tf_all"))
    all_tot = tf.agg(F.sum("tf").cast("long").alias("tot_tokens"))
    scored = (
        # term_tot is vocabulary-sized (unbounded at 100 TB): no forced
        # broadcast — tf is already shuffled on token, so this join
        # co-locates for free; AQE broadcasts when actually small.
        tf.join(term_tot, "token")
        .join(F.broadcast(src_tot), "source")  # bcast-ok: per-source totals, constant domain
        .crossJoin(F.broadcast(all_tot))  # bcast-ok: 1-row total
        .select(
            "source",
            "token",
            "tf",
            "tf_all",
            F.round(
                (F.col("tf") * F.col("tot_tokens")).cast("double")
                / (F.col("tf_all") * F.col("src_tokens")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("lift"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "source", "token", "tf", "tf_all", "lift",
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("source", "rnk")
    )
