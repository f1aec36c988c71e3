"""Reusable deduplication operators (parameterized library surface; the
oracle-verified fixed-shape variants live in plans/dedup.py).

All candidate generation is equi-join based (shingle / LSH band /
signature-byte blocking) — no operator here ever cross-joins the corpus,
so every one survives a 100 TB document table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions.hashing import h32, minhash_coeffs, minhash_col


def exact_dedup(df: DataFrame, cols: list[str] | None = None, keep: str = "first",
                order_col: str | None = None) -> DataFrame:
    """Drop exact duplicates over ``cols`` (default: all columns).

    With ``order_col``, keeps the row with the smallest (keep='first') or
    largest (keep='last') value per group — deterministic, unlike
    dropDuplicates. One shuffle on the dedup key hash.
    """
    subset = cols or df.columns
    if order_col is None:
        return df.dropDuplicates(subset)
    direction = F.asc(order_col) if keep == "first" else F.desc(order_col)
    w = Window.partitionBy(*subset).orderBy(direction)
    return (
        df.withColumn("_dl_rn", F.row_number().over(w))
        .filter(F.col("_dl_rn") == 1)
        .drop("_dl_rn")
    )


def shingle(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams of the lowercased text."""
    gram = " , ".join(f"element_at(toks, i + {j})" for j in range(n))
    expr = f"""
    CASE WHEN size(toks) >= {n} THEN
      array_distinct(transform(sequence(1, size(toks) - {n - 1}),
        i -> concat_ws(' ', {gram})))
    ELSE CAST(array() AS ARRAY<STRING>) END
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.split(F.lower(text_col), " ").alias("toks")
    )
    return (
        toks.select("id", F.explode_outer(F.expr(expr)).alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.8, n: int = 3,
    prune_unique: bool = True, max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold) by word
    n-gram Jaccard; candidates from grouped shingle posting lists.

    Candidate pairs come from ONE shuffle keyed on shingle: group the
    posting list per shingle and enumerate in-group pairs directly
    (``collect_list`` + streamed posexplode/slice generators, so no
    single row ever holds the quadratic pair array). Versus the
    classic self-equi-join this removes two exchanges (the join's
    second side and the separate document-frequency pre-count — a
    posting list of length 1 simply emits no pairs, so singleton
    pruning is free and lossless; ``prune_unique`` is kept for API
    compatibility and is implied). At 100 TB the guard rail is
    ``max_df``: a stopword shingle's posting list is quadratic under
    ANY pair-enumeration strategy, so production runs cap it (lossy,
    the standard trade); the default None keeps exact semantics for
    oracle comparison."""
    # r12 (guide §2.3/§2.4): per-doc set sizes are the LENGTH of the
    # map-side shingle array — computed before the explode, carried
    # through the posting list as (id, n) structs. Versus the previous
    # exploded-rows groupBy-count + two size joins this removes one
    # full aggregate exchange, two join stages, and the persist of the
    # exploded shingle table; the postings shuffle carries 8 extra
    # bytes per entry. Results are identical (same pairs, same
    # inter/union arithmetic).
    gram = " , ".join(f"element_at(toks, i + {j})" for j in range(n))
    arr_expr = f"""
    CASE WHEN size(toks) >= {n} THEN
      array_distinct(transform(sequence(1, size(toks) - {n - 1}),
        i -> concat_ws(' ', {gram})))
    ELSE CAST(array() AS ARRAY<STRING>) END
    """
    shingled = df.select(
        F.col(id_col).alias("id"), F.split(F.lower(text_col), " ").alias("toks")
    ).select("id", F.expr(arr_expr).alias("shingles"))
    exploded = (
        shingled.select(
            "id",
            F.size("shingles").cast("long").alias("n"),
            F.explode_outer("shingles").alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )
    groups = exploded.groupBy("shingle").agg(
        F.sort_array(F.collect_list(F.struct("id", "n"))).alias("dl")
    )
    if max_df is not None:
        groups = groups.filter(F.size("dl") <= max_df)
    # Two chained generators: posexplode picks the left element, then a
    # slice-explode emits its suffix partners. Spark's Generate operator
    # STREAMS generator output, so per-row memory is O(len(dl)) — the
    # n^2 pair volume is spread over n streamed rows, never materialized
    # as one n^2-element array inside a single row (a stopword shingle
    # would OOM a task under the flatten(transform(...)) formulation).
    inter = (
        groups.filter(F.size("dl") >= 2)
        .select(F.col("dl"), F.posexplode("dl").alias("i", "a"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.n").alias("na"),
            F.explode(F.expr("slice(dl, i + 2, size(dl))")).alias("b"),
        )
        .select("id_a", "na", F.col("b.id").alias("id_b"), F.col("b.n").alias("nb"))
        # r13 (guide §2.3 narrower keys): 2-long pair grouping key; na/nb
        # are functionally dependent on the ids, recovered exactly by max().
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with estimated Jaccard.

    k permutations split into ``bands`` bands; a pair collides when any
    band matches. Probability of detection ≈ 1-(1-j^r)^b with r = k/bands
    — tune (k, bands) to the target threshold.
    """
    assert k % bands == 0, "k must be divisible by bands"
    rows = k // bands
    # Expressions are built as SQL strings (one JVM round trip each)
    # rather than hundreds of composed Column objects — identical plans,
    # ~10× cheaper client-side construction at k=128.
    from pg_ducklake_spark.functions.hashing import sql_minhash

    coeffs = minhash_coeffs(k, seed)
    sh = shingle(df, text_col, id_col, n)
    hashed = sh.select("id", h32("shingle").alias("h"))
    sigs = hashed.groupBy("id").agg(
        *[F.expr(f"min({sql_minhash('h', a, b)}) AS mh{i}")
          for i, (a, b) in enumerate(coeffs)]
    ).persist()
    band_structs = ", ".join(
        f"struct(CAST({band} AS INT) AS band_id, concat_ws('_', "
        + ", ".join(
            f"cast(mh{band * rows + r} as string)" for r in range(rows)
        )
        + ") AS band_key)"
        for band in range(bands)
    )
    banded = sigs.selectExpr(
        "id", f"explode(array({band_structs})) AS bk"
    ).select("id", "bk.band_id", "bk.band_key")
    # In-bucket candidates from grouped posting lists (one band-keyed
    # shuffle + streamed pair generators) instead of the two-sided band
    # self-join — one exchange and the join stage fewer, same pairs.
    cands = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list("id")).alias("dl"))
        .filter(F.size("dl") >= 2)
        .select(F.col("dl"), F.posexplode("dl").alias("i", "id_a"))
        .select(
            "id_a",
            F.explode(F.expr("slice(dl, i + 2, size(dl))")).alias("id_b"),
        )
        .distinct()
    )
    sa = sigs.selectExpr("id AS id_a", *[f"mh{i} AS a{i}" for i in range(k)])
    sb = sigs.selectExpr("id AS id_b", *[f"mh{i} AS b{i}" for i in range(k)])
    est = F.expr(
        "CAST("
        + " + ".join(f"IF(a{i} = b{i}, 1, 0)" for i in range(k))
        + f" AS DOUBLE) / {k}"
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def dedupe_keep_first(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Remove near-duplicates given a pair list: drops every id that
    appears as id_b of a pair whose id_a survives transitively.

    Single-pass approximation of connected components: keep an id unless
    it is dominated by any smaller id (id_b side of a pair). Exact for
    star-shaped duplicate clusters (the common case); chains of length
    > 2 may keep an intermediate — run to fixpoint if exactness matters.
    """
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def incremental_jaccard_pairs(
    corpus: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    threshold: float = 0.8,
    n: int = 3,
    corpus_shingles: DataFrame | None = None,
    corpus_sizes: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs introduced by an append batch, WITHOUT re-joining
    the corpus against itself — the per-batch maintenance step of a
    continuously-deduped lake. Returns (new_id, other_id, other_is_new,
    jaccard): each new document against both the pre-existing corpus
    (other_is_new = false) and the rest of its own batch (true,
    emitted once with new_id < other_id).

    Scale shape: the join input is delta's shingles probing the
    corpus's shingles — cost grows with the BATCH, not the corpus²;
    corpus-side shingles/sizes can be passed in precomputed
    (``corpus_shingles`` / ``corpus_sizes``), which at 100 TB is a
    maintained index table appended alongside the data rather than
    recomputed per batch. Pairs among delta docs agree exactly with a
    full :func:`jaccard_pairs` recompute (same shingles, same metric).
    """
    d_sh = shingle(delta, text_col, id_col, n).persist()
    c_sh = (
        corpus_shingles
        if corpus_shingles is not None
        else shingle(corpus, text_col, id_col, n)
    )
    d_sizes = d_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    c_sizes = (
        corpus_sizes
        if corpus_sizes is not None
        else c_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    a = d_sh.select(F.col("id").alias("new_id"), "shingle")
    b = c_sh.select(
        F.col("id").alias("other_id"), "shingle"
    ).withColumn("other_is_new", F.lit(False)).unionByName(
        d_sh.select(F.col("id").alias("other_id"), "shingle").withColumn(
            "other_is_new", F.lit(True)
        )
    )
    inter = (
        a.join(b, "shingle")
        # new-vs-old: every cross pair (an updated row is never compared
        # with its own pre-image); new-vs-new: once, smaller id first
        .filter(
            (~F.col("other_is_new") & (F.col("new_id") != F.col("other_id")))
            | (F.col("other_is_new") & (F.col("new_id") < F.col("other_id")))
        )
        .groupBy("new_id", "other_id", "other_is_new")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = d_sizes.select(F.col("id").alias("new_id"), F.col("n_shingles").alias("na"))
    # The b side's size must describe the VERSION that was shingled
    # there (an id can appear on both sides with different text after
    # an update), so sizes join on (other_id, other_is_new).
    sb = c_sizes.select(
        F.col("id").alias("other_id"), F.col("n_shingles").alias("nb")
    ).withColumn("other_is_new", F.lit(False)).unionByName(
        d_sizes.select(
            F.col("id").alias("other_id"), F.col("n_shingles").alias("nb")
        ).withColumn("other_is_new", F.lit(True))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sa, "new_id")
        .join(sb, ["other_id", "other_is_new"])
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "other_id", "other_is_new", "jaccard")
    )


def incremental_near_dup(
    lake,
    table: str,
    since_version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 3,
) -> DataFrame:
    """Lake-level incremental dedup: near-dup pairs between the rows
    appended after snapshot ``since_version`` (via the change feed)
    and the corpus as of that snapshot. The ongoing-maintenance twin
    of the batch operators: dedup the delta against the world without
    touching corpus × corpus."""
    from pg_ducklake_spark.changefeed import table_insertions

    corpus = lake.table(table, version=since_version)
    delta = table_insertions(lake, table, since_version + 1)
    return incremental_jaccard_pairs(
        corpus, delta, text_col, id_col, threshold, n
    )
