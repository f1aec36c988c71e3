"""Multimodal-column queries: binary payload handling end to end.

``documents.text`` is encoded to a binary column (the testdata has no
real media), exercising the same plumbing a 100 TB image/audio lake
needs: opaque bytes + typed metadata, SQL-side byte functions, and an
Arrow-batched Pandas feature extractor (oracle-less rows-only check —
the fake decode is Python-side by design).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.functions import davg, sql_davg
from pg_ducklake_spark.plans import query, t


@query(
    "mm_binary_metadata",
    oracle=f"""
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(octet_length(content) AS BIGINT)) AS BIGINT) AS total_bytes,
           {sql_davg('CAST(octet_length(content) AS DOUBLE)')} AS avg_bytes,
           CAST(MAX(octet_length(content)) AS BIGINT) AS max_bytes
    FROM (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             encode(text) AS content
      FROM documents) media
    GROUP BY media_type
    ORDER BY media_type
    """,
)
def mm_binary_metadata(spark, sf_dir):
    """Typed-metadata stats over an opaque binary column."""
    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )
    nbytes = F.octet_length("content").cast("long")
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(nbytes).cast("long").alias("total_bytes"),
            davg("CAST(octet_length(content) AS DOUBLE)").alias("avg_bytes"),
            F.max(F.octet_length("content")).cast("long").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


@query(
    "mm_feature_extraction",
    # The fake featurizer is deterministic byte math (UTF-8 byte stats +
    # a mod-16 histogram), so DuckDB can recompute it from hex(encode()):
    # byte i = 16*hexdigit(2i+1) + hexdigit(2i+2). Empty payloads follow
    # the featurizer's single-zero-byte substitution. Integer byte sums
    # are exact in float64 (numpy's pairwise mean == sum/n here), and
    # log2 ulp noise is absorbed by the shared round-to-6.
    oracle="""
    WITH raw AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n0
      FROM documents
    ),
    bytes AS (
      SELECT media_id,
             CASE WHEN n0 = 0 THEN 1 ELSE n0 END AS n,
             CASE WHEN n0 = 0 THEN [0]
                  ELSE list_transform(range(0, n0), i ->
                    (strpos('0123456789ABCDEF', substr(h, 2*i + 1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF', substr(h, 2*i + 2, 1)) - 1))
             END AS bs
      FROM raw
    ),
    hist AS (
      SELECT media_id, n, bs,
             list_transform(range(0, 16), k ->
               len(list_filter(bs, x -> x % 16 = k))) AS cnts
      FROM bytes
    )
    SELECT media_id,
           CAST(n AS BIGINT) AS n_bytes,
           ROUND(CAST(list_sum(bs) AS DOUBLE) / n, 6) AS byte_mean,
           ROUND(-list_sum(list_transform(cnts, c ->
             CASE WHEN c > 0
                  THEN (CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)
                  ELSE CAST(0.0 AS DOUBLE) END)), 6) AS entropy,
           ROUND(CAST(cnts[1] AS DOUBLE) / n, 6) AS f0
    FROM hist
    ORDER BY media_id
    """,
)
def mm_feature_extraction(spark, sf_dir):
    """Arrow-batched fake-decode feature extraction (mapInPandas); the
    decode stub seam is operators/multimodal.py."""
    from pg_ducklake_spark.operators.multimodal import extract_features

    docs = t(spark, sf_dir, "documents")
    # r12: NO pre-kernel rebalance here, deliberately (guide §1.2 —
    # measure, don't assume). The spans kernel wins from the same
    # spread (md5 per 50-char window ≈ heavy CPU per input byte), but
    # this featurizer is vectorized numpy byte stats — cheap per byte —
    # and the round-robin exchange of the raw text costs more than the
    # one-task kernel it parallelizes (interleaved 5-draw A/B at sf0.1:
    # exec median 1.97 s with rebalance vs 1.19 s without). On a
    # production layout the writer emits many files and the scan is
    # already parallel, so nothing is lost at scale.
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.to_json(F.struct("lang", "source")).alias("metadata"),
    )
    feats = extract_features(media, dim=16, fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        F.round("byte_entropy_proxy", 6).alias("entropy"),
        F.round(F.element_at("feature", 1), 6).alias("f0"),
    ).orderBy("media_id")


@query(
    "mm_frame_sample",
    # The operator emits one row per sampled byte offset
    # (sequence(0, len-1, 1024)); the oracle verifies the aggregate of
    # that explosion against the closed form — frames = ⌊max(len-1,0)/
    # stride⌋ + 1, last offset = (frames-1)·stride — so any drift in
    # the sampling arithmetic (off-by-one, empty payloads) fails the
    # value compare.
    oracle="""
    SELECT media_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(FLOOR(GREATEST(n_bytes - 1, 0) / 1024) + 1 AS BIGINT)
             AS n_frames,
           CAST((FLOOR(GREATEST(n_bytes - 1, 0) / 1024)) * 1024 AS BIGINT)
             AS last_offset
    FROM (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
      FROM documents
      WHERE doc_id % 3 = 2
    ) v
    ORDER BY media_id
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Frame sampling over opaque video payloads: one row per sampled
    offset (the stand-in for per-frame decode at a fixed byte stride),
    rolled up per media item. The explode is pure column ops — no
    Python in the loop, embarrassingly parallel at 100 TB."""
    from pg_ducklake_spark.operators.multimodal import frame_sample

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )
    frames = frame_sample(media, every_n_bytes=1024)
    return (
        frames.groupBy("media_id")
        .agg(
            F.max("n_bytes").cast("long").alias("n_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.max("byte_offset").cast("long").alias("last_offset"),
        )
        # one row per media item (corpus-proportional): distributed sort
        .orderBy("media_id")
    )
