"""Corpus-curation closers: canonical-document selection per near-dup
cluster, and trailing-window anomaly screening over the event stream.

Canonical selection is the final step of the dedup contract: pair
detection (Jaccard/MinHash) → component clustering (a~b~c chains) →
keep exactly ONE document per cluster, chosen by quality. The anomaly
screen is the ops-side counterpart: flag days whose event volume
deviates from the trailing week — ingestion spikes/outages corrupt
training mixes silently.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.plans import query, rebalance, t
from pg_ducklake_spark.plans.dedup import _DUCK_SHINGLED
from pg_ducklake_spark.plans.text import _DUCK_QUALITY, _SPARK_QUALITY


@query(
    "dedup_canonical_selection",
    # Same pair + recursive-CTE component derivation as dedup_components
    # (threshold 0.5), then keep the best-quality member per component
    # (tie → smaller doc_id).
    oracle=f"""
    WITH RECURSIVE shingled AS ({_DUCK_SHINGLED}),
    exploded AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM shingled
    ),
    sizes AS (
      SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles FROM shingled
    ),
    pair_inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM pair_inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE)
            / CAST(sa.n_shingles + sb.n_shingles - inter AS DOUBLE) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(node, comp) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
    ),
    members AS (
      SELECT CAST(node AS BIGINT) AS doc_id,
             CAST(MIN(comp) AS BIGINT) AS component
      FROM reach GROUP BY node
    ),
    ranked AS (
      SELECT m.component, m.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY m.component
               ORDER BY ({_DUCK_QUALITY}) DESC, m.doc_id ASC
             ) AS rnk,
             COUNT(*) OVER (PARTITION BY m.component) AS n_members
      FROM members m JOIN documents d ON d.doc_id = m.doc_id
    )
    SELECT component, doc_id AS keeper_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rnk = 1
    ORDER BY component
    """,
)
def dedup_canonical_selection(spark, sf_dir):
    """One keeper per near-duplicate cluster: Jaccard-0.5 pair edges →
    connected components (min-label propagation, operators/
    components.py) → highest-quality member wins (tie → smaller
    doc_id).

    Scale shape: everything up to components is the equi-join dedup
    family; the selection itself is one window partitioned by
    component (cluster-sized groups, never global) after a join back
    to the documents table on doc_id."""
    from pg_ducklake_spark.operators.components import connected_components
    from pg_ducklake_spark.operators.dedup import jaccard_pairs

    docs = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        rebalance(docs), text_col="text", id_col="doc_id", threshold=0.5
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        # jaccard_pairs emits one ordered row per pair (groupBy output,
        # id_a < id_b) -- skip the pre-loop dedup shuffle
        edges_unique=True,
    ).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    )
    quality = F.expr(_SPARK_QUALITY)
    members = comp.join(
        docs.select("doc_id", quality.alias("_q")), "doc_id"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("_q"), F.asc("doc_id")
    )
    wc = Window.partitionBy("component")
    return (
        members.withColumn("rnk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("rnk") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
        # one row per duplicate component (data-proportional):
        # distributed range sort, no single-task funnel
        .orderBy("component")
    )


@query(
    "events_anomaly_zscore",
    # Trailing-7-observation z-score from EXACT integer window sums
    # (sum, sum of squares): mean/variance derive from bigint
    # arithmetic, so the doubles are built by an identical expression
    # tree on both engines — no engine-specific stddev accumulation
    # order in sight.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT day, event_type, n,
             SUM(n) OVER w AS s1, SUM(n * n) OVER w AS s2,
             COUNT(*) OVER w AS k
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, event_type, n,
           ROUND((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0)
                        / 6.0), 4) AS z,
           CASE WHEN abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0)
                        / 6.0)) > 2.0 THEN 1 ELSE 0 END AS is_anomaly
    FROM win
    WHERE k = 7
      AND (CAST(s2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) > 0
    ORDER BY event_type, day
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Daily event-volume anomalies: z-score of each (event_type, day)
    count against its trailing 7 days, from exact integer window sums
    (see oracle comment). Flags |z| > 2.

    One groupBy to daily grain, then a per-event_type ordered window —
    partition count = event-type cardinality × bounded daily rows, no
    global ordering."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    win = daily.select(
        "day",
        "event_type",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    mean = F.col("s1").cast("double") / 7.0
    ss = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / 7.0
    )
    z = (F.col("n").cast("double") - mean) / F.sqrt(ss / 6.0)
    return (
        win.filter((F.col("k") == 7) & (ss > 0))
        .select(
            "day",
            "event_type",
            "n",
            F.round(z, 4).alias("z"),
            F.when(F.abs(z) > 2.0, 1).otherwise(0).cast("int").alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )
