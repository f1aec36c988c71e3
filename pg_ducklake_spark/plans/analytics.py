"""ClickBench-shaped event analytics (the reference's CI query gate).

The reference gates releases on the 43-query ClickBench sweep
(reference: .github/workflows/docker.yaml:135-188) — wide aggregations,
count(distinct), GROUP BY … ORDER BY … LIMIT, LIKE/regexp matching and
date bucketing over a big flat table. These queries replay those shapes
over the synthetic ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.functions import davg, dsum, sql_davg, sql_dsum
from pg_ducklake_spark.plans import query, t


@query(
    "events_overview",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    """,
)
def events_overview(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        dsum("value").alias("total_value"),
        davg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "events_by_type",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
           {sql_dsum('value')} AS total_value,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type ASC
    """,
)
def events_by_type(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            dsum("value").alias("total_value"),
            davg("value").alias("avg_value"),
        )
        .coalesce(1).sortWithinPartitions(F.desc("n"), F.asc("event_type"))
    )


@query(
    "events_daily",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def events_daily(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            dsum("value").alias("total_value"),
        )
        .coalesce(1).sortWithinPartitions("day")
    )


@query(
    "events_hourly_histogram",
    oracle="""
    SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    ORDER BY hour
    """,
)
def events_hourly_histogram(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").cast("long").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hour")
    )


@query(
    "events_top_users",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id ASC
    LIMIT 25
    """,
)
def events_top_users(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(25)
    )


@query(
    "events_purchase_funnel",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS views,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS clicks,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
             AS purchases
    FROM events
    GROUP BY user_id
    HAVING COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 2
    ORDER BY purchases DESC, user_id ASC
    LIMIT 50
    """,
)
def events_purchase_funnel(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cnt = lambda ty: F.count(F.when(F.col("event_type") == ty, 1))  # noqa: E731
    return (
        ev.groupBy("user_id")
        .agg(
            cnt("view").alias("views"),
            cnt("click").alias("clicks"),
            cnt("purchase").alias("purchases"),
        )
        .filter(F.col("purchases") >= 2)
        .orderBy(F.desc("purchases"), F.asc("user_id"))
        .limit(50)
    )


@query(
    "events_props_extract",
    oracle="""
    SELECT k_bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT CAST(floor(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                        / 10) AS BIGINT) AS k_bucket
      FROM events WHERE props LIKE '%"k"%'
    ) x
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
)
def events_props_extract(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("props").like('%"k"%'))
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("long")
    return (
        ev.select(F.floor(k / 10).cast("long").alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_bucket")
    )


@query(
    "events_value_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
           ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS p90,
           ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 6) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_quantiles(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # One percentile(array(...)) agg, not three: each percentile() call
    # buffers the group's values independently, so the array form cuts
    # the per-group buffering/sort 3x (A/B at sf0.1: 0.56 s vs 0.90 s).
    return (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("ps"))
        .select(
            "event_type",
            F.round(F.col("ps")[0], 6).alias("p50"),
            F.round(F.col("ps")[1], 6).alias("p90"),
            F.round(F.col("ps")[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@query(
    "events_sessionized_gap",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           {sql_davg('session_len')} AS avg_session_events
    FROM (
      SELECT user_id, session_id, CAST(COUNT(*) AS DOUBLE) AS session_len
      FROM (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
                 CASE WHEN date_diff('microsecond',
                                     LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id),
                                     ts) <= 1800000000
                      THEN 0 ELSE 1 END AS is_new
          FROM events) marked
      ) numbered
      GROUP BY user_id, session_id
    ) sessions
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    ORDER BY n_sessions DESC, user_id ASC
    LIMIT 30
    """,
)
def events_sessionized_gap(spark, sf_dir):
    """Gap-based sessionization — the classic stateful event operator,
    expressed with window functions (shuffle once on user_id, then both
    windows reuse the same partitioning — no second shuffle)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("lag_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.expr("timestampdiff(MICROSECOND, lag_ts, ts)") <= 1800000000,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    numbered = marked.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("double").alias("session_len")
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            davg("session_len").alias("avg_session_events"),
        )
        .filter(F.col("n_sessions") >= 3)
        .orderBy(F.desc("n_sessions"), F.asc("user_id"))
        .limit(30)
    )


@query(
    "events_like_filter",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    WHERE props LIKE '%"k": 7%' AND event_type NOT LIKE 'err%'
    GROUP BY event_type
    ORDER BY n DESC, event_type ASC
    """,
)
def events_like_filter(spark, sf_dir):
    """ClickBench LIKE-matching shape (Q20-ish: URL LIKE '%google%'):
    substring filter over a high-cardinality string column, then
    aggregate. Both LIKEs reach the parquet scan as pushed filters."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like('%"k": 7%') & ~F.col("event_type").like("err%"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .coalesce(1).sortWithinPartitions(F.desc("n"), F.asc("event_type"))
    )


@query(
    "events_minute_histogram",
    oracle=f"""
    SELECT CAST(EXTRACT(minute FROM ts) AS INT) AS minute,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_minute_histogram(spark, sf_dir):
    """ClickBench minute-bucketing shape (Q: GROUP BY extract minute) —
    a date-part group over the full table with a distinct-count."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.minute("ts").alias("minute"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .coalesce(1).sortWithinPartitions("minute")
    )


@query(
    "events_top_users_multiagg",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS types,
           {sql_dsum('value')} AS total_value,
           MAX(ts) AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY n DESC, user_id ASC
    LIMIT 25
    """,
)
def events_top_users_multiagg(spark, sf_dir):
    """ClickBench top-N shape: GROUP BY high-cardinality key with
    several aggregates, ORDER BY count LIMIT N. Spark plans this as
    partial-agg → shuffle → TakeOrdered, so only 25 rows ever reach
    the driver regardless of user-count."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("types"),
            dsum("value").alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(25)
    )


@query(
    "docs_regexp_classes",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, 'spark|shuffle')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sparky,
           CAST(SUM(CASE WHEN regexp_matches(text, '^[a-z ]+$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_plain
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def docs_regexp_classes(spark, sf_dir):
    """ClickBench regexp shape: two regexp classifications in one scan
    (conditional aggregation, no self-join)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("text").rlike("spark|shuffle").cast("long")).alias(
                "n_sparky"
            ),
            F.sum(F.col("text").rlike("^[a-z ]+$").cast("long")).alias("n_plain"),
        )
        .coalesce(1).sortWithinPartitions("source")
    )
