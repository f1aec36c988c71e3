"""Time-series join operators: as-of joins and interval (range) joins —
operators the reference engine lacks entirely (and Spark has no native
syntax for), expressed Spark-first and oracle-checked against DuckDB's
native ASOF JOIN / theta range join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_ducklake_spark.functions import davg, sql_davg
from pg_ducklake_spark.plans import query, t


def _purchases(spark, sf_dir):
    return t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")


def _clicks(spark, sf_dir):
    return t(spark, sf_dir, "events").filter(F.col("event_type") == "click")


@query(
    "ts_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, c.ts AS click_ts,
           CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS gap_micros
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def ts_asof_join(spark, sf_dir):
    """For every purchase, the latest click at-or-before it by the same
    user (tagged single-scan window strategy: one scan, one shuffle, no
    range explosion)."""
    from pg_ducklake_spark.operators.asof import asof_self_join

    joined = asof_self_join(
        t(spark, sf_dir, "events"),
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        on="ts",
        by=["user_id"],
        right_prefix="click_",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("click_ts"),
        F.expr("timestampdiff(MICROSECOND, click_ts, ts)").cast("long").alias(
            "gap_micros"
        ),
    ).coalesce(1).sortWithinPartitions("event_id")


@query(
    "ts_asof_gap_stats",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS purchases,
           CAST(COUNT(c.ts) AS BIGINT) AS matched,
           {sql_davg("CAST(date_diff('microsecond', c.ts, p.ts) AS DOUBLE) / 1000000.0")}
             AS avg_gap_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def ts_asof_gap_stats(spark, sf_dir):
    from pg_ducklake_spark.operators.asof import asof_self_join

    joined = asof_self_join(
        t(spark, sf_dir, "events"),
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        on="ts",
        by=["user_id"],
        right_prefix="click_",
    )
    gap = F.expr("timestampdiff(MICROSECOND, click_ts, ts)").cast("double") / 1_000_000.0
    return joined.agg(
        F.count(F.lit(1)).alias("purchases"),
        F.count("click_ts").alias("matched"),
        davg(gap).alias("avg_gap_seconds"),
    )


@query(
    "ts_range_join_conversions",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS conversion_pairs,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS converting_users
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def ts_range_join_conversions(spark, sf_dir):
    """Interval join: purchases within 30 minutes after a click. The
    equi-join on user_id carries the range predicate as a post-filter —
    Spark plans this as a hash join + filter, never a cross product."""
    clicks = _clicks(spark, sf_dir).select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purchases = _purchases(spark, sf_dir).select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("conversion_pairs"),
        F.countDistinct("c_user").alias("converting_users"),
    )


@query(
    "ts_time_bucket_rollup",
    oracle=f"""
    SELECT bucket, event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {sql_davg('value')} AS avg_value
    FROM (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600)
               AT TIME ZONE 'UTC' AS bucket,
             event_type, value
      FROM events) x
    GROUP BY bucket, event_type
    ORDER BY bucket, event_type
    """,
)
def ts_time_bucket_rollup(spark, sf_dir):
    """Hypertable-style arbitrary time_bucket (6h) continuous-aggregate
    shape, via integer epoch arithmetic (identical across engines)."""
    ev = t(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 21600) * 21600)
    ).cast("timestamp_ntz")
    return (
        ev.groupBy(bucket.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value"))
        .orderBy("bucket", "event_type")
    )
