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
    ).orderBy("event_id")  # purchase-proportional output: distributed sort


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


@query(
    "ts_gap_fill_locf",
    # Gap-fill a dense per-(user, minute) grid and carry the last
    # observation forward — the hypertable locf/interpolate shape.
    # min(value) is the per-minute observation (exact on both engines);
    # the LOCF window is ROWS UNBOUNDED PRECEDING..CURRENT with
    # IGNORE NULLS on each side.
    oracle="""
    WITH grid AS (
      SELECT u.user_id,
             unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-01 03:59:00',
                                    INTERVAL 1 MINUTE)) AS minute
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 5) u
    ),
    obs AS (
      SELECT user_id, date_trunc('minute', ts) AS minute,
             MIN(value) AS v
      FROM events
      WHERE user_id < 5
        AND ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND ts <  TIMESTAMP '2024-01-01 04:00:00'
      GROUP BY user_id, date_trunc('minute', ts)
    )
    SELECT g.user_id, g.minute, obs.v AS observed,
           last_value(obs.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.minute
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM grid g LEFT JOIN obs ON obs.user_id = g.user_id
                             AND obs.minute = g.minute
    ORDER BY g.user_id, g.minute
    """,
)
def ts_gap_fill_locf(spark, sf_dir):
    """Dense-grid gap fill with last-observation-carried-forward: the
    minute grid comes from one explode (no driver loop), observations
    left-join onto it, and the fill is a single per-user window —
    one shuffle on user_id, scale-independent of gap width."""
    from pyspark.sql import Window

    all_ev = t(spark, sf_dir, "events")
    ev = all_ev.filter(
        (F.col("user_id") < 5)
        & (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-01 04:00:00").cast("timestamp_ntz"))
    )
    # grid users come from the whole table (not the time window), so a
    # user idle through the window still gets an all-NULL filled series
    users = all_ev.filter(F.col("user_id") < 5).select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.expr(
                "sequence(TIMESTAMP_NTZ '2024-01-01 00:00:00',"
                " TIMESTAMP_NTZ '2024-01-01 03:59:00', INTERVAL 1 MINUTE)"
            )
        ).alias("minute"),
    )
    obs = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("minute")
    ).agg(F.min("value").alias("v"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "minute"], "left")
        .select(
            "user_id",
            "minute",
            F.col("v").alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("filled"),
        )
        # user x minute grid output: distributed range sort, no funnel
        .orderBy("user_id", "minute")
    )


@query(
    "ts_gap_fill_interpolate",
    # Linear interpolation between the bracketing observations; NULL
    # outside the observed range. The lerp is written with identical
    # operation order on both engines (IEEE-exact), rounded to 6 to
    # absorb nothing-but-paranoia; epoch-minute arithmetic is integer.
    oracle="""
    WITH grid AS (
      SELECT u.user_id,
             unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-01 03:59:00',
                                    INTERVAL 1 MINUTE)) AS minute
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 5) u
    ),
    obs AS (
      SELECT user_id, date_trunc('minute', ts) AS minute,
             MIN(value) AS v
      FROM events
      WHERE user_id < 5
        AND ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND ts <  TIMESTAMP '2024-01-01 04:00:00'
      GROUP BY user_id, date_trunc('minute', ts)
    ),
    brk AS (
      SELECT g.user_id, g.minute, obs.v,
             CAST(epoch(g.minute) AS BIGINT) / 60 AS m,
             last_value(obs.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN obs.v IS NOT NULL
                             THEN CAST(epoch(g.minute) AS BIGINT) / 60 END
                        IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
             first_value(obs.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.minute
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN obs.v IS NOT NULL
                              THEN CAST(epoch(g.minute) AS BIGINT) / 60 END
                         IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.minute
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
      FROM grid g LEFT JOIN obs ON obs.user_id = g.user_id
                               AND obs.minute = g.minute
    )
    SELECT user_id, minute, v AS observed,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(m - pm AS DOUBLE)
                                 / CAST(nm - pm AS DOUBLE))
             ELSE NULL END, 6) AS interpolated
    FROM brk
    ORDER BY user_id, minute
    """,
)
def ts_gap_fill_interpolate(spark, sf_dir):
    """Linear interpolation over the dense minute grid: each gap minute
    lerps between its bracketing observations (two ignore-nulls windows
    over ONE user_id shuffle — no self-join, no range explosion);
    minutes outside the observed range stay NULL."""
    from pyspark.sql import Window

    all_ev = t(spark, sf_dir, "events")
    ev = all_ev.filter(
        (F.col("user_id") < 5)
        & (F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-01 04:00:00").cast("timestamp_ntz"))
    )
    users = all_ev.filter(F.col("user_id") < 5).select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.expr(
                "sequence(TIMESTAMP_NTZ '2024-01-01 00:00:00',"
                " TIMESTAMP_NTZ '2024-01-01 03:59:00', INTERVAL 1 MINUTE)"
            )
        ).alias("minute"),
    )
    obs = ev.groupBy(
        "user_id", F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("minute")
    ).agg(F.min("value").alias("v"))
    m = (F.unix_timestamp(F.col("minute").cast("timestamp")) / 60).cast("long")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("minute")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_m = F.when(F.col("v").isNotNull(), m)
    base = (
        grid.join(obs, ["user_id", "minute"], "left")
        .withColumn("m", m)
        .withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("pm", F.last(obs_m, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nm", F.first(obs_m, ignorenulls=True).over(wn))
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("m") - F.col("pm")).cast("double")
        / (F.col("nm") - F.col("pm")).cast("double")
    )
    return (
        base.select(
            "user_id",
            "minute",
            F.col("v").alias("observed"),
            F.round(
                F.when(F.col("v").isNotNull(), F.col("v"))
                .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), lerp)
                .otherwise(F.lit(None)),
                6,
            ).alias("interpolated"),
        )
        # user x minute grid output: distributed range sort, no funnel
        .orderBy("user_id", "minute")
    )


@query(
    "ts_user_span_interval",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           max(ts) - min(ts) AS span
    FROM events
    GROUP BY user_id
    ORDER BY span DESC, user_id ASC
    LIMIT 20
    """,
)
def ts_user_span_interval(spark, sf_dir):
    """INTERVAL results cross-engine (types.sql INTERVAL tier made
    useful): per-user activity span as a day-time interval — Spark's
    timestamp subtraction yields DayTimeIntervalType, DuckDB's an
    INTERVAL, and both surface as exact timedeltas to the comparator.

    Scale shape: one partial-aggregated groupBy on user_id, then a
    k-bounded top-20 (TakeOrderedAndProject) — no full sort."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts") - F.min("ts")).alias("span"),
        )
        .orderBy(F.desc("span"), F.asc("user_id"))
        .limit(20)
    )
