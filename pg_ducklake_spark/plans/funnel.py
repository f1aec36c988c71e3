"""Event-funnel and journey analytics over ``events``.

Classic product-analytics shapes a training-data/event lake needs:
ordered conversion funnels (view → click → signup → purchase, each
stage strictly after the previous one for the same user) and the
event-type transition matrix (Markov first-order journey counts).

Scale shape: every stage is an equi-join/groupBy on user_id — the
natural shuffle key — and the transition matrix is a user-partitioned
window (no global ordering anywhere), so both survive a 1000-executor
100 TB run unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.plans import query, t

_FUNNEL_ORACLE = """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    s AS (
      SELECT e.user_id, MIN(e.ts) AS t_signup
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'signup' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.t_signup
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 4) AS full_conversion
"""


@query("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark, sf_dir):
    """Strictly-ordered four-stage funnel: users who viewed, then
    clicked after their first view, then signed up after that first
    qualifying click, then purchased after that signup.

    Each stage = one equi-join on user_id + a min-aggregate — the
    standard funnel plan; no windows, no per-user collection, so stage
    N's shuffle is bounded by the survivors of stage N-1."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(prev, prev_ts_col, etype, out_col):
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_col))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = stage(v, "t_view", "click", "t_click")
    s = stage(c, "t_click", "signup", "t_signup")
    p = stage(s, "t_signup", "purchase", "t_purchase")

    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((v, "n_view"), (c, "n_click"), (s, "n_signup"), (p, "n_purchase"))
    ]
    row = counts[0]
    for other in counts[1:]:
        row = row.crossJoin(other)  # four 1-row aggregates: trivially safe
    return row.select(
        "n_view",
        "n_click",
        "n_signup",
        "n_purchase",
        F.round(
            F.col("n_purchase").cast("double") / F.col("n_view"), 4
        ).alias("full_conversion"),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    ORDER BY from_type, to_type
    """,
)
def events_transition_matrix(spark, sf_dir):
    """First-order journey transition counts: for each consecutive
    event pair within a user's timeline (ties broken by event_id for
    cross-engine determinism), count (from_type → to_type).

    One user_id-partitioned window + one small groupBy — the window
    never sees more than one user's events per partition group."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )
