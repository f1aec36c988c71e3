"""Statistical-moment queries with order-independent exactness.

stddev/variance/correlation are normally computed from floating sums
(order-dependent → cross-engine drift); here every moment derives from
exact fixed-point sums of x, x², xy, so both engines produce identical
doubles at any parallelism. digits=4 because inputs have ≤2 decimals, so
every product has ≤4 — exact — while price² (~1.2e10) × 10⁴ still fits
int64 (×10¹⁰ would not).
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions import dsum, sql_dsum
from pg_ducklake_spark.plans import query, t

_dsum = partial(dsum, digits=4)
_sql_dsum = partial(sql_dsum, digits=4)


@query(
    "stats_value_moments",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_sql_dsum('value')} / COUNT(*) AS mean,
           sqrt(({_sql_dsum('value * value')}
                 - {_sql_dsum('value')} * {_sql_dsum('value')} / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_samp
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stats_value_moments(spark, sf_dir):
    """Sample stddev from exact decimal Σx and Σx² — deterministic on
    both engines regardless of summation order."""
    ev = t(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    sx = _dsum("value")
    sxx = _dsum("value * value")
    return (
        ev.groupBy("event_type")
        .agg(
            n.alias("n"),
            (sx / n).alias("mean"),
            F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))).alias("stddev_samp"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_price_quantity_corr",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ({_sql_dsum('l_quantity * l_extendedprice')}
            - {_sql_dsum('l_quantity')} * {_sql_dsum('l_extendedprice')} / COUNT(*))
           / (sqrt({_sql_dsum('l_quantity * l_quantity')}
                   - {_sql_dsum('l_quantity')} * {_sql_dsum('l_quantity')} / COUNT(*))
              * sqrt({_sql_dsum('l_extendedprice * l_extendedprice')}
                     - {_sql_dsum('l_extendedprice')} * {_sql_dsum('l_extendedprice')}
                       / COUNT(*)))
             AS corr_qty_price
    FROM lineitem
    """,
)
def stats_price_quantity_corr(spark, sf_dir):
    """Pearson correlation from exact decimal sums (Σx, Σy, Σxy, Σx²,
    Σy²) — the moment-sketch pattern that scales with one map-side
    combine and no second pass."""
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = _dsum("l_quantity")
    sy = _dsum("l_extendedprice")
    sxy = _dsum("l_quantity * l_extendedprice")
    sxx = _dsum("l_quantity * l_quantity")
    syy = _dsum("l_extendedprice * l_extendedprice")
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return li.agg(n.alias("n"), corr.alias("corr_qty_price"))


@query(
    "stats_histogram_fixed_bins",
    oracle="""
    SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT least(CAST(floor(value / 10.0) AS BIGINT), 19) AS bin
      FROM events) x
    GROUP BY bin
    ORDER BY bin
    """,
)
def stats_histogram_fixed_bins(spark, sf_dir):
    """Fixed-width histogram — one groupBy, the building block under
    every distributed quantile/profile job."""
    ev = t(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 10.0).cast("long"), F.lit(19))
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


@query(
    "stats_mad_outliers",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type, value AS median FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.median) AS ad, m.median
      FROM events e JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT event_type, median, ad,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type, median, ad AS mad FROM r2 WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           m.median AS med,
           m.mad AS mad,
           CAST(SUM(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           ROUND(CAST(SUM(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS outlier_rate
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.median, m.mad
    ORDER BY d.event_type
    """,
)
def stats_mad_outliers(spark, sf_dir):
    """Robust outlier detection per event type: lower median + MAD
    (median absolute deviation), flagging values beyond 3 MADs — the
    heavy-tail screen that, unlike z-scores, is immune to the outliers
    it hunts.

    Medians are EXACT order statistics computed by the two-phase
    bin + refine operator (operators/quantile.py): a (type, floor(v))
    histogram locates each group's k-th element, a second pass sorts
    only the target bin — no group ever funnels through a single task,
    unlike the oracle's window formulation (fine for DuckDB
    single-node, a scale-killer for Spark). Both statistics are actual
    data values (no interpolation), so every comparison — including
    the ad > 3*MAD threshold — is bit-exact across engines."""
    from pg_ducklake_spark.operators.quantile import group_median_exact

    ev = t(spark, sf_dir, "events")
    med = group_median_exact(ev, ["event_type"], "value", out_col="med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(  # bcast-ok: per-event-type medians, constant domain
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = group_median_exact(
        dev, ["event_type"], "ad", out_col="mad"
    )
    flagged = dev.join(F.broadcast(mad), "event_type")  # bcast-ok: per-event-type MADs, constant domain
    is_out = F.when(F.col("ad") > 3 * F.col("mad"), 1).otherwise(0)
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(is_out).cast("long").alias("n_outliers"),
        )
        .withColumn(
            "outlier_rate",
            F.round(F.col("n_outliers").cast("double") / F.col("n"), 6),
        )
        .select("event_type", "n", "med", "mad", "n_outliers", "outlier_rate")
        .orderBy("event_type")
    )


@query(
    "stats_binned_quantiles",
    oracle="""
    WITH binned AS (
      SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, CAST(FLOOR(value) AS BIGINT)
    ),
    cum AS (
      SELECT event_type, b, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS c,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM binned
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN c >= CAST(CEIL(0.5 * n) AS BIGINT)
                         THEN b + 1 END) AS BIGINT) AS p50_ub,
           CAST(MIN(CASE WHEN c >= CAST(CEIL(0.9 * n) AS BIGINT)
                         THEN b + 1 END) AS BIGINT) AS p90_ub,
           CAST(MIN(CASE WHEN c >= CAST(CEIL(0.99 * n) AS BIGINT)
                         THEN b + 1 END) AS BIGINT) AS p99_ub
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stats_binned_quantiles(spark, sf_dir):
    """One-pass mergeable-histogram quantiles: p50/p90/p99 upper bounds
    per event type from unit-width bins — the single-shuffle sketch a
    100 TB pipeline uses when the exact two-pass order statistic
    (stats_mad_outliers) is too expensive. Error is bounded by the bin
    width by construction, and the estimate (smallest bin upper edge
    whose cumulative count reaches ceil(q*n)) is pure integer
    arithmetic — bit-identical on both engines.

    Scale shape: ONE map-side-combined shuffle on (type, bin); the
    cumulative window runs over the |types| x |bins| histogram, never
    the data. Histograms merge associatively, so the same layout
    serves streaming and incremental maintenance."""
    ev = t(spark, sf_dir, "events")
    binned = ev.groupBy(
        "event_type", F.floor("value").cast("long").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = binned.withColumn("c", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wtot)
    )

    def ub(q: float):
        k = F.ceil(F.lit(q) * F.col("n")).cast("long")
        return F.min(
            F.when(F.col("c") >= k, F.col("b") + 1)
        ).cast("long")

    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            ub(0.5).alias("p50_ub"),
            ub(0.9).alias("p90_ub"),
            ub(0.99).alias("p99_ub"),
        )
        .orderBy("event_type")
    )
