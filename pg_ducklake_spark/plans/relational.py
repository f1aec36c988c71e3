"""Relational-operator coverage queries (SURVEY.md §2.B).

One named query per operator family pinned by the reference regression
suite: projections/filters (basic.sql), joins incl. EXISTS semi-joins
(fdw.sql:28-49), scalar subqueries (hybrid_scan.sql:10-11), sort/limit
(ctas.sql:9), UNNEST + generate_series (insert_unnest.sql, ctas.sql:3),
string/date scalar functions (vacuum.sql:46, sorted_table.sql:31), plus
the Spark-free extras (windows, set ops, rollup) the ClickBench gate
implies.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions import dsum, sql_dsum
from pg_ducklake_spark.plans import query, t


@query(
    "rel_filter_projection",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           upper(o_orderpriority) AS priority,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000
    ORDER BY o_orderkey
    """,
)
def rel_filter_projection(spark, sf_dir):
    """basic.sql:7 shape — pushed filter + pruned projection."""
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.upper("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "rel_exists_semijoin",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def rel_exists_semijoin(spark, sf_dir):
    """fdw.sql:28-31 EXISTS shape → left-semi join."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "rel_not_exists_antijoin",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def rel_not_exists_antijoin(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "rel_outer_join_coalesce",
    oracle=f"""
    SELECT n_name,
           CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers,
           {sql_dsum('coalesce(s_acctbal, 0.0)')} AS total_acctbal
    FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def rel_outer_join_coalesce(spark, sf_dir):
    nat = t(spark, sf_dir, "nation")
    supp = t(spark, sf_dir, "supplier")
    return (
        nat.join(supp, nat.n_nationkey == supp.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            dsum("coalesce(s_acctbal, 0.0)").alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "rel_scalar_subquery",
    oracle=f"""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_dsum('c_acctbal')}
                              / COUNT(c_acctbal) FROM customer)
    ORDER BY c_custkey
    """,
)
def rel_scalar_subquery(spark, sf_dir):
    """hybrid_scan.sql:10-11 scalar-subquery shape (broadcast 1-row join)."""
    cust = t(spark, sf_dir, "customer")
    avg_bal = cust.agg((dsum("c_acctbal") / F.count("c_acctbal")).alias("avg_bal"))
    return (
        cust.join(F.broadcast(avg_bal))  # bcast-ok: 1-row aggregate
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "rel_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'F'
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def rel_in_subquery(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    mach = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    return (
        orders.join(mach, orders.o_custkey == mach.c_custkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@query(
    "rel_union_intersect_except",
    oracle="""
    SELECT 'high_balance' AS tag, c_custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT 'builder' AS tag, c_custkey FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
    EXCEPT
    SELECT 'builder' AS tag, c_custkey FROM customer WHERE c_nationkey = 3
    ORDER BY tag, c_custkey
    """,
)
def rel_union_intersect_except(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    high = cust.filter(F.col("c_acctbal") > 9000).select(
        F.lit("high_balance").alias("tag"), "c_custkey"
    )
    builder = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select(F.lit("builder").alias("tag"), "c_custkey")
    nation3 = cust.filter(F.col("c_nationkey") == 3).select(
        F.lit("builder").alias("tag"), "c_custkey"
    )
    return (
        high.union(builder).distinct().exceptAll(nation3.distinct()).orderBy("tag", "c_custkey")
    )


@query(
    "rel_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rnk
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey ASC)
                  AS BIGINT) AS rnk
      FROM customer) x
    WHERE rnk <= 3
    ORDER BY c_nationkey, rnk
    """,
)
def rel_window_rank(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("c_custkey", "c_nationkey", "c_acctbal", "rnk")
        .coalesce(1).sortWithinPartitions("c_nationkey", "rnk")
    )


@query(
    "rel_window_running_total",
    oracle=f"""
    SELECT day, daily,
           CAST(SUM(daily) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) AS running_total,
           CAST(AVG(daily) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS ma7
    FROM (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             {sql_dsum('value')} AS daily
      FROM events GROUP BY 1) d
    ORDER BY day
    """,
)
def rel_window_running_total(spark, sf_dir):
    """Running totals / moving averages over a pre-aggregated daily series.

    The inner aggregate shrinks the data before the single-partition
    window — at 100 TB the window runs over ~days-count rows, not raw
    events, so the unpartitioned window is safe.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("daily")
    )
    w = Window.orderBy("day")
    return (
        daily.withColumn(
            "running_total",
            F.sum("daily").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"),
        )
        .withColumn("ma7", F.avg("daily").over(w.rowsBetween(-6, 0)).cast("double"))
        .orderBy("day")
    )


@query(
    "rel_window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def rel_window_lag_lead(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "rel_rollup",
    oracle=f"""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           CAST(COUNT(c_custkey) AS BIGINT) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
)
def rel_rollup(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)  # bcast-ok: nation is constant (25 rows)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)  # bcast-ok: region is constant (5 rows)
        .rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            dsum("c_acctbal").alias("total_balance"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_balance",
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "rel_unnest_tokens",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id <= 100) x
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def rel_unnest_tokens(spark, sf_dir):
    """insert_unnest.sql UNNEST shape → explode(split(...))."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@query(
    "rel_generate_series",
    oracle="""
    SELECT CAST(r AS BIGINT) AS id, CAST(r * r AS BIGINT) AS square
    FROM range(1, 101) tbl(r)
    ORDER BY id
    """,
)
def rel_generate_series(spark, sf_dir):
    """ctas.sql:3 generate_series shape → spark.range."""
    return (
        spark.range(1, 101)
        .select(F.col("id").cast("long"), (F.col("id") * F.col("id")).cast("long").alias("square"))
        .orderBy("id")
    )


@query(
    "rel_string_functions",
    oracle="""
    SELECT p_partkey,
           p_brand || '/' || p_type AS brand_type,
           lower(p_name) AS lname,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 4) AS name_prefix,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    WHERE p_name LIKE '%widget%' OR regexp_matches(p_name, '^(red|blue)')
    ORDER BY p_partkey
    """,
)
def rel_string_functions(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("%widget%") | F.col("p_name").rlike("^(red|blue)")
        )
        .select(
            "p_partkey",
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.lower("p_name").alias("lname"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        )
        .orderBy("p_partkey")
    )


@query(
    "rel_date_functions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(date_trunc('month', o_orderdate)) AS DATE) AS first_month
    FROM orders
    GROUP BY 1, 2
    ORDER BY yr, qtr
    """,
)
def rel_date_functions(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.date_trunc("month", "o_orderdate")).cast("date").alias("first_month"),
        )
        .orderBy("yr", "qtr")
    )


@query(
    "rel_case_bucketing",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def rel_case_bucketing(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("bucket")
    )


@query(
    "rel_distinct_count_multi",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS distinct_priorities,
           CAST(COUNT(DISTINCT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT))
                AS BIGINT) AS distinct_years
    FROM orders
    """,
)
def rel_distinct_count_multi(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.countDistinct("o_orderpriority").alias("distinct_priorities"),
        F.countDistinct(F.year("o_orderdate").cast("long")).alias("distinct_years"),
    )


@query(
    "rel_cross_join_small",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    ORDER BY from_region, to_region
    """,
)
def rel_cross_join_small(spark, sf_dir):
    r1 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(F.broadcast(r2))  # bcast-ok: region is constant (5 rows)
        .filter(F.col("k1") < F.col("k2"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@query(
    "rel_hybrid_scan_join",
    oracle=f"""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    HAVING COUNT(*) > 10
    ORDER BY revenue DESC, n_name ASC
    """,
)
def rel_hybrid_scan_join(spark, sf_dir):
    """hybrid_scan.sql shape: fact × dimension from different 'stores'.

    In the reference this joins a heap table with a ducklake table; in
    Spark any two DataFrames join natively — here parquet × an
    in-memory-registered dimension (createDataFrame), proving the
    hybrid path."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = t(spark, sf_dir, "customer")
    # Dimension loaded driver-side then parallelized — the "row-store" side.
    nat_rows = t(spark, sf_dir, "nation").collect()
    nat = spark.createDataFrame(nat_rows, t(spark, sf_dir, "nation").schema)
    return (
        # customer is SF-proportional: no forced broadcast.
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)  # bcast-ok: nation is constant (25 rows)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .filter(F.col("n_orders") > 10)
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )
