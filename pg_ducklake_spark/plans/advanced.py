"""Second wave of delegated-SQL coverage: the remaining TPC-H shapes
expressible on this column subset (q8/q16/q19/q21/q22-lite), plus
ClickBench-style string/JSON/retention/heatmap analytics and less-common
relational operators (INTERSECT, GROUPING SETS, ordered string_agg,
FILTER-clause aggregates, arg-max)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions import davg, dsum, sql_davg, sql_dsum
from pg_ducklake_spark.plans import query, t

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
             / {sql_dsum('volume')} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS volume, n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        # part/supplier/customer are SF-proportional: no forced broadcast —
        # size-based auto-broadcast at small SF, shuffle/AQE at 100 TB.
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))  # bcast-ok: nation is constant (25 rows)
        .join(F.broadcast(reg), F.col("n1_region") == reg.r_regionkey)  # bcast-ok: region is constant (5 rows)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))  # bcast-ok: nation is constant (25 rows)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg((dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")
              / dsum("volume")).alias("mkt_share"))
        .coalesce(1).sortWithinPartitions("o_year")
    )


@query(
    "tpch_q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 2, 3, 4, 5)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_counts(spark, sf_dir):
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        # part is SF-proportional: no forced broadcast.
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@query(
    "tpch_q19_disjunctive_filter",
    oracle=f"""
    SELECT {sql_dsum(_REV)} AS revenue, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filter(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    # part is SF-proportional: no forced broadcast.
    j = li.join(part, li.l_partkey == part.p_partkey)
    c = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(c).agg(
        dsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q21_sole_supplier_orders",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
      AND o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_sole_supplier_orders(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sole = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") == 1)
        .select(F.col("l_orderkey").alias("sole_orderkey"))
    )
    return (
        # supplier is SF-proportional and sole is order-proportional:
        # no forced broadcast on either.
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sole, li.l_orderkey == F.col("sole_orderkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "tpch_q22_low_activity_customers",
    oracle=f"""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer
                       WHERE c_acctbal > 0.0)
      AND (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) < 8
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_low_activity_customers(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("threshold")
    )
    counts = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        cust.join(F.broadcast(avg_bal))  # bcast-ok: 1-row aggregate
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(counts, cust.c_custkey == F.col("ck"), "left")
        .filter(F.coalesce(F.col("n_orders"), F.lit(0)) < 8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "rel_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    ORDER BY c_custkey
    """,
)
def rel_intersect(spark, sf_dir):
    rich = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.intersect(big).orderBy("c_custkey")


@query(
    "rel_grouping_sets",
    oracle=f"""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
    """,
)
def rel_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("adv_orders")
    return spark.sql(
        f"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('o_totalprice')} AS total
        FROM adv_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "rel_string_agg_ordered",
    oracle="""
    SELECT n_name,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM nation JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def rel_string_agg_ordered(spark, sf_dir):
    nat = t(spark, sf_dir, "nation")
    supp = t(spark, sf_dir, "supplier")
    return (
        nat.join(supp, nat.n_nationkey == supp.s_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers")
        )
        .orderBy("n_name")
    )


@query(
    "rel_arg_max",
    oracle="""
    SELECT o_orderstatus,
           max_by(o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
             AS top_order,
           MAX(o_totalprice) AS top_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def rel_arg_max(spark, sf_dir):
    """arg-max with a tie-proof composite ordering key (price ×100 is
    exact at 2 decimals; orderkey breaks ties deterministically)."""
    orders = t(spark, sf_dir, "orders")
    ord_key = F.round(F.col("o_totalprice") * 100).cast("long") * 10000000 + F.col(
        "o_orderkey"
    )
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", ord_key).alias("top_order"),
            F.max("o_totalprice").alias("top_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "events_retention",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS retained
    FROM (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(ts AS DATE) = DATE '2024-01-02'
    ) d1
    JOIN (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(ts AS DATE) = DATE '2024-01-09'
    ) d7 USING (user_id)
    """,
)
def events_retention(spark, sf_dir):
    """Classic day-N retention via distinct-user self-join."""
    ev = t(spark, sf_dir, "events")
    d1 = ev.filter(F.col("ts").cast("date") == F.lit("2024-01-02").cast("date")).select(
        "user_id"
    ).distinct()
    d7 = ev.filter(F.col("ts").cast("date") == F.lit("2024-01-09").cast("date")).select(
        "user_id"
    ).distinct()
    return d1.join(d7, "user_id").agg(F.count(F.lit(1)).alias("retained"))


@query(
    "events_dow_hour_heatmap",
    oracle=f"""
    SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS BIGINT)
             AS dow_idx,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_davg('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY dow_idx, hour
    """,
)
def events_dow_hour_heatmap(spark, sf_dir):
    """Day-of-week × hour heatmap. DOW via epoch-day arithmetic — the
    engines disagree on dayofweek() numbering, integer math doesn't."""
    ev = t(spark, sf_dir, "events")
    dow = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7
    ).cast("long")
    return (
        ev.groupBy(dow.alias("dow_idx"), F.hour("ts").cast("long").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value"))
        .orderBy("dow_idx", "hour")
    )


@query(
    "events_json_extract_typed",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def events_json_extract_typed(spark, sf_dir):
    """JSON property extraction with typing (variant-column analog)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(k.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("long").alias("k_sum"),
            F.min(k).cast("long").alias("k_min"),
            F.max(k).cast("long").alias("k_max"),
        )
    )


@query(
    "events_regex_classes",
    oracle="""
    SELECT CASE WHEN regexp_matches(event_type, '^(view|click)$') THEN 'browse'
                WHEN regexp_matches(event_type, '^(purchase|signup)$') THEN 'convert'
                ELSE 'other' END AS class,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY 1
    ORDER BY class
    """,
)
def events_regex_classes(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cls = (
        F.when(F.col("event_type").rlike("^(view|click)$"), "browse")
        .when(F.col("event_type").rlike("^(purchase|signup)$"), "convert")
        .otherwise("other")
    )
    return (
        ev.groupBy(cls.alias("class"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .orderBy("class")
    )


@query(
    "rel_filter_clause_aggs",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
           CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS returned,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS discounted,
           {sql_dsum("CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0.0 END")}
             AS bulk_revenue
    FROM lineitem
    GROUP BY 1
    ORDER BY yr
    """,
)
def rel_filter_clause_aggs(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.year("l_shipdate").cast("long").alias("yr"))
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("discounted"),
            dsum(
                "CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0.0 END"
            ).alias("bulk_revenue"),
        )
        .orderBy("yr")
    )


@query(
    "customer_segment_percentiles",
    oracle="""
    SELECT c_mktsegment,
           ROUND(CAST(quantile_cont(c_acctbal, 0.25) AS DOUBLE), 6) AS p25,
           ROUND(CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE), 6) AS p50,
           ROUND(CAST(quantile_cont(c_acctbal, 0.75) AS DOUBLE), 6) AS p75
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def customer_segment_percentiles(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.75)"), 6).alias("p75"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "lineitem_share_of_order",
    oracle="""
    SELECT l_orderkey, l_linenumber, share
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10)))
                      OVER (PARTITION BY l_orderkey) AS DOUBLE) AS share
      FROM lineitem) x
    WHERE share > 0.95
    ORDER BY l_orderkey, l_linenumber
    """,
)
def lineitem_share_of_order(spark, sf_dir):
    """Windowed share-of-group with exact decimal window sum."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    share = F.col("l_extendedprice").cast("double") / F.sum(
        F.col("l_extendedprice").cast("decimal(38,10)")
    ).over(w).cast("double")
    return (
        li.withColumn("share", share)
        .filter(F.col("share") > 0.95)
        .select("l_orderkey", "l_linenumber", "share")
        .orderBy("l_orderkey", "l_linenumber")
    )
