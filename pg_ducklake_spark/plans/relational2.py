"""Third coverage wave: inequality joins, self-joins, bag-semantics set
ops, HAVING subqueries, CTE chains, framed window first/last, padded
string formatting, date arithmetic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pg_ducklake_spark.functions import dsum, sql_dsum
from pg_ducklake_spark.plans import query, t


@query(
    "rel2_inequality_join",
    oracle="""
    SELECT s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_richer_customers
    FROM supplier s JOIN customer c
      ON c.c_nationkey = s.s_nationkey AND c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey
    ORDER BY s.s_suppkey
    """,
)
def rel2_inequality_join(spark, sf_dir):
    """Equi-key + inequality condition — hash join with residual filter,
    never a cross product."""
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    cust = t(spark, sf_dir, "customer")
    return (
        supp.join(
            cust,
            (cust.c_nationkey == supp.s_nationkey)
            & (cust.c_acctbal > supp.s_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
        .orderBy("s_suppkey")
    )


@query(
    "rel2_lineitem_self_join",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS line_a, b.l_linenumber AS line_b
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_linenumber < b.l_linenumber
     AND b.l_extendedprice > a.l_extendedprice * 2
    WHERE a.l_orderkey <= 2000
    ORDER BY a.l_orderkey, line_a, line_b
    """,
)
def rel2_lineitem_self_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    a = li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_a"),
        F.col("l_extendedprice").alias("price_a"),
    )
    b = li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("line_b"),
        F.col("l_extendedprice").alias("price_b"),
    )
    return (
        a.join(b, "l_orderkey")
        .filter(
            (F.col("line_a") < F.col("line_b"))
            & (F.col("price_b") > F.col("price_a") * 2)
        )
        .select("l_orderkey", "line_a", "line_b")
        .orderBy("l_orderkey", "line_a", "line_b")
    )


@query(
    "rel2_except_all_bag",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_acctbal > 0
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY c_nationkey
    """,
)
def rel2_except_all_bag(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).select("c_nationkey")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return pos.exceptAll(bld).orderBy("c_nationkey")


@query(
    "rel2_having_subquery",
    oracle=f"""
    SELECT c_nationkey, {sql_dsum('c_acctbal')} AS nation_balance
    FROM customer
    GROUP BY c_nationkey
    HAVING {sql_dsum('c_acctbal')}
           > (SELECT {sql_dsum('c_acctbal')} / 20 FROM customer)
    ORDER BY c_nationkey
    """,
)
def rel2_having_subquery(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        dsum("c_acctbal").alias("nation_balance"),
    )
    threshold = cust.agg((dsum("c_acctbal") / 20).alias("thr"))
    return (
        per_nation.join(F.broadcast(threshold))  # bcast-ok: 1-row aggregate
        .filter(F.col("nation_balance") > F.col("thr"))
        .select("c_nationkey", "nation_balance")
        .orderBy("c_nationkey")
    )


@query(
    "rel2_cte_chain",
    oracle=f"""
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 200000
    ),
    cust_totals AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big,
             {sql_dsum('o_totalprice')} AS total
      FROM big_orders GROUP BY o_custkey
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dsum('total')} AS segment_total
    FROM cust_totals JOIN customer ON o_custkey = c_custkey
    WHERE n_big >= 2
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def rel2_cte_chain(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    cust_totals = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_big"), dsum("o_totalprice").alias("total")
    )
    cust = t(spark, sf_dir, "customer")
    return (
        cust_totals.filter(F.col("n_big") >= 2)
        # customer is SF-proportional: no forced broadcast.
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("total").alias("segment_total"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "rel2_first_last_value_frames",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_type
    FROM events
    WHERE user_id <= 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def rel2_first_last_value_frames(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w_full).alias("last_type"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "rel2_string_formatting",
    oracle="""
    SELECT n_nationkey,
           lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded_key,
           rpad(n_name, 12, '.') AS padded_name,
           trim(concat('  ', n_name, '  ')) AS trimmed,
           reverse(n_name) AS reversed,
           CAST(strpos(n_name, '_') AS BIGINT) AS underscore_at
    FROM nation
    ORDER BY n_nationkey
    """,
)
def rel2_string_formatting(spark, sf_dir):
    nat = t(spark, sf_dir, "nation")
    return nat.select(
        "n_nationkey",
        F.lpad(F.col("n_nationkey").cast("string"), 4, "0").alias("padded_key"),
        F.rpad("n_name", 12, ".").alias("padded_name"),
        F.trim(F.concat(F.lit("  "), F.col("n_name"), F.lit("  "))).alias("trimmed"),
        F.reverse("n_name").alias("reversed"),
        F.instr(F.col("n_name"), "_").cast("long").alias("underscore_at"),
    ).orderBy("n_nationkey")


@query(
    "rel2_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS BIGINT) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey <= 100
    ORDER BY o_orderkey
    """,
)
def rel2_date_arithmetic(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("date").alias(
            "due_date"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")


@query(
    "rel2_salted_skew_join",
    oracle=f"""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice')} AS total_price
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY s_name
    """,
)
def rel2_salted_skew_join(spark, sf_dir):
    """Skew-salted fact-dim join: the salt fans each hot key across
    ``salt`` reducers, and because salting only redistributes rows, the
    result is provably identical to the plain join — which is exactly
    what the oracle checks. (operators/skew.py; at 100 TB this is the
    manual fallback when AQE's skew splitting isn't enough.)"""
    from pg_ducklake_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(
        li.withColumnRenamed("l_suppkey", "k"),
        supp.withColumnRenamed("s_suppkey", "k"),
        on="k",
        salt=8,
    )
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("total_price"),
        )
        # per-supplier rollup (SF-proportional): distributed sort
        .orderBy("s_name")
    )


_FUZZY_SQL = """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
"""


@query("rel2_fuzzy_name_match", oracle=_FUZZY_SQL)
def rel2_fuzzy_name_match(spark, sf_dir):
    """Blocked fuzzy string join: distinct part names self-joined on
    their first word (the blocking key — an equi-join, never all-pairs)
    with an edit-distance ≤ 3 refinement. The same SQL text runs on
    both engines (levenshtein/split_part are shared builtins); at scale
    the block key bounds candidate volume exactly like an LSH band."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_FUZZY_SQL)
