"""Lakehouse-lifecycle queries, oracle-verified.

Each query builds a throwaway lake from the test tables, drives a Lake
operation (DML, time travel, change feed, compaction, inline buffer),
and returns the resulting DataFrame; the DuckDB oracle computes the same
final state straight from the raw tables. This puts the *lakehouse
semantics* — not just the analytics — through the driver's hash gate.

The customer table (1.5k rows at sf0.01) keeps these fast; every op
still exercises the real multi-file parquet path.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import functions as F

from pg_ducklake_spark.functions import sql_dsum as _sql_dsum
from pg_ducklake_spark.plans import query, t


def _tmp_lake(spark):
    from pg_ducklake_spark import Lake

    root = tempfile.mkdtemp(prefix="pg_ducklake_spark_q_")
    atexit.register(shutil.rmtree, root, True)
    return Lake(spark, root)


@query(
    "lake_dml_roundtrip",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'BUILDING'
                THEN c_acctbal * 1.1 ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM customer
    WHERE NOT (c_acctbal < 0)
    ORDER BY c_custkey
    """,
)
def lake_dml_roundtrip(spark, sf_dir):
    """INSERT → DELETE(pred) → UPDATE(pred) → final scan: the
    dml_row_count.sql lifecycle, hash-checked against a pure-SQL oracle."""
    lake = _tmp_lake(spark)
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    lake.create_table("c", "c_custkey bigint, c_acctbal double, c_mktsegment string")
    lake.insert("c", cust)
    lake.delete("c", "c_acctbal < 0")
    lake.update("c", {"c_acctbal": "c_acctbal * 1.1"}, "c_mktsegment = 'BUILDING'")
    return lake.table("c").orderBy("c_custkey")


@query(
    "lake_time_travel",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_custkey <= 500
    ORDER BY c_custkey
    """,
)
def lake_time_travel(spark, sf_dir):
    """Two inserts, read back at the first version (time_travel.sql:8-12)."""
    lake = _tmp_lake(spark)
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    lake.create_table("c", "c_custkey bigint, c_acctbal double")
    lake.insert("c", cust.filter(F.col("c_custkey") <= 500))
    lake.insert("c", cust.filter(F.col("c_custkey") > 500))
    return lake.time_travel("c", 2).orderBy("c_custkey")


@query(
    "lake_change_feed",
    oracle="""
    SELECT c_custkey, c_acctbal, 'update_preimage' AS _change_type
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT c_custkey, 0.0 AS c_acctbal, 'update_postimage' AS _change_type
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT c_custkey, c_acctbal, 'delete' AS _change_type
    FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    ORDER BY c_custkey, _change_type
    """,
)
def lake_change_feed(spark, sf_dir):
    """UPDATE + DELETE, then table_changes over just those snapshots —
    the data_change_feed.sql contract with all non-insert change types."""
    lake = _tmp_lake(spark)
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    lake.create_table("c", "c_custkey bigint, c_acctbal double, c_mktsegment string")
    lake.insert("c", cust)
    v0 = lake.current_snapshot("c")
    lake.update("c", {"c_acctbal": "0.0"}, "c_mktsegment = 'MACHINERY'")
    lake.delete("c", "c_mktsegment = 'AUTOMOBILE'")
    return (
        lake.table_changes("c", v0 + 1, v0 + 2)
        .select("c_custkey", "c_acctbal", "_change_type")
        .orderBy("c_custkey", "_change_type")
    )


@query(
    "lake_ctas_partitioned",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {_sql_dsum('o_totalprice')} AS total
    FROM orders WHERE o_orderkey <= 5000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def lake_ctas_partitioned(spark, sf_dir):
    """CTAS with a partition spec; aggregate over the partitioned table
    (ctas.sql + partition.sql combined)."""
    from pg_ducklake_spark.functions import dsum

    lake = _tmp_lake(spark)
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    lake.create_table_as("o", orders, partition_by=["o_orderstatus"])
    return (
        lake.table("o")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


@query(
    "lake_vacuum_consistency",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           {_sql_dsum('s_acctbal')} AS total_bal
    FROM supplier
    """,
)
def lake_vacuum_consistency(spark, sf_dir):
    """Many small inserts → vacuum compaction → identical data (the
    vacuum.sql before/after contract)."""
    lake = _tmp_lake(spark)
    from pg_ducklake_spark.functions import dsum

    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    lake.create_table("s", "s_suppkey bigint, s_acctbal double")
    for bucket in range(4):
        lake.insert("s", supp.filter(F.col("s_suppkey") % 4 == bucket))
    before = lake.table_info("s")["file_count"]
    lake.vacuum("s", target_file_size=1 << 26)
    after = lake.table_info("s")["file_count"]
    assert after <= before
    return lake.table("s").agg(
        F.count(F.lit(1)).alias("n"), dsum("s_acctbal").alias("total_bal")
    )


@query(
    "lake_inline_buffer_union",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    UNION ALL
    SELECT 900 AS n_nationkey, 'INLINE_A' AS n_name
    UNION ALL
    SELECT 901 AS n_nationkey, 'INLINE_B' AS n_name
    ORDER BY n_nationkey
    """,
)
def lake_inline_buffer_union(spark, sf_dir):
    """Parquet files ∪ unflushed inline rows in one read — the
    data-inlining union-read (SURVEY.md §4.2 custom piece #1)."""
    lake = _tmp_lake(spark)
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int"), "n_name"
    )
    lake.create_table(
        "n", "n_nationkey int, n_name string",
        options={"data_inlining_row_limit": 10},
    )
    lake.insert("n", nat)
    lake.append_batch(
        "n", {"n_nationkey": [900, 901], "n_name": ["INLINE_A", "INLINE_B"]}
    )
    return lake.table("n").orderBy("n_nationkey")


@query(
    "lake_schema_evolution",
    oracle="""
    SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS zone
    FROM region
    UNION ALL
    SELECT 90 AS r_regionkey, 'NEW' AS r_name, 'z1' AS zone
    ORDER BY r_regionkey
    """,
)
def lake_schema_evolution(spark, sf_dir):
    """ADD COLUMN then insert under the new schema; old rows read as NULL
    (metadata_sync.sql / time_travel.sql evolution semantics)."""
    lake = _tmp_lake(spark)
    reg = t(spark, sf_dir, "region").select(F.col("r_regionkey").cast("int"), "r_name")
    lake.create_table("r", "r_regionkey int, r_name string")
    lake.insert("r", reg)
    lake.add_column("r", "zone", "string")
    lake.insert(
        "r",
        spark.createDataFrame([(90, "NEW", "z1")], "r_regionkey int, r_name string, zone string"),
    )
    return lake.table("r").orderBy("r_regionkey")


@query(
    "lake_view_macro",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(round(CAST(s_acctbal AS DECIMAL(18,2)) * 0.9, 2))
                      AS DOUBLE), 2) AS discounted
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal > 0
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def lake_view_macro(spark, sf_dir):
    """Persisted view + scalar macro (≙ ducklake_view / ducklake_macro*):
    the view pre-joins supplier→nation, the macro computes a discount;
    the outer aggregate runs through ``lake.sql`` with both expanded —
    proving view registration, macro inlining, and pushdown compose."""
    lake = _tmp_lake(spark)
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("int"), "s_acctbal"
    )
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int"), "n_name"
    )
    lake.create_table("supp", "s_suppkey bigint, s_nationkey int, s_acctbal double")
    lake.create_table("nat", "n_nationkey int, n_name string")
    lake.insert("supp", sup)
    lake.insert("nat", nat)
    lake.create_macro(
        "discounted", ["x"], "round(CAST(x AS DECIMAL(18,2)) * 0.9, 2)"
    )
    lake.create_view(
        "supp_by_nation",
        "SELECT n_name, s_acctbal FROM supp JOIN nat ON s_nationkey = n_nationkey",
    )
    return lake.sql(
        """
        SELECT n_name,
               count(*) AS n_suppliers,
               round(CAST(sum(discounted(s_acctbal)) AS DOUBLE), 2) AS discounted
        FROM supp_by_nation
        WHERE s_acctbal > 0
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@query(
    "lake_table_macro",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier JOIN (
      SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2
    ) nsub ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def lake_table_macro(spark, sf_dir):
    """Table macro (``CREATE MACRO .. AS TABLE``, r12 — surplus parity:
    upstream DuckLake supports them, the reference supports no macros
    at all, docs/ducklake_feature_coverage.md:32-34): a parameterized
    FROM-position derived table, created through the SQL prompt and
    consumed in a join. The expansion is textual and pre-Catalyst, so
    the join still plans as an ordinary broadcast-able equi-join over
    the base scans."""
    lake = _tmp_lake(spark)
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("int")
    )
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int"), "n_name",
        F.col("n_regionkey").cast("int"),
    )
    lake.create_table("supp", "s_suppkey bigint, s_nationkey int")
    lake.create_table(
        "nat", "n_nationkey int, n_name string, n_regionkey int"
    )
    lake.insert("supp", sup)
    lake.insert("nat", nat)
    lake.execute(
        "CREATE MACRO nations_in(rmax) AS TABLE "
        "SELECT n_nationkey, n_name FROM nat WHERE n_regionkey < rmax"
    )
    return lake.sql(
        """
        SELECT n_name, count(*) AS n_suppliers
        FROM supp JOIN nations_in(2) ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@query(
    "lake_sql_prompt_roundtrip",
    oracle="""
    WITH base AS (
      SELECT n_nationkey, n_name,
             CASE WHEN n_nationkey < 10 THEN 'old' ELSE 'frontier' END AS era
      FROM nation
    )
    SELECT n_nationkey, n_name, era,
           CASE WHEN era = 'old' THEN n_nationkey * 2 ELSE n_nationkey END
             AS n_nationkey2
    FROM base
    WHERE n_nationkey <> 13
    ORDER BY n_nationkey
    """,
)
def lake_sql_prompt_roundtrip(spark, sf_dir):
    """The reference's whole interaction model — SQL statements at a
    prompt — replayed through Lake.execute: CTAS, ALTER ADD COLUMN with
    an initial DEFAULT backfilling pre-existing rows, column-list
    INSERT filling the default, UPDATE/DELETE with predicates, and a
    final SELECT, all hash-checked against one pure-SQL oracle."""
    lake = _tmp_lake(spark)
    t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int"), "n_name"
    ).createOrReplaceTempView("_nation_src")
    lake.create_table_as(
        "n", spark.sql("SELECT * FROM _nation_src WHERE n_nationkey < 10")
    )
    lake.execute("ALTER TABLE n ADD COLUMN era STRING DEFAULT 'old'")
    lake.execute(
        "INSERT INTO n (n_nationkey, n_name, era) "
        "SELECT n_nationkey, n_name, 'frontier' FROM _nation_src "
        "WHERE n_nationkey >= 10"
    )
    lake.execute("ALTER TABLE n ADD COLUMN n_nationkey2 INT")
    lake.execute("UPDATE n SET n_nationkey2 = n_nationkey * 2 WHERE era = 'old'")
    lake.execute("UPDATE n SET n_nationkey2 = n_nationkey WHERE era <> 'old'")
    lake.execute("DELETE FROM n WHERE n_nationkey = 13")
    return lake.execute("SELECT * FROM n ORDER BY n_nationkey")


@query(
    "lake_bucketed_join",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {_sql_dsum('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey <= 20000
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def lake_bucketed_join(spark, sf_dir):
    """Storage-partitioned join through the driver's hash gate: both
    tables written with the same bucket(8, custkey) transform, joined
    bucket-to-bucket (operators/colocated.py — no table-wide shuffle,
    one independent sub-join per bucket), then aggregated. The oracle
    is a plain SQL join — proving the co-located decomposition is
    exactly equivalent."""
    from pg_ducklake_spark.functions import dsum
    from pg_ducklake_spark.operators.colocated import bucketed_join

    lake = _tmp_lake(spark)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_totalprice"
    ).filter(F.col("o_orderkey") <= 20000)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    lake.create_table_as("o", orders, partition_by=["bucket(8, custkey)"])
    lake.create_table_as("c", cust, partition_by=["bucket(8, custkey)"])
    return (
        bucketed_join(lake, "o", "c", key="custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .coalesce(1).sortWithinPartitions("c_mktsegment")
    )


@query(
    "lake_incremental_stats",
    oracle="""
    WITH final AS (
      SELECT source,
             CASE WHEN source = 'src1' THEN n_chars + 7 ELSE n_chars END
               AS nc
      FROM documents WHERE lang <> 'de'
      UNION ALL
      SELECT source, n_chars AS nc FROM documents WHERE doc_id < 100
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(nc) AS BIGINT) AS sum_n_chars,
           ROUND(CAST(SUM(nc) AS DOUBLE) / COUNT(*), 6) AS avg_chars
    FROM final
    GROUP BY source
    ORDER BY source
    """,
)
def lake_incremental_stats(spark, sf_dir):
    """Incremental materialized-view maintenance: per-source corpus
    stats advanced across DELETE + UPDATE + INSERT purely from the
    change feed (operators/incremental.py) — never rescanning the
    table — and provably equal to the oracle's from-scratch recompute
    of the final state.

    Scale shape: the delta aggregation reads only changed rows (bounded
    by DML volume, not corpus size); the merge is a full-outer join on
    the group keys against a |groups|-row base. At 100 TB this is the
    difference between maintaining corpus statistics per commit and
    re-scanning the lake."""
    from pg_ducklake_spark.operators.incremental import (
        incremental_agg,
        snapshot_agg,
    )

    lake = _tmp_lake(spark)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    lake.create_table(
        "d", "doc_id bigint, source string, lang string, n_chars bigint"
    )
    lake.insert("d", docs)
    v0 = lake.current_snapshot("d")
    base = snapshot_agg(lake.table("d"), ["source"], ["n_chars"])
    # Pin the base BEFORE the DML (a real MV would persist it): the
    # collect is |sources| rows — metadata-sized by contract.
    base = spark.createDataFrame(
        base.collect(), "source string, n bigint, sum_n_chars bigint"
    )
    lake.delete("d", "lang = 'de'")
    lake.update("d", {"n_chars": "n_chars + 7"}, "source = 'src1'")
    lake.insert(
        "d",
        docs.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "source",
            "lang",
            "n_chars",
        ),
    )
    out = incremental_agg(
        lake, "d", base, ["source"], ["n_chars"], from_version=v0
    )
    return (
        out.select(
            "source",
            F.col("n").cast("long").alias("n"),
            F.col("sum_n_chars").cast("long").alias("sum_n_chars"),
            F.round(
                F.col("sum_n_chars").cast("double") / F.col("n"), 6
            ).alias("avg_chars"),
        )
        .coalesce(1)
        .sortWithinPartitions("source")
    )


@query(
    "lake_schema_namespace",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_positive
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def lake_schema_namespace(spark, sf_dir):
    """Schema namespaces end-to-end (reference: multi-schema metadata,
    ducklake_schema in src/pgducklake_freeze.cpp:35; qualified names in
    test/regression/sql/metadata_sync.sql): CREATE SCHEMA, qualified
    CREATE TABLE + INSERT through the SQL prompt, then a cross-schema
    join through lake.sql — the oracle computes the same report from
    the raw tables. Scale shape: schema routing is pure metadata; the
    query itself is one dim broadcast + one small groupBy."""
    from pg_ducklake_spark.sqlexec import execute

    lake = _tmp_lake(spark)
    execute(lake, "CREATE SCHEMA raw")
    execute(lake, "CREATE SCHEMA ref")
    lake.create_table(
        "raw.customer",
        "c_custkey bigint, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    lake.insert(
        "raw.customer",
        t(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
        ),
    )
    lake.create_table("ref.nation", "n_nationkey int, n_name string")
    lake.insert(
        "ref.nation", t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return lake.sql(
        """
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_positive
        FROM raw.customer JOIN ref.nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@query(
    "lake_add_data_files",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def lake_add_data_files(spark, sf_dir):
    """Register an EXISTING parquet file into a table without rewriting
    its data (≙ upstream DuckLake's ducklake_add_data_files; neither
    the reference nor upstream-pg exposes it,
    docs/ducklake_feature_coverage.md:97 — PARITY.md divergence), then
    aggregate the assembled table. Scale shape: registration is pure
    metadata (footer reads + hard links — no data pass); the aggregate
    is one map-side-combined shuffle over a low-cardinality key."""
    import os

    lake = _tmp_lake(spark)
    lake.create_table(
        "docs", "doc_id bigint, text string, lang string,"
        " source string, n_chars bigint"
    )
    lake.add_data_files(
        "docs", [os.path.join(sf_dir, "documents.parquet")]
    )
    return (
        lake.table("docs")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "lake_rowid_lineage",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_custkey <= 600 AND c_acctbal < 0
    ORDER BY c_custkey
    """,
)
def lake_rowid_lineage(spark, sf_dir):
    """rowid row lineage through a DML step (upstream DuckLake rowid
    semantics; unsupported in the reference,
    docs/ducklake_feature_coverage.md:54): scan with rowid before a
    DELETE, anti-join the surviving rowids, and return the business
    columns of exactly the rows the DELETE removed. Scale shape: the
    rowid column is file.row_id_start + parquet row_index (metadata-
    sized broadcast of one row per file); the anti-join keys on a
    bigint."""
    lake = _tmp_lake(spark)
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    lake.create_table("c", "c_custkey bigint, c_acctbal double")
    lake.insert("c", cust.filter(F.col("c_custkey") <= 600))
    v_before = lake.current_snapshot("c")
    lake.delete("c", "c_acctbal < 0")
    pre = lake.table("c", with_rowid=True, version=v_before)
    post_ids = lake.table("c", with_rowid=True).select("rowid")
    return (
        pre.join(post_ids, "rowid", "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "lake_copy_from_database",
    oracle="""
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def lake_copy_from_database(spark, sf_dir):
    """Bulk-migrate a plain DuckDB database into the lake (≙ upstream
    DuckLake's COPY FROM DATABASE; unsupported in the reference,
    docs/ducklake_feature_coverage.md:101 — PARITY.md divergence), then
    join-aggregate the migrated tables. Scale shape: migration exports
    each source table once through a DuckDB parquet COPY and registers
    the file via add_data_files (parquet is the interchange — no
    row-loop, no Spark rewrite); the query is a broadcastable dim join
    plus one low-cardinality rollup."""
    import os
    import tempfile

    import duckdb

    db = os.path.join(
        tempfile.mkdtemp(prefix="pg_ducklake_mig_"), "src.duckdb"
    )
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE nation AS SELECT n_nationkey, n_name, n_regionkey"
        f" FROM read_parquet('{sf_dir}/nation.parquet')"
    )
    con.execute(
        "CREATE TABLE region AS SELECT r_regionkey, r_name"
        f" FROM read_parquet('{sf_dir}/region.parquet')"
    )
    con.close()
    lake = _tmp_lake(spark)
    lake.copy_from_database(db)
    return lake.sql(
        """
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
        """
    )
