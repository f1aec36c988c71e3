"""Cross-engine exactness of the fixed-point aggregates
(functions/exact.py) on adversarial values: negatives, rounding ties,
magnitude boundaries, NULLs, and shuffled partitionings. The Spark
expression and the generated SQL (run on BOTH Spark SQL and DuckDB)
must agree bit-for-bit — this is the contract every oracle-paired
aggregate in plans/ rests on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.functions import davg, dsum, sql_davg, sql_dsum

CASES = [
    # (name, values, digits)
    ("prices", [0.01, 0.02, 0.03, 9999.99, 123456.78, 0.1, 0.2, 0.3], 10),
    ("negatives", [-0.01, -123.45, 67.89, -0.1, 0.1, -9999.99], 10),
    ("half_ties", [0.5e-10, 1.5e-10, 2.5e-10, -0.5e-10, -1.5e-10], 10),
    ("big_bounded", [8.9e8, -8.9e8, 8.99999999e8, 1.0, -1.0], 10),
    ("product_scale", [1.1024554804e10, 2.0e10, 5.5e9, 3.3e8], 4),
    ("tiny", [1e-11, -1e-11, 5e-11], 10),
]


@pytest.mark.parametrize("name,values,digits", CASES, ids=[c[0] for c in CASES])
def test_dsum_davg_cross_engine(spark, name, values, digits):
    rows = [(float(v),) for v in values] + [(None,)]
    df = spark.createDataFrame(rows, "x double").repartition(4)
    got = df.agg(
        dsum("x", digits).alias("s"), davg("x", digits).alias("a")
    ).collect()[0]

    # Same generated SQL text on Spark SQL ...
    df.createOrReplaceTempView("vals")
    s_sql = spark.sql(
        f"SELECT {sql_dsum('x', digits)} AS s, {sql_davg('x', digits)} AS a FROM vals"
    ).collect()[0]
    # ... and on DuckDB.
    con = duckdb.connect()
    con.execute("CREATE TABLE vals(x DOUBLE)")
    con.executemany("INSERT INTO vals VALUES (?)", rows)
    d = con.execute(
        f"SELECT {sql_dsum('x', digits)} AS s, {sql_davg('x', digits)} AS a FROM vals"
    ).fetchone()

    assert got.s == s_sql.s == d[0], f"{name}: dsum diverged {got.s} {s_sql.s} {d[0]}"
    assert got.a == s_sql.a == d[1], f"{name}: davg diverged {got.a} {s_sql.a} {d[1]}"


def test_dsum_order_independent(spark):
    """Identical result under any partitioning/order — the distributed
    reproducibility guarantee."""
    vals = [((-1) ** i * (i * 0.01 + 0.001 * (i % 7)),) for i in range(1, 2000)]
    a = spark.createDataFrame(vals, "x double").repartition(1)
    b = spark.createDataFrame(list(reversed(vals)), "x double").repartition(13)
    ra = a.agg(dsum("x").alias("s")).collect()[0].s
    rb = b.agg(dsum("x").alias("s")).collect()[0].s
    assert ra == rb


def test_dsum_all_null_stays_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    row = df.agg(dsum("x").alias("s"), davg("x").alias("a")).collect()[0]
    assert row.s is None and row.a is None
