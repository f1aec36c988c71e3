"""CSV ingestion (the reference's ``read_csv`` CTAS path,
README.md:108-110, test/regression/sql/readme_examples.sql:24-26).

Schema inference happens at ingestion only — exactly the reference's
model (§1.2): the created lake table gets the inferred schema pinned.
Spark's csv reader is distributed and pushdown-capable, so this scales
to TB-size csv directories unchanged; http(s) URLs would arrive via
hadoop's filesystem layer where configured.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from pg_ducklake_spark.lake import Lake


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    **options,
) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def ingest_csv(lake: "Lake", table: str, path: str, **options) -> int:
    """CTAS from a csv file/directory with inferred schema."""
    df = read_csv(lake.spark, path, **options)
    return lake.create_table_as(table, df)
