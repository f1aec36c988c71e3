"""CSV ingestion (the reference's ``read_csv`` CTAS path,
README.md:108-110, test/regression/sql/readme_examples.sql:24-26).

Schema inference happens at ingestion only — exactly the reference's
model (§1.2): the created lake table gets the inferred schema pinned.
Spark's csv reader is distributed and pushdown-capable, so this scales
to TB-size csv directories unchanged; http(s) URLs would arrive via
hadoop's filesystem layer where configured.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from pg_ducklake_spark.lake import Lake

_SPOOL_DIR: str | None = None


def _fetch_url(url: str) -> str:
    """Spool an http(s) CSV to a local file (the reference reads
    https CSVs through DuckDB's httpfs, readme_examples.sql:24-26;
    Spark's reader is filesystem-based, so ingestion-time URLs are
    spooled once driver-side, then parsed distributed). Ingestion is a
    one-shot copy in both engines — the *table* is what scales."""
    global _SPOOL_DIR
    if _SPOOL_DIR is None:
        _SPOOL_DIR = tempfile.mkdtemp(prefix="pg_ducklake_spark_csv_")
    dest = os.path.join(
        _SPOOL_DIR, os.path.basename(url.split("?")[0]) or "download.csv"
    )
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as f:
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    return dest


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    **options,
) -> DataFrame:
    if path.startswith(("http://", "https://")):
        path = _fetch_url(path)
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
