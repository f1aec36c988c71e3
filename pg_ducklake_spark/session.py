"""SparkSession helper tuned for this engine.

Scale notes (100 TB design): these settings are the local-mode analog of
what a 1000-executor deployment would set cluster-wide — AQE on (runtime
shuffle-partition coalescing + skew-join splitting), modest
shuffle-partition default for local runs, Arrow enabled so any Pandas-UDF
path is batched, and timestamps kept NTZ so parquet round-trips are
timezone-stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pg_ducklake_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession with sane analytic defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # Python workers (Pandas UDFs, Python data sources) must be able to
    # import this package; propagate the repo root before the JVM forks.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    shuffle = max(4, min(64, cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local-mode split sizing: the sf0.1 tables are single ~20 MB
        # parquet files, which the 128 MB default reads as ONE partition —
        # zero scan parallelism. 4 MB splits spread the scan across cores.
        # (On a real cluster with properly sized files, keep the default.)
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # TIME columns (types.sql native tier) need the 4.x feature flag
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
