"""Change data feed (A18): table_insertions / table_deletions /
table_changes between two snapshots, with the reference's 4 change types
{insert, delete, update_preimage, update_postimage}
(reference: sql/pg_ducklake--0.1.0.sql:344-449,
test/regression/sql/data_change_feed.sql:17-43).

Inserted rows are derived from each snapshot's added files (no extra
change files written on the insert path — same trick as Delta CDF);
UPDATE/DELETE snapshots read their explicit ``_change_data`` parquet;
inline-buffer changes ride in the snapshot JSON. OPTIMIZE/FLUSH move
bytes without logical change and are skipped.

Reads are bounded by the version range — at 100 TB you only scan the
files the range touched, never the table.
"""

from __future__ import annotations

import datetime as dt
import os
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_ducklake_spark.catalog import from_json_value
from pg_ducklake_spark.errors import SnapshotNotFoundError

if TYPE_CHECKING:
    from pg_ducklake_spark.lake import Lake

_SKIP_OPS = {"OPTIMIZE", "FLUSH_INLINED_DATA", "CREATE OPTIONS", "SET OPTION"}


def _resolve(lake: "Lake", name: str, v):
    if v is None:
        return lake._log(name).latest_version()
    if isinstance(v, int):
        return v
    return lake._log(name).version_at_timestamp(v)


def table_changes(lake: "Lake", name: str, start, end=None) -> DataFrame:
    """All changes in snapshots [start, end] (inclusive), with
    ``_change_type``, ``_commit_version``, ``_commit_timestamp``."""
    log = lake._log(name)
    if not log.exists():
        raise SnapshotNotFoundError(f"table {name!r} does not exist")
    a, b = _resolve(lake, name, start), _resolve(lake, name, end)
    latest = log.latest_version()
    if a < 1 or b > latest or a > b:
        raise SnapshotNotFoundError(
            f"invalid change-feed range [{a}, {b}] (latest snapshot {latest})"
        )
    if a < log.min_version():
        raise SnapshotNotFoundError(
            f"change-feed range [{a}, {b}] reaches expired snapshots "
            f"(oldest readable is {log.min_version()})"
        )
    end_state = log.replay(b)
    schema = end_state.schema_at(b)
    table_dir = lake._table_dir(name)

    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType(), False),
            T.StructField("_commit_version", T.LongType(), False),
            T.StructField("_commit_timestamp", T.TimestampType(), True),
        ]
    )
    parts: list[DataFrame] = []
    empty = lake.spark.createDataFrame([], out_schema)

    current_names = tuple(f.name for f in schema.fields)

    for v in range(a, b + 1):
        snap = log.read_snapshot(v)
        op = snap.get("operation", "WRITE")
        if op in _SKIP_OPS:
            continue
        # Data committed at snapshot v carries the column names of THAT
        # vintage; map each end-schema column back through any later
        # renames (same walk as Lake._read_files).
        phys = tuple(
            end_state.physical_name(c, v) for c in current_names
        )

        def read_mapped(paths: list[str], with_ct: bool) -> DataFrame:
            extra = (
                [T.StructField("_change_type", T.StringType())]
                if with_ct
                else []
            )
            if phys == current_names:
                rs = T.StructType(list(schema.fields) + extra)
                return lake.spark.read.schema(rs).parquet(*paths)
            claimed = {p for c, p in zip(current_names, phys) if p != c}
            read_fields, aliases = [], []
            for f, p in zip(schema.fields, phys):
                if p == f.name and p in claimed:
                    aliases.append((None, f))
                    continue
                read_fields.append(T.StructField(p, f.dataType, True))
                aliases.append((p, f))
            df = lake.spark.read.schema(
                T.StructType(read_fields + extra)
            ).parquet(*paths)
            proj = [
                (
                    F.col(p).alias(f.name)
                    if p is not None
                    else F.lit(None).cast(f.dataType).alias(f.name)
                )
                for p, f in aliases
            ]
            if with_ct:
                proj.append(F.col("_change_type"))
            return df.select(*proj)

        ts = snap.get("timestamp")
        ts_lit = (
            F.lit(dt.datetime.fromisoformat(ts)).cast("timestamp") if ts else F.lit(None).cast("timestamp")
        )

        def stamp(df: DataFrame, change_type: str | None = None) -> DataFrame:
            if change_type is not None:
                df = df.withColumn("_change_type", F.lit(change_type))
            return (
                df.withColumn("_commit_version", F.lit(v).cast("long"))
                .withColumn("_commit_timestamp", ts_lit)
                .select(*[f.name for f in out_schema.fields])
            )

        added = [d["path"] for d in snap.get("add", [])]
        # DML ops carry explicit change files; their added data files are
        # rewrites/inserts already represented there.
        if added and op not in ("DELETE", "UPDATE", "MERGE"):
            paths = [os.path.join(table_dir, p) for p in added]
            parts.append(stamp(read_mapped(paths, with_ct=False), "insert"))
        if snap.get("cdf_path"):
            cdf = read_mapped(
                [os.path.join(table_dir, snap["cdf_path"])], with_ct=True
            )
            parts.append(stamp(cdf))
        inline_rows = [
            {"change_type": "insert", "values": r["values"]}
            for r in snap.get("inline_add", [])
            if op == "INSERT"
        ] + list(snap.get("inline_changes", []))
        if inline_rows:
            data = [
                tuple(
                    from_json_value(
                        r["values"].get(end_state.physical_name(f.name, v)),
                        f.dataType,
                    )
                    for f in schema.fields
                )
                + (r["change_type"],)
                for r in inline_rows
            ]
            cdf_schema = T.StructType(
                list(schema.fields) + [T.StructField("_change_type", T.StringType())]
            )
            parts.append(stamp(lake.spark.createDataFrame(data, schema=cdf_schema)))

    if not parts:
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_insertions(lake: "Lake", name: str, start, end=None) -> DataFrame:
    """Rows inserted between two snapshots (insert + update_postimage)."""
    ch = table_changes(lake, name, start, end)
    return ch.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")


def table_deletions(lake: "Lake", name: str, start, end=None) -> DataFrame:
    """Rows deleted between two snapshots (delete + update_preimage)."""
    ch = table_changes(lake, name, start, end)
    return ch.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).drop("_change_type")
