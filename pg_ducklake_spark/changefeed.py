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
        if op == "DELETE" and snap.get("dv") and not snap.get("cdf_path"):
            # r11: DV-mode DELETE writes positions only (the delete
            # files ARE the change record — the reference's
            # ducklake_delete_file design; previously the delete path
            # also materialized every deleted row to a CDF file,
            # contradicting its "a small delete touches zero data
            # bytes" contract). Reconstruct the deleted rows at feed
            # time: delta positions = this snapshot's cumulative DV
            # minus the prior DV state, semi-joined into a pre-delete
            # vintage read of just the touched files.
            parts.append(
                stamp(
                    _derive_dv_deletions(
                        lake, name, log, snap, v, end_state, schema,
                        table_dir,
                    ),
                    "delete",
                )
            )
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


def _derive_dv_deletions(
    lake: "Lake", name: str, log, snap: dict, v: int, end_state, schema,
    table_dir: str,
) -> DataFrame:
    """Deleted rows of a DV-mode DELETE snapshot, reconstructed from
    positions: read the touched data files under the PRE-delete state
    (prior DVs subtracted, renames and initial defaults applied by
    ``Lake._read_files`` exactly as the original scan saw them),
    semi-join the delta positions, then map the v-vintage column names
    forward to the feed's end-schema names (same walk as read_mapped)."""
    files = sorted({d["file"] for d in snap["dv"]})
    new_paths = sorted(
        {os.path.join(table_dir, d["path"]) for d in snap["dv"]}
    )
    prior = log.replay(v - 1)
    newp = (
        lake.spark.read.schema(lake._DV_SCHEMA)
        .parquet(*new_paths)
        .filter(F.col("file").isin(files))
    )
    old = {f: d for f, d in prior.dvs.items() if f in set(files)}
    delta = newp
    if old:
        old_paths = sorted(
            {os.path.join(table_dir, d["path"]) for d in old.values()}
        )
        oldp = (
            lake.spark.read.schema(lake._DV_SCHEMA)
            .parquet(*old_paths)
            .filter(F.col("file").isin(list(old)))
        )
        delta = newp.join(oldp, ["file", "row_index"], "left_anti")
    schema_v = prior.schema_at(v - 1)
    rows = lake._read_files(
        name, prior, schema_v, rels=files, keep_meta=True
    )
    pos = delta.select(
        F.concat(F.lit(f"file:{table_dir}/"), F.col("file")).alias("_dl_fp"),
        F.col("row_index").alias("_dl_ri"),
    )
    deleted = rows.join(
        F.broadcast(pos), ["_dl_fp", "_dl_ri"], "left_semi"  # bcast-ok: bounded by this snapshot's delete volume
    ).drop("_dl_fp", "_dl_ri")
    current_names = tuple(f.name for f in schema.fields)
    phys = tuple(end_state.physical_name(c, v) for c in current_names)
    claimed = {p for c, p in zip(current_names, phys) if p != c}
    cols = set(deleted.columns)
    proj = []
    for f, p in zip(schema.fields, phys):
        if (p == f.name and p in claimed) or p not in cols:
            proj.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            proj.append(F.col(p).cast(f.dataType).alias(f.name))
    return deleted.select(*proj)


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
