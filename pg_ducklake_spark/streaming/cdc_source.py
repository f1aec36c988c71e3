"""Incremental CDC streaming source over the lake snapshot log.

The reference's change feed is a batch table function
(``table_changes`` between two snapshots — sql/pg_ducklake--0.1.0.sql:
344-449). Here the same feed is ALSO a first-class Structured
Streaming source via PySpark 4's Python DataSource API: offsets are
snapshot ids, each micro-batch is exactly the snapshot range committed
since the last batch, and every data/change file in the range becomes
one input partition read executor-side with pyarrow.

Scale notes: the driver touches only the snapshot JSON (never row
data); per-batch work is proportional to the *delta*, not the table —
the property that makes CDC tailing viable on a 100 TB table. File
reads fan out across executors (one partition per file), and a
restarted query resumes from its checkpointed snapshot offset.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# DML snapshots carry explicit change files; their added data files are
# rewrites already represented there (same rule as changefeed.py).
_SKIP_OPS = {"OPTIMIZE", "FLUSH_INLINED_DATA", "CREATE OPTIONS", "SET OPTION"}
_DML_OPS = {"DELETE", "UPDATE", "MERGE"}


@dataclass
class _CdfPartition(InputPartition):
    """One unit of executor-side work for a micro-batch."""

    kind: str  # "insert_file" | "cdf_file" | "inline"
    path: str | None
    version: int
    timestamp: str | None
    field_names: list[str] = field(default_factory=list)
    rows: list[tuple] = field(default_factory=list)  # inline only


def _changes_meta_fields() -> list[T.StructField]:
    return [
        T.StructField("_change_type", T.StringType(), False),
        T.StructField("_commit_version", T.LongType(), False),
        T.StructField("_commit_timestamp", T.TimestampType(), True),
    ]


class LakeCDFStreamReader(DataSourceStreamReader):
    def __init__(self, lake_root: str, table: str, starting_version: int):
        self.table_dir = os.path.join(lake_root, table)
        self.starting_version = starting_version

    def _log(self):
        from pg_ducklake_spark.catalog import SnapshotLog

        return SnapshotLog(self.table_dir)

    # -- offsets: {"version": n} == consumed through snapshot n ----------

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        return {"version": self._log().latest_version()}

    def commit(self, end: dict) -> None:
        pass  # the snapshot log is immutable; nothing to release

    # -- planning (driver-side, metadata only) ---------------------------

    def partitions(self, start: dict, end: dict) -> list[_CdfPartition]:
        log = self._log()
        if start["version"] + 1 < log.min_version():
            from pg_ducklake_spark.errors import SnapshotNotFoundError

            raise SnapshotNotFoundError(
                f"CDC stream offset {start['version'] + 1} has been "
                f"expired (oldest readable snapshot is {log.min_version()}); "
                "restart the stream with a fresh checkpoint / startingVersion"
            )
        parts: list[_CdfPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            snap = log.read_snapshot(v)
            op = snap.get("operation", "WRITE")
            if op in _SKIP_OPS:
                continue
            ts = snap.get("timestamp")
            state = log.replay(v)
            names = [f.name for f in state.schema_at(v).fields]
            if op not in _DML_OPS:
                for d in snap.get("add", []):
                    parts.append(
                        _CdfPartition(
                            kind="insert_file",
                            path=os.path.join(self.table_dir, d["path"]),
                            version=v, timestamp=ts, field_names=names,
                        )
                    )
            if snap.get("cdf_path"):
                parts.append(
                    _CdfPartition(
                        kind="cdf_file",
                        path=os.path.join(self.table_dir, snap["cdf_path"]),
                        version=v, timestamp=ts, field_names=names,
                    )
                )
            inline = [
                ("insert", r["values"])
                for r in snap.get("inline_add", [])
                if op == "INSERT"
            ] + [
                (c["change_type"], c["values"])
                for c in snap.get("inline_changes", [])
            ]
            if inline:
                schema = state.schema_at(v)
                from pg_ducklake_spark.catalog import from_json_value

                rows = [
                    tuple(
                        from_json_value(vals.get(f.name), f.dataType)
                        for f in schema.fields
                    )
                    + (ctype,)
                    for ctype, vals in inline
                ]
                parts.append(
                    _CdfPartition(
                        kind="inline", path=None, version=v, timestamp=ts,
                        field_names=names, rows=rows,
                    )
                )
        return parts

    # -- execution (executor-side; pyarrow, no Spark) --------------------

    def read(self, partition: _CdfPartition):
        commit_ts = (
            dt.datetime.fromisoformat(partition.timestamp).replace(tzinfo=None)
            if partition.timestamp
            else None
        )
        tail = (partition.version, commit_ts)
        if partition.kind == "inline":
            for row in partition.rows:
                yield row[:-1] + (row[-1],) + tail
            return
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.path, format="parquet")
        want = list(partition.field_names) + (
            ["_change_type"] if partition.kind == "cdf_file" else []
        )
        cols = [c for c in want if c in dataset.schema.names]
        for batch in dataset.to_table(columns=cols).to_batches():
            data = batch.to_pylist()
            for rec in data:
                base = tuple(rec.get(c) for c in partition.field_names)
                if partition.kind == "cdf_file":
                    yield base + (rec.get("_change_type"),) + tail
                else:
                    yield base + ("insert",) + tail


class LakeCDFDataSource(DataSource):
    """``spark.readStream.format("lake_cdf")`` — options:
    ``lake_root`` (lake directory), ``table``, ``startingVersion``
    (default 1: replay the whole history, like Delta CDF's
    startingVersion=0)."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self):
        from pg_ducklake_spark.catalog import SnapshotLog

        table_dir = os.path.join(self.options["lake_root"], self.options["table"])
        state = SnapshotLog(table_dir).replay()
        return T.StructType(list(state.schema.fields) + _changes_meta_fields())

    def streamReader(self, schema) -> LakeCDFStreamReader:
        return LakeCDFStreamReader(
            self.options["lake_root"],
            self.options["table"],
            int(self.options.get("startingversion", 1)),
        )
