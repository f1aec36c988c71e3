"""Streaming ingest INTO a lake table: ``writeStream`` → snapshots.

The missing half of the streaming surface (cdc_source.py reads the
change feed OUT; this writes a stream IN): a ``foreachBatch`` sink
that lands every micro-batch as one atomic lake snapshot, with
exactly-once semantics across restarts.

Exactly-once design: Structured Streaming's checkpoint gives
at-least-once delivery of micro-batches — after a crash the last batch
is REPLAYED. The sink makes the replay idempotent by embedding a
``stream:<query>:batch:<id>`` marker in the snapshot's
``commit_extra_info``, which is atomic with the data commit (same
snapshot JSON). On (re)start the sink scans the table history once for
the query's highest committed batch id and skips any batch at or below
it — the lakehouse analog of Delta's txn-version dedup. The history
scan is once per query start (bounded by snapshot count); per-batch
work is one comparison.

Scale shape: each micro-batch writes through ``Lake.insert`` — the
normal distributed parquet write path with partition/sort specs, NOT
NULL enforcement, and file stats. Nothing is collected driver-side.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    from pg_ducklake_spark.lake import Lake

_MARKER_KEY = "lake_stream_sink"


def _marker(query_name: str, batch_id: int) -> str:
    return json.dumps({_MARKER_KEY: {"query": query_name, "batch": batch_id}})


def _last_committed_batch(lake: "Lake", name: str, query_name: str) -> int:
    """Highest batch id this query has already committed to the table
    (-1 when none): scans snapshot history once at query start."""
    last = -1
    for s in lake._state(name).history:
        info = s.commit_extra_info
        if not info:
            continue
        try:
            payload = json.loads(info).get(_MARKER_KEY)
        except (ValueError, AttributeError):
            continue
        if payload and payload.get("query") == query_name:
            last = max(last, int(payload.get("batch", -1)))
    return last


def stream_insert(
    lake: "Lake",
    name: str,
    sdf: DataFrame,
    checkpoint_dir: str,
    query_name: str = "lake_stream_sink",
    trigger: dict | None = None,
    output_mode: str = "append",
):
    """Start a streaming query appending ``sdf`` into lake table
    ``name``; returns the ``StreamingQuery``.

    ``trigger`` is passed to ``DataStreamWriter.trigger`` (e.g.
    ``{"availableNow": True}`` to drain-and-stop, or
    ``{"processingTime": "10 seconds"}``). ``query_name`` scopes the
    exactly-once batch markers — use one name per logical pipeline."""
    lake._check_writable()
    lake._state(name)  # table must exist — fail before the query starts
    committed = {"last": _last_committed_batch(lake, name, query_name)}

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= committed["last"]:
            return  # replayed batch after restart — already in a snapshot
        saved = lake.commit_extra_info
        lake.commit_extra_info = _marker(query_name, batch_id)
        try:
            lake.insert(name, batch_df)
        finally:
            lake.commit_extra_info = saved
        committed["last"] = batch_id

    writer = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
