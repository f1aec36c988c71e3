"""Z-order (Morton-curve) compaction: multi-column data clustering so
per-file min/max stats prune on *every* z-ordered column, not just the
leading sort key.

The reference's sorted tables (SURVEY.md A14) cluster on one sort
vector; Z-ordering is the standard lakehouse upgrade (Delta OPTIMIZE
ZORDER BY): each column is bucketed into 2^bits equi-width cells
(bounds from one tiny agg), the cell indices are bit-interleaved into a
Morton key, and files are rewritten range-partitioned + sorted by that
key. Pure column arithmetic — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import LakeError

if TYPE_CHECKING:
    from pg_ducklake_spark.lake import Lake


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Attach a Morton key column for ``cols`` (numeric/date/timestamp).

    Returns (df, key_column). Bounds are computed with one aggregate over
    the frame (two scalars per column — metadata-scale driver work)."""
    if not 1 <= len(cols) <= 4:
        raise LakeError("zorder supports 1-4 columns")
    aggs = []
    for c in cols:
        num = F.col(c).cast("double")
        aggs += [F.min(num).alias(f"_min_{c}"), F.max(num).alias(f"_max_{c}")]
    bounds = df.agg(*aggs).collect()[0]

    buckets = []
    n = (1 << bits) - 1
    for c in cols:
        lo, hi = bounds[f"_min_{c}"], bounds[f"_max_{c}"]
        if lo is None or hi is None or hi == lo:
            buckets.append(F.lit(0))
            continue
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
        buckets.append(
            F.least(F.floor(scaled * n).cast("long"), F.lit(n)).cast("long")
        )
    # Interleave: output bit (i * ncols + j) = bit i of column j's bucket.
    ncols = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            key = key + (
                F.shiftright(b, i).bitwiseAND(1).cast("long")
                * F.lit(1 << (i * ncols + j))
            )
    return df, key


def optimize_zorder(
    lake: "Lake",
    name: str,
    cols: list[str],
    target_file_size: int | None = None,
    bits: int = 8,
) -> dict:
    """Rewrite all live files of ``name`` z-ordered by ``cols``; one
    OPTIMIZE snapshot (removes every old file, DVs fold in)."""
    import math

    lake._check_writable()
    state = lake._state(name)
    if not state.files:
        return {"files_removed": 0, "files_added": 0}
    for c in cols:
        if c not in [f.name for f in state.schema.fields]:
            raise LakeError(f"zorder column {c!r} not in table {name!r}")
    table_dir = lake._table_dir(name)
    target = int(target_file_size or lake.options(name)["target_file_size"])
    df = lake._read_files(name, state, state.schema)
    df, key = zorder_key(df, cols, bits)
    total_bytes = sum(f.bytes for f in state.files.values())
    n_out = max(1, math.ceil(total_bytes / target))
    ordered = df.withColumn("_dl_z", key).repartitionByRange(
        n_out, F.col("_dl_z")
    ).sortWithinPartitions("_dl_z").drop("_dl_z")
    add = lake._write_data(
        table_dir, ordered, state.partition_spec, options=lake.options(name)
    )
    remove = sorted(state.files)

    def validate(fresh):
        from pg_ducklake_spark.errors import ConcurrentModificationError

        if not set(remove) <= set(fresh.files):
            raise ConcurrentModificationError(
                f"optimize_zorder({name!r}) conflicts with concurrent rewrite"
            )

    lake._log(name).commit(
        {
            "operation": "OPTIMIZE",
            "operation_params": {"zorder_by": cols},
            "add": [e.to_json() for e in add],
            "remove": remove,
            "metrics": {"files_removed": len(remove), "files_added": len(add)},
        },
        validate=validate,
        base_version=state.snapshot_id,
    )
    return {"files_removed": len(remove), "files_added": len(add)}
