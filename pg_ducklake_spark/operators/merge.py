"""MERGE INTO (upsert) for lake tables.

The reference does NOT support MERGE (reference:
docs/ducklake_feature_coverage.md:12) — this is the Spark-native bonus
SURVEY.md §2.B flags. Delta-style semantics, simplified:

    merge(lake, target, source, on=[keys],
          when_matched_update={col: expr} | None,
          when_matched_delete=False,
          when_not_matched_insert=True | {col: expr})

``expr`` strings may reference ``source.<col>`` and ``target.<col>``.
Multiple source rows hitting one target row raise (same contract as
Delta). Matched target files are rewritten copy-on-write (reading
through any delete files); unmatched source rows append as new files;
one snapshot commits everything with update/insert/delete counts and a
full change feed.

Scale: the only full-table work is one semi-join to find affected files
and one anti-join for inserts — both shuffle on the merge keys; the
rewrite touches affected files only.
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_ducklake_spark.catalog import CDF_DIR
from pg_ducklake_spark.errors import LakeError

if TYPE_CHECKING:
    from pg_ducklake_spark.lake import Lake


def merge(
    lake: "Lake",
    target: str,
    source: DataFrame,
    on: list[str],
    when_matched_update: dict[str, str] | None = None,
    when_matched_delete: bool = False,
    when_not_matched_insert: bool | dict[str, str] = True,
    message: str | None = None,
) -> dict[str, int]:
    """Returns {"num_updated": u, "num_deleted": d, "num_inserted": i}."""
    if when_matched_update and when_matched_delete:
        raise LakeError("choose when_matched_update OR when_matched_delete")
    lake._check_writable()
    lake._check_message(target, message)
    state = lake._state(target)
    schema = state.schema
    table_dir = lake._table_dir(target)
    tcols = [f.name for f in schema.fields]
    for k in on:
        if k not in tcols:
            raise LakeError(f"merge key {k!r} not in target {target!r}")
        if k not in source.columns:
            raise LakeError(f"merge key {k!r} not in source")

    src = source.alias("source").persist()
    keys = src.select(*on).distinct()

    # Delta contract: a target row must match at most one source row.
    dup = src.groupBy(*on).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise LakeError(
            f"merge source has duplicate keys (e.g. {dict((k, dup[0][k]) for k in on)})"
            " — each target row must match at most one source row"
        )

    # Affected target files + matched-row counts, one DV-filtered scan.
    tmeta = lake._read_files(target, state, schema, keep_meta=True)
    hits = (
        tmeta.join(F.broadcast(keys) if _small(src) else keys, on)  # bcast-ok: guarded by _small() row-count check
        .groupBy("_dl_fp")
        .count()
        .collect()
    )
    file_counts = {lake._uri_to_rel(table_dir, r["_dl_fp"]): r["count"] for r in hits}
    n_matched = sum(file_counts.values())

    # Inline-buffer rows are not merged in v1 — refuse loudly. Hit
    # detection is a semi-join of the source key set against the
    # broadcast inline buffer (tiny by contract: bounded by
    # data_inlining_row_limit) — no driver collect of source keys, no
    # truncation, works for arbitrarily large merge sources.
    if state.inline_rows:
        inline_df = lake._inline_df(state, schema)
        inline_hit = (
            keys.join(F.broadcast(inline_df.select(*on)), on, "left_semi")  # bcast-ok: inline buffer capped by flush threshold
            .limit(1)
            .count()
        )
        if inline_hit:
            raise LakeError(
                "merge into tables with matching unflushed inline rows is "
                "unsupported; run flush_inlined_data() first"
            )

    add = []
    cdf_parts = []
    n_deleted = 0
    if file_counts and (when_matched_update or when_matched_delete):
        affected = lake._read_files(
            target, state, schema, rels=sorted(file_counts)
        ).alias("target")
        # Matched marker: a literal carried on the source side (robust to
        # NULLs in real source columns).
        src_marked = src.withColumn("_dl_m", F.lit(1))
        joined = affected.join(src_marked, on, "left")
        is_matched = F.col("_dl_m").isNotNull()
        if when_matched_delete:
            rewritten = joined.filter(~is_matched).select(
                *[F.col(f"target.{c}") if c not in on else F.col(c) for c in tcols]
            )
            n_deleted = n_matched
        else:
            cols = []
            for f in schema.fields:
                c = f.name
                if c in (when_matched_update or {}):
                    cols.append(
                        F.when(is_matched, F.expr(when_matched_update[c]).cast(f.dataType))
                        .otherwise(F.col(c if c in on else f"target.{c}"))
                        .alias(c)
                    )
                else:
                    cols.append(F.col(c if c in on else f"target.{c}").alias(c))
            rewritten = joined.select(*cols)
        add.extend(
            lake._write_data(
                table_dir, rewritten, state.partition_spec,
                schema=schema, options=lake.options(target),
            )
        )
        # change feed: preimages + postimages (or deletes)
        pre = (
            affected.join(src_marked, on, "left_semi")
            .withColumn(
                "_change_type",
                F.lit("delete" if when_matched_delete else "update_preimage"),
            )
        )
        cdf_parts.append(pre)
        if not when_matched_delete:
            post_cols = []
            for f in schema.fields:
                c = f.name
                if c in (when_matched_update or {}):
                    post_cols.append(F.expr(when_matched_update[c]).cast(f.dataType).alias(c))
                else:
                    post_cols.append(F.col(c if c in on else f"target.{c}").alias(c))
            post = (
                affected.join(src_marked, on, "inner")
                .select(*post_cols)
                .withColumn("_change_type", F.lit("update_postimage"))
            )
            cdf_parts.append(post)

    n_inserted = 0
    if when_not_matched_insert:
        tkeys = lake._read_files(target, state, schema).select(*on)
        unmatched = src.join(tkeys, on, "left_anti")
        if isinstance(when_not_matched_insert, dict):
            ins = unmatched.select(
                *[
                    F.expr(when_not_matched_insert.get(f.name, "NULL")).cast(f.dataType).alias(f.name)
                    if f.name in when_not_matched_insert or f.name not in unmatched.columns
                    else F.col(f.name).cast(f.dataType)
                    for f in schema.fields
                ]
            )
        else:
            missing = [f.name for f in schema.fields if f.name not in unmatched.columns]
            ins = unmatched
            for m in missing:
                ins = ins.withColumn(m, F.lit(None))
            ins = ins.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])
        ins = ins.persist()
        n_inserted = ins.count()
        if n_inserted:
            add.extend(
                lake._write_data(
                    table_dir, ins, state.partition_spec,
                    schema=schema, options=lake.options(target),
                )
            )
            cdf_parts.append(ins.withColumn("_change_type", F.lit("insert")))

    n_updated = 0 if when_matched_delete else (n_matched if when_matched_update else 0)
    if n_updated == 0 and n_deleted == 0 and n_inserted == 0:
        return {"num_updated": 0, "num_deleted": 0, "num_inserted": 0}

    cdf_rel = None
    if cdf_parts:
        cdf_rel = f"{CDF_DIR}/{uuid.uuid4().hex}"
        out = cdf_parts[0]
        for p in cdf_parts[1:]:
            out = out.unionByName(p)
        out.write.parquet(os.path.join(table_dir, cdf_rel))

    remove = sorted(file_counts) if (when_matched_update or when_matched_delete) else []
    lake._commit_dml(
        target,
        state,
        operation="MERGE",
        add=add,
        remove=remove,
        inline_remove=[],
        inline_changes=[],
        metrics={
            "num_updated": n_updated,
            "num_deleted": n_deleted,
            "num_inserted": n_inserted,
        },
        cdf_path=cdf_rel,
        message=message,
        touched=sorted(file_counts),
    )
    return {
        "num_updated": n_updated,
        "num_deleted": n_deleted,
        "num_inserted": n_inserted,
    }


#: Merge sources at or below this row count get their key set broadcast
#: to the affected-file probe (one map-side join, no shuffle of the
#: target scan). Above it, the hint is omitted and the join shuffles on
#: the merge keys — AQE may still demote it to broadcast at runtime if
#: the distinct key set turns out small.
BROADCAST_SOURCE_ROWS = 100_000


def _small(df: DataFrame, threshold_rows: int = BROADCAST_SOURCE_ROWS) -> bool:
    """Bounded-size probe: scan stops after threshold+1 rows, so the
    check costs O(threshold) regardless of source size — never a full
    count of an arbitrarily large merge source."""
    return df.limit(threshold_rows + 1).count() <= threshold_rows
