"""Sequence packing and document chunking — the two layout operators a
training-data pipeline runs after filtering/dedup to turn a cleaned
corpus into fixed-shape model inputs.

Both are pure column/window operators (no Python in the loop):

- :func:`pack_sequences` — concatenated-stream packing, the GPT-style
  pretraining layout: documents are laid out end-to-end in a
  deterministic order and the stream is cut every ``max_tokens``;
  a document crossing a cut is split across consecutive bins. One
  running-sum window + one explode produce, per (document, bin)
  segment, the bin id, the offset inside the bin, and the segment's
  token span — exact integer math, no driver-side loop, no fixpoint.
- :func:`chunk_documents` — split each document into overlapping
  fixed-width character chunks (sequence + substr, one explode), the
  retrieval/embedding-prep shape.

Scale notes: the unsharded running sum is a two-pass distributed
prefix sum — deterministic range-bucketing on the order column,
per-bucket token subtotals (bounded collect: one row per bucket),
exclusive bucket offsets broadcast back, then a per-bucket window for
the local running sum. No stage ever sees more than ~1/num_buckets of
the corpus, so the global total order costs the same as a sharded
pack; passing ``partition_by`` (e.g. a shard column) still packs
within shards with zero driver round-trips. chunk_documents is
embarrassingly parallel (per-row explode, no shuffle).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _range_bucket_expr(df: DataFrame, order_col: str, num_buckets: int):
    """A deterministic range-bucket column for ``order_col``.

    Samples the order column with a fixed seed (same trick as Spark's
    RangePartitioner, but with the boundaries materialized as literals
    so the bucket id is a *deterministic pure function of the row* —
    re-executions and recomputed stages always agree), then counts how
    many boundaries each value exceeds. Works for any orderable type
    (strings included). The sample collect is bounded: ~64 values per
    bucket regardless of corpus size.
    """
    if num_buckets <= 1:
        return F.lit(0)
    n = df.count()
    if n == 0:
        return F.lit(0)
    target = 64 * num_buckets
    fraction = min(1.0, target / n)
    sample = [
        r[0]
        for r in df.select(order_col).sample(False, fraction, seed=42).collect()
        if r[0] is not None
    ]
    sample.sort()
    if len(sample) < 2:
        return F.lit(0)
    step = len(sample) / num_buckets
    bounds: list = []
    for i in range(1, num_buckets):
        b = sample[min(int(i * step), len(sample) - 1)]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    if not bounds:
        return F.lit(0)
    return functools.reduce(
        operator.add,
        [(F.col(order_col) > F.lit(b)).cast("int") for b in bounds],
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    order_col: str,
    partition_by: str | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Concatenated-stream packing into bins of exactly ``max_tokens``.

    Rows are ordered by ``order_col`` (must be a deterministic total
    order, e.g. a doc id); the running token stream is cut every
    ``max_tokens``. Output: one row per (document, bin) segment with

    - ``bin_id``      — which fixed-size bin the segment lands in,
    - ``bin_offset``  — token offset of the segment inside its bin,
    - ``seg_tokens``  — tokens of this document in this bin,
    - ``doc_token_start`` — offset of the segment inside the document.

    Every bin except the last is exactly full by construction; a
    document spanning k boundaries yields k+1 rows.
    """
    out = df.withColumn("_tok", F.col(token_col).cast("long")).filter(
        F.col("_tok") > 0
    )
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(order_col)
        c_before = F.coalesce(
            F.sum("_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
    else:
        # Two-pass distributed prefix sum: a global Window.orderBy would
        # drag the whole corpus through ONE task (WindowExec warns
        # "No Partition Defined"); instead bucket rows into contiguous
        # ranges of the total order, sum tokens per bucket (tiny
        # collect: one long per bucket), and give each bucket its
        # exclusive prefix as a broadcast offset. The per-bucket window
        # then computes the same exact running sum with every stage
        # partition-parallel.
        num_buckets = out.sparkSession.sparkContext.defaultParallelism
        out = out.withColumn("_bkt", _range_bucket_expr(out, order_col, num_buckets))
        subs = {
            r["_bkt"]: r["_sub"]
            for r in out.groupBy("_bkt").agg(F.sum("_tok").alias("_sub")).collect()
        }
        offsets, run = [], 0
        for b in range(max(subs, default=0) + 1):
            offsets.append(run)
            run += subs.get(b, 0)
        off_arr = F.array(*[F.lit(v).cast("long") for v in offsets])
        w = Window.partitionBy("_bkt").orderBy(order_col)
        c_before = F.element_at(off_arr, F.col("_bkt") + 1) + F.coalesce(
            F.sum("_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
    out = (
        out.withColumn("_c0", c_before)
        .withColumn("_c1", F.col("_c0") + F.col("_tok"))
        .withColumn("_b0", F.floor(F.col("_c0") / F.lit(max_tokens)))
        .withColumn("_b1", F.floor((F.col("_c1") - 1) / F.lit(max_tokens)))
        .withColumn("bin_id", F.explode(F.expr("sequence(_b0, _b1)")))
    )
    seg_start = F.greatest(F.col("_c0"), F.col("bin_id") * F.lit(max_tokens))
    seg_end = F.least(
        F.col("_c1"), (F.col("bin_id") + 1) * F.lit(max_tokens)
    )
    keep = id_cols or df.columns
    return out.select(
        *keep,
        F.col("bin_id").cast("long").alias("bin_id"),
        (seg_start - F.col("bin_id") * F.lit(max_tokens))
        .cast("long")
        .alias("bin_offset"),
        (seg_end - seg_start).cast("long").alias("seg_tokens"),
        (seg_start - F.col("_c0")).cast("long").alias("doc_token_start"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """One row per (doc, chunk): fixed-width character windows with
    ``overlap`` characters of left context. Pure sequence/substr —
    vectorized, no Python, no shuffle."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    starts = F.expr(f"sequence(1, greatest(length({text_col}), 1), {step})")
    return (
        df.select(
            F.col(id_col),
            F.length(text_col).cast("long").alias("n_chars"),
            F.posexplode(starts).alias("chunk_no", "start"),
            F.col(text_col).alias("_t"),
        )
        .withColumn("chunk", F.expr(f"substr(_t, start, {chunk_chars})"))
        .filter(F.length("chunk") > 0)
        .select(
            id_col,
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.col("start").cast("long").alias("start"),
            F.length("chunk").cast("long").alias("chunk_len"),
            "chunk",
        )
    )
