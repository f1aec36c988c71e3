"""Structured Streaming surface over the lake.

The reference has no streaming machinery (SURVEY.md §1.1: the change
feed is its closest thing to a stream); this module is the additive
Spark-native stream layer: lake tables as append streams, watermarked
windowed aggregation, and a custom stateful operator via
applyInPandasWithState.
"""

from pg_ducklake_spark.streaming.stream import (
    running_totals_stateful,
    stream_lake_appends,
    streaming_exact_dedup,
    streaming_sessionize,
    streaming_token_topk,
    windowed_event_counts,
)

__all__ = [
    "stream_lake_appends",
    "windowed_event_counts",
    "running_totals_stateful",
    "streaming_exact_dedup",
    "streaming_sessionize",
    "streaming_token_topk",
]
