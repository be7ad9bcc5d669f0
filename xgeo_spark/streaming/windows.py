"""Watermarked event-time windowed aggregation over the change feed.

The reference is order-preserving by construction and has no notion of
event time vs arrival time (SURVEY.md §2.3). The CDC feed does: events
arrive out of order (FIXTURES.md §2 injects a ±lsn-window shuffle), so any
time-windowed rollup needs a watermark to bound state while still
absorbing stragglers. This module provides the canonical form: tumbling
event-time windows over `ts`, keyed by an arbitrary column, with a
configurable lateness bound.

Scale notes: state per (key, window) is a handful of aggregates; the
watermark expires windows older than the bound, so state size is
O(|active keys| x windows-in-horizon), independent of stream length.
Output mode "append" emits each window exactly once, when it finalizes —
the right contract for appending rollups to a lake table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    key_col: str = "conv_id",
    window_minutes: int = 5,
    watermark_minutes: int = 10,
) -> DataFrame:
    """Streaming tumbling-window rollup: events / deletes / distinct-ish
    turn span per (key, window), tolerating ``watermark_minutes`` of
    event-time lateness."""
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.window("ts", f"{window_minutes} minutes").alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
            F.max("lsn").alias("max_lsn"),
            F.min("turn_idx").alias("min_turn"),
            F.max("turn_idx").alias("max_turn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "n_deletes",
            "max_lsn",
            "min_turn",
            "max_turn",
        )
    )
