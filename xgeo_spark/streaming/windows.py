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


def join_updates_to_subsequent_deletes(
    events: DataFrame,
    horizon_minutes: int = 10,
    watermark_minutes: int = 10,
) -> DataFrame:
    """Watermarked stream-stream interval join: each full-image event
    paired with the delete of the SAME (conv_id, turn_idx) that follows it
    within ``horizon_minutes`` of event time — the short-lived-turn
    detector (write-then-retract within the horizon).

    Both sides are derived from the one change feed by filter, each with
    its own watermark; the join condition carries the time bound
    (d_ts in (u_ts, u_ts + horizon]), which is what lets Structured
    Streaming expire join state: an update older than
    watermark + horizon can never match a future delete and is dropped.
    State is therefore O(events in horizon), independent of stream
    length — the property that makes this join runnable against an
    unbounded 10^10-event feed. (The reference has no joins at all,
    SURVEY.md §2.3; this is target-engine streaming surface.)
    """
    upd = (
        events.filter(F.col("op") != "D")
        .select(
            "conv_id",
            "turn_idx",
            F.col("lsn").alias("u_lsn"),
            F.col("ts").alias("u_ts"),
        )
        .withWatermark("u_ts", f"{watermark_minutes} minutes")
    )
    dels = (
        events.filter(F.col("op") == "D")
        .select(
            F.col("conv_id").alias("d_conv_id"),
            F.col("turn_idx").alias("d_turn_idx"),
            F.col("lsn").alias("d_lsn"),
            F.col("ts").alias("d_ts"),
        )
        .withWatermark("d_ts", f"{watermark_minutes} minutes")
    )
    return upd.join(
        dels,
        (F.col("conv_id") == F.col("d_conv_id"))
        & (F.col("turn_idx") == F.col("d_turn_idx"))
        & (F.col("d_ts") > F.col("u_ts"))
        & (
            F.col("d_ts")
            <= F.col("u_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        ),
        "inner",
    ).select("conv_id", "turn_idx", "u_lsn", "u_ts", "d_lsn", "d_ts")
