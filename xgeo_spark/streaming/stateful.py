"""Custom stateful streaming operator: per-conversation progress tracking.

The reference has no stateful operators at all (SURVEY.md §2.3); this is
the target-engine capability the task brief calls "custom stateful
operators": `applyInPandasWithState` keeps one state row per conv_id
across micro-batches — turn-span high-water mark, max lsn applied, deletes
seen, last activity timestamp — and emits the updated snapshot for every conversation
touched by the batch. Downstream consumers (monitoring, conversation-
completeness checks) read the emitted stream without rescanning the lake.

Scale notes: state is partitioned by conv_id (Spark shuffles each batch to
its state partition — the same key the lake buckets on, so a co-partitioned
deployment reuses the exchange); per-group state is O(1) scalars, never the
transcript text, so state-store size is bounded by |conversations|; a
processing-time timeout (``conv_ttl_minutes``) evicts conversations idle
longer than the TTL, emitting a final ``closed=true`` snapshot — unbounded
key spaces therefore cannot grow the store without bound.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("turn_span", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_turn_idx", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("turn_span", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_turn_idx", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _update_conv_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        n_events, n_turns, n_del, max_lsn, max_turn, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [[conv_id, n_events, n_turns, n_del, max_lsn, max_turn, last_ts, True]],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )
        return

    if state.exists:
        n_events, n_turns, n_del, max_lsn, max_turn, last_ts = state.get
    else:
        n_events = n_turns = n_del = 0
        max_lsn = max_turn = last_ts = -1

    for pdf in pdfs:
        n_events += len(pdf)
        n_del += int((pdf["op"] == "D").sum())
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")).max()
            last_ts = max(last_ts, int(ts_us))
    # turn_span is a HIGH-WATER MARK (max turn_idx seen + 1), not a distinct
    # count: an exact distinct count would need per-key set/sketch state,
    # breaking this operator's O(1)-scalars-per-conversation bound. For
    # contiguous inserts (the common case) span == count; arrival gaps make
    # span an upper bound.
    n_turns = max(n_turns, max_turn + 1)

    state.update((n_events, n_turns, n_del, max_lsn, max_turn, last_ts))
    yield pd.DataFrame(
        [[conv_id, n_events, n_turns, n_del, max_lsn, max_turn, last_ts, False]],
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def conversation_progress(
    events: DataFrame,
    conv_ttl_minutes: int | None = None,
    output_mode: str = "append",
) -> DataFrame:
    """Streaming: running per-conversation progress via
    applyInPandasWithState. ``events`` must be a STREAMING DataFrame with
    at least (conv_id, turn_idx, op, lsn, ts).

    ``output_mode="append"`` emits one snapshot row per touched
    conversation per micro-batch (works with file sinks); "update" suits
    sinks that upsert by conv_id."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if conv_ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        if conv_ttl_minutes and not state.hasTimedOut:
            state.setTimeoutDuration(conv_ttl_minutes * 60 * 1000)
        yield from _update_conv_state(key, pdfs, state)

    return (
        events.select("conv_id", "turn_idx", "op", "lsn", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode=output_mode,
            timeoutConf=timeout,
        )
    )
