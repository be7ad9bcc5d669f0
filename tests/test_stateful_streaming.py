"""applyInPandasWithState conversation-progress operator: state persists
across micro-batches and snapshots reflect the full feed at the end."""

from __future__ import annotations

import pandas as pd

from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    generate_change_events,
    write_change_stream,
)
from xgeo_spark.sources.change_feed import ChangeFeedSource
from xgeo_spark.streaming.stateful import conversation_progress


def test_conversation_progress_stream(spark, tmp_path):
    cfg = ChangeStreamConfig(n_events=4000, n_convs=60, seed=9, n_files=4)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)

    from pyspark.sql import functions as F

    src = ChangeFeedSource(spark, feed)
    stream = src.read_stream(max_files_per_trigger=1)
    good = stream.filter(F.col("_op").isNotNull()).withColumn("op", F.col("_op"))

    out_dir = str(tmp_path / "out")
    q = (
        conversation_progress(good)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    snaps = spark.read.parquet(out_dir).toPandas()
    # keep the LAST snapshot per conversation (max n_events = latest)
    last = (
        snaps.sort_values(["conv_id", "n_events"])
        .groupby("conv_id", as_index=False)
        .tail(1)
        .set_index("conv_id")
    )

    ev = generate_change_events(cfg)
    expect = ev.groupby("conv_id").agg(
        n_events=("lsn", "size"),
        n_deletes=("op", lambda s: int((s == "D").sum())),
        max_lsn=("lsn", "max"),
        max_turn_idx=("turn_idx", "max"),
    )
    assert set(last.index) == set(expect.index)
    for conv_id, row in expect.iterrows():
        got = last.loc[conv_id]
        assert got["n_events"] == row["n_events"], conv_id
        assert got["n_deletes"] == row["n_deletes"], conv_id
        assert got["max_lsn"] == row["max_lsn"], conv_id
        assert got["max_turn_idx"] == row["max_turn_idx"], conv_id
        assert got["turn_span"] == row["max_turn_idx"] + 1, conv_id
        ts_us = int(
            pd.to_datetime(ev[ev.conv_id == conv_id]["ts"].max()).value // 1000
        )
        assert got["last_ts_us"] == ts_us, conv_id
