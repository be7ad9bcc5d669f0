"""Watermarked tumbling-window rollup: streaming result over an
out-of-order feed equals the batch groupBy on the same data."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    generate_change_events,
    write_change_stream,
)
from xgeo_spark.sources.change_feed import ChangeFeedSource
from xgeo_spark.streaming.windows import windowed_event_counts


def test_windowed_counts_match_batch(spark, tmp_path):
    cfg = ChangeStreamConfig(n_events=4000, n_convs=50, seed=17, n_files=4)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)

    src = ChangeFeedSource(spark, feed)
    stream = src.read_stream(max_files_per_trigger=1)
    good = stream.filter(F.col("_op").isNotNull()).withColumn("op", F.col("_op"))

    out_dir = str(tmp_path / "out")
    q = (
        windowed_event_counts(good, key_col="conv_id", window_minutes=5,
                              watermark_minutes=10)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()

    ev = generate_change_events(cfg)
    ev["window_start"] = pd.to_datetime(ev["ts"]).dt.floor("5min")
    expect = (
        ev.groupby(["window_start", "conv_id"])
        .agg(n_events=("lsn", "size"), max_lsn=("lsn", "max"))
        .reset_index()
    )

    # append mode drops windows the final watermark hasn't passed; every
    # EMITTED window must match the batch truth exactly, and the bulk of
    # windows must have been emitted
    assert len(got) >= 0.8 * len(expect)
    merged = got.merge(expect, on=["window_start", "conv_id"],
                       suffixes=("_s", "_b"), how="left")
    assert merged["n_events_b"].notna().all()
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["max_lsn_s"] == merged["max_lsn_b"]).all()


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream join (update x subsequent delete within the horizon)
    over the out-of-order feed equals the equivalent batch join."""
    from xgeo_spark.streaming.windows import join_updates_to_subsequent_deletes

    cfg = ChangeStreamConfig(
        n_events=4000, n_convs=40, seed=19, n_files=4, delete_frac=0.15
    )
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)

    src = ChangeFeedSource(spark, feed)
    stream = src.read_stream(max_files_per_trigger=1)
    good = stream.filter(F.col("_op").isNotNull()).withColumn("op", F.col("_op"))

    out_dir = str(tmp_path / "out")
    q = (
        join_updates_to_subsequent_deletes(good, horizon_minutes=10,
                                           watermark_minutes=10)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()

    ev = generate_change_events(cfg)
    upd = ev[ev["op"] != "D"][["conv_id", "turn_idx", "lsn", "ts"]].rename(
        columns={"lsn": "u_lsn", "ts": "u_ts"}
    )
    dels = ev[ev["op"] == "D"][["conv_id", "turn_idx", "lsn", "ts"]].rename(
        columns={"lsn": "d_lsn", "ts": "d_ts"}
    )
    m = upd.merge(dels, on=["conv_id", "turn_idx"])
    expect = m[
        (m["d_ts"] > m["u_ts"])
        & (m["d_ts"] <= m["u_ts"] + pd.Timedelta(minutes=10))
    ]

    assert len(expect) > 0, "fixture should produce in-horizon pairs"
    # availableNow + watermarks may hold back pairs near the stream tail;
    # every EMITTED pair must be a true pair, and the bulk must be emitted
    key = ["conv_id", "turn_idx", "u_lsn", "d_lsn"]
    got_k = set(map(tuple, got[key].itertuples(index=False, name=None)))
    exp_k = set(map(tuple, expect[key].itertuples(index=False, name=None)))
    assert got_k <= exp_k, f"false pairs: {sorted(got_k - exp_k)[:5]}"
    assert len(got_k) >= 0.8 * len(exp_k), (len(got_k), len(exp_k))
