"""Snapshot-bootstrap (initial load) + tail-replay convergence.

The snapshot-then-stream pattern of binlog CDC connectors: seed the lake
from a consistent snapshot at watermark W, then tail the feed. Invariants:

- bootstrap alone reproduces the LWW fold of all events with lsn <= W;
- bootstrap + FULL replay converges to plain full replay (LWW discards
  the stale history — no feed filtering required for correctness);
- bootstrap + tail replay with ``min_lsn=W`` ALSO converges, while
  provably skipping whole feed files via parquet footer lsn statistics;
- re-running the bootstrap after the fact is skipped by the sink's
  batch_id idempotency (it commits as batch -1).
"""

import os

import numpy as np
import pandas as pd
import pytest

from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    generate_change_events,
    lww_oracle,
    write_change_stream,
    write_change_stream_parquet,
)
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig


def _snapshot_at(events_pd: pd.DataFrame, watermark: int):
    """Pandas-side source snapshot: the LWW fold of events with lsn <= W,
    plus its honest wire schema version (v2 iff any tool_meta is set)."""
    snap = lww_oracle(events_pd[events_pd["lsn"] <= watermark])
    sv = 2 if snap["tool_meta"].notna().any() else 1
    if sv == 1:
        snap = snap.drop(columns=["tool_meta"])
    return snap, sv


def _texts(table):
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    return list(got["text"].fillna("∅"))


def test_bootstrap_then_tail_replay_with_file_skipping(spark, tmp_path):
    cfg = ChangeStreamConfig(n_events=16_000, n_convs=250, seed=7, n_files=8)
    feed = str(tmp_path / "feed")
    write_change_stream_parquet(feed, cfg)
    events_pd = generate_change_events(cfg)
    w = int(events_pd["lsn"].quantile(0.5))
    snap_pd, sv = _snapshot_at(events_pd, w)

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(spark, feed, table, config=IngestConfig(n_buckets=8))
    st = pipe.bootstrap_snapshot(spark.createDataFrame(snap_pd), w, schema_version=sv)
    assert not st.skipped

    # bootstrap alone == the <=W oracle
    assert _texts(table) == list(snap_pd["text"].fillna("∅"))

    # footer stats must prove at least one whole file below the watermark
    files = sorted(
        os.path.join(feed, f) for f in os.listdir(feed) if f.endswith(".parquet")
    )
    n_skipped = sum(
        CDCIngestPipeline._file_entirely_below_lsn(f, w) for f in files
    )
    assert n_skipped >= 1, "watermark should prune whole feed files"

    pipe.run_batch_replay(files_per_batch=2, min_lsn=w)

    expected = lww_oracle(events_pd)
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == len(expected)
    assert list(got["conv_id"]) == list(expected["conv_id"])
    assert list(got["turn_idx"].astype(np.int64)) == list(expected["turn_idx"])
    pd.testing.assert_series_equal(
        got["text"].fillna("∅"), expected["text"].fillna("∅"), check_names=False
    )
    assert "tool_meta" in got.columns  # v2 arrived in the tail
    pd.testing.assert_series_equal(
        got["tool_meta"].fillna("∅"), expected["tool_meta"].fillna("∅"),
        check_names=False,
    )

    # bootstrap rerun after the tail: idempotently skipped
    st2 = pipe.bootstrap_snapshot(
        spark.createDataFrame(snap_pd), w, schema_version=sv
    )
    assert st2.skipped


def test_bootstrap_plus_full_replay_converges(spark, tmp_path):
    """No feed filtering at all: replaying history OVER the snapshot must
    still converge (stale events lose LWW to the watermark-stamped rows).
    Early watermark -> v1 snapshot -> the table must still evolve to v2
    when the tail's schema change arrives."""
    cfg = ChangeStreamConfig(n_events=12_000, n_convs=200, seed=11, n_files=6)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)  # jsonl wire: no footer stats, no skipping
    events_pd = generate_change_events(cfg)
    w = int(events_pd["lsn"].quantile(0.25))
    snap_pd, sv = _snapshot_at(events_pd, w)
    assert sv == 1, "early watermark should predate the schema flip"

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(spark, feed, table, config=IngestConfig(n_buckets=8))
    pipe.bootstrap_snapshot(spark.createDataFrame(snap_pd), w, schema_version=sv)
    assert "tool_meta" not in table.read().columns  # v1 snapshot stays v1

    pipe.run_batch_replay(files_per_batch=2)

    expected = lww_oracle(events_pd)
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == len(expected)
    pd.testing.assert_series_equal(
        got["text"].fillna("∅"), expected["text"].fillna("∅"), check_names=False
    )
    assert "tool_meta" in got.columns
    pd.testing.assert_series_equal(
        got["tool_meta"].fillna("∅"), expected["tool_meta"].fillna("∅"),
        check_names=False,
    )
