"""End-to-end CDC replay — the north-rule correctness check (SURVEY.md §5.2
item 2): synthesize a change stream with out-of-order updates, duplicates,
deletes, and a mid-stream schema change; replay through the engine in
batches; assert final-table equality (per-turn text equality under stable
(conv_id, turn_idx) ordering) against the pure-pandas LWW oracle."""

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


def _assert_table_matches_oracle(table, events_pd):
    expected = lww_oracle(events_pd)
    got = (
        table.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(got) == len(expected), f"row count {len(got)} != {len(expected)}"
    assert list(got["conv_id"]) == list(expected["conv_id"])
    assert list(got["turn_idx"].astype(np.int64)) == list(expected["turn_idx"])
    # THE invariant: per-turn text equality under stable key order
    pd.testing.assert_series_equal(
        got["text"].fillna("∅"), expected["text"].fillna("∅"), check_names=False
    )
    for col in ("role", "tool"):
        pd.testing.assert_series_equal(
            got[col].fillna("∅"), expected[col].fillna("∅"), check_names=False
        )
    # schema evolution happened: tool_meta exists and matches
    assert "tool_meta" in got.columns
    pd.testing.assert_series_equal(
        got["tool_meta"].fillna("∅"), expected["tool_meta"].fillna("∅"),
        check_names=False,
    )


@pytest.mark.parametrize("writer", ["jsonl", "parquet"])
def test_batch_replay_matches_oracle(spark, tmp_path, writer):
    cfg = ChangeStreamConfig(n_events=20_000, n_convs=300, seed=42, n_files=8)
    feed = str(tmp_path / "feed")
    if writer == "jsonl":
        write_change_stream(feed, cfg)
    else:
        write_change_stream_parquet(feed, cfg)
    events_pd = generate_change_events(cfg)

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table, lineage_path=str(tmp_path / "lineage"),
        config=IngestConfig(n_buckets=16),
    )
    stats = pipe.run_batch_replay(files_per_batch=2)
    assert len(stats) == 4
    assert not any(s.skipped for s in stats)
    _assert_table_matches_oracle(table, events_pd)

    # lineage got one summary row per batch + per-partition rows
    lin = pipe.lineage.read().toPandas()
    assert set(lin[lin.partition_id == -1]["batch_id"]) == {0, 1, 2, 3}
    assert (lin[lin.partition_id >= 0]["rows_in"] > 0).all()


@pytest.mark.parametrize("compression", ["gzip", "bzip2"])
def test_compressed_feed(spark, tmp_path, compression):
    """Suffix-dispatch decompression parity: reference unwraps .gz at
    cmd/xgeo/main.go:29-32 and .bz2 at main.go:33-36; Spark's file source
    decodes both by codec extension — the feed just has to be recognized."""
    cfg = ChangeStreamConfig(
        n_events=4000, n_convs=80, seed=3, n_files=4, compression=compression
    )
    feed = str(tmp_path / "feed")
    paths = write_change_stream(feed, cfg)
    ext = {"gzip": ".jsonl.gz", "bzip2": ".jsonl.bz2"}[compression]
    assert all(p.endswith(ext) for p in paths)
    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(spark, feed, table, config=IngestConfig(n_buckets=8, lineage=False))
    # nothing silently dropped: scan count == generated event count (incl.
    # the duplicate_frac re-deliveries)
    assert pipe.source.read_batch().count() == len(generate_change_events(cfg))
    pipe.run_batch_replay(files_per_batch=4)
    _assert_table_matches_oracle(table, generate_change_events(cfg))


def test_quarantine_malformed_and_unknown_ops(spark, tmp_path):
    """Reference nil-filter parity (cmd/xgeo/main.go:54-56), upgraded from
    drop-silently to count-and-keep: malformed JSON rows and unknown op codes
    land in the quarantine dir, good rows still apply, and the lineage row
    carries the quarantined count."""
    import json as _json

    cfg = ChangeStreamConfig(n_events=2000, n_convs=40, seed=7, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    # corrupt the feed: append malformed JSON + an unknown op + a null conv_id
    bad_lines = [
        "{this is not json at all",
        _json.dumps({"lsn": 10**9, "offset": 10**9, "op": "X",  # unknown op
                     "conv_id": "conv-bad", "turn_idx": 0, "role": "user",
                     "text": "x", "ts": "2026-01-01T00:00:00.000000",
                     "schema_version": 1}),
        _json.dumps({"lsn": 10**9 + 1, "offset": 10**9 + 1, "op": "I",
                     "conv_id": None, "turn_idx": 0, "role": "user",  # null key
                     "text": "x", "ts": "2026-01-01T00:00:00.000000",
                     "schema_version": 1}),
    ]
    with open(str(tmp_path / "feed" / "events-00001.jsonl"), "a") as f:
        for ln in bad_lines:
            f.write(ln + "\n")

    qdir = str(tmp_path / "quarantine")
    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table, lineage_path=str(tmp_path / "lineage"),
        config=IngestConfig(n_buckets=8, quarantine_dir=qdir),
    )
    pipe.run_batch_replay(files_per_batch=1)

    # good rows still applied, table matches the uncorrupted oracle
    _assert_table_matches_oracle(table, generate_change_events(cfg))

    # all 3 bad rows are in the quarantine dir with their raw payload kept
    quar = spark.read.json(qdir).toPandas()
    assert len(quar) == 3
    assert quar["_corrupt"].notna().sum() == 1          # the malformed line
    assert (quar["op"] == "X").sum() == 1               # raw wire op preserved
    # lineage summary row for batch 1 counts them
    lin = pipe.lineage.read().toPandas()
    summary = lin[(lin.partition_id == -1) & (lin.batch_id == 1)]
    assert int(summary["rows_quarantined"].iloc[0]) == 3


def test_idempotent_remerge(spark, tmp_path):
    """Re-applying an already-committed batch_id is a no-op (exactly-once)."""
    cfg = ChangeStreamConfig(n_events=3000, n_convs=50, seed=11, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(spark, feed, table, config=IngestConfig(n_buckets=8, lineage=False))
    stats1 = pipe.run_batch_replay(files_per_batch=1)
    v_after = table.current_version()

    # replay the SAME batches with the SAME batch ids -> all skipped
    stats2 = pipe.run_batch_replay(files_per_batch=1, start_batch_id=0)
    assert all(s.skipped for s in stats2)
    assert table.current_version() == v_after
    _assert_table_matches_oracle(table, generate_change_events(cfg))
    assert len(stats1) == len(stats2)


def test_late_lower_lsn_event_cannot_resurrect_delete(spark, tmp_path):
    """Tombstone correctness: an update with lsn < applied delete arriving in
    a LATER batch must not bring the key back."""
    import datetime as dt

    rows1 = [
        {"lsn": 1, "offset": 0, "op": "I", "conv_id": "c", "turn_idx": 0,
         "role": "user", "text": "hello", "tool": None,
         "ts": dt.datetime(2026, 1, 1), "schema_version": 1},
        {"lsn": 5, "offset": 1, "op": "D", "conv_id": "c", "turn_idx": 0,
         "role": None, "text": None, "tool": None,
         "ts": dt.datetime(2026, 1, 1, 0, 5), "schema_version": 1},
    ]
    rows2 = [  # late, out-of-order update from before the delete
        {"lsn": 3, "offset": 2, "op": "U", "conv_id": "c", "turn_idx": 0,
         "role": "user", "text": "stale", "tool": None,
         "ts": dt.datetime(2026, 1, 1, 0, 3), "schema_version": 1},
    ]
    from xgeo_spark.streaming.pipeline import TRANSCRIPT_SCHEMA, KEY_COLS

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    table.create(TRANSCRIPT_SCHEMA, KEY_COLS, n_buckets=4)
    sdf = lambda rows: spark.createDataFrame(pd.DataFrame(rows))  # noqa: E731
    table.merge(sdf(rows1), batch_id=0)
    table.merge(sdf(rows2), batch_id=1)
    assert table.read().count() == 0

    # but a REINSERT with a higher lsn does resurrect
    rows3 = [
        {"lsn": 9, "offset": 3, "op": "I", "conv_id": "c", "turn_idx": 0,
         "role": "user", "text": "back", "tool": None,
         "ts": dt.datetime(2026, 1, 1, 0, 9), "schema_version": 1},
    ]
    table.merge(sdf(rows3), batch_id=2)
    got = table.read().collect()
    assert len(got) == 1 and got[0]["text"] == "back"


def test_empty_batch_commits_noop_without_orphan_dir(spark, tmp_path):
    """A batch that dedups to nothing (all rows quarantined / empty trigger)
    must not leave an unreferenced data/v<N> directory behind — snapshot
    expiry walks files and would never prune an empty dir."""
    import os

    from pyspark.sql import types as T

    from xgeo_spark.streaming.pipeline import KEY_COLS, TRANSCRIPT_SCHEMA

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    table.create(TRANSCRIPT_SCHEMA, KEY_COLS, n_buckets=4)
    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("lsn", T.LongType()),
                T.StructField("offset", T.LongType()),
                T.StructField("op", T.StringType()),
            ]
            + list(TRANSCRIPT_SCHEMA.fields)
        ),
    )
    stats = table.merge(empty, batch_id=0)
    assert stats.version == 1 and not stats.skipped
    data = tmp_path / "lake" / "data"
    dirs = os.listdir(data) if data.exists() else []
    assert dirs == [], f"orphaned version dirs: {dirs}"
    # and the idempotency stamp still advanced
    assert table.last_batch_id() == 0
