"""Structured Streaming shell: checkpointed file-source tail + foreachBatch
(SURVEY.md §7 milestone 3, §5.2 item 3 crash/replay at the query level)."""

import os
import shutil

from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    generate_change_events,
    lww_oracle,
    write_change_stream,
)
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig


def _final_matches(table, cfg):
    expected = lww_oracle(generate_change_events(cfg))
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == len(expected)
    assert got["text"].fillna("∅").tolist() == expected["text"].fillna("∅").tolist()


def test_streaming_available_now_matches_oracle(spark, tmp_path):
    cfg = ChangeStreamConfig(n_events=8000, n_convs=120, seed=5, n_files=6)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table, lineage_path=str(tmp_path / "lineage"),
        config=IngestConfig(n_buckets=8, max_files_per_trigger=2),
    )
    pipe.run_stream(checkpoint_dir=str(tmp_path / "ckpt"))
    _final_matches(table, cfg)

    # second run over the same checkpoint: nothing new to process,
    # table version must not advance (exactly-once across restarts)
    v = table.current_version()
    pipe.run_stream(checkpoint_dir=str(tmp_path / "ckpt"))
    assert table.current_version() == v


def test_streaming_resume_after_stop_with_late_files(spark, tmp_path):
    """Feed arrives in two waves; the query is stopped between them and
    resumed from the checkpoint — the engine must pick up only the new
    files and still converge to the oracle."""
    cfg = ChangeStreamConfig(n_events=6000, n_convs=100, seed=13, n_files=6)
    staging = str(tmp_path / "staging")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    paths = write_change_stream(staging, cfg)

    # wave 1: first 3 files
    for p in paths[:3]:
        shutil.copy(p, feed)
    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table, config=IngestConfig(n_buckets=8, lineage=False,
                                                max_files_per_trigger=1),
    )
    pipe.run_stream(checkpoint_dir=str(tmp_path / "ckpt"))
    v_mid = table.current_version()
    assert v_mid > 0

    # wave 2: remaining files land; resume from the same checkpoint
    for p in paths[3:]:
        shutil.copy(p, feed)
    pipe2 = CDCIngestPipeline(
        spark, feed, ParquetLakeTable(spark, str(tmp_path / "lake")),
        config=IngestConfig(n_buckets=8, lineage=False, max_files_per_trigger=1),
    )
    pipe2.run_stream(checkpoint_dir=str(tmp_path / "ckpt"))
    _final_matches(pipe2.table, cfg)
