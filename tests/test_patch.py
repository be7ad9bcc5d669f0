"""Partial-image (op 'P') updates: ingest-time squash against the table.

A patch sets only its non-null columns; the resolver (operators/patch.py)
reads the current row bucket-pruned, folds full-image/patch/delete chains
per key in lsn order, and feeds plain full rows to the standard LWW merge
— so the final table must equal the sequential fold oracle
(generator.fold_oracle), including patch-after-delete re-creation and
duplicate patch redelivery."""

import numpy as np
import pandas as pd
import pytest

from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    fold_oracle,
    generate_change_events,
    write_change_stream,
    write_change_stream_parquet,
)
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig


def _cfg(seed=31):
    return ChangeStreamConfig(
        n_events=12_000, n_convs=200, seed=seed, n_files=6, patch_frac=0.15
    )


def _assert_matches_fold_oracle(table, events_pd):
    expected = fold_oracle(events_pd)
    got = (
        table.read().orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    assert list(got["conv_id"]) == list(expected["conv_id"])
    assert list(got["turn_idx"].astype(np.int64)) == list(expected["turn_idx"])
    for col in ("text", "role", "tool", "tool_meta"):
        pd.testing.assert_series_equal(
            got[col].fillna("∅"), expected[col].fillna("∅"), check_names=False
        )


@pytest.mark.parametrize("writer", ["jsonl", "parquet"])
def test_patch_replay_matches_fold_oracle(spark, tmp_path, writer):
    """Both writers must fold patches identically, across micro-batch
    boundaries (patches in batch k hit rows merged in batch k-1). NOTE:
    with enable_patches=True apply_batch forces the pre-aggregation path
    for BOTH writers (pipeline.py), so this parametrization covers the two
    FEED formats through one apply path — the footer-hinted single-job
    path is by design unreachable with patches on and is covered by the
    patch-free replay tests instead."""
    cfg = _cfg()
    feed = str(tmp_path / "feed")
    (write_change_stream if writer == "jsonl" else write_change_stream_parquet)(
        feed, cfg
    )
    events_pd = generate_change_events(cfg)
    assert (events_pd["op"] == "P").sum() > 500

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table,
        config=IngestConfig(n_buckets=8, enable_patches=True),
    )
    pipe.run_batch_replay(files_per_batch=2)
    _assert_matches_fold_oracle(table, events_pd)


def test_patch_replay_idempotent_remerge(spark, tmp_path):
    """Replaying the whole feed against the already-applied lake (fresh
    pipeline objects, same lake dir) must skip every batch and leave the
    table bit-identical — the patch resolver sits BEFORE the idempotency
    check's merge, so skipped batches must not re-apply patches either."""
    cfg = _cfg(seed=32)
    feed = str(tmp_path / "feed")
    write_change_stream_parquet(feed, cfg)
    events_pd = generate_change_events(cfg)

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    conf = IngestConfig(n_buckets=8, enable_patches=True)
    CDCIngestPipeline(spark, feed, table, config=conf).run_batch_replay(
        files_per_batch=3
    )
    before = table.read().orderBy("conv_id", "turn_idx").toPandas()

    table2 = ParquetLakeTable(spark, str(tmp_path / "lake"))
    stats = CDCIngestPipeline(spark, feed, table2, config=conf).run_batch_replay(
        files_per_batch=3
    )
    assert all(s.skipped for s in stats)
    after = table2.read().orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(before, after)
    _assert_matches_fold_oracle(table2, events_pd)


@pytest.mark.parametrize("writer", ["jsonl", "parquet"])
def test_patches_without_flag_are_quarantined(spark, tmp_path, writer):
    """A patch merged as a full row would silently null unset columns.
    With enable_patches off (the default), op-'P' rows must instead be
    quarantined like any unrecognized dialect — raw op preserved, counted,
    full-image events still applied — on BOTH apply paths."""
    import glob
    import json as jsonlib

    cfg = ChangeStreamConfig(
        n_events=3_000, n_convs=60, seed=33, n_files=2, patch_frac=0.2
    )
    feed = str(tmp_path / "feed")
    (write_change_stream if writer == "jsonl" else write_change_stream_parquet)(
        feed, cfg
    )
    events_pd = generate_change_events(cfg)
    n_patches = int((events_pd["op"] == "P").sum())
    assert n_patches > 100

    qdir = str(tmp_path / "quarantine")
    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table,
        config=IngestConfig(n_buckets=4, quarantine_dir=qdir),
    )
    pipe.run_batch_replay(files_per_batch=1)

    # full-image events applied as if the patches never existed
    from xgeo_spark.fixtures.generator import lww_oracle

    expected = lww_oracle(events_pd[events_pd["op"] != "P"])
    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == len(expected)
    pd.testing.assert_series_equal(
        got["text"].fillna("∅"), expected["text"].fillna("∅"), check_names=False
    )

    # every patch is in quarantine with its raw op value
    qrows = []
    for p in glob.glob(f"{qdir}/*.json"):
        with open(p) as f:
            qrows += [jsonlib.loads(line) for line in f if line.strip()]
    assert sum(r.get("op") == "P" for r in qrows) == n_patches


def test_patch_dialect_canonicalization(spark, tmp_path):
    """Wire dialect 'PATCH' canonicalizes to P and folds; the raw value
    survives only in quarantine (none here)."""
    import json

    feed = tmp_path / "feed"
    feed.mkdir()
    rows = [
        {"lsn": 1, "offset": 1, "op": "INSERT", "conv_id": "c-1", "turn_idx": 0,
         "role": "user", "text": "hello", "tool": None,
         "ts": "2026-01-01T00:00:00.000000", "schema_version": 1},
        {"lsn": 2, "offset": 2, "op": "PATCH", "conv_id": "c-1", "turn_idx": 0,
         "role": None, "text": "hello (edited)", "tool": None,
         "ts": "2026-01-01T00:00:01.000000", "schema_version": 1},
    ]
    with open(feed / "events-00000.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, str(feed), table,
        config=IngestConfig(n_buckets=2, enable_patches=True),
    )
    pipe.run_batch_replay(files_per_batch=1)
    got = table.read().toPandas()
    assert len(got) == 1
    assert got.iloc[0]["text"] == "hello (edited)"
    assert got.iloc[0]["role"] == "user"  # preserved through the patch


def test_patch_streaming_matches_fold_oracle(spark, tmp_path):
    """The streaming path (foreachBatch -> pre-aggregation apply) must fold
    patches identically to bounded replay."""
    cfg = ChangeStreamConfig(
        n_events=6_000, n_convs=120, seed=34, n_files=4, patch_frac=0.15
    )
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    events_pd = generate_change_events(cfg)

    table = ParquetLakeTable(spark, str(tmp_path / "lake"))
    pipe = CDCIngestPipeline(
        spark, feed, table,
        config=IngestConfig(
            n_buckets=4, enable_patches=True, max_files_per_trigger=1
        ),
    )
    pipe.run_stream(str(tmp_path / "ckpt"), available_now=True)
    _assert_matches_fold_oracle(table, events_pd)
