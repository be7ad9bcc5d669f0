"""Multi-table fan-out routing: one feed -> N lake tables, per-table
exactly-once. The union of the routed tables must equal the single-table
replay's oracle (the route is a partition of the key space), and replaying
a batch after a partial fan-out must skip per table independently."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    generate_change_events,
    lww_oracle,
    write_change_stream_parquet,
)
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
from xgeo_spark.streaming.pipeline import IngestConfig
from xgeo_spark.streaming.router import MultiTableRouter


def _route_expr():
    # shard conversations across two tenant tables by key hash — a pure
    # expression over the event, same contract as a payload `table` column
    return F.when(
        F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0, "shard_a"
    ).otherwise("shard_b")


def _make_router(spark, tmp_path, feed, tables=("shard_a", "shard_b")):
    lakes = {n: ParquetLakeTable(spark, str(tmp_path / n)) for n in tables}
    return (
        MultiTableRouter(
            spark,
            feed,
            lakes,
            _route_expr(),
            lineage_root=str(tmp_path / "lineage"),
            config=IngestConfig(n_buckets=4),
        ),
        lakes,
    )


def test_routed_union_matches_single_table_oracle(spark, tmp_path):
    cfg = ChangeStreamConfig(n_events=10_000, n_convs=150, seed=21, n_files=4)
    feed = str(tmp_path / "feed")
    write_change_stream_parquet(feed, cfg)
    events_pd = generate_change_events(cfg)

    router, lakes = _make_router(spark, tmp_path, feed)
    batches = router.run_batch_replay(files_per_batch=2)
    assert all(b["unrouted"] == 0 for b in batches)

    expected = lww_oracle(events_pd)
    parts = [lakes[n].read().toPandas() for n in lakes]
    got = (
        pd.concat(parts)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    assert list(got["conv_id"]) == list(expected["conv_id"])
    assert list(got["turn_idx"].astype(np.int64)) == list(expected["turn_idx"])
    pd.testing.assert_series_equal(
        got["text"].fillna("∅"), expected["text"].fillna("∅"), check_names=False
    )
    # both shards are non-trivial (the route actually partitions)
    assert all(len(p) > 0 for p in parts)
    # schema evolution reached every routed table independently
    assert all("tool_meta" in lakes[n].read().columns for n in lakes)


def test_partial_fanout_replay_skips_per_table(spark, tmp_path):
    """Crash-mid-fan-out recovery: apply batch 0 to shard_a only (simulated
    partial fan-out), then route the batch through the full router — shard_a
    must skip it, shard_b must apply it; final union still matches."""
    cfg = ChangeStreamConfig(n_events=6_000, n_convs=100, seed=22, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream_parquet(feed, cfg)
    events_pd = generate_change_events(cfg)

    router, lakes = _make_router(spark, tmp_path, feed)

    import os

    files = sorted(
        os.path.join(feed, f) for f in os.listdir(feed) if f.endswith(".parquet")
    )
    batch = router.source.read_batch(files)

    # simulated crash: only shard_a committed batch 0
    pre = batch.withColumn("_route", _route_expr())
    router._pipes["shard_a"].apply_batch(
        pre.filter(F.col("_route") == "shard_a").drop("_route"), 0
    )
    assert lakes["shard_a"].last_batch_id() == 0
    assert lakes["shard_b"].last_batch_id() is None

    # recovery: replay the whole batch through the router
    out = router.apply_batch(batch, 0)
    assert out["shard_a"].skipped
    assert not out["shard_b"].skipped

    expected = lww_oracle(events_pd)
    got = (
        pd.concat([lakes[n].read().toPandas() for n in lakes])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(expected)
    pd.testing.assert_series_equal(
        got["text"].fillna("∅"), expected["text"].fillna("∅"), check_names=False
    )


def test_route_null_rows_reach_dead_letter(spark, tmp_path):
    """A malformed row routes to NULL (its key is null and the route
    expression null-propagates, like any payload-derived route — note a
    hash route does NOT: xxhash64(NULL) is the seed); it must be counted
    AND land in the router's dead-letter dir — never silently dropped."""
    import glob
    import json as jsonlib
    import os

    cfg = ChangeStreamConfig(n_events=2_000, n_convs=50, seed=23, n_files=1)
    feed = str(tmp_path / "feed")
    from xgeo_spark.fixtures.generator import write_change_stream

    write_change_stream(feed, cfg)
    # append a malformed line and a record with a null key
    fn = sorted(os.listdir(feed))[0]
    with open(os.path.join(feed, fn), "a") as f:
        f.write("{this is not json\n")
        f.write('{"lsn": 999999, "offset": 999999, "op": "U", "conv_id": null, '
                '"turn_idx": 0, "text": "orphan", "schema_version": 1}\n')

    dead = str(tmp_path / "dead")
    lakes = {n: ParquetLakeTable(spark, str(tmp_path / n)) for n in ("a", "b")}
    tenant = F.substring("conv_id", 6, 8).cast("int") % 2
    router = MultiTableRouter(
        spark, feed, lakes,
        F.when(tenant == 0, "a").when(tenant == 1, "b"),
        config=IngestConfig(n_buckets=2),
        unrouted_dir=dead,
    )
    out = router.run_batch_replay(files_per_batch=1)
    assert out[0]["unrouted"] == 2  # corrupt line + null-key record

    def _dead_rows():
        rows = []
        # dead letters land under batch_id=N subdirs (idempotent rewrite)
        for p in glob.glob(f"{dead}/**/*.json", recursive=True):
            with open(p) as f:
                rows += [jsonlib.loads(line) for line in f if line.strip()]
        return rows

    assert len(_dead_rows()) == 2
    # crash-and-replay of the same batch must REWRITE, not re-append,
    # its dead letters (same recovery protocol as the per-table merges)
    router.run_batch_replay(files_per_batch=1)
    assert len(_dead_rows()) == 2
