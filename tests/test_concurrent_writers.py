"""Multi-writer commit protocol: optimistic-concurrency RETRY.

Round-3 verified that a stale writer is DETECTED (CommitConflictError, no
clobber); round-4 upgrades detection to convergence — a loser re-bases on
the winner's manifest and retries, so two uncoordinated writers merging
into one table lose nothing and double nothing (the Iceberg commit model:
conflict -> refresh -> reapply -> commit). The local-path commit swap uses
os.link (atomic create-if-absent) so even LocalFileSystem's rename TOCTOU
window cannot let two same-version committers both "win".
"""

from __future__ import annotations

import datetime as dt
import threading

import pandas as pd

from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
from xgeo_spark.streaming.pipeline import KEY_COLS, TRANSCRIPT_SCHEMA


def _batch(spark, lsn0: int, conv: str, texts: dict[int, str], op: str = "U"):
    rows = [
        {"lsn": lsn0 + i, "offset": lsn0 + i, "op": op, "conv_id": conv,
         "turn_idx": t, "role": "user", "text": x, "tool": None,
         "ts": dt.datetime(2026, 1, 1), "schema_version": 1}
        for i, (t, x) in enumerate(sorted(texts.items()))
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def _run_threads(*fns):
    """Run callables on a shared start barrier; re-raise the first error."""
    barrier = threading.Barrier(len(fns))
    errs: list[BaseException] = []

    def wrap(fn):
        def run():
            barrier.wait()
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 - surfaced below
                errs.append(e)
        return run

    threads = [threading.Thread(target=wrap(fn)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def test_two_writers_disjoint_batches_converge(spark, tmp_path):
    """Two uncoordinated writers (batch_id=None appends — independent jobs,
    not one checkpointed stream) race 3 batches each over DISJOINT keys.
    Every commit conflict must re-base and retry: the final table equals
    the serial LWW fold of all six batches — no lost update in either
    direction."""
    root = str(tmp_path / "lake")
    a = ParquetLakeTable(spark, root)
    a.create(TRANSCRIPT_SCHEMA, KEY_COLS, n_buckets=4)
    b = ParquetLakeTable(spark, root)

    def writer(table, conv, lsn_base):
        for i in range(3):
            table.merge(
                _batch(spark, lsn_base + 10 * i, conv,
                       {0: f"{conv}-v{i}", i + 1: f"{conv}-t{i}"}),
                batch_id=None,
            )

    _run_threads(lambda: writer(a, "conv-a", 100),
                 lambda: writer(b, "conv-b", 200))

    fresh = ParquetLakeTable(spark, root)
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in fresh.read().collect()}
    # serial oracle: per key, the highest-lsn write of its own stream
    expect = {}
    for conv in ("conv-a", "conv-b"):
        for i in range(3):
            expect[(conv, 0)] = f"{conv}-v{i}"
            expect[(conv, i + 1)] = f"{conv}-t{i}"
    assert got == expect
    # six data commits, every one present (none clobbered by the race)
    commits = [c for c in fresh.history() if not c.get("compaction")]
    assert len(commits) == 6


def test_two_writers_same_batch_sequence_exactly_once(spark, tmp_path):
    """OVERLAPPING delivery: two writers race the SAME ordered batch
    sequence (at-least-once redelivery of one logical stream). The retry
    path must re-check batch_id idempotency against the WINNER's manifest,
    so each batch applies exactly once — never zero, never twice."""
    root = str(tmp_path / "lake")
    a = ParquetLakeTable(spark, root)
    a.create(TRANSCRIPT_SCHEMA, KEY_COLS, n_buckets=4)
    b = ParquetLakeTable(spark, root)

    def replay(table):
        for bid in range(4):
            table.merge(
                _batch(spark, 100 * (bid + 1), "conv-x",
                       {0: f"v{bid}", bid + 1: f"t{bid}"}),
                batch_id=bid,
            )

    _run_threads(lambda: replay(a), lambda: replay(b))

    fresh = ParquetLakeTable(spark, root)
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in fresh.read().collect()}
    assert got == {
        ("conv-x", 0): "v3", ("conv-x", 1): "t0", ("conv-x", 2): "t1",
        ("conv-x", 3): "t2", ("conv-x", 4): "t3",
    }
    applied = [c["batch_id"] for c in fresh.history()
               if c.get("batch_id") is not None]
    assert sorted(applied) == [0, 1, 2, 3], applied  # exactly once each


def test_retry_rebases_on_winners_schema_evolution(spark, tmp_path):
    """A loser whose attempt was computed against a pre-evolution manifest
    must re-diff schema against the WINNER's evolved schema on retry: the
    final table carries the winner's added column, with nulls for the
    loser's rows — never a dropped column or a stale-schema manifest."""
    from unittest import mock

    from pyspark.sql import functions as F

    root = str(tmp_path / "lake")
    a = ParquetLakeTable(spark, root)
    a.create(TRANSCRIPT_SCHEMA, KEY_COLS, n_buckets=4)
    a.merge(_batch(spark, 0, "conv-s", {0: "base"}), batch_id=None)

    b = ParquetLakeTable(spark, root)
    stale = b.manifest()  # v1 schema, version 1

    # the winner evolves the schema (adds tool_meta)
    v2 = _batch(spark, 10, "conv-s", {1: "winner"}).withColumn(
        "tool_meta", F.lit('{"k":1}')
    )
    a.merge(v2, batch_id=None)

    # loser: first manifest() read is stale, the retry re-reads for real
    real_manifest = b.manifest
    calls = {"n": 0}

    def flaky_manifest():
        calls["n"] += 1
        return stale if calls["n"] == 1 else real_manifest()

    with mock.patch.object(b, "manifest", side_effect=flaky_manifest):
        b.merge(_batch(spark, 20, "conv-s", {2: "loser-v1"}), batch_id=None)

    fresh = ParquetLakeTable(spark, root)
    got = {r["turn_idx"]: (r["text"], r["tool_meta"])
           for r in fresh.read().collect()}
    assert got == {
        0: ("base", None),
        1: ("winner", '{"k":1}'),
        2: ("loser-v1", None),
    }
    # manifest schema retains the winner's evolution
    import json as _json

    schema_cols = [
        f["name"]
        for f in _json.loads(fresh.manifest()["schema"])["fields"]
    ]
    assert "tool_meta" in schema_cols
