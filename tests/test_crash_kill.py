"""Process-level crash: SIGKILL an ingesting child (its whole process
group — Python driver AND its Spark JVM die mid-batch, nothing flushes),
then resume from the same checkpoint in this process and require the
final table to exactly equal the LWW oracle.

The graceful-stop and fresh-objects suites prove resume logic; this
proves TORN-STATE recovery: a process that vanished anywhere — mid
bucket write, mid manifest swap, mid offset commit — must leave a lake
whose last committed manifest is consistent (atomic create-swap), whose
half-written attempt dirs are invisible (manifest-referenced reads) and
sweepable (remove_orphan_files), and whose re-delivered batches are
idempotent no-ops. Exactly-once under kill -9, not just under stop()."""

from __future__ import annotations

import os
import re
import signal
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Committed manifests only — mirrors parquet_lake._VERSION_RE.  Hadoop's
# ChecksumFileSystem leaves dot-prefixed .crc sidecars and in-flight tmp
# files in the same directory, so a raw listdir count races the commit
# protocol (".x.crc" + "x.tmp" == 2 entries with ZERO commits).
_COMMITTED_RE = re.compile(r"v\d{12}\.json")


def _committed_versions(versions_dir: str) -> int:
    if not os.path.isdir(versions_dir):
        return 0
    return sum(1 for x in os.listdir(versions_dir) if _COMMITTED_RE.fullmatch(x))

CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from xgeo_spark.session import get_spark
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
    from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

    spark = get_spark("kill-child", parallelism=4)
    table = ParquetLakeTable(spark, {lake!r})
    pipe = CDCIngestPipeline(
        spark, {feed!r}, table,
        config=IngestConfig(n_buckets=8, lineage=False,
                            max_files_per_trigger=1),
    )
    pipe.run_stream(checkpoint_dir={ckpt!r}, available_now=True)
    print("CHILD-FINISHED", flush=True)
    """
)


def test_sigkill_mid_stream_then_resume_converges(spark, tmp_path):
    from xgeo_spark.fixtures.generator import (
        ChangeStreamConfig,
        generate_change_events,
        lww_oracle,
        write_change_stream,
    )
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
    from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

    cfg = ChangeStreamConfig(n_events=16_000, n_convs=150, seed=13, n_files=16)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    script = CHILD.format(repo=REPO, lake=lake, feed=feed, ckpt=ckpt)
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # its own process group: JVM dies with it
        env=env,
    )
    try:
        versions = str(tmp_path / "lake" / "_versions")
        deadline = time.time() + 300
        while time.time() < deadline:
            n = _committed_versions(versions)
            if n >= 2:
                break
            if proc.poll() is not None:
                pytest.fail("child finished before the kill landed — "
                            "raise n_files or lower the kill threshold")
            time.sleep(0.05)
        else:
            pytest.fail("child never committed 2 versions")
        os.killpg(proc.pid, signal.SIGKILL)  # driver + JVM, no flush
    finally:
        proc.wait(timeout=60)

    # torn state must still be readable: last committed manifest wins
    table = ParquetLakeTable(spark, lake)
    mid_rows = table.read().count()
    assert mid_rows > 0

    # resume from the SAME checkpoint; re-delivered batch ids no-op
    pipe = CDCIngestPipeline(
        spark, feed, table,
        config=IngestConfig(n_buckets=8, lineage=False,
                            max_files_per_trigger=1),
    )
    pipe.run_stream(checkpoint_dir=ckpt, available_now=True)

    got = table.read().orderBy("conv_id", "turn_idx").toPandas()
    exp = lww_oracle(generate_change_events(cfg))
    assert len(got) == len(exp)
    assert got["text"].fillna("∅").tolist() == exp["text"].fillna("∅").tolist()
    assert got["role"].tolist() == exp["role"].tolist()

    # debris from the killed attempt (if any) is sweepable and sweeping
    # changes nothing
    table.remove_orphan_files()
    assert table.read().count() == len(exp)
