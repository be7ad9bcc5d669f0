#!/usr/bin/env python
"""Phase-level profiler for the sf0.1 bench CDC leg (tools-only, not shipped
in the bench): replicates bench.run_cdc_bench but times every sub-phase of
every batch so per-batch fixed overhead is attributable."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/xgeo-shuffle")

from xgeo_spark.session import get_spark
from xgeo_spark.fixtures.generator import ChangeStreamConfig, write_change_stream_parquet
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

CPUS = int(os.environ.get("PROF_CPUS", "32"))
N_EVENTS = int(os.environ.get("PROF_EVENTS", "2000000"))

spark = get_spark("xgeo_prof", parallelism=CPUS, shuffle_partitions=CPUS)
workdir = tempfile.mkdtemp(prefix="xgeo_prof_")
feed_dir = os.path.join(workdir, "feed")
cfg = ChangeStreamConfig(n_events=N_EVENTS, n_convs=max(200, N_EVENTS // 50),
                         seed=42, n_files=128)
t0 = time.perf_counter()
write_change_stream_parquet(feed_dir, cfg)
print(f"gen: {time.perf_counter()-t0:.2f}s", flush=True)

paths = sorted(os.path.join(feed_dir, f) for f in os.listdir(feed_dir)
               if f.endswith(".parquet"))

table = ParquetLakeTable(spark, os.path.join(workdir, "lake"))
pipe = CDCIngestPipeline(
    spark, feed_dir, table,
    lineage_path=os.path.join(workdir, "lineage"),
    config=IngestConfig(n_buckets=32, normalize_text=True, adaptive=False),
)

# warmup (same as bench)
warm_table = ParquetLakeTable(spark, os.path.join(workdir, "warm_lake"))
warm = CDCIngestPipeline(
    spark, feed_dir, warm_table,
    config=IngestConfig(n_buckets=32, normalize_text=True, lineage=False, adaptive=False),
)
t0 = time.perf_counter()
wb = warm.source.read_batch(paths[:1])
warm.apply_batch(wb, 0)
print(f"warmup: {time.perf_counter()-t0:.2f}s", flush=True)

# instrument: monkeypatch phases
import xgeo_spark.sinks.parquet_lake as pl

orig_write = pl.ParquetLakeTable._write_buckets
orig_commit = pl.ParquetLakeTable._commit

def timed_write(self, *args, **kwargs):
    t = time.perf_counter()
    r = orig_write(self, *args, **kwargs)
    print(f"    _write_buckets: {time.perf_counter()-t:.2f}s", flush=True)
    return r

def timed_commit(self, manifest):
    t = time.perf_counter()
    r = orig_commit(self, manifest)
    print(f"    _commit: {time.perf_counter()-t:.2f}s", flush=True)
    return r

pl.ParquetLakeTable._write_buckets = timed_write
pl.ParquetLakeTable._commit = timed_commit

from xgeo_spark.streaming.lineage import LineageLog
orig_append = LineageLog.append
def timed_append(self, *a, **k):
    t = time.perf_counter()
    r = orig_append(self, *a, **k)
    print(f"    lineage.append: {time.perf_counter()-t:.2f}s", flush=True)
    return r
LineageLog.append = timed_append

files_per_batch = max(1, len(paths) // 4)
t_all = time.perf_counter()
bid = 0
for i in range(0, len(paths), files_per_batch):
    chunk = paths[i:i + files_per_batch]
    tb = time.perf_counter()
    pipe._tune_input_splits(chunk)
    t1 = time.perf_counter()
    batch = pipe.source.read_batch(chunk)
    t2 = time.perf_counter()
    hint = pipe._sv_hint(chunk)
    t3 = time.perf_counter()
    stats = pipe.apply_batch(batch, bid, max_sv_hint=hint)
    t4 = time.perf_counter()
    print(f"batch {bid}: total={t4-tb:.2f}s tune={t1-tb:.2f} read_batch={t2-t1:.2f} "
          f"sv_hint={t3-t2:.2f} apply={t4-t3:.2f}", flush=True)
    bid += 1
wall = time.perf_counter() - t_all
t5 = time.perf_counter()
n = table.read().count()
print(f"final count: {time.perf_counter()-t5:.2f}s rows={n}", flush=True)
print(f"replay wall: {wall:.2f}s -> {N_EVENTS/wall:.0f} ev/s (nominal)", flush=True)
spark.stop()
