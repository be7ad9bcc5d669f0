"""SparkSession factory with scale-aware defaults.

Defaults are tuned so the same code runs on local[N] for tests and on a
multi-executor cluster unchanged:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on for every pandas-UDF crossing,
- shuffle partitions sized to parallelism (overridable),
- UTC session timezone so timestamps compare bit-identically against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see xgeo_spark/__init__.py

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xgeo_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``parallelism`` pins ``local[N]``; default is ``$SPARK_GRAFT_CPUS`` or
    all cores. On a real cluster, leave ``parallelism`` unset and submit via
    ``spark-submit --py-files``; only the master URL changes.
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # at local scale: one shuffle partition per core; on a cluster this
        # is overridden (AQE coalesces down from a higher initial number).
        shuffle_partitions = max(parallelism, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # int64 micros, not the INT96 legacy default: INT96 is deprecated
        # and writes NO column min/max statistics, which kills both parquet
        # row-group skipping on ts predicates and the lake's manifest-level
        # file pruning (sinks/parquet_lake.py file_stats).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # propagate the huge-page workaround to Python UDF workers
        .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
        # FAIR scheduling so concurrent jobs SHARE task slots instead of
        # queueing FIFO. With every job in the default pool this behaves
        # exactly like FIFO; it only matters when a thread opts into
        # another pool — the BackgroundCompactor tags its major-compaction
        # jobs "maintenance" (weight 1 vs ingest's 4, minShare 2), so an
        # ingest micro-batch keeps ~4/5 of the cores while a base rewrite
        # is in flight rather than stalling behind it. Measured on the 1e9
        # replay: worst ingest batch 37.5 s (FIFO) -> see
        # BENCH_longrun_1e9_bgmajor_r05.json. On a real cluster the
        # maintenance writer is its own application/executors; this models
        # that isolation inside one JVM.
        .config("spark.scheduler.mode", "FAIR")
    )
    # pool weights ride a real file on disk; when the package is imported
    # from a --py-files zip the path below isn't a filesystem file and
    # Spark would fail opening it — fall back to FAIR defaults (equal
    # weights) there, and pass the file via submit conf instead
    _alloc = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "conf", "fairscheduler.xml")
    if os.path.isfile(_alloc):
        builder = builder.config("spark.scheduler.allocation.file", _alloc)
    # Shuffle/spill scratch space. On a real cluster spark.local.dir points
    # at node-local NVMe via the submit config; in this sandbox the single
    # virtio disk serializes concurrent shuffle-file writes (measured:
    # 657 s of shuffle-write time in one 99-task stage at 32 threads vs
    # 1.9 s at 8 — and near-zero on tmpfs). Benchmarks set
    # SPARK_GRAFT_LOCAL_DIR=/dev/shm/... to model node-local fast storage.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
