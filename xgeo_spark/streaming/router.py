"""Multi-table fan-out: one change feed routed into N lake tables.

A single binlog/WAL tail usually carries changes for MANY target tables
(the topic-routing layer of binlog CDC connectors). The reference engine is
strictly single-pipeline (one source -> one sink,
/root/reference/cmd/xgeo/main.go:44-62); this router is the target-engine
extension: each micro-batch is scanned ONCE, split by a caller-supplied
routing expression, and each slice is applied through that table's own
``CDCIngestPipeline.apply_batch`` — so every per-table property (LWW
dedup, schema evolution, quarantine, lineage, compaction) composes
unchanged.

Exactly-once under fan-out: each target table stamps the SAME batch_id in
its own manifest. A crash mid-fan-out replays the batch; tables that
already committed skip it (``MergeStats.skipped``), the rest apply — the
per-table idempotency check IS the fan-out recovery protocol, no
two-phase coordination needed. Dead letters participate too: unrouted
rows land in a ``batch_id=N`` subdir with overwrite semantics, so a
replayed batch rewrites (not re-appends) its own dead letters; only a
caller passing ``batch_id=None`` falls back to at-least-once appends.

Scale notes: the batch is persisted before the fan-out so N merges read
one materialized micro-batch instead of re-scanning the feed N times
(micro-batches are bounded by construction; this is the one place a cache
is strictly cheaper than the alternative). Each slice's merge then
repartitions on its own table's buckets — skew in one table's key space
never stalls another table's merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from xgeo_spark.sinks.base import LakeTable, MergeStats
from xgeo_spark.sources.change_feed import ChangeFeedSource
from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig


class MultiTableRouter:
    def __init__(
        self,
        spark: SparkSession,
        feed_dir: str,
        tables: dict[str, LakeTable],
        route: Column,
        lineage_root: str | None = None,
        config: IngestConfig | None = None,
        unrouted_dir: str | None = None,
    ):
        """``route``: a Column evaluating to the target-table name per
        event (e.g. an explicit ``table`` payload column, or a sharding
        expression over the key). Events routing to a name not in
        ``tables`` — including NULL routes, which is where a key-derived
        expression sends malformed rows with a null key — are counted per
        batch (``unrouted`` in the returned stats dict) and, when
        ``unrouted_dir`` is set, written there as JSON with their raw
        payload: the dead-letter analogue of the quarantine split, kept
        separate because no per-table pipeline can own a record whose
        target is unknown."""
        import os

        self.spark = spark
        self.source = ChangeFeedSource(spark, feed_dir)
        self.route = route
        self.config = config or IngestConfig()
        self.unrouted_dir = unrouted_dir
        self._pipes: dict[str, CDCIngestPipeline] = {
            name: CDCIngestPipeline(
                spark,
                feed_dir,
                table,
                lineage_path=(
                    os.path.join(lineage_root, name) if lineage_root else None
                ),
                config=self.config,
            )
            for name, table in tables.items()
        }

    def apply_batch(
        self, batch_df: DataFrame, batch_id: int | None
    ) -> dict[str, MergeStats | int]:
        routed = batch_df.withColumn("_route", self.route).persist()
        try:
            out: dict[str, MergeStats | int] = {}
            known = list(self._pipes)
            for name, pipe in self._pipes.items():
                sub = routed.filter(F.col("_route") == F.lit(name)).drop("_route")
                out[name] = pipe.apply_batch(sub, batch_id)
            unrouted = routed.filter(
                ~F.col("_route").isin(known) | F.col("_route").isNull()
            )
            n_unrouted = unrouted.count()
            if n_unrouted and self.unrouted_dir is not None:
                import os

                # idempotent under crash-and-replay: the dead letters land
                # in a batch_id-keyed subdir with overwrite semantics, so a
                # replayed batch REWRITES its own dead letters instead of
                # appending duplicates (the per-table merges already skip
                # via batch_id; this makes the fan-out's third output leg
                # obey the same recovery protocol).
                # batch_id=None writes go to their own batch_id= subdir too
                # (the Hive null-partition sentinel) so the directory stays
                # uniformly one-level partitioned — mixing root-level JSON
                # files with batch_id=N subdirs would break partition
                # discovery for a reader doing spark.read.json(unrouted_dir).
                dst = os.path.join(
                    self.unrouted_dir,
                    f"batch_id={batch_id}"
                    if batch_id is not None
                    else "batch_id=__HIVE_DEFAULT_PARTITION__",
                )
                mode = "overwrite" if batch_id is not None else "append"
                unrouted.write.mode(mode).json(dst)
            out["unrouted"] = n_unrouted
            return out
        finally:
            routed.unpersist()

    def run_batch_replay(
        self, files_per_batch: int = 2, start_batch_id: int = 0
    ) -> list[dict[str, MergeStats | int]]:
        import os

        files = sorted(
            os.path.join(self.source.feed_dir, f)
            for f in os.listdir(self.source.feed_dir)
            if f.endswith((".jsonl", ".jsonl.gz", ".jsonl.bz2", ".parquet"))
        )
        out = []
        bid = start_batch_id
        any_pipe = next(iter(self._pipes.values()))
        for i in range(0, len(files), files_per_batch):
            chunk = files[i : i + files_per_batch]
            # same decode-parallelism fix as the single-table replay: size
            # input splits so the scan stage exposes ~3 tasks per core
            any_pipe._tune_input_splits(chunk)
            batch = self.source.read_batch(chunk)
            out.append(self.apply_batch(batch, bid))
            bid += 1
        return out
