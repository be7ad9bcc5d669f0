"""Checkpointed incremental consumer of the lake's change feed.

The downstream half of the CDC story (the upstream half being change feed
-> LWW dedup -> lake merge): a ``ChangeFeedConsumer`` tails a lake table's
``table_changes`` stream and propagates each new commit range to a
downstream target exactly-once — the Delta-CDF / Iceberg-changelog
consumer loop, e.g. lake -> feature store, lake -> search index, or
lake -> downstream lake in another region.

Exactly-once without distributed transactions, by composing two idempotent
halves around an at-least-once poll:

1. the consumer's checkpoint (highest consumed version) is a create-only
   marker file per version range — crash AFTER applying but BEFORE
   checkpointing replays the same range on restart;
2. the replayed range lands in the downstream table's ``merge`` with
   ``batch_id = v_to``, which the sink's idempotency contract turns into
   a no-op (same mechanism the upstream pipeline uses for streaming
   replay-after-crash).

The data moved per poll is O(changes in range) — a manifest diff plus
``_seq``-pruned file reads — never a diff of two table scans, so a
consumer that polls every few minutes on a 100 TB table reads megabytes,
not the table.
"""

from __future__ import annotations

import posixpath
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xgeo_spark.sinks.base import LakeTable, MergeStats
from xgeo_spark.sinks.fsio import HadoopFS
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

_CKPT_RE = re.compile(r"^consumed-(\d{12})$")


class ChangeFeedConsumer:
    """Tail one lake table's commits from a durable checkpoint.

    ``checkpoint_path`` may live anywhere the Hadoop FS reaches (HDFS/S3A
    on a cluster, file: in tests); markers are create-only files named by
    the consumed-through version, so the latest checkpoint is discovered
    by listing — the same no-mutable-pointer discipline as the lake's own
    ``_versions/`` directory, and safe under a crashed predecessor."""

    def __init__(self, source: ParquetLakeTable, checkpoint_path: str):
        self.source = source
        self.checkpoint_path = checkpoint_path
        self.fs = HadoopFS(source.spark, checkpoint_path)

    # ---------- checkpoint ----------

    def last_consumed(self) -> int:
        """Highest version consumed so far; 0 before the first poll (so the
        first range (0, current] bootstraps the full table as upserts)."""
        best = 0
        for name in self.fs.list_names(self.checkpoint_path):
            m = _CKPT_RE.match(name)
            if m:
                best = max(best, int(m.group(1)))
        return best

    # markers retained behind the newest one; bounds checkpoint-dir growth
    # (and the per-poll listing) on long-lived consumers while keeping a
    # forensic tail
    KEEP_MARKERS = 8

    def _checkpoint(self, version: int) -> None:
        try:
            self.fs.write_text_commit(
                posixpath.join(self.checkpoint_path, f"consumed-{version:012d}"),
                "",
            )
        except FileExistsError:
            pass  # a replay re-consumed an already-checkpointed range
        self._prune_markers()

    def _prune_markers(self) -> None:
        """Delete all but the newest KEEP_MARKERS marker files. Safe at any
        point: ``last_consumed`` only needs the maximum, and markers are
        create-only, so a concurrent reader can never observe a smaller
        maximum than before the prune."""
        versions = sorted(
            int(m.group(1))
            for m in (
                _CKPT_RE.match(n)
                for n in self.fs.list_names(self.checkpoint_path)
            )
            if m
        )
        for v in versions[: -self.KEEP_MARKERS]:
            self.fs.delete(
                posixpath.join(self.checkpoint_path, f"consumed-{v:012d}")
            )

    # ---------- polling ----------

    def poll(self) -> tuple[DataFrame, int, int] | None:
        """The unconsumed change range as (changes_df, v_from, v_to), or
        None when the consumer is caught up. Does NOT advance the
        checkpoint — callers apply the changes, then ``commit(v_to)``."""
        v_from = self.last_consumed()
        v_to = self.source.current_version()
        if v_to <= v_from:
            return None
        return self.source.table_changes(v_from, v_to), v_from, v_to

    def commit(self, v_to: int) -> None:
        self._checkpoint(v_to)

    # ---------- the standard sink: another lake table ----------

    def propagate(self, downstream: LakeTable) -> MergeStats | None:
        """Apply one unconsumed range to a downstream table; None if caught
        up. Net-changes become a merge batch: ``_change_type`` drives the
        op, ``_commit_version`` is the LWW lsn (per key it is monotone in
        commit order, so out-of-order REPLAYS of consumer batches still
        converge), ``batch_id = v_to`` makes the replayed merge a no-op."""
        polled = self.poll()
        if polled is None:
            return None
        changes, _v_from, v_to = polled
        if not downstream.exists():
            key_cols = self.source.manifest()["key_cols"]
            n_buckets = self.source.manifest()["n_buckets"]
            downstream.create(
                self.source.user_schema, key_cols, n_buckets=n_buckets
            )
        updates = changes.select(
            *[c for c in changes.columns
              if c not in ("_change_type", "_commit_version")],
            F.when(F.col("_change_type") == "delete", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("_commit_version").cast("long").alias("lsn"),
        )
        stats = downstream.merge(updates, batch_id=v_to)
        self.commit(v_to)
        return stats
