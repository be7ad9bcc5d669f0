"""Sink abstraction: one narrow interface, multiple engines.

Deliberately shaped like the reference's one-interface reader layer
(`type FeatureReader interface { Read(...) error }`,
/root/reference/io/interface.go:3-5): the pipeline talks to a ``LakeTable``
and never cares whether commits land in Iceberg snapshots or in the
parquet+manifest fallback.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass
class MergeStats:
    batch_id: int | None
    skipped: bool = False
    version: int | None = None
    rows_upserted: int = 0
    rows_deleted: int = 0
    rows_deduped_away: int = 0
    buckets_touched: int = 0
    offset_range: tuple[int, int] | None = None
    schema_changed: bool = False
    # observed batch text bytes (fast path only; pre-agg path records it
    # per partition instead); surfaced in the lineage summary row
    approx_bytes: int | None = None
    partition_rows: dict[int, int] = field(default_factory=dict)
    # bucket -> data files this merge wrote (table-relative); not part of
    # as_row — consumed by the pipeline's per-bucket lineage fast path
    written_files: dict[int, list[str]] | None = None

    def as_row(self) -> dict:
        return {
            "batch_id": self.batch_id,
            "version": self.version,
            "skipped": self.skipped,
            "rows_upserted": self.rows_upserted,
            "rows_deleted": self.rows_deleted,
            "rows_deduped_away": self.rows_deduped_away,
            "buckets_touched": self.buckets_touched,
            "offset_start": None if not self.offset_range else self.offset_range[0],
            "offset_end": None if not self.offset_range else self.offset_range[1],
            "schema_changed": self.schema_changed,
        }


class LakeTable(abc.ABC):
    """An upsertable, schema-evolving, exactly-once table."""

    @abc.abstractmethod
    def exists(self) -> bool: ...

    @abc.abstractmethod
    def create(self, schema: T.StructType, key_cols: list[str], n_buckets: int = 64) -> None: ...

    @abc.abstractmethod
    def read(self, include_system: bool = False) -> DataFrame:
        """Current table state (tombstones excluded unless include_system)."""

    @abc.abstractmethod
    def merge(
        self,
        updates: DataFrame,
        batch_id: int | None = None,
        offset_range: tuple[int, int] | None = None,
        **hints,
    ) -> MergeStats:
        """LWW-merge a batch of change events (op/lsn/ts + key + payload).

        Must be IDEMPOTENT on batch_id: re-merging an already-committed
        batch_id is a no-op (the exactly-once contract under streaming
        replay-after-crash).
        """

    @abc.abstractmethod
    def last_batch_id(self) -> int | None: ...

    @property
    @abc.abstractmethod
    def user_schema(self) -> T.StructType: ...
