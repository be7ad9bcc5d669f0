"""Iceberg sink logic tests — no Iceberg runtime in the sandbox, so these
cover everything testable without a live catalog: the generated SQL (merge,
schema-evolution DDL, idempotency stamp), the writer/reader property-key
consistency, and the skip-if-committed control flow. The end-to-end LWW /
replay semantics the SQL encodes are exercised against the parquet sink in
tests/test_cdc_replay.py; the MERGE branches here must match that behavior
by construction (same strictly-greater guard, same tombstone flag).

No Spark session needed — everything here is pure Python.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from xgeo_spark.plans.schema_evolution import diff_schemas
from xgeo_spark.sinks.base import MergeStats
from xgeo_spark.sinks.iceberg_lake import (
    BATCH_ID_PROP,
    IcebergLakeTable,
    alter_sql,
    merge_sql,
    parse_batch_id,
    stamp_batch_sql,
)

KEYS = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool", "ts"]


def test_merge_sql_shape():
    sql = merge_sql("cat.db.transcripts", KEYS, PAYLOAD)
    # join on ALL key columns
    assert "t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    # LWW guard is STRICTLY greater on every MATCHED branch — this is what
    # makes crash-replay of an already-applied batch a no-op (see module
    # docstring convergence argument)
    assert sql.count("s._lsn > t._lsn") == 2
    assert "s._lsn >= t._lsn" not in sql
    # delete branch tombstones instead of removing the row
    assert "THEN UPDATE SET t._deleted = true, t._lsn = s._lsn" in sql
    # update branch rewrites the full payload and clears the tombstone
    for c in PAYLOAD:
        assert f"t.{c} = s.{c}" in sql
    assert "t._deleted = false" in sql
    # insert lists every column exactly once, system cols last
    m = re.search(r"INSERT \(([^)]*)\) VALUES \(([^)]*)\)", sql)
    cols = [c.strip() for c in m.group(1).split(",")]
    vals = [v.strip() for v in m.group(2).split(",")]
    assert cols == KEYS + PAYLOAD + ["_lsn", "_deleted"]
    assert vals == [f"s.{c}" for c in cols]
    # delete branch must be checked BEFORE the generic update branch (first
    # matching WHEN wins in MERGE)
    assert sql.index("s._deleted") < sql.index("t._deleted = false")


def test_alter_sql_add_and_widen():
    table = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    batch = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),      # widened
            T.StructField("text", T.StringType()),
            T.StructField("tool_meta", T.StringType()),   # added
        ]
    )
    stmts = alter_sql("cat.db.t", diff_schemas(table, batch))
    assert "ALTER TABLE cat.db.t ADD COLUMN tool_meta string" in stmts
    assert "ALTER TABLE cat.db.t ALTER COLUMN turn_idx TYPE bigint" in stmts
    assert len(stmts) == 2


def test_alter_sql_noop_on_identical():
    s = T.StructType([T.StructField("a", T.StringType())])
    assert alter_sql("t", diff_schemas(s, s)) == []


def test_stamp_and_parse_use_the_same_property():
    """The round-1 bug: merge wrote one property name, last_batch_id read a
    different one, so replay-after-crash would re-apply every batch. Writer
    and reader now share BATCH_ID_PROP by construction; this pins it."""
    sql = stamp_batch_sql("cat.db.t", 7)
    assert BATCH_ID_PROP in sql
    assert sql == (
        f"ALTER TABLE cat.db.t SET TBLPROPERTIES ('{BATCH_ID_PROP}'='7')"
    )
    # what SHOW TBLPROPERTIES would hand back after that statement
    assert parse_batch_id({BATCH_ID_PROP: "7"}) == 7
    assert parse_batch_id({}) is None
    assert parse_batch_id({BATCH_ID_PROP: "garbage"}) is None
    # the stale round-1 property name must NOT satisfy the reader
    assert parse_batch_id({"xgeo.batch_id": "7"}) is None


class _StubbedTable(IcebergLakeTable):
    """last_batch_id stubbed so merge()'s skip gate runs without a catalog."""

    def __init__(self, last):
        self._last = last
        self.touched = False

    def last_batch_id(self):
        return self._last

    def _key_cols_of(self):  # pragma: no cover - only hit on non-skip path
        self.touched = True
        raise AssertionError("merge proceeded past the idempotency gate")


def test_merge_skips_already_committed_batch():
    t = _StubbedTable(last=5)
    for bid in (0, 4, 5):
        stats = t.merge(updates=None, batch_id=bid)
        assert stats == MergeStats(batch_id=bid, skipped=True)
    assert t.touched is False


def test_merge_proceeds_for_new_batch():
    t = _StubbedTable(last=5)
    try:
        t.merge(updates=None, batch_id=6)
    except AssertionError as e:
        assert "past the idempotency gate" in str(e)
    assert t.touched is True
