"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the CDC apply path run over the driver's
  sf0.001 ``events`` table treated as a change feed (decode -> LWW dedup ->
  bucket-merge -> read back).
- ``queries()``: one entry per implemented operator (SURVEY.md §2.4 target
  set + training-data-pipeline operators); implementations live in
  ``xgeo_spark/queries.py``.
- ``oracle_sql()``: matching ANSI SQL for DuckDB. Keys without SQL are the
  genuinely non-SQL-expressible ops (stateful CDC replay, UDF-heuristic
  text analysis, LSH candidate generation) — the driver does a rows-only
  check for those; their semantics are covered by tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see xgeo_spark/__init__.py

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC-apply the sf0.001 events table into a lake table.

    events(event_id, ts, user_id, event_type, value, props) is read as a
    change feed: lsn = event_id, key = (user_id, event_type), op = U with
    a deterministic 5% D mix — then the full engine path runs: LWW dedup
    (map-side combinable max_by), schema shaping, bucket-partitioned
    idempotent merge. Returns the final deduped table.
    """
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    updates = ev.select(
        F.col("event_id").alias("lsn"),
        F.col("event_id").alias("offset"),
        F.when(F.pmod(F.col("event_id"), F.lit(20)) == 0, "D").otherwise("U").alias("op"),
        F.col("user_id").cast("long"),
        F.col("event_type"),
        F.col("ts"),
        F.col("value"),
        F.col("props"),
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix="xgeo_entry_")
    table = ParquetLakeTable(spark, os.path.join(root, "lake"))
    table.create(schema, ["user_id", "event_type"], n_buckets=8)
    table.merge(updates, batch_id=0)
    return table.read().orderBy("user_id", "event_type")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from xgeo_spark.queries import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from xgeo_spark.queries import LAZY_SQL, QUERIES

    out = {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
    # lazily-built oracles (VALUES-literal input pins — see queries.LAZY_SQL)
    out.update({name: build() for name, build in LAZY_SQL.items()})
    return out
