"""xgeo_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the capability surface of StationA/xgeo
(reference: /root/reference, a single-pass streaming record-at-a-time ETL
engine — see `io/interface.go:3-5`, `cmd/xgeo/main.go:44-62`) as an
idiomatic-Spark pipeline:

- change-feed source (offset-ordered event files)   -> sources/streaming
- event decode / normalization (vectorized, Arrow)  -> functions/
- last-writer-wins dedup per (conv_id, turn_idx)    -> operators/dedup
- schema evolution (Arrow schema diff -> ALTER)     -> plans/schema_evolution
- exactly-once lake upsert (MERGE, idempotent)      -> sinks/
- per-batch lineage manifest                        -> streaming/lineage

Everything here is built on the public PySpark DataFrame/SQL/Streaming API.
"""

__version__ = "0.1.0"

from xgeo_spark.session import get_spark  # noqa: F401
