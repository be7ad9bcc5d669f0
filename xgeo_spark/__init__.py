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

import os as _os

# numpy >= 1.18 madvises MADV_HUGEPAGE on large allocations; on hosts where
# synchronous transparent-huge-page compaction is slow (measured here:
# ~250 ms PER 2 MB page -> a 160 MB array took 20 s to first-touch, 220x
# the normal cost) that turns every big numpy/pandas allocation into a
# stall. Must be set before numpy is first imported.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from xgeo_spark.session import get_spark  # noqa: F401
