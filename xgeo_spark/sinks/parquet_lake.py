"""Parquet-backed lake table with Iceberg-style commit semantics.

Why this exists: the sandbox has no Iceberg runtime jars, but the north
rule's sink contract (idempotent MERGE, snapshot stamped with the batch's
offset range, schema evolution, replay-after-kill convergence) is about
*semantics*, not the jar. This implementation provides those semantics on
plain parquet + a JSON manifest, with the same interface the Iceberg sink
implements, so swapping in real Iceberg is a config change.

Physical layout (all data files immutable, commits are manifest swaps):

    <root>/
      _latest                      # current version number (atomic rename)
      _versions/v<NNN>.json        # manifest per committed version
      data/v<NNN>/_bucket=<K>/*.parquet

Two merge strategies, selected at create() (Iceberg's copy-on-write vs
merge-on-read, same trade-off):

- **cow**: a merge rewrites every bucket its batch touches — read-optimized
  (reads are a plain scan), but write cost is O(touched table size) per
  batch. With uniformly spread keys every batch rewrites the whole table.
- **mor** (default for ingest): a merge appends the batch's deduped rows as
  DELTA files per bucket — write cost is O(batch), independent of table
  size. Reads union base+delta and reduce to the last writer per key
  (`max_by` over (lsn, commit-seq) — partial-aggregated, so the reduce is
  map-side combined). `compact()` folds deltas into the base; the pipeline
  auto-compacts when a bucket accumulates more than
  ``compact_threshold`` delta generations, amortizing read cost while
  keeping ingest O(batch). At 10^10 events this is the difference between
  ingest throughput degrading linearly with table size and staying flat.

Scale design (both modes):
- The table is hash-bucketed on the key's conv_id (``pmod(xxhash64(conv_id),
  n_buckets)``) — the moral equivalent of Iceberg's ``bucket(N, conv_id)``
  hidden partitioning. At 100 TB you raise ``n_buckets`` (e.g. 4096) so each
  rewrite/compaction unit stays executor-sized.
- Deletes are tombstones (``_deleted`` + ``_lsn`` retained), so a late,
  lower-lsn update arriving AFTER a delete cannot resurrect the key —
  replay converges regardless of arrival order.
- Idempotency: the manifest records ``last_batch_id``; merging a batch_id
  <= last committed is a no-op (streaming foreachBatch replays batches
  after a crash with the same batch_id).
- Commit atomicity: manifest written to a temp file then ``os.replace``-d,
  then ``_latest`` swapped the same way. A crash between data write and
  manifest swap leaves orphan files, never a torn table.
- ``_seq`` (the commit version that wrote each row) totally orders writers
  at equal lsn: a redelivered duplicate is identical anyway, and an update
  re-applied by replay wins over the base copy deterministically.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xgeo_spark.operators.dedup import lww_dedup_agg
from xgeo_spark.plans.schema_evolution import align_to_schema, evolve_schema
from xgeo_spark.sinks.base import LakeTable, MergeStats

_SYS_FIELDS = [
    T.StructField("_lsn", T.LongType(), True),
    T.StructField("_seq", T.LongType(), True),
    T.StructField("_deleted", T.BooleanType(), True),
]


def _bucket_expr(conv_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")


class ParquetLakeTable(LakeTable):
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------- manifest plumbing ----------

    def _latest_path(self) -> str:
        return os.path.join(self.root, "_latest")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_versions", f"v{version:012d}.json")

    def exists(self) -> bool:
        return os.path.exists(self._latest_path())

    def current_version(self) -> int:
        with open(self._latest_path()) as f:
            return int(f.read().strip())

    def manifest(self) -> dict:
        with open(self._manifest_path(self.current_version())) as f:
            return json.load(f)

    def _atomic_write(self, path: str, content: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _commit(self, manifest: dict) -> None:
        v = manifest["version"]
        self._atomic_write(self._manifest_path(v), json.dumps(manifest, indent=1))
        self._atomic_write(self._latest_path(), str(v))

    # ---------- schema ----------

    @property
    def user_schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest()["schema"]))

    def _physical_schema(self, user: T.StructType | None = None) -> T.StructType:
        user = user or self.user_schema
        return T.StructType(list(user.fields) + _SYS_FIELDS)

    # ---------- lifecycle ----------

    def create(
        self,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 64,
        mode: str = "mor",
    ) -> None:
        if self.exists():
            raise ValueError(f"table already exists at {self.root}")
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge mode: {mode}")
        manifest = {
            "version": 0,
            "schema": json.dumps(schema.jsonValue()),
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "mode": mode,
            "last_batch_id": None,
            "buckets": {},      # bucket -> base files
            "deltas": {},       # bucket -> delta files (mor only)
            "commits": [],
        }
        self._commit(manifest)

    def last_batch_id(self) -> int | None:
        return self.manifest().get("last_batch_id")

    # ---------- read ----------

    def _read_files(self, files: list[str], schema: T.StructType) -> DataFrame:
        paths = [os.path.join(self.root, f) for f in files]
        return self.spark.read.schema(schema).parquet(*paths)

    def _lww_reduce(self, df: DataFrame, key_cols: list[str]) -> DataFrame:
        """Reduce (base ∪ deltas) to the last writer per key. Total order:
        (_lsn, _seq) — partial hash aggregate, map-side combined."""
        payload = [c for c in df.columns if c not in key_cols]
        ord_key = F.struct(
            F.col("_lsn").alias("l"), F.coalesce(F.col("_seq"), F.lit(0)).alias("s")
        )
        return (
            df.groupBy(*key_cols)
            .agg(F.max_by(F.struct(*payload), ord_key).alias("_w"))
            .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
        )

    def read(self, include_system: bool = False, version: int | None = None) -> DataFrame:
        """Current table state; pass ``version`` for a time-travel read of
        any retained snapshot (Iceberg ``VERSION AS OF`` analogue)."""
        if version is None:
            m = self.manifest()
        else:
            path = self._manifest_path(version)
            if not os.path.exists(path):
                raise ValueError(
                    f"version {version} is not retained (expired or never existed)"
                )
            with open(path) as f:
                m = json.load(f)
        schema = self._physical_schema(
            T.StructType.fromJson(json.loads(m["schema"]))
        )
        base = [f for fl in m["buckets"].values() for f in fl]
        delta = [f for fl in (m.get("deltas") or {}).values() for f in fl]
        if not base and not delta:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self._read_files(base + delta, schema)
            if delta:
                df = self._lww_reduce(df, m["key_cols"])
        if include_system:
            return df
        return df.filter(~F.col("_deleted")).drop("_lsn", "_seq", "_deleted")

    # ---------- maintenance ----------

    def history(self) -> list[dict]:
        """Commit log of the current snapshot (most recent last)."""
        return list(self.manifest().get("commits") or [])

    def delta_depth(self) -> int:
        """Max number of delta files stacked on any bucket (mor read cost)."""
        m = self.manifest()
        deltas = m.get("deltas") or {}
        return max((len(v) for v in deltas.values()), default=0)

    def compact(self) -> MergeStats:
        """Fold all delta files into the base (mor -> read-optimized).

        Reads base+delta for every bucket that has deltas, LWW-reduces, and
        rewrites those buckets; buckets without deltas carry forward.
        Tombstones are RETAINED in the compacted base so late lower-lsn
        events still cannot resurrect deleted keys."""
        m = self.manifest()
        deltas: dict = m.get("deltas") or {}
        touched = sorted(int(b) for b, fl in deltas.items() if fl)
        if not touched:
            return MergeStats(batch_id=None, skipped=True, version=m["version"])
        key_cols = m["key_cols"]
        physical = self._physical_schema(
            T.StructType.fromJson(json.loads(m["schema"]))
        )
        files = [
            f
            for b in touched
            for f in (m["buckets"].get(str(b), []) + deltas.get(str(b), []))
        ]
        combined = self._read_files(files, physical).withColumn(
            "_bucket", _bucket_expr(key_cols[0], m["n_buckets"])
        )
        reduced = self._lww_reduce(combined, key_cols)

        version = m["version"] + 1
        new_buckets, out_dir = self._write_buckets(reduced, touched, version, m)
        new_manifest = dict(m)
        new_manifest["version"] = version
        new_manifest["buckets"] = new_buckets
        new_manifest["deltas"] = {
            b: [] if int(b) in set(touched) else fl for b, fl in deltas.items()
        }
        new_manifest["commits"] = (m.get("commits") or [])[-99:] + [
            {"compaction": True, "buckets_rewritten": touched}
        ]
        self._commit(new_manifest)
        return MergeStats(batch_id=None, version=version, buckets_touched=len(touched))

    def expire_versions(self, keep_last: int = 2) -> dict:
        """Snapshot expiry (Iceberg ``expire_snapshots`` analogue).

        Keeps the newest ``keep_last`` manifests; deletes older manifests
        and any data file no retained manifest references. Safe order:
        manifests are removed BEFORE their now-orphaned data files, so a
        crash mid-expiry never leaves a retained manifest pointing at
        deleted data."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        current = self.current_version()
        vdir = os.path.join(self.root, "_versions")
        versions = sorted(
            int(fn[1:-5]) for fn in os.listdir(vdir)
            if fn.startswith("v") and fn.endswith(".json")
        )
        keep = [v for v in versions if v > current - keep_last]
        drop = [v for v in versions if v <= current - keep_last]

        referenced: set[str] = set()
        for v in keep:
            with open(self._manifest_path(v)) as f:
                mv = json.load(f)
            for coll in (mv["buckets"], mv.get("deltas") or {}):
                for fl in coll.values():
                    referenced.update(fl)

        for v in drop:
            os.remove(self._manifest_path(v))

        removed_files = 0
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
                for fn in filenames:
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, self.root)
                    if fn.endswith(".parquet") and rel not in referenced:
                        os.remove(full)
                        removed_files += 1
                if not os.listdir(dirpath):
                    os.rmdir(dirpath)
        return {
            "versions_expired": drop,
            "versions_kept": keep,
            "data_files_removed": removed_files,
        }

    # ---------- merge ----------

    def _write_buckets(
        self, df: DataFrame, touched: list[int], version: int, m: dict
    ) -> tuple[dict, str]:
        """Write df (must carry _bucket) partitioned by bucket under the
        version dir; return (updated bucket->files map, out_dir)."""
        out_dir = os.path.join(self.root, "data", f"v{version:012d}")
        (
            df.repartition(max(len(touched), 1), "_bucket")
            .sortWithinPartitions(*m["key_cols"])
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out_dir)
        )
        new_buckets = dict(m["buckets"])
        rel_out = os.path.relpath(out_dir, self.root)
        for b in touched:
            bdir = os.path.join(out_dir, f"_bucket={b}")
            files = (
                sorted(
                    os.path.join(rel_out, f"_bucket={b}", fn)
                    for fn in os.listdir(bdir)
                    if fn.endswith(".parquet")
                )
                if os.path.isdir(bdir)
                else []
            )
            new_buckets[str(b)] = files
        return new_buckets, out_dir

    def merge(
        self,
        updates: DataFrame,
        batch_id: int | None = None,
        offset_range: tuple[int, int] | None = None,
        touched_buckets: list[int] | None = None,
        stats_hints: dict | None = None,
    ) -> MergeStats:
        m = self.manifest()
        last = m.get("last_batch_id")
        if batch_id is not None and last is not None and batch_id <= last:
            return MergeStats(batch_id=batch_id, skipped=True, version=m["version"])

        key_cols: list[str] = m["key_cols"]
        n_buckets: int = m["n_buckets"]
        mode: str = m.get("mode", "cow")
        old_user = T.StructType.fromJson(json.loads(m["schema"]))
        version = m["version"] + 1

        # 1. schema evolution: diff batch payload vs table, widen/add
        payload_fields = [
            f for f in updates.schema.fields
            if f.name not in ("op", "lsn", "offset", "schema_version")
        ]
        new_user = evolve_schema(old_user, T.StructType(payload_fields))
        schema_changed = new_user != old_user
        physical = self._physical_schema(new_user)

        # 2. in-batch LWW dedup (map-side partial agg; see operators/dedup.py)
        deduped = lww_dedup_agg(updates, key_cols, "lsn", "ts")
        # shape to the evolved physical schema: missing columns -> typed
        # nulls, narrower batch types -> widened casts
        shaped = deduped.select(
            *[
                (F.col(f.name) if f.name in deduped.columns else F.lit(None))
                .cast(f.dataType)
                .alias(f.name)
                for f in new_user.fields
            ],
            F.col("lsn").cast("long").alias("_lsn"),
            F.lit(version).cast("long").alias("_seq"),
            (F.col("op") == F.lit("D")).alias("_deleted"),
        )
        conv_key = key_cols[0]
        shaped = shaped.withColumn("_bucket", _bucket_expr(conv_key, n_buckets))

        # batch-level row counts: taken from the pipeline's pre-aggregation
        # hints when present (zero extra work); else one small agg here.
        # NOTE: Observation.get deadlocks inside streaming foreachBatch
        # (listener events never fire for those jobs), so counts must NOT
        # ride on observe() in this code path.
        if stats_hints is None:
            hint_row = shaped.agg(
                F.count(F.lit(1)).alias("rows_in"),
                F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("deletes_in"),
            ).collect()[0]
            stats_hints = {
                "rows_in": hint_row["rows_in"] or 0,
                "deletes_in": hint_row["deletes_in"] or 0,
            }

        # 3. touched buckets: bounded-size collect (<= n_buckets ints);
        #    the pipeline passes this as a hint computed inside its single
        #    lineage pre-aggregation pass, saving a job
        if touched_buckets is not None:
            touched = sorted(touched_buckets)
        else:
            touched = sorted(
                r[0] for r in shaped.select("_bucket").distinct().collect()
            )
        if not touched:
            new_manifest = dict(m)
            new_manifest["version"] = version
            new_manifest["last_batch_id"] = batch_id if batch_id is not None else last
            self._commit(new_manifest)
            return MergeStats(batch_id=batch_id, version=version)

        if mode == "mor":
            # 4m. append the deduped batch as delta files — O(batch) write,
            # no read of existing data at all
            out_dir = os.path.join(self.root, "data", f"v{version:012d}")
            (
                shaped.repartition(max(len(touched), 1), "_bucket")
                .sortWithinPartitions(*key_cols)
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(out_dir)
            )
            rel_out = os.path.relpath(out_dir, self.root)
            new_deltas = {b: list(fl) for b, fl in (m.get("deltas") or {}).items()}
            for b in touched:
                bdir = os.path.join(out_dir, f"_bucket={b}")
                files = (
                    sorted(
                        os.path.join(rel_out, f"_bucket={b}", fn)
                        for fn in os.listdir(bdir)
                        if fn.endswith(".parquet")
                    )
                    if os.path.isdir(bdir)
                    else []
                )
                new_deltas.setdefault(str(b), [])
                new_deltas[str(b)].extend(files)
            new_buckets = dict(m["buckets"])
        else:
            # 4c. copy-on-write: read ONLY touched buckets, reduce, rewrite
            old_physical = self._physical_schema(old_user)
            touched_files = [
                f
                for b in touched
                for f in (
                    m["buckets"].get(str(b), [])
                    + (m.get("deltas") or {}).get(str(b), [])
                )
            ]
            if touched_files:
                target = self._read_files(touched_files, old_physical)
                target = align_to_schema(target, physical)
                target = target.withColumn("_bucket", _bucket_expr(conv_key, n_buckets))
                combined = target.unionByName(shaped)
            else:
                combined = shaped
            final = self._lww_reduce(combined, key_cols)
            new_buckets, _ = self._write_buckets(final, touched, version, m)
            new_deltas = m.get("deltas") or {}

        commit_info = {
            "batch_id": batch_id,
            "offset_range": list(offset_range) if offset_range else None,
            "buckets_rewritten": touched,
            "rows_in": int(stats_hints.get("rows_in", 0) or 0),
            "deletes_in": int(stats_hints.get("deletes_in", 0) or 0),
            "schema_changed": schema_changed,
        }
        new_manifest = {
            "version": version,
            "schema": json.dumps(new_user.jsonValue()),
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "mode": mode,
            "last_batch_id": batch_id if batch_id is not None else last,
            "buckets": new_buckets,
            "deltas": new_deltas,
            "commits": (m.get("commits") or [])[-99:] + [commit_info],
        }
        self._commit(new_manifest)

        deletes_in = int(stats_hints.get("deletes_in", 0) or 0)
        return MergeStats(
            batch_id=batch_id,
            version=version,
            rows_upserted=int(stats_hints.get("rows_in", 0) or 0) - deletes_in,
            rows_deleted=deletes_in,
            buckets_touched=len(touched),
            offset_range=offset_range,
            schema_changed=schema_changed,
        )
