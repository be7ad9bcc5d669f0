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

Scale design:
- The table is hash-bucketed on the key's conv_id (``pmod(xxhash64(conv_id),
  n_buckets)``) — the moral equivalent of Iceberg's ``bucket(N, conv_id)``
  hidden partitioning. A merge rewrites ONLY the buckets its batch touches
  (copy-on-write at bucket granularity); untouched buckets are carried
  forward by manifest reference, zero data movement. At 100 TB you raise
  ``n_buckets`` (e.g. 4096) so each rewrite unit stays executor-sized.
- Deletes are tombstones (``_deleted`` + ``_lsn`` retained), so a late,
  lower-lsn update arriving AFTER a delete cannot resurrect the key —
  replay converges regardless of arrival order.
- Idempotency: the manifest records ``last_batch_id``; merging a batch_id
  <= last committed is a no-op (streaming foreachBatch replays batches
  after a crash with the same batch_id).
- Commit atomicity: manifest written to a temp file then ``os.replace``-d,
  then ``_latest`` swapped the same way. A crash between data write and
  manifest swap leaves orphan files, never a torn table.
- Per-batch row metrics ride on ``DataFrame.observe`` — no extra pass over
  the data.
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

    def create(self, schema: T.StructType, key_cols: list[str], n_buckets: int = 64) -> None:
        if self.exists():
            raise ValueError(f"table already exists at {self.root}")
        manifest = {
            "version": 0,
            "schema": json.dumps(schema.jsonValue()),
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "last_batch_id": None,
            "buckets": {},
            "commits": [],
        }
        self._commit(manifest)

    def last_batch_id(self) -> int | None:
        return self.manifest().get("last_batch_id")

    # ---------- read ----------

    def _read_files(self, files: list[str], schema: T.StructType) -> DataFrame:
        paths = [os.path.join(self.root, f) for f in files]
        return self.spark.read.schema(schema).parquet(*paths)

    def read(self, include_system: bool = False) -> DataFrame:
        m = self.manifest()
        schema = self._physical_schema(
            T.StructType.fromJson(json.loads(m["schema"]))
        )
        files = [f for fl in m["buckets"].values() for f in fl]
        if not files:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self._read_files(files, schema)
        if include_system:
            return df
        return df.filter(~F.col("_deleted")).drop("_lsn", "_deleted")

    # ---------- merge ----------

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
        old_user = T.StructType.fromJson(json.loads(m["schema"]))

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
            new_manifest["version"] = m["version"] + 1
            new_manifest["last_batch_id"] = batch_id if batch_id is not None else last
            self._commit(new_manifest)
            return MergeStats(batch_id=batch_id, version=new_manifest["version"])

        # 4. read ONLY touched buckets of the current table
        old_physical = self._physical_schema(old_user)
        touched_files = [
            f for b in touched for f in m["buckets"].get(str(b), [])
        ]
        if touched_files:
            target = self._read_files(touched_files, old_physical)
            target = align_to_schema(target, T.StructType(
                [f for f in physical.fields]
            ))
            target = target.withColumn("_bucket", _bucket_expr(conv_key, n_buckets))
            # updates win lsn ties (equal lsn == duplicate redelivery)
            combined = target.withColumn("_src", F.lit(0)).unionByName(
                shaped.withColumn("_src", F.lit(1))
            )
        else:
            combined = shaped.withColumn("_src", F.lit(1))

        # 5. final LWW reduce across (existing ∪ incoming)
        payload_cols = [c for c in combined.columns if c not in key_cols]
        ord_key = F.struct(F.col("_lsn").alias("l"), F.col("_src").alias("s"))
        final = (
            combined.groupBy(*key_cols)
            .agg(F.max_by(F.struct(*payload_cols), ord_key).alias("_w"))
            .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload_cols])
            .drop("_src")
        )

        # 6. write touched buckets for the new version (one file per bucket
        #    partition at local scale; AQE coalesces small ones)
        version = m["version"] + 1
        out_dir = os.path.join(self.root, "data", f"v{version:012d}")
        (
            final.repartition(max(len(touched), 1), "_bucket")
            .sortWithinPartitions(*key_cols)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out_dir)
        )

        # 7. new manifest: rewritten buckets point at fresh files, untouched
        #    buckets carried forward by reference
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
            "last_batch_id": batch_id if batch_id is not None else last,
            "buckets": new_buckets,
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
