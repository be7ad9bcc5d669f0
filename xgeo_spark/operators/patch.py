"""Partial-image (patch) resolution: op 'P' events set only their non-null
columns ("null means unchanged" — the partial-image shape of WAL/binlog
feeds and upsert stores; a full image is required to SET a column to null).

The lake's row-level LWW machinery (one winning row per key by (_lsn,_seq))
is deliberately untouched: patches are squashed into full images AT INGEST
by a read-modify-write against the current table — so every downstream
property (merge-on-read resolution, time travel, table_changes, compaction)
keeps working on whole rows.

Per micro-batch, for the keys that have patches:

1. read the CURRENT row for those keys — bucket-pruned
   (``ParquetLakeTable.read_buckets``): only the buckets the patch keys
   hash to are planned, ~|touched buckets|/n_buckets of the table;
2. union it (as a full image at its stored _lsn) with ALL of the batch's
   events for those keys;
3. fold per key in lsn order, entirely with expressions: the latest full
   image resets every column, later patches override their non-null
   columns (per-column ``max_by(col, lsn-where-set)``), a trailing delete
   wins as a delete, and patches after a delete re-create a partial row;
4. emit the folded rows as plain full-image events, unioned with the
   untouched non-patch keys' events, into the normal merge.

Ordering contract: within a batch any arrival order is fine (the fold is
by lsn, not arrival). ACROSS batches the feed must not deliver a key's
full image in a later batch with a LOWER lsn than an already-applied patch
— that needs per-column versions, which no row-LWW store has; WAL/binlog
segments are lsn-ordered across files, so the contract holds for the
feeds this engine tails (and for stale PATCHES arriving late, the lsn
guard in step 3 discards them correctly).

Reference provenance: the reference engine has no update semantics at all
(append-only NDJSON sink, /root/reference/cmd/xgeo/main.go:53-62); this is
target-engine surface per SURVEY.md §2.4 (upsert/delete apply), extended
to the partial-image case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NON_PAYLOAD = ("op", "lsn", "offset", "schema_version")


def resolve_patches(
    batch: DataFrame, table, key_cols: list[str]
) -> DataFrame:
    """Squash the batch's 'P' events into full images (see module doc).

    Returns an op-I/U/D-only DataFrame safe for the standard LWW merge.
    When the batch carries no patches the folded slice is empty and the
    batch passes through unchanged (the split joins still plan, against
    an empty broadcast — that residual cost is why the pipeline gates
    this behind ``IngestConfig.enable_patches``).
    """
    patch_keys = (
        batch.filter(F.col("op") == "P").select(*key_cols).distinct()
    )
    # patch keys per batch are a small fraction of the key space; the
    # semi/anti split below broadcasts them so the batch is not shuffled
    keys_b = F.broadcast(patch_keys)
    touched = batch.join(keys_b, key_cols, "left_semi")
    others = batch.join(keys_b, key_cols, "left_anti")

    base = _current_rows_for(table, patch_keys, key_cols)
    if base is not None:
        base_evs = base.join(keys_b, key_cols, "left_semi").select(
            *key_cols,
            F.col("_lsn").alias("lsn"),
            F.lit(None).cast("long").alias("offset"),
            F.lit("U").alias("op"),
            F.lit(None).cast("int").alias("schema_version"),
            *[F.col(c) for c in base.columns if c not in key_cols and not c.startswith("_")],
        )
        evs = touched.unionByName(base_evs, allowMissingColumns=True)
    else:
        evs = touched
    all_payload = [
        c for c in evs.columns if c not in NON_PAYLOAD and c not in key_cols
    ]

    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    # the latest FULL image per key (table row counts as one); patches at
    # or below it are stale/duplicate redeliveries and are discarded
    evs = evs.withColumn(
        "_lf", F.max(F.when(F.col("op") != "P", F.col("lsn"))).over(w)
    )
    live = evs.filter(
        ((F.col("op") != "P") & (F.col("lsn") == F.col("_lf")))
        | (
            (F.col("op") == "P")
            & (F.col("_lf").isNull() | (F.col("lsn") > F.col("_lf")))
        )
    )
    # per-column LWW: value from the max-lsn live row that SET the column
    # (full images set every column, patches only their non-null ones)
    folded = live.groupBy(*key_cols).agg(
        F.max("lsn").alias("lsn"),
        F.max("offset").alias("offset"),
        F.max("schema_version").alias("schema_version"),
        F.max_by("op", F.col("lsn")).alias("_last_op"),
        *[
            F.max_by(
                F.col(c),
                F.when(
                    (F.col("op") != "P") | F.col(c).isNotNull(), F.col("lsn")
                ),
            ).alias(c)
            for c in all_payload
        ],
    )
    resolved = folded.select(
        F.when(F.col("_last_op") == "D", "D").otherwise("U").alias("op"),
        "lsn",
        "offset",
        "schema_version",
        *key_cols,
        *all_payload,
    )
    return resolved.unionByName(others, allowMissingColumns=True)


def _current_rows_for(table, patch_keys: DataFrame, key_cols: list[str]):
    """Current live rows (with ``_lsn``) for the patch keys, bucket-pruned
    when the sink supports it; None when the table holds no data yet (or
    ``table`` is None — the pure in-batch fold, for single-batch use)."""
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

    if table is None:
        return None
    if isinstance(table, ParquetLakeTable):
        if not table.exists():
            return None
        m = table.manifest()
        if not m["buckets"] and not (m.get("deltas") or {}):
            return None
        import json

        from pyspark.sql import types as T

        # cast the probe key to the TABLE's key type before hashing:
        # xxhash64(int) != xxhash64(long) for the same value, so a batch
        # whose key dtype differs from the manifest schema would probe the
        # wrong buckets and silently fold against an "absent" base row
        # (same hazard ParquetLakeTable.lookup guards against).
        user = T.StructType.fromJson(json.loads(m["schema"]))
        key_type = next(
            f.dataType for f in user.fields if f.name == key_cols[0]
        )
        bids = [
            r["b"]
            for r in patch_keys.select(
                F.pmod(
                    F.xxhash64(F.col(key_cols[0]).cast(key_type)),
                    F.lit(m["n_buckets"]),
                )
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        ]
        if not bids:
            return None
        cur = table.read_buckets(bids, include_system=True)
    else:
        cur = table.read(include_system=True)
    return cur.filter(~F.col("_deleted")).drop("_seq", "_deleted")
