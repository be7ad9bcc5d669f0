"""Change-feed source: offset-ordered event files -> canonical event rows.

This is the target-engine analogue of the reference's whole reader layer:

- suffix dispatch (.jsonl / .jsonl.gz / .jsonl.bz2 / .parquet) mirrors
  /root/reference/cmd/xgeo/main.go:25-40 (".zip/.shp -> shapefile, .gz/.bz2
  unwrap, else geojson");
- compressed NDJSON is decoded transparently by Spark's file source codecs,
  the built-in equivalent of main.go:29-36's gzip/bzip2 wrappers;
- heterogeneous wire encodings are normalized to ONE canonical event shape
  (CHANGE_EVENT_SCHEMA), the analogue of io/shp.go:39-44 normalizing every
  source into the one GeoJSON-Feature record;
- malformed records are quarantined, not fatal — the analogue of the
  nil-record filter at main.go:54-56, upgraded from "drop silently" to
  "count and keep" (mode=PERMISSIVE + _corrupt capture).

Events with op codes from other CDC dialects (Debezium c/u/d/r,
spelled-out INSERT/UPDATE/DELETE) are canonicalized to I/U/D with a
built-in column expression — no Python in the decode hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical (union, post-evolution) event schema. v1 files simply lack
# tool_meta and carry narrower turn_idx — both are absorbed at decode time.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("offset", T.LongType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("tool_meta", T.StringType(), True),
        T.StructField("_corrupt", T.StringType(), True),
    ]
)

def _op_canon():
    return (
        F.when(F.upper(F.col("op")).isin("I", "C", "R", "INSERT", "CREATE", "READ"), "I")
        .when(F.upper(F.col("op")).isin("U", "UPDATE"), "U")
        .when(F.upper(F.col("op")).isin("D", "DELETE"), "D")
        .when(F.upper(F.col("op")).isin("P", "PATCH"), "P")
        .otherwise(F.lit(None))
    )


def _canonicalize(df: DataFrame) -> DataFrame:
    # canonical op lands in _op; the original wire value stays in `op` so
    # quarantined records keep their raw payload for the audit trail
    return df.withColumn("_op", _op_canon())


class ChangeFeedSource:
    """Reads a directory of offset-ordered change-event files.

    ``read_batch`` for bounded replay/tests, ``read_stream`` for the
    Structured Streaming tail (file source tracks processed files in the
    checkpoint, the binlog-position analogue).
    """

    def __init__(self, spark: SparkSession, feed_dir: str):
        self.spark = spark
        self.feed_dir = feed_dir

    # -- format dispatch (reference parity: suffix tests, main.go:25-40) --

    def _formats_present(self) -> set[str]:
        fmts = set()
        for fn in os.listdir(self.feed_dir):
            if fn.endswith(
                (".jsonl", ".jsonl.gz", ".jsonl.bz2", ".json", ".json.gz", ".json.bz2")
            ):
                fmts.add("json")
            elif fn.endswith(".parquet"):
                fmts.add("parquet")
        return fmts

    def read_batch(self, paths: list[str] | None = None) -> DataFrame:
        fmts = self._formats_present()
        srcs = []
        if paths is not None:
            json_paths = [p for p in paths if ".json" in os.path.basename(p)]
            pq_paths = [p for p in paths if p.endswith(".parquet")]
            if json_paths:
                srcs.append(self._read_json(json_paths))
            if pq_paths:
                srcs.append(self._read_parquet(pq_paths))
        else:
            if "json" in fmts:
                srcs.append(self._read_json([self.feed_dir]))
            if "parquet" in fmts:
                srcs.append(self._read_parquet([os.path.join(self.feed_dir, "*.parquet")]))
        if not srcs:
            return self.spark.createDataFrame([], CHANGE_EVENT_SCHEMA)
        out = srcs[0]
        for s in srcs[1:]:
            out = out.unionByName(s)
        return out

    def _read_json(self, paths: list[str]) -> DataFrame:
        df = (
            self.spark.read.schema(CHANGE_EVENT_SCHEMA)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .json(paths)
        )
        return _canonicalize(df)

    def _read_parquet(self, paths: list[str]) -> DataFrame:
        # Parquet wire variant: v1 files store turn_idx int32 / no tool_meta;
        # the explicit union schema upcasts at scan time (Spark 4 parquet
        # readers support widening type promotion).
        schema = T.StructType([f for f in CHANGE_EVENT_SCHEMA.fields if f.name != "_corrupt"])
        df = self.spark.read.schema(schema).parquet(*paths)
        return _canonicalize(df.withColumn("_corrupt", F.lit(None).cast("string")))

    def read_stream(self, max_files_per_trigger: int = 4) -> DataFrame:
        fmts = self._formats_present()
        fmt = "parquet" if fmts == {"parquet"} else "json"
        reader = (
            self.spark.readStream.schema(
                T.StructType([f for f in CHANGE_EVENT_SCHEMA.fields if f.name != "_corrupt"])
            )
            .option("maxFilesPerTrigger", max_files_per_trigger)
            # offset-ordered file names ARE the binlog order; process oldest
            # first so commit order tracks feed order
            .option("latestFirst", "false")
        )
        if fmt == "json":
            reader = reader.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            glob = os.path.join(self.feed_dir, "*.jsonl*")
            df = reader.json(glob)
        else:
            df = reader.parquet(os.path.join(self.feed_dir, "*.parquet"))
        return _canonicalize(df.withColumn("_corrupt", F.lit(None).cast("string")))

    @staticmethod
    def split_good_bad(
        df: DataFrame, allow_patches: bool = True
    ) -> tuple[DataFrame, DataFrame]:
        """Quarantine split: rows that failed decode or op-canonicalization.

        ``allow_patches=False`` routes op-'P' partial images to quarantine
        exactly like any unrecognized dialect (raw op preserved for
        reprocessing): a consumer that has not opted into patch semantics
        must never merge a partial image as a full row — that would null
        every unset column — and must not lose the record either."""
        if not allow_patches:
            df = df.withColumn(
                "_op",
                F.when(F.col("_op") == "P", F.lit(None).cast("string"))
                .otherwise(F.col("_op")),
            )
        bad = df.filter(
            F.col("_corrupt").isNotNull() | F.col("_op").isNull()
            | F.col("conv_id").isNull() | F.col("lsn").isNull()
        ).drop("_op")
        good = (
            df.filter(
                F.col("_corrupt").isNull() & F.col("_op").isNotNull()
                & F.col("conv_id").isNotNull() & F.col("lsn").isNotNull()
            )
            .withColumn("op", F.col("_op"))
            .drop("_corrupt", "_op")
        )
        return good, bad
