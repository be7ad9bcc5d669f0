"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The task brief's pattern for a 100 TB training-data pipeline: media rides as
an opaque ``binary`` column with a typed metadata struct alongside; all
decode / feature-extract / resize / frame-sample steps run as Arrow-batched
functions over ``mapInPandas`` so each Python worker sees whole record
batches (never row-at-a-time) and output columns get real Spark types.

The container has no imaging/audio libs, so the actual codec step is
STUBBED: ``decode_image_stub`` parses a deterministic fake header (our own
16-byte format, see ``fake_image_bytes``) instead of libjpeg. Everything
around it — schema contracts, batch iteration shape, partition sizing,
metadata projection — is real and tested; swapping in a real decoder
changes only the marked inner function.

Reference analogue: this is the same many-encodings -> one-canonical-shape
normalization xgeo does for geometry (/root/reference/io/shp.go:48-72),
applied to media payloads.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"XIMG"

# metadata struct carried alongside every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image|audio|video
        T.StructField("format", T.StringType(), True),        # fake codec name
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def fake_image_bytes(media_id: int, width: int, height: int) -> bytes:
    """Deterministic stand-in for an encoded image: 16-byte header
    (magic, w, h) + seeded pseudo-pixel payload."""
    header = _MAGIC + struct.pack("<iiI", width, height, media_id & 0xFFFFFFFF)
    rng = np.random.default_rng(media_id)
    body = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8)
    return header + body.tobytes()


def _decode_one(buf: bytes) -> tuple[int | None, int | None, float | None, bool]:
    """THE STUB: replace this with PIL/libjpeg when available.

    Parses the fake header and computes mean pixel intensity over the body.
    """
    if buf is None or len(buf) < 16 or buf[:4] != _MAGIC:
        return None, None, None, False
    w, h, _seed = struct.unpack("<iiI", buf[4:16])
    body = np.frombuffer(buf[16:], dtype=np.uint8)
    mean = float(body.mean()) if body.size else 0.0
    return w, h, round(mean, 4), True


def decode_images(df: DataFrame, id_col: str = "media_id",
                  data_col: str = "data") -> DataFrame:
    """mapInPandas decode: binary column -> typed feature columns.

    The batch shape is the real thing: one pandas DataFrame per Arrow batch,
    vectorized hashing/size JVM-independent work in numpy/pandas, typed
    output per DECODED_SCHEMA.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bufs = pdf[data_col]
            decoded = [_decode_one(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": pd.array([d[0] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "n_bytes": bufs.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": bufs.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "mean_intensity": pd.array([d[2] for d in decoded], dtype="float64"),
                    "decode_ok": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, data_col).mapInPandas(batches, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10,
                      meta_col: str = "meta") -> DataFrame:
    """Video frame-sampling *plan*: expand (media_id, n_frames) into one row
    per sampled frame index — pure JVM-side sequence/explode; the per-frame
    decode would be a decode_images-style mapInPandas over (media_id,
    frame_idx). Demonstrates the fan-out side of multimodal pipelines."""
    n_frames = F.col(f"{meta_col}.n_frames")
    idxs = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        df.filter(F.col(f"{meta_col}.media_type") == "video")
        .select("media_id", F.explode(idxs).alias("frame_idx"))
    )


def synthesize_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/queries: binary payload + typed
    metadata struct. Built driver-side (small n) — at scale this column
    arrives from the lake, not from synthesis."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w = int(rng.integers(16, 256)) if kind != "audio" else None
        h = int(rng.integers(16, 256)) if kind != "audio" else None
        nf = int(rng.integers(24, 240)) if kind == "video" else None
        sr = 16000 if kind == "audio" else None
        data = fake_image_bytes(i, w or 8, h or 8)
        rows.append((i, data, (kind, "ximg", w, h, nf, sr)))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META_SCHEMA, True),
        ]
    )
    return spark.createDataFrame(rows, schema)
