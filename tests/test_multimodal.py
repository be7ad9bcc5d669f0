"""Multimodal binary-column plumbing: schema contract, batch decode shape,
frame-sample fan-out, corrupt-payload handling."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from xgeo_spark.functions.multimodal import (
    DECODED_SCHEMA,
    decode_images,
    fake_image_bytes,
    frame_sample_plan,
    synthesize_media_table,
)


def test_decode_schema_and_values(spark):
    media = synthesize_media_table(spark, n=30)
    out = decode_images(media)
    assert out.schema == DECODED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    for mid, r in rows.items():
        assert r["decode_ok"] is True
        assert r["n_bytes"] >= 16
        assert r["sha256"] is not None and len(r["sha256"]) == 64
        assert 0.0 <= r["mean_intensity"] <= 255.0
    # determinism: same media_id -> same bytes -> same hash
    again = {r["media_id"]: r["sha256"] for r in decode_images(media).collect()}
    assert again == {k: v["sha256"] for k, v in rows.items()}


def test_decode_handles_corrupt_payload(spark):
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(0, bytearray(b"notmagic" * 4)), (1, bytearray(b"x")),
         (2, bytearray(fake_image_bytes(2, 4, 4)))],
        schema,
    )
    got = {r["media_id"]: r["decode_ok"] for r in decode_images(df).collect()}
    assert got == {0: False, 1: False, 2: True}


def test_frame_sample_plan(spark):
    media = synthesize_media_table(spark, n=30)
    frames = frame_sample_plan(media, every_n=10)
    pdf = frames.toPandas()
    metas = {
        r["media_id"]: r["nf"]
        for r in media.select("media_id", F.col("meta.n_frames").alias("nf")).collect()
        if r["nf"] is not None
    }
    assert set(pdf["media_id"]) == set(metas)
    for mid, nf in metas.items():
        want = len(range(0, nf, 10))
        assert (pdf["media_id"] == mid).sum() == want
