"""Geodesic scalar library vs known published values (SURVEY.md §2.2)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xgeo_spark.functions.geo import (
    bound_of_points,
    haversine_m,
    initial_bearing_deg,
    linestring_length_m,
    midpoint,
    olc_decode_center,
    olc_encode10,
    ring_area_m2,
)

PARIS = (48.8566, 2.3522)
LONDON = (51.5074, -0.1278)


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [(PARIS[0], PARIS[1], LONDON[0], LONDON[1])],
        ["lat1", "lon1", "lat2", "lon2"],
    )


def test_haversine_known_distance(pair_df):
    d = pair_df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).first()["d"]
    assert d == pytest.approx(343_500, rel=0.01)  # Paris-London ~343.5 km


def test_haversine_zero_and_symmetry(pair_df):
    r = pair_df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")).alias("z"),
        (
            haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
            - haversine_m(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1"))
        ).alias("asym"),
    ).first()
    assert r["z"] == 0.0
    assert abs(r["asym"]) < 1e-6


def test_bearing_and_midpoint(pair_df):
    r = pair_df.select(
        initial_bearing_deg(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("b"),
        midpoint(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("m"),
    ).first()
    # Paris -> London initial bearing ≈ 330°
    assert r["b"] == pytest.approx(330, abs=2)
    assert r["m"]["lat"] == pytest.approx(50.2, abs=0.2)
    assert r["m"]["lon"] == pytest.approx(1.1, abs=0.3)


def _pts(spark, pts):
    schema = T.ArrayType(
        T.StructType([T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())])
    )
    return spark.createDataFrame(
        [([{"lon": p[0], "lat": p[1]} for p in pts],)],
        T.StructType([T.StructField("points", schema)]),
    )


def test_linestring_length_and_bounds(spark):
    # 1 degree of latitude ≈ 111.2 km; two stacked segments
    df = _pts(spark, [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0)])
    r = df.select(
        linestring_length_m(F.col("points")).alias("len"),
        bound_of_points(F.col("points")).alias("bb"),
    ).first()
    assert r["len"] == pytest.approx(2 * 111_195, rel=0.005)
    assert (r["bb"]["min_lon"], r["bb"]["min_lat"], r["bb"]["max_lon"], r["bb"]["max_lat"]) == (
        0.0, 0.0, 0.0, 2.0,
    )
    empty = _pts(spark, [(5.0, 5.0)])
    assert empty.select(linestring_length_m(F.col("points")).alias("l")).first()["l"] == 0.0


def test_ring_area_equator_square(spark):
    # 1°x1° ring at the equator ≈ 111.19 km x 111.19 km
    df = _pts(spark, [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    a = df.select(ring_area_m2(F.col("points")).alias("a")).first()["a"]
    assert a == pytest.approx(111_195**2, rel=0.01)
    # degenerate ring -> null
    deg = _pts(spark, [(0.0, 0.0), (1.0, 0.0)])
    assert deg.select(ring_area_m2(F.col("points")).alias("a")).first()["a"] is None


def test_olc_encode_known_value(spark):
    # published example from the Open Location Code docs
    df = spark.createDataFrame([(47.365590, 8.524997)], ["lat", "lon"])
    code = df.select(olc_encode10(F.col("lat"), F.col("lon")).alias("c")).first()["c"]
    assert code == "8FVC9G8F+6X"


def test_olc_roundtrip(spark):
    rows = [(47.365590, 8.524997), (-33.8688, 151.2093), (0.0, 0.0), (89.9999, 179.9999)]
    df = spark.createDataFrame(rows, ["lat", "lon"])
    out = df.select(
        "lat", "lon",
        olc_decode_center(olc_encode10(F.col("lat"), F.col("lon"))).alias("d"),
    ).collect()
    for r in out:
        # cell is 1/8000 deg; center within half-cell of the input
        assert r["d"]["lat"] == pytest.approx(r["lat"], abs=1.01 / 16000)
        assert r["d"]["lon"] == pytest.approx(r["lon"], abs=1.01 / 16000)


def test_olc_decode_garbage(spark):
    df = spark.createDataFrame([("nope",), (None,)], ["c"])
    for r in df.select(olc_decode_center(F.col("c")).alias("d")).collect():
        assert r["d"]["lat"] is None and r["d"]["lon"] is None
