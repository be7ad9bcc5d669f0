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


def _olc_spec_encode(lat: float, lon: float, n: int) -> str:
    """Independent pure-int restatement of the public OLC spec (pair digits
    base-20, grid digits row*4+col on a 5x4 grid) — the differential oracle
    for olc_encode."""
    alpha = "23456789CFGHJMPQRVWX"
    lat = min(max(lat, -90.0), 90.0)
    lon = ((lon + 180.0) % 360.0) - 180.0
    import math

    la = min(int(math.floor((lat + 90.0) * 8000 * 5**5)), 180 * 8000 * 5**5 - 1)
    lo = min(int(math.floor((lon + 180.0) * 8000 * 4**5)), 360 * 8000 * 4**5 - 1)
    grid = ""
    for _ in range(5):
        grid = alpha[(la % 5) * 4 + (lo % 4)] + grid
        la //= 5
        lo //= 4
    pairs = ""
    for i in range(5):
        shift = 20 ** (4 - i)
        pairs += alpha[(la // shift) % 20] + alpha[(lo // shift) % 20]
    full = pairs[:8] + "+" + pairs[8:] + grid
    return full[: n + 1]


def test_olc_grid_refinement_differential(spark):
    """olc_encode at 10-15 digits vs an independent spec restatement, over
    coordinates spanning hemispheres, the antimeridian wrap, and the
    lat-clamp edge."""
    from xgeo_spark.functions.geo import olc_encode

    import random

    rng = random.Random(7)
    pts = [(rng.uniform(-90, 90), rng.uniform(-180, 180)) for _ in range(40)]
    pts += [(90.0, 0.0), (-90.0, 0.0), (0.0, 179.99999), (0.0, -180.0),
            (47.365590, 8.524997), (20.3701125, 2.782234375)]
    rows = [(la, lo, n) for la, lo in pts for n in range(10, 16)]
    df = spark.createDataFrame(rows, ["lat", "lon", "n"])
    got = df.select(
        "lat", "lon", "n",
        olc_encode(F.col("lat"), F.col("lon"), F.col("n")).alias("code"),
    ).collect()
    for r in got:
        assert r["code"] == _olc_spec_encode(r["lat"], r["lon"], r["n"]), (
            r["lat"], r["lon"], r["n"])


def test_olc_grid_encode_properties(spark):
    """Length-10 output equals olc_encode10; longer codes extend shorter
    ones (prefix property); decode center lands within half the final
    cell at every length."""
    from xgeo_spark.functions.geo import olc_encode

    pts = [(47.365590, 8.524997), (-33.8688, 151.2093), (0.0, 0.0),
           (89.9999, 179.9999), (-0.000001, -0.000001)]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    cols = {f"c{n}": olc_encode(F.col("lat"), F.col("lon"), F.lit(n))
            for n in range(10, 16)}
    out = df.select("lat", "lon", olc_encode10("lat", "lon").alias("c"),
                    *[v.alias(k) for k, v in cols.items()]).collect()
    for r in out:
        assert r["c10"] == r["c"]
        for n in range(10, 15):
            assert r[f"c{n+1}"].startswith(r[f"c{n}"])
    dec = df.select(
        "lat", "lon",
        olc_decode_center(
            olc_encode(F.col("lat"), F.col("lon"), F.lit(12))
        ).alias("d"),
    ).collect()
    for r in dec:
        # 12-digit cell: lat 1/(8000*25), lon 1/(8000*16) degrees
        assert r["d"]["lat"] == pytest.approx(
            min(max(r["lat"], -90.0), 90.0), abs=0.51 / (8000 * 25))
        assert r["d"]["lon"] == pytest.approx(r["lon"], abs=0.51 / (8000 * 16))


# ---- round-2 parity additions (VERDICT item 7) ------------------------------

from xgeo_spark.functions.geo import (  # noqa: E402
    bound_around_point,
    bound_height_m,
    bound_pad,
    bound_width_m,
    multipolygon_area_m2,
    olc_recover_nearest,
    olc_shorten,
    polygon_area_m2,
    signed_ring_area_m2,
    simplify_dp,
)

_CCW_SQ = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]  # lon,lat — CCW


def test_signed_ring_area_orientation(spark):
    """orb/geo/area.go:38 SignedArea: negative when clockwise."""
    ccw = _pts(spark, _CCW_SQ)
    cw = _pts(spark, list(reversed(_CCW_SQ)))
    a_ccw = ccw.select(signed_ring_area_m2(F.col("points")).alias("a")).first()["a"]
    a_cw = cw.select(signed_ring_area_m2(F.col("points")).alias("a")).first()["a"]
    assert a_ccw == pytest.approx(111_195**2, rel=0.01)
    assert a_cw == pytest.approx(-a_ccw, rel=1e-9)


def _rings_df(spark, rings):
    schema = T.ArrayType(T.ArrayType(
        T.StructType([T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())])
    ))
    return spark.createDataFrame(
        [([[{"lon": p[0], "lat": p[1]} for p in r] for r in rings],)],
        T.StructType([T.StructField("rings", schema)]),
    )


def test_polygon_area_with_hole(spark):
    """orb/geo/area.go:83 polygonArea: outer minus holes, orientation-blind."""
    outer = _CCW_SQ
    hole = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75)]  # 0.5x0.5
    a = (
        _rings_df(spark, [outer, hole])
        .select(polygon_area_m2(F.col("rings")).alias("a")).first()["a"]
    )
    full = 111_195**2
    assert a == pytest.approx(full - full / 4, rel=0.01)
    # hole orientation must not matter (reference takes Abs of each ring)
    a2 = (
        _rings_df(spark, [outer, list(reversed(hole))])
        .select(polygon_area_m2(F.col("rings")).alias("a")).first()["a"]
    )
    assert a2 == pytest.approx(a, rel=1e-12)


def test_multipolygon_area_sums(spark):
    schema = T.ArrayType(T.ArrayType(T.ArrayType(
        T.StructType([T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())])
    )))
    sq2 = [(10.0, 0.0), (11.0, 0.0), (11.0, 1.0), (10.0, 1.0)]
    mp = [[[{"lon": p[0], "lat": p[1]} for p in _CCW_SQ]],
          [[{"lon": p[0], "lat": p[1]} for p in sq2]]]
    df = spark.createDataFrame([(mp,)], T.StructType([T.StructField("mp", schema)]))
    a = df.select(multipolygon_area_m2(F.col("mp")).alias("a")).first()["a"]
    assert a == pytest.approx(2 * 111_195**2, rel=0.01)


def test_bound_around_point_and_pad_height_width(spark):
    df = spark.createDataFrame([(0.0, 0.0)], ["lat", "lon"])
    r = df.select(
        bound_around_point(F.col("lat"), F.col("lon"), 111_195.0).alias("b")
    ).first()["b"]
    # ~1 degree in every direction at the equator
    assert r["min_lat"] == pytest.approx(-1.0, abs=0.01)
    assert r["max_lat"] == pytest.approx(1.0, abs=0.01)
    assert r["min_lon"] == pytest.approx(-1.0, abs=0.01)
    assert r["max_lon"] == pytest.approx(1.0, abs=0.01)

    # pole-overlapping radius collapses to the full longitude band
    # (orb/geo/bound.go:28-33)
    pole = spark.createDataFrame([(89.9, 10.0)], ["lat", "lon"]).select(
        bound_around_point(F.col("lat"), F.col("lon"), 100_000.0).alias("b")
    ).first()["b"]
    assert pole["min_lon"] == -180.0 and pole["max_lon"] == 180.0
    assert pole["max_lat"] == 90.0

    bounds = df.select(
        F.struct(
            F.lit(0.0).alias("min_lon"), F.lit(0.0).alias("min_lat"),
            F.lit(1.0).alias("max_lon"), F.lit(1.0).alias("max_lat"),
        ).alias("b")
    )
    r2 = bounds.select(
        bound_pad(F.col("b"), 111_131.75).alias("p"),
        bound_height_m(F.col("b")).alias("h"),
        bound_width_m(F.col("b")).alias("w"),
    ).first()
    # pad: 1 degree of lat; lon pad slightly larger (divided by cos(1 deg))
    assert r2["p"]["min_lat"] == pytest.approx(-1.0, abs=1e-9)
    assert r2["p"]["max_lat"] == pytest.approx(2.0, abs=1e-9)
    assert r2["p"]["min_lon"] == pytest.approx(-1.0 / math.cos(math.radians(1.0)), abs=1e-6)
    # height: 1 deg * 111131.75 (orb/geo/bound.go:64-66 constant)
    assert r2["h"] == pytest.approx(111_131.75, abs=1e-6)
    # width: haversine along the mid-latitude (0.5 deg)
    assert r2["w"] == pytest.approx(111_195 * math.cos(math.radians(0.5)), rel=0.005)


def test_olc_shorten_and_recover(spark):
    full = "8FVC9G8F+6X"  # center ~(47.3656, 8.5250)
    df = spark.createDataFrame(
        [
            (full, 47.3656, 8.5250),    # at the center: maximal trim
            (full, 47.4, 8.6),          # ~0.08 deg away: 4-char trim
            (full, 20.0, 100.0),        # far away: unchanged
        ],
        ["code", "lat", "lon"],
    )
    out = [
        r["s"]
        for r in df.select(
            olc_shorten(F.col("code"), F.col("lat"), F.col("lon")).alias("s")
        ).collect()
    ]
    assert out[0] == "+6X"
    assert out[1] == "9G8F+6X"
    assert out[2] == full

    # recover roundtrip: every shortened form recovers the original full code
    rec = spark.createDataFrame(
        [("+6X", 47.3656, 8.5250), ("9G8F+6X", 47.4, 8.6),
         ("8F+6X", 47.37, 8.51), (full, 47.4, 8.6)],
        ["code", "lat", "lon"],
    )
    got = [
        r["f"]
        for r in rec.select(
            olc_recover_nearest(F.col("code"), F.col("lat"), F.col("lon")).alias("f")
        ).collect()
    ]
    assert got == [full] * 4


def test_olc_recover_snaps_to_nearest_cell(spark):
    """Reference just south of a cell whose short code wraps: the recovered
    full code must be the NEAREST matching cell, not the same-prefix one
    (shorten.go:127-140 snap logic)."""
    # short code "2222+22" decodes (with the ref's prefix) to a cell ~1 deg
    # away north; a reference at the south edge forces the snap branch.
    df = spark.createDataFrame([("2222+22", 0.999, 0.001)], ["code", "lat", "lon"])
    full = df.select(
        olc_recover_nearest(F.col("code"), F.col("lat"), F.col("lon")).alias("f")
    ).first()["f"]
    c = full.replace("+", "")
    assert len(c) == 10
    # decoded center must be within half a padded cell (0.5 deg) of the ref
    from xgeo_spark.functions.geo import _olc_center_one
    lat_c, lon_c = _olc_center_one(full)
    assert abs(lat_c - 0.999) <= 0.5 + 1e-9
    assert abs(lon_c - 0.001) <= 0.5 + 1e-9


def test_simplify_dp(spark):
    pts = [(0.0, 0.0), (1.0, 0.001), (2.0, 0.0),          # near-collinear
           (3.0, 1.0),                                     # real corner
           (4.0, 0.0), (5.0, 0.0005), (6.0, 0.0)]          # near-collinear
    df = _pts(spark, pts).withColumn("tol", F.lit(0.01))
    out = df.select(simplify_dp(F.col("points"), F.col("tol")).alias("s")).first()["s"]
    got = [(p["lon"], p["lat"]) for p in out]
    assert got == [(0.0, 0.0), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0), (6.0, 0.0)]

    # tolerance below the wiggle keeps everything
    keep = df.withColumn("tol", F.lit(0.0001)).select(
        simplify_dp(F.col("points"), F.col("tol")).alias("s")
    ).first()["s"]
    assert len(keep) == len(pts)

    # short lines pass through
    short = _pts(spark, [(0.0, 0.0), (1.0, 1.0)]).withColumn("tol", F.lit(10.0))
    assert len(short.select(simplify_dp(F.col("points"), F.col("tol")).alias("s")).first()["s"]) == 2


# ---- round-3 parity additions (planar + projections, SURVEY §2.2-6) ---------

from xgeo_spark.functions.geo import (  # noqa: E402
    mercator_scale_factor,
    planar_distance_from,
    polygon_contains,
    ring_contains,
    webmercator_inv_lat,
    webmercator_inv_lon,
    webmercator_x,
    webmercator_y,
)

# a non-convex (concave "C" shape), CLOSED ring
_CONCAVE = [(0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0), (1.0, 3.0),
            (4.0, 3.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]


def _probe(spark, ring, pts):
    schema = T.StructType([
        T.StructField("ring", T.ArrayType(T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType())]))),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])
    ring_v = [{"lon": x, "lat": y} for x, y in ring]
    return spark.createDataFrame([(ring_v, x, y) for x, y in pts], schema)


def test_ring_contains_concave(spark):
    inside = [(0.5, 0.5), (0.5, 3.5), (0.5, 2.0), (3.9, 0.5), (3.9, 3.5)]
    outside = [(2.0, 2.0),      # inside the concavity, outside the ring
               (-1.0, 2.0), (5.0, 2.0), (2.0, -1.0), (2.0, 5.0)]
    df = _probe(spark, _CONCAVE, inside + outside)
    got = df.select(
        "lon", "lat",
        ring_contains(F.col("ring"), F.col("lon"), F.col("lat")).alias("c"),
    ).collect()
    exp = dict([((x, y), True) for x, y in inside]
               + [((x, y), False) for x, y in outside])
    for r in got:
        assert r["c"] == exp[(r["lon"], r["lat"])], (r["lon"], r["lat"])


def test_ring_contains_vertex_aligned_ray(spark):
    """The ray passing exactly through a vertex must not double-count: a
    square with a vertex at the probe's latitude."""
    diamond = [(2.0, 0.0), (4.0, 2.0), (2.0, 4.0), (0.0, 2.0), (2.0, 0.0)]
    pts_in = [(2.0, 2.0), (1.0, 2.0), (3.0, 2.0)]   # lat == two vertices' lat
    pts_out = [(-1.0, 2.0), (4.5, 2.0)]
    df = _probe(spark, diamond, pts_in + pts_out)
    got = {(r["lon"], r["lat"]): r["c"] for r in df.select(
        "lon", "lat",
        ring_contains(F.col("ring"), F.col("lon"), F.col("lat")).alias("c"),
    ).collect()}
    for p in pts_in:
        assert got[p] is True, p
    for p in pts_out:
        assert got[p] is False, p


def test_polygon_contains_with_hole(spark):
    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    schema = T.StructType([
        T.StructField("rings", T.ArrayType(T.ArrayType(T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType())])))),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])
    rings = [[{"lon": x, "lat": y} for x, y in r] for r in (outer, hole)]
    cases = [((2.0, 2.0), True), ((5.0, 5.0), False),   # in hole -> out
             ((11.0, 5.0), False), ((7.0, 5.0), True)]
    df = spark.createDataFrame([(rings, x, y) for (x, y), _ in cases], schema)
    got = {(r["lon"], r["lat"]): r["c"] for r in df.select(
        "lon", "lat",
        polygon_contains(F.col("rings"), F.col("lon"), F.col("lat")).alias("c"),
    ).collect()}
    for (x, y), exp in cases:
        assert got[(x, y)] == exp, (x, y)


def test_planar_distance_from(spark):
    line = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    cases = [((5.0, 3.0), 3.0),      # perpendicular onto first segment
             ((13.0, 14.0), 5.0),    # beyond the last vertex: 3-4-5
             ((-3.0, -4.0), 5.0),    # before the first vertex
             ((10.0, 5.0), 0.0)]     # on the second segment
    df = _probe(spark, line, [p for p, _ in cases])
    got = {(r["lon"], r["lat"]): r["d"] for r in df.select(
        "lon", "lat",
        planar_distance_from(F.col("ring"), F.col("lon"), F.col("lat")).alias("d"),
    ).collect()}
    for p, exp in cases:
        assert got[p] == pytest.approx(exp, abs=1e-12), p
    # single vertex degrades to point distance; empty -> null
    one = _probe(spark, [(1.0, 1.0)], [(4.0, 5.0)])
    assert one.select(planar_distance_from(
        F.col("ring"), F.col("lon"), F.col("lat")).alias("d")
    ).first()["d"] == pytest.approx(5.0)
    empty = _probe(spark, [], [(0.0, 0.0)])
    assert empty.select(planar_distance_from(
        F.col("ring"), F.col("lon"), F.col("lat")).alias("d")
    ).first()["d"] is None


def test_webmercator_roundtrip_and_known_values(spark):
    import math as m
    df = spark.createDataFrame(
        [(0.0, 0.0), (8.524997, 47.36559), (151.2093, -33.8688),
         (-180.0, 85.051128779), (179.9, -85.051128779)],
        ["lon", "lat"])
    out = df.select(
        "lon", "lat",
        webmercator_x(F.col("lon")).alias("x"),
        webmercator_y(F.col("lat")).alias("y"),
    ).withColumn("lon2", webmercator_inv_lon(F.col("x"))) \
     .withColumn("lat2", webmercator_inv_lat(F.col("y"))).collect()
    R = 6_378_137.0
    for r in out:
        assert r["x"] == pytest.approx(R * m.pi / 180.0 * r["lon"], rel=1e-12)
        exp_y = max(-R * m.pi, min(
            m.log(m.tan((90.0 + r["lat"]) * m.pi / 360.0)) * R, R * m.pi))
        assert r["y"] == pytest.approx(exp_y, rel=1e-9)
        assert r["lon2"] == pytest.approx(r["lon"], abs=1e-9)
        assert r["lat2"] == pytest.approx(r["lat"], abs=1e-9)
    # scale factor: 2 at 60 deg
    sf = spark.createDataFrame([(60.0,)], ["lat"]).select(
        mercator_scale_factor(F.col("lat")).alias("s")).first()["s"]
    assert sf == pytest.approx(2.0, rel=1e-12)


# ---- round-4 parity additions (planar area/length + radial/visvalingam) -----

from xgeo_spark.functions.geo import (  # noqa: E402
    planar_length,
    planar_polygon_area,
    planar_ring_area,
    simplify_radial,
    simplify_visvalingam,
)


def _ring(pts):
    return pts + [pts[0]]  # close (GeoJSON contract)


def test_planar_ring_area_signed(spark):
    """orb/planar/area.go ringCentroidArea sign convention: CCW positive,
    CW negative; unit square = 1 exactly (euclidean, not geodesic)."""
    ccw = _pts(spark, _ring(_CCW_SQ))
    cw = _pts(spark, _ring(list(reversed(_CCW_SQ))))
    assert ccw.select(planar_ring_area(F.col("points")).alias("a")).first()["a"] == 1.0
    assert cw.select(planar_ring_area(F.col("points")).alias("a")).first()["a"] == -1.0
    # degenerate (< 4 vertices incl. closure) -> 0
    deg = _pts(spark, [(0.0, 0.0), (1.0, 0.0), (0.0, 0.0)])
    assert deg.select(planar_ring_area(F.col("points")).alias("a")).first()["a"] == 0.0


def test_planar_polygon_area_with_hole(spark):
    """|outer| - Σ|holes| (orb polygonCentroidArea): 2x2 square minus a
    1x1 hole = 3, regardless of hole winding."""
    outer = _ring([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)])
    hole = _ring([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)])  # CCW hole
    schema = T.ArrayType(
        T.ArrayType(T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType()),
        ]))
    )
    df = spark.createDataFrame(
        [([[{"lon": x, "lat": y} for x, y in r] for r in (outer, hole)],)],
        T.StructType([T.StructField("rings", schema)]),
    )
    assert df.select(planar_polygon_area(F.col("rings")).alias("a")).first()["a"] == 3.0


def test_planar_length_345(spark):
    """Euclidean 3-4-5 triangle perimeter = 12 exactly."""
    df = _pts(spark, _ring([(0.0, 0.0), (3.0, 0.0), (3.0, 4.0)]))
    assert df.select(planar_length(F.col("points")).alias("l")).first()["l"] == 12.0
    # single point / empty -> 0
    one = _pts(spark, [(5.0, 5.0)])
    assert one.select(planar_length(F.col("points")).alias("l")).first()["l"] == 0.0


def test_simplify_radial_orb_semantics(spark):
    """orb/simplify/radial.go: keep v0, then vertices strictly farther than
    the threshold from the last KEPT vertex; append the final vertex if it
    was dropped."""
    pts = [(0.0, 0.0), (0.5, 0.0), (1.1, 0.0), (1.2, 0.0), (2.5, 0.0)]
    df = _pts(spark, pts).withColumn("tol", F.lit(1.0))
    out = df.select(simplify_radial(F.col("points"), F.col("tol")).alias("s")).first()["s"]
    assert [(p["lon"], p["lat"]) for p in out] == [(0.0, 0.0), (1.1, 0.0), (2.5, 0.0)]

    # final vertex dropped by distance -> appended anyway
    tail = _pts(spark, [(0.0, 0.0), (0.5, 0.0), (0.9, 0.0)]).withColumn(
        "tol", F.lit(1.0)
    )
    out2 = tail.select(simplify_radial(F.col("points"), F.col("tol")).alias("s")).first()["s"]
    assert [(p["lon"], p["lat"]) for p in out2] == [(0.0, 0.0), (0.9, 0.0)]


def test_simplify_visvalingam_orb_semantics(spark):
    """orb/simplify/visvalingam.go VisvalingamThreshold: removes interior
    vertices whose (doubled) effective triangle area <= 2*threshold, with
    monotone area recomputation; endpoints always survive."""
    pts = [(0.0, 0.0), (1.0, 0.1), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0)]
    # doubled areas: v1=0.2, v2=1.1, v3=2.0. threshold 0.15 -> 2t=0.3:
    # v1 removed; v2 recomputes vs (0,0) to 2.0 (monotone) -> stops.
    df = _pts(spark, pts).withColumn("tol", F.lit(0.15))
    out = df.select(
        simplify_visvalingam(F.col("points"), F.col("tol")).alias("s")
    ).first()["s"]
    assert [(p["lon"], p["lat"]) for p in out] == [
        (0.0, 0.0), (2.0, 0.0), (3.0, 1.0), (4.0, 0.0)
    ]
    # huge threshold: only the endpoints survive
    flat = df.withColumn("tol", F.lit(1e9)).select(
        simplify_visvalingam(F.col("points"), F.col("tol")).alias("s")
    ).first()["s"]
    assert [(p["lon"], p["lat"]) for p in flat] == [(0.0, 0.0), (4.0, 0.0)]
    # sub-threshold wiggle only: nothing removed
    keep = df.withColumn("tol", F.lit(0.05)).select(
        simplify_visvalingam(F.col("points"), F.col("tol")).alias("s")
    ).first()["s"]
    assert len(keep) == len(pts)


# ---- round-5 parity additions (orb tail: planar distance, keep-N, polygon) --

from xgeo_spark.functions.geo import (  # noqa: E402
    planar_distance,
    planar_distance_squared,
    simplify_polygon,
    simplify_visvalingam_keep,
)


def test_planar_distance_point_to_point(spark):
    """orb/planar/distance.go Distance / DistanceSquared: 3-4-5 triangle,
    symmetry, zero."""
    df = spark.createDataFrame(
        [(0.0, 0.0, 3.0, 4.0), (1.5, -2.0, 1.5, -2.0)],
        ["lon1", "lat1", "lon2", "lat2"],
    )
    rows = df.select(
        planar_distance(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d"),
        planar_distance_squared(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d2"),
        planar_distance(F.col("lon2"), F.col("lat2"), F.col("lon1"), F.col("lat1")).alias("rev"),
    ).collect()
    assert rows[0]["d"] == 5.0 and rows[0]["d2"] == 25.0
    assert rows[0]["rev"] == 5.0
    assert rows[1]["d"] == 0.0 and rows[1]["d2"] == 0.0


def test_simplify_visvalingam_keep(spark):
    """orb/simplify/visvalingam.go:33 VisvalingamKeep: remove smallest
    triangles until N vertices remain; rows already at/below N unchanged."""
    pts = [(0.0, 0.0), (1.0, 0.1), (2.0, 0.0), (3.0, 2.0), (4.0, 0.0)]
    # doubled areas: v1=0.2, v2=2.1, v3=4.0 (all distinct -> deterministic)
    df = _pts(spark, pts)

    def run(k):
        out = df.withColumn("k", F.lit(k)).select(
            simplify_visvalingam_keep(F.col("points"), F.col("k")).alias("s")
        ).first()["s"]
        return [(p["lon"], p["lat"]) for p in out]

    assert run(4) == [(0.0, 0.0), (2.0, 0.0), (3.0, 2.0), (4.0, 0.0)]
    assert run(2) == [(0.0, 0.0), (4.0, 0.0)]  # endpoints always survive
    assert run(5) == pts and run(9) == pts      # <= to_keep passes through


def _poly_df(spark, rings):
    schema = T.StructType([
        T.StructField("rings", T.ArrayType(T.ArrayType(T.StructType([
            T.StructField("lon", T.DoubleType()),
            T.StructField("lat", T.DoubleType())])))),
    ])
    data = [([[{"lon": x, "lat": y} for x, y in r] for r in rings],)]
    return spark.createDataFrame(data, schema)


def test_simplify_polygon_ring_protection(spark):
    """orb/simplify/helpers.go polygon(): rings simplified as linestrings
    (closure survives — shared endpoint always kept), degenerate HOLES
    dropped, outer ring always retained."""
    outer = [(0.0, 0.0), (5.0, 0.001), (10.0, 0.0), (10.0, 10.0),
             (0.0, 10.0), (0.0, 0.0)]           # one near-collinear vertex
    hole = [(4.0, 4.0), (4.02, 4.02), (4.0, 4.04), (3.98, 4.02),
            (4.0, 4.0)]                          # tiny diamond
    df = _poly_df(spark, [outer, hole])

    def run(tol, method):
        out = df.select(simplify_polygon(
            F.col("rings"), F.lit(tol), F.lit(method)).alias("s")
        ).first()["s"]
        return [[(p["lon"], p["lat"]) for p in r] for r in out]

    # moderate tolerance: outer loses the collinear vertex, the hole
    # collapses to its 2 endpoints -> dropped; closure preserved
    got = run(0.1, "dp")
    assert len(got) == 1
    assert got[0] == [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                      (0.0, 10.0), (0.0, 0.0)]
    assert got[0][0] == got[0][-1]

    # tiny tolerance: both rings survive intact
    got2 = run(1e-6, "dp")
    assert len(got2) == 2 and len(got2[0]) == 6 and len(got2[1]) == 5

    # outer ring is NEVER dropped, even when it degenerates
    got3 = run(1e9, "dp")
    assert len(got3) == 1 and len(got3[0]) == 2

    # radial + visvalingam modes drop the degenerate hole the same way
    for m in ("radial", "visvalingam"):
        gm = run(5.0 if m == "radial" else 1.0, m)
        assert [r[-1] for r in gm] == [r[0] for r in gm]  # closure kept
        assert len(gm) == 1
