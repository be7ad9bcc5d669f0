"""Geodesic scalar functions — SURVEY.md §2.2 operator parity.

The reference vendored a geodesic library (haversine distance, bearing,
midpoint, geodesic area/length, bounds — orb/geo at
/root/reference/vendor/github.com/paulmach/orb/geo/{distance,area,length,
bound}.go) and Open Location Code encode/decode
(/root/reference/vendor/github.com/google/open-location-code/go/encode.go:55,
decode.go:25) as its planned scalar-function surface. Spark-first homes:

- distance / bearing / midpoint / bounds: pure COLUMN EXPRESSIONS (JVM
  trig inside whole-stage codegen — faster than any UDF and usable in
  filters that Catalyst can reorder);
- linestring length: higher-order array builtins (transform over the
  point sequence — still JVM-side);
- spherical ring area: Arrow-batched pandas UDF (numpy, one vectorized
  spherical-excess computation per batch) — per-vertex loops don't map to
  builtins cleanly;
- Open Location Code encode: vectorized numpy pandas UDF (pure base-20
  arithmetic, implemented from the public spec).

All formulas are the standard published ones (haversine; Chamberlain &
Duquette spherical polygon area; OLC open spec).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EARTH_RADIUS_M = 6371008.8  # mean Earth radius (IUGG)


# ---------------------------------------------------------------- column exprs

def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters, pure column expression."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dlmb / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def initial_bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing (degrees clockwise from north, [0, 360))."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dlmb = F.radians(lon2 - lon1)
    y = F.sin(dlmb) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dlmb)
    return F.pmod(F.degrees(F.atan2(y, x)) + 360.0, F.lit(360.0))


def midpoint(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle midpoint as struct(lat, lon) in degrees."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    l1 = F.radians(lon1)
    dlmb = F.radians(lon2 - lon1)
    bx = F.cos(p2) * F.cos(dlmb)
    by = F.cos(p2) * F.sin(dlmb)
    lat_m = F.atan2(
        F.sin(p1) + F.sin(p2),
        F.sqrt(F.pow(F.cos(p1) + bx, 2) + F.pow(by, 2)),
    )
    lon_m = l1 + F.atan2(by, F.cos(p1) + bx)
    return F.struct(
        F.degrees(lat_m).alias("lat"),
        # normalize to [-180, 180)
        (F.pmod(F.degrees(lon_m) + 540.0, F.lit(360.0)) - 180.0).alias("lon"),
    )


def bound_of_points(points: Column) -> Column:
    """Bounding box of array<struct<lon,lat>> -> struct(min_lon, min_lat,
    max_lon, max_lat); higher-order array aggregation, JVM-side."""
    lons = F.transform(points, lambda p: p["lon"])
    lats = F.transform(points, lambda p: p["lat"])
    return F.struct(
        F.array_min(lons).alias("min_lon"),
        F.array_min(lats).alias("min_lat"),
        F.array_max(lons).alias("max_lon"),
        F.array_max(lats).alias("max_lat"),
    )


def linestring_length_m(points: Column) -> Column:
    """Length in meters of array<struct<lon,lat>> — per-segment haversine
    via transform over the index sequence; stays in codegen."""
    n = F.size(points)

    def seg(i):
        a = F.element_at(points, i + 1)
        b = F.element_at(points, i + 2)
        return haversine_m(a["lat"], a["lon"], b["lat"], b["lon"])

    return F.when(n < 2, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(F.sequence(F.lit(0), n - 2), seg),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# ---------------------------------------------------------------- pandas UDFs

@pandas_udf(T.DoubleType())
def ring_area_m2(rings: pd.Series) -> pd.Series:
    """Spherical polygon area (m²) of a single ring given as
    array<struct<lon,lat>> (or array<array<double>> [lon,lat]).

    Chamberlain & Duquette: A = |R²/2 · Σ (λ₂−λ₁)(2 + sin φ₁ + sin φ₂)|,
    vectorized per ring with numpy."""

    def _area(ring) -> float | None:
        if ring is None or len(ring) < 3:
            return None
        arr = np.asarray(
            [[p["lon"], p["lat"]] if isinstance(p, dict) else [p[0], p[1]] for p in ring],
            dtype=np.float64,
        )
        lon = np.radians(arr[:, 0])
        lat = np.radians(arr[:, 1])
        lon2, lat2 = np.roll(lon, -1), np.roll(lat, -1)
        s = np.sum((lon2 - lon) * (2 + np.sin(lat) + np.sin(lat2)))
        return abs(s) * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0

    return rings.map(_area)


# --- Open Location Code (plus codes), from the public spec -------------------

_OLC_ALPHABET = np.frombuffer(b"23456789CFGHJMPQRVWX", dtype=np.uint8)


@pandas_udf(T.StringType())
def olc_encode10(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """10-digit Open Location Code (e.g. 8FVC9G8F+6X), vectorized.

    Coordinates are converted to integer units of 1/8000 degree (exactly the
    resolution of the 10th digit), then five base-20 digit pairs are peeled
    off most-significant-first; '+' sits after the 8th character."""
    la = np.clip(lat.to_numpy(dtype=np.float64), -90.0, 90.0)
    lo = lon.to_numpy(dtype=np.float64)
    lo = ((lo + 180.0) % 360.0) - 180.0
    la_u = np.floor((la + 90.0) * 8000.0).astype(np.int64)
    lo_u = np.floor((lo + 180.0) * 8000.0).astype(np.int64)
    la_u = np.minimum(la_u, 180 * 8000 - 1)   # lat=90 falls in last row
    lo_u = np.minimum(lo_u, 360 * 8000 - 1)

    out = np.empty((len(la), 11), dtype=np.uint8)
    out[:, 8] = ord("+")
    char_cols = [(0, 1), (2, 3), (4, 5), (6, 7), (9, 10)]  # MSD pair first
    for i, (c_lat, c_lon) in enumerate(char_cols):
        shift = 20 ** (4 - i)
        out[:, c_lat] = _OLC_ALPHABET[(la_u // shift) % 20]
        out[:, c_lon] = _OLC_ALPHABET[(lo_u // shift) % 20]
    return pd.Series([bytes(row).decode("ascii") for row in out])


@pandas_udf(
    T.StructType(
        [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
    )
)
def olc_decode_center(codes: pd.Series) -> pd.DataFrame:
    """Decode a 10-digit plus code to its cell-center (lat, lon)."""
    idx = {c: i for i, c in enumerate("23456789CFGHJMPQRVWX")}

    def _dec(code):
        if not isinstance(code, str):
            return (None, None)
        digits = [ch for ch in code.upper() if ch != "+"]
        if len(digits) != 10 or any(d not in idx for d in digits):
            return (None, None)
        la_u = lo_u = 0
        for d_lat, d_lon in zip(digits[0::2], digits[1::2]):
            la_u = la_u * 20 + idx[d_lat]
            lo_u = lo_u * 20 + idx[d_lon]
        return (la_u / 8000.0 - 90.0 + 1 / 16000.0, lo_u / 8000.0 - 180.0 + 1 / 16000.0)

    decoded = codes.map(_dec)
    return pd.DataFrame(
        {"lat": [d[0] for d in decoded], "lon": [d[1] for d in decoded]}
    )
