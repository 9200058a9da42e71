"""Geo functions over WGS84 GeoPoint columns, vectorized.

The reference stores GeoPoint as integer milliseconds-of-degree and
renders text as ``"<lat_ms>x<lon_ms>"`` (lib/grn_geo.h:43-52); the
distance approximations are grn_geo_distance_rectangle/sphere/
ellipsoid (lib/geo.c:2324-2580) and the containment predicates are
grn_geo_in_rectangle_raw / in-circle-by-distance (lib/geo.c:2151-2237).
All kernels here are numpy over whole Arrow columns — geo predicates
run inside ``map_batches`` / filter scans, never per row.

Scope note: the rectangle approximation implements the same-quadrant
``geo_distance_rectangle_square_root`` path; the reference's extra
quadrant/antimeridian branches (lib/geo.c:2337-2510) refine
cross-hemisphere pairs and are not reproduced.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GEO_RESOLUTION = 3_600_000                  # GeoPoint ms per degree
GEO_RADIUS = 6357303.0                      # GRN_GEO_RADIUS (meters)
_MS2RAD = np.pi / (GEO_RESOLUTION * 180.0)  # GRN_GEO_INT2RAD
# WGS84 (GRS) ellipsoid constants, lib/grn_geo.h:48-50
_GRS_C1, _GRS_C2, _GRS_C3 = 6335439.0, 6378137.0, 0.006694


def parse_geopoint(col) -> tuple[np.ndarray, np.ndarray]:
    """``"<lat>x<lon>"`` strings -> (lat_ms, lon_ms) int64 arrays
    (grn_obj_cast text->GeoPoint analogue). Coordinates are integer
    milliseconds-of-degree, or decimal DEGREES when they contain a
    ``.`` (grn_geo_point parsing, lib/geo.c:1860-1900). Accepts an
    Arrow array, a numpy/str list, or a single string."""
    import pyarrow.compute as pc

    if isinstance(col, str):
        col = [col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(list(col), pa.large_string())
    # "," is an accepted separator too ("35.6,139.7" — grn_geo_point
    # parsing accepts x and , between coordinates, lib/geo.c:1860)
    col = pc.replace_substring(pc.fill_null(col, "0x0"), ",", "x")
    parts = pc.split_pattern(col, "x")

    def _coord(a: pa.Array) -> np.ndarray:
        try:
            return a.cast(pa.int64()).to_numpy(zero_copy_only=False)
        except pa.ArrowInvalid:
            # degree form: 35.6846 -> msec (value * 3600 * 1000)
            deg = a.cast(pa.float64()).to_numpy(zero_copy_only=False)
            return np.round(deg * GEO_RESOLUTION).astype(np.int64)

    lat = _coord(pc.list_element(parts, 0))
    lon = _coord(pc.list_element(parts, 1))
    return lat, lon


def validate_rectangle(tl_lat: int, tl_lon: int, br_lat: int, br_lon: int) -> None:
    """Query-argument bounds check (grn_geo_in_rectangle's corner
    validation, lib/geo.c:1094-1166; bounds lib/grn_geo.h:54-57):
    latitude strictly inside ±324000000, longitude strictly inside
    ±647999999."""
    max_lat = 90 * GEO_RESOLUTION
    max_lon = 180 * GEO_RESOLUTION - 1
    for name, v, m in (
        ("latitude", tl_lat, max_lat), ("latitude", br_lat, max_lat),
        ("longitude", tl_lon, max_lon), ("longitude", br_lon, max_lon),
    ):
        if v >= m or v <= -m:
            raise ValueError(f"geo_in_rectangle(): {name} {v} out of range (+-{m})")


def geo_radius(center, radius, approx: str = "rectangle") -> float:
    """Circle radius argument: a number is meters; a GeoPoint is a rim
    point whose distance to the center is the radius
    (grn_geo_in_circle's domain dispatch, lib/geo.c:2099-2148)."""
    if isinstance(radius, (int, float)):
        return float(radius)
    s = str(radius)
    if "x" in s:
        return float(geo_distance(center, s, approx)[0])
    return float(s)


def _rad(ms: np.ndarray) -> np.ndarray:
    return ms.astype(np.float64) * _MS2RAD


def geo_distance(p1, p2, approx: str = "rectangle") -> np.ndarray:
    """Meters between GeoPoints under the named approximation
    (func_geo_distance, lib/proc.c:4734-4788)."""
    lat1, lon1 = parse_geopoint(p1)
    lat2, lon2 = parse_geopoint(p2)
    if len(lat1) == 1 and len(lat2) > 1:
        lat1, lon1 = np.broadcast_to(lat1, lat2.shape), np.broadcast_to(lon1, lon2.shape)
    if len(lat2) == 1 and len(lat1) > 1:
        lat2, lon2 = np.broadcast_to(lat2, lat1.shape), np.broadcast_to(lon2, lon1.shape)
    la1, lo1, la2, lo2 = _rad(lat1), _rad(lon1), _rad(lat2), _rad(lon2)
    if approx in ("rectangle", "rect"):
        x = (lo2 - lo1) * np.cos((la1 + la2) * 0.5)
        y = la2 - la1
        return np.sqrt(x * x + y * y) * GEO_RADIUS
    if approx in ("sphere", "sphr"):
        x = np.sin(np.abs(lo2 - lo1) * 0.5)
        y = np.sin(np.abs(la2 - la1) * 0.5)
        return np.arcsin(np.sqrt(y * y + np.cos(la1) * np.cos(la2) * x * x)) * 2 * GEO_RADIUS
    if approx in ("ellipsoid", "ellip"):
        p = (la1 + la2) * 0.5
        q = 1 - _GRS_C3 * np.sin(p) ** 2
        r = np.sqrt(q)
        m = _GRS_C1 / (q * r)
        n = _GRS_C2 / r
        x = n * np.cos(p) * np.abs(lo1 - lo2)
        y = m * np.abs(la1 - la2)
        return np.sqrt(x * x + y * y)
    raise ValueError(f"unknown approximate type {approx!r}")


def geo_in_rectangle(points, top_left, bottom_right) -> np.ndarray:
    """Bool mask: point inside [top_left, bottom_right], longitude-wrap
    aware (grn_geo_in_rectangle_raw, lib/geo.c:2151-2178)."""
    lat, lon = parse_geopoint(points)
    tl_lat, tl_lon = (int(v[0]) for v in parse_geopoint(top_left))
    br_lat, br_lon = (int(v[0]) for v in parse_geopoint(bottom_right))
    validate_rectangle(tl_lat, tl_lon, br_lat, br_lon)
    ok_lat = (lat <= tl_lat) & (lat >= br_lat)
    if tl_lon > br_lon:      # GRN_GEO_LONGITUDE_IS_WRAPPED (crosses 180°)
        ok_lon = (lon >= tl_lon) | (lon <= br_lon)
    else:
        ok_lon = (lon >= tl_lon) & (lon <= br_lon)
    return ok_lat & ok_lon


def geo_in_circle(points, center, radius_m, approx: str = "rectangle") -> np.ndarray:
    """Bool mask: distance(point, center) <= radius — meters, or a rim
    GeoPoint (grn_geo_in_circle, lib/geo.c:2099-2148)."""
    return geo_distance(points, center, approx) <= geo_radius(center, radius_m, approx)
