"""Geo function parity (lib/geo.c formulas) + script-filter wiring."""

import math

import numpy as np
import pyarrow as pa

from groonga_ray.geo import (
    GEO_RADIUS, geo_distance, geo_in_circle, geo_in_rectangle, parse_geopoint,
)
from groonga_ray.script import eval_filter, parse_filter


def _ref_rect(lat1, lon1, lat2, lon2):
    r = math.pi / (3_600_000 * 180)
    la1, lo1, la2, lo2 = lat1 * r, lon1 * r, lat2 * r, lon2 * r
    x = (lo2 - lo1) * math.cos((la1 + la2) * 0.5)
    y = la2 - la1
    return math.hypot(x, y) * GEO_RADIUS


def test_parse_and_distance_modes():
    lat, lon = parse_geopoint(["100000000x-200000000", "0x0"])
    assert lat.tolist() == [100000000, 0] and lon.tolist() == [-200000000, 0]
    a, b = "128452975x503157902", "128452975x502905502"  # ~ Tokyo-ish pair
    d_rect = geo_distance(a, b, "rectangle")[0]
    assert abs(d_rect - _ref_rect(128452975, 503157902, 128452975, 502905502)) < 1e-6
    d_sph = geo_distance(a, b, "sphere")[0]
    d_ell = geo_distance(a, b, "ellipsoid")[0]
    # all three approximations agree to ~1% at this separation
    assert abs(d_sph - d_rect) / d_rect < 0.01
    assert abs(d_ell - d_rect) / d_rect < 0.01


def test_in_rectangle_wrap():
    pts = ["0x640000000", "0x-640000000", "0x0"]
    # box crossing the antimeridian: lon >= 170 deg or <= -170 deg
    m = geo_in_rectangle(pts, "100000000x612000000", "-100000000x-612000000")
    assert m.tolist() == [True, True, False]


def test_geo_in_filter_expression():
    batch = pa.table(
        {
            "pt": pa.array(["0x0", "0x100000000", "50000000x0"]),
        }
    )
    ast = parse_filter('geo_in_circle(pt, "0x0", 3200000, "rectangle")')
    mask = eval_filter(ast, batch)
    d = geo_distance(batch.column("pt"), "0x0", "rectangle")
    assert mask.to_pylist() == (d <= 3200000).tolist()
    ast2 = parse_filter('geo_distance(pt, "0x0") < 3200000')
    assert eval_filter(ast2, batch).to_pylist() == mask.to_pylist()
    assert geo_in_circle(batch.column("pt"), "0x0", 3200000).tolist() == mask.to_pylist()
