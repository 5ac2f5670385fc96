"""Geometry kernel tests: WKT parse, boundary-inclusive covers, hull, planner.

The rectangle boundary cases pin the reference's `covers` (not
`contains`) semantics: TestWithinFilter.java:107-135 — a (0,0)-(3,3)
rectangle must include the boundary point (3,3).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hbase_gis_spark.geo import geohash as gh
from hbase_gis_spark.geo.geometry import (
    bbox_polygon,
    convex_hull,
    parse_wkt,
    polygon_from_points,
)
from hbase_gis_spark.geo.planner import (
    NoCoveringPrefixError,
    knn_prefixes,
    minimum_bounding_prefixes,
)

MIDTOWN_WKT = (
    "POLYGON ((-73.980844 40.758703, -73.987214 40.761369, "
    "-73.990839 40.756400, -73.984422 40.753642, -73.980844 40.758703))"
)


def rect_wkt(x1, y1, x2, y2):
    return (
        f"POLYGON (({x1} {y1}, {x1} {y2}, {x2} {y2}, {x2} {y1}, {x1} {y1}))"
    )


def test_parse_midtown():
    poly = parse_wkt(MIDTOWN_WKT)
    assert len(poly.parts) == 1
    assert poly.parts[0][0].shape == (4, 2)  # closing point dropped
    min_lon, min_lat, max_lon, max_lat = poly.bounds()
    assert min_lon == -73.990839 and max_lat == 40.761369


def test_line_points_rectangle_boundary_semantics():
    """Reference golden counts: y=x points 1..10 against two rectangles
    (TestWithinFilter.java:107-135): (0,0)-(2.999,2.999) -> 2 matches,
    (0,0)-(3,3) -> 3 matches (boundary point (3,3) is covered)."""
    xs = np.arange(1.0, 11.0)
    ys = xs.copy()
    poly_small = parse_wkt(rect_wkt(0, 0, 2.999, 2.999))
    assert poly_small.covers(xs, ys).sum() == 2
    poly_exact = parse_wkt(rect_wkt(0, 0, 3.0, 3.0))
    assert poly_exact.covers(xs, ys).sum() == 3


def test_covers_vertices_and_edges():
    poly = parse_wkt(rect_wkt(0, 0, 10, 10))
    assert poly.covers_point(0.0, 0.0)  # vertex
    assert poly.covers_point(5.0, 0.0)  # edge
    assert poly.covers_point(10.0, 10.0)
    assert poly.covers_point(5.0, 5.0)
    assert not poly.covers_point(10.000001, 5.0)
    assert not poly.covers_point(-0.000001, 0.0)


def test_covers_nan_excluded():
    poly = parse_wkt(rect_wkt(0, 0, 10, 10))
    out = poly.covers(np.array([5.0, np.nan]), np.array([np.nan, 5.0]))
    assert not out.any()


def test_polygon_with_hole():
    wkt = (
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), "
        "(4 4, 4 6, 6 6, 6 4, 4 4))"
    )
    poly = parse_wkt(wkt)
    assert poly.covers_point(1.0, 1.0)
    assert not poly.covers_point(5.0, 5.0)  # inside the hole
    assert poly.covers_point(4.0, 5.0)  # on the hole boundary => covered
    assert poly.covers_point(4.0, 4.0)


def test_multipolygon():
    wkt = "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))"
    poly = parse_wkt(wkt)
    assert poly.covers_point(0.5, 0.5)
    assert poly.covers_point(5.5, 5.5)
    assert not poly.covers_point(3.0, 3.0)


@given(
    st.floats(min_value=-73.99, max_value=-73.98, allow_nan=False),
    st.floats(min_value=40.754, max_value=40.760, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_covers_agrees_with_convex_halfplane(x, y):
    """For a convex CCW polygon, covers == all cross products >= 0.

    This identity is what the within-polygon DuckDB oracle uses."""
    poly = parse_wkt(MIDTOWN_WKT)
    ring = poly.parts[0][0]
    # Midtown ring as given is clockwise; orient CCW for the test
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    if (x1 * y2 - x2 * y1).sum() < 0:
        ring = ring[::-1]
        x1, y1 = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    halfplane = all(
        (x2[j] - x1[j]) * (y - y1[j]) - (y2[j] - y1[j]) * (x - x1[j]) >= 0
        for j in range(len(ring))
    )
    assert poly.covers_point(x, y) == halfplane


def test_convex_hull_square():
    pts = np.array([[0, 0], [0, 1], [1, 0], [1, 1], [0.5, 0.5], [0.2, 0.9]])
    hull = convex_hull(pts)
    assert hull.parts[0][0].shape[0] == 4
    assert hull.covers_point(0.5, 0.5)
    assert not hull.covers_point(1.2, 0.5)


def test_centroid_rectangle():
    poly = parse_wkt(rect_wkt(0, 0, 4, 2))
    cx, cy = poly.centroid()
    assert abs(cx - 2.0) < 1e-12 and abs(cy - 1.0) < 1e-12


def test_minimum_bounding_prefixes_midtown():
    """Small query polygon -> prefixes at a usable precision; all
    polygon vertices must land inside cells carrying these prefixes."""
    poly = parse_wkt(MIDTOWN_WKT)
    prefixes = minimum_bounding_prefixes(poly)
    assert len(prefixes) in (1, 9)
    p = len(prefixes[0])
    assert 1 <= p <= 7
    for lon, lat in poly.exterior_points():
        assert gh.encode(lat, lon, p) in prefixes


@given(
    st.floats(min_value=-179, max_value=178, allow_nan=False),
    st.floats(min_value=-85, max_value=84, allow_nan=False),
    st.floats(min_value=1e-4, max_value=0.5),
    st.floats(min_value=1e-4, max_value=0.5),
)
@settings(max_examples=60, deadline=None)
def test_prefixes_cover_random_bboxes(x, y, w, h):
    """Prefix pruning must be a superset filter: every point of the
    query bbox falls in a prefixed cell (the pruned scan never loses
    a potential match)."""
    poly = bbox_polygon(x, y, x + w, y + h)
    prefixes = minimum_bounding_prefixes(poly)
    p = len(prefixes[0])
    rng = np.random.default_rng(0)
    xs = rng.uniform(x, x + w, 50)
    ys = rng.uniform(y, y + h, 50)
    for px, py in zip(xs, ys):
        assert gh.encode(py, px, p) in prefixes


def test_knn_prefixes_shape():
    prefs = knn_prefixes(40.76098703, -73.97000655, 7)
    assert len(prefs) == 9
    assert len(set(prefs)) == 9
    assert all(len(p) == 7 for p in prefs)
