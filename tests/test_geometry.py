"""Geometry kernel unit tests — ported test intents from the reference's
JUnit suite (LineClipperTest, ShapeSplitterTest, CoordTest semantics)."""

from __future__ import annotations

import numpy as np

from mkgmap_spark.functions import geometry as g
from mkgmap_spark.mapunits import round_pof2, to_degrees, to_map_unit


def test_map_unit_roundtrip():
    assert to_map_unit(0.0) == 0
    assert to_map_unit(360.0) == 1 << 24
    assert to_map_unit(-180.0) == -(1 << 23)
    d = to_degrees(to_map_unit(51.5))
    assert abs(d - 51.5) < 360.0 / (1 << 24)


def test_round_pof2():
    # Area.java:150-158: binary half rounds up
    assert round_pof2(10, 0) == 10
    assert round_pof2(10, 2) == 12
    assert round_pof2(9, 2) == 8
    assert round_pof2(-10, 2) == -8
    assert round_pof2(8, 2) == 8


def test_shoelace_and_orientation():
    # unit square CCW -> positive, CW -> negative (Way.clockwise:216)
    lats = np.array([0, 0, 10, 10])
    lons = np.array([0, 10, 10, 0])
    assert g.shoelace2(lats, lons) == 200  # 2 * area(100)
    assert not g.is_clockwise(lats, lons)
    assert g.is_clockwise(lats[::-1], lons[::-1])
    # closed ring (repeated first point) same result
    la2 = np.append(lats, 0)
    lo2 = np.append(lons, 0)
    assert g.shoelace2(la2, lo2) == 200


def test_winding_pip_basic():
    ring_y = np.array([0, 0, 100, 100])
    ring_x = np.array([0, 100, 100, 0])
    py = np.array([50, 150, -1, 99])
    px = np.array([50, 50, 50, 99])
    inside = g.points_in_ring(py, px, ring_y, ring_x)
    assert inside.tolist() == [True, False, False, True]


def test_pip_concave_and_hole():
    # concave "U" shape
    uy = np.array([0, 0, 30, 30, 10, 10, 30, 30, 0])
    ux = np.array([0, 40, 40, 30, 30, 10, 10, 0, 0])
    py = np.array([20, 5, 20])
    px = np.array([20, 20, 35])
    got = g.points_in_ring(py, px, uy, ux).tolist()
    assert got == [False, True, True]

    rings = [
        (np.array([0, 0, 100, 100]), np.array([0, 100, 100, 0]), False),
        (np.array([40, 40, 60, 60]), np.array([40, 60, 60, 40]), True),
    ]
    res = g.points_in_polygon(np.array([50, 20]), np.array([50, 20]), rings)
    assert res.tolist() == [False, True]


def test_clip_polyline_liang_barsky():
    # line crossing the box -> clipped to the box edge
    parts = g.clip_polyline(np.array([-10, 10]), np.array([5, 5]), (0, 0, 20, 20))
    assert len(parts) == 1
    ys, xs = parts[0]
    assert ys[0] == 0 and ys[-1] == 10
    # line fully outside -> no parts
    assert g.clip_polyline(np.array([-10, -5]), np.array([5, 5]), (0, 0, 20, 20)) == []
    # line leaving and re-entering -> two parts
    parts = g.clip_polyline(
        np.array([10, 10, 10]), np.array([-5, 40, 15]), (0, 0, 20, 20)
    )
    assert len(parts) == 2


def test_clip_ring_sutherland_hodgman():
    ys, xs = g.clip_ring(np.array([-10, -10, 30, 30]), np.array([-10, 30, 30, -10]), (0, 0, 20, 20))
    # clipped square is exactly the bbox
    assert ys.min() == 0 and ys.max() == 20 and xs.min() == 0 and xs.max() == 20
    area = abs(g.shoelace2(ys.astype(np.int64), xs.astype(np.int64))) / 2
    assert area == 400


def test_douglas_peucker():
    # collinear middle points dropped, spike kept
    la = np.array([0, 0, 5, 0, 0])
    lo = np.array([0, 10, 20, 30, 40])
    keep = g.douglas_peucker_mask(la, lo, max_error=3.0)
    assert keep[0] and keep[-1] and keep[2]
    assert keep.sum() == 3
    keep2 = g.douglas_peucker_mask(la, lo, max_error=10.0)
    assert keep2.sum() == 2
    # preserved flag honored (Coord.preserved())
    pres = np.array([False, True, False, False, False])
    keep3 = g.douglas_peucker_mask(la, lo, max_error=10.0, preserved=pres)
    assert keep3[1]


def test_segment_intersection():
    # crossing
    assert g.segments_intersect(0, 0, 10, 10, 0, 10, 10, 0).item()
    # parallel disjoint
    assert not g.segments_intersect(0, 0, 10, 0, 1, 1, 11, 1).item()
    # touching at endpoint
    assert g.segments_intersect(0, 0, 10, 10, 10, 10, 20, 0).item()
    # collinear overlap
    assert g.segments_intersect(0, 0, 10, 0, 5, 0, 15, 0).item()


def test_distances():
    # one degree of longitude at equator ~ 111.32 km
    mu = 1 << 24
    one_deg = mu // 360
    d = g.distance_haversine_m(0, 0, 0, one_deg)
    assert abs(d - 111_194) < 500  # sphere value for R=6378137: 2piR/360
    de = g.distance_equirect_m(0, 0, 0, one_deg)
    assert abs(d - de) < 1.0


def test_round_up_reference_cases():
    """UtilsTest.testRoundUp (imgfmt/UtilsTest.java:57-64): ceil to a
    multiple of 2^shift, negative-safe — ceil_pof2 is the arithmetic
    twin of Utils.roundUp's unsigned-shift trick."""
    from mkgmap_spark.mapunits import ceil_pof2

    assert ceil_pof2(1, 0) == 1
    assert ceil_pof2(-1, 0) == -1
    assert ceil_pof2(1, 1) == 2
    assert ceil_pof2(-1, 1) == 0
    assert ceil_pof2(2, 1) == 2
    assert ceil_pof2(-2, 1) == -2
