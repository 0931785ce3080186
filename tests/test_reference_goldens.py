"""Ports of the reference's own JUnit cases against the engine's
kernels: LineClipperTest, CoordTest (rhumb bearing / haversine),
KdTreeTest (nearest-point parity), LineSplitterFilterTest (sizes),
ShapeMergeFilterTest (merge variants)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mkgmap_spark.functions.bearing import rhumb_bearing_rad_deg
from mkgmap_spark.functions.geometry import clip_polyline, distance_haversine_m
from mkgmap_spark.mapunits import to_map_unit

_RAD_PER_DEG = np.pi / 180.0


def _clip_int(lats, lons, bbox):
    # Java Math.round = floor(x + 0.5), the reference's re-quantization
    parts = clip_polyline(np.asarray(lats), np.asarray(lons), bbox)
    return [
        [(int(np.floor(y + 0.5)), int(np.floor(x + 0.5))) for y, x in zip(pl, px)]
        for pl, px in parts
    ]


# ---------------------------------------------------- LineClipperTest
def test_lineclipper_example_clip():
    """testExampleClip: the Liang-Barsky reference example; the 101.425
    intersection re-quantizes by Java rounding."""
    # Area(60, 70, 150, 230) = (minLat, minLon, maxLat, maxLon)
    parts = _clip_int([20, 160], [30, 280], (60, 70, 150, 230))
    assert parts == [[(60, 101), (132, 230)]]


def test_lineclipper_list_clip():
    """testListClip: enter, leave, re-enter -> exactly two lines."""
    lats = [20, 40, 102, 150, 210, 190]
    lons = [30, 60, 110, 150, 220, 135]
    parts = _clip_int(lats, lons, (100, 100, 200, 200))
    assert len(parts) == 2
    assert parts[0] == [(100, 108), (102, 110), (150, 150), (193, 200)]
    assert parts[1] == [(200, 178), (190, 135)]


def test_lineclipper_all_inside():
    """testAllInside: wholly-inside input is reported as unclipped
    (the reference returns null; the kernel returns the single part
    identical to the input)."""
    lats = [102, 150, 190]
    lons = [110, 150, 195]
    parts = _clip_int(lats, lons, (100, 100, 200, 200))
    assert parts == [list(zip(lats, lons))]


# -------------------------------------------------------- CoordTest
def _bearing_deg(lat1, lon1, lat2, lon2):
    return rhumb_bearing_rad_deg(
        lat1 * _RAD_PER_DEG, lon1 * _RAD_PER_DEG, lat2 * _RAD_PER_DEG, lon2 * _RAD_PER_DEG
    )


def test_coord_bearing_rhumb():
    """CoordTest.testBearingRhumb."""
    assert _bearing_deg(33.95, -118.4, 40.6333333333, -73.7833333333) == pytest.approx(79.32388, abs=0.1)
    assert _bearing_deg(0.0, 10.0, 1.0, 10.0) == pytest.approx(0.0, abs=0.001)
    assert _bearing_deg(1.0, 10.0, 1.0, 11.0) == pytest.approx(90.0, abs=0.001)
    assert _bearing_deg(0.0, 10.0, 1.0, 11.0) == pytest.approx(44.99861, abs=0.001)
    assert _bearing_deg(60.0, 10.0, 61.0, 11.0) == pytest.approx(26.214722, abs=0.001)


def test_coord_distance_haversine():
    """CoordTest.testDistanceGC (values already scaled to Coord.R =
    6378137 in the reference assertions)."""
    R_RATIO = 6378137.0 / 6371000.0

    def hav(a, b, c, d):
        return float(
            distance_haversine_m(
                to_map_unit(a), to_map_unit(b), to_map_unit(c), to_map_unit(d)
            )
        )

    assert hav(33.95, -118.4, 40.6333333333, -73.7833333333) == pytest.approx(
        3973000 * R_RATIO, abs=1000
    )
    assert hav(1.0, 10.0, 1.0, 11.0) == pytest.approx(111300 * R_RATIO, abs=200)
    assert hav(0.0, 10.0, 1.0, 10.0) == pytest.approx(111300 * R_RATIO, abs=200)
    assert hav(0.0, 10.0, 1.0, 11.0) == pytest.approx(157400 * R_RATIO, abs=300)
    assert hav(60.0, 10.0, 61.0, 11.0) == pytest.approx(124100 * R_RATIO, abs=300)


# -------------------------------------------------------- KdTreeTest
def test_kdtree_nearest_parity(spark):
    """KdTreeTest.TestFindNextPoint: the engine's kNN (k=1) must find a
    point at EXACTLY the naive-scan minimum distance for every probe of
    a coordinate grid (the reference sweeps 200x200 probes; a coarser
    sweep keeps the Spark job small with the same property)."""
    from mkgmap_spark.operators.knn import knn_join

    ref = [(70, 20), (50, 40), (90, 60), (20, 30), (40, 70), (80, 10), (-10, 20), (-30, -40)]
    probes = [(x, y) for x in range(-100, 100, 5) for y in range(-100, 100, 5)]
    left = spark.createDataFrame(
        [(i, y, x) for i, (y, x) in enumerate(probes)], "id long, ay int, ax int"
    )
    right = spark.createDataFrame(
        [(i, y, x) for i, (y, x) in enumerate(ref)], "rid long, ry int, rx int"
    )
    got = {
        r["id"]: r["dist2"]
        for r in knn_join(left, right, k=1, strategy="broadcast").collect()
    }
    ry = np.array([p[0] for p in ref], dtype=np.int64)
    rx = np.array([p[1] for p in ref], dtype=np.int64)
    for i, (py, px) in enumerate(probes):
        want = int(((ry - py) ** 2 + (rx - px) ** 2).min())
        assert got[i] == want, (i, py, px)


# ---------------------------------------------- LineSplitterFilterTest
def test_linesplitter_sizes_sweep(spark):
    """LineSplitterFilterTest.testSizes: for every length n the split
    must (a) conserve the points (parts chain, shared endpoints), (b)
    keep every part <= MAX, and (c) use the minimal part count
    1 + ceil((n - MAX) / (MAX - 1)) — all lengths in ONE job."""
    from mkgmap_spark.operators.simplify import split_long_lines

    MAX = 250
    ns = list(range(2, 1251, 7))
    rows = [(n, list(range(n)), list(range(n))) for n in ns]
    df = spark.createDataFrame(rows, "id long, lats array<int>, lons array<int>")
    out = split_long_lines(df, max_points=MAX).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    for n in ns:
        parts = sorted(by_id[n], key=lambda r: r["part"])
        sizes = [len(p["lats"]) for p in parts]
        assert all(s <= MAX + 1 for s in sizes), n  # parts share endpoints
        rem = n - MAX
        needed = 1
        if rem > 0:
            needed += rem // (MAX - 1) + (1 if rem % (MAX - 1) else 0)
        assert len(parts) == needed, (n, len(parts))
        assert sum(sizes) - (len(parts) - 1) == n, n
        for a, b in zip(parts, parts[1:]):
            assert a["lats"][-1] == b["lats"][0], n


# ---------------------------------------------- ShapeMergeFilterTest
def test_shapemerge_variants(spark):
    """ShapeMergeFilterTest: two shapes sharing one point / one edge /
    three consecutive points merge into ONE shape with the expected
    point count, under every rotation and orientation of both rings
    (the reference's testVariants sweep).  The engine reports open-ring
    counts (reference counts include the closing duplicate, hence -1);
    signed area conservation is asserted by the kernel itself."""
    from mkgmap_spark.operators.merge import merge_shapes

    fixtures = {
        # name -> (shape1, shape2, expected rings, expected OPEN points)
        "one-point": (
            [(15, 10), (30, 25), (25, 30), (10, 30), (5, 20), (15, 10)],
            [(25, 30), (30, 35), (20, 40), (15, 35), (25, 30)],
            1, 9,
        ),
        "one-edge": (
            [(15, 10), (30, 25), (25, 30), (15, 35), (5, 20), (15, 10)],
            [(25, 30), (30, 35), (20, 40), (15, 35), (25, 30)],
            1, 7,
        ),
        "three-points": (
            [(15, 10), (30, 25), (25, 30), (20, 35), (15, 35), (5, 20), (15, 10)],
            [(25, 30), (30, 35), (20, 40), (15, 35), (20, 35), (25, 30)],
            1, 7,
        ),
    }

    def variants(pts):
        open_pts = pts[:-1]
        for rev in (False, True):
            p = list(reversed(open_pts)) if rev else list(open_pts)
            for rot in range(len(p)):
                q = p[rot:] + p[:rot]
                yield q + [q[0]]

    rows = []
    expect = {}
    vid = 0
    for name, (a, b, n_rings, n_open) in fixtures.items():
        for va in variants(a):
            for vb in variants(b):
                key = f"{name}:{vid}"
                rows.append((1, key, [p[0] for p in va], [p[1] for p in va]))
                rows.append((2, key, [p[0] for p in vb], [p[1] for p in vb]))
                expect[key] = (n_rings, n_open)
                vid += 1
    df = spark.createDataFrame(rows, "id long, typ string, lats array<int>, lons array<int>")
    out = merge_shapes(df, ["typ"]).collect()
    got: dict[str, list] = {}
    for r in out:
        got.setdefault(r["typ"], []).append(r)
    assert set(got) == set(expect)
    for key, (n_rings, n_open) in expect.items():
        rings = got[key]
        assert len(rings) == n_rings, key
        assert rings[0]["n_points"] == n_open, (key, rings[0]["n_points"])
        assert sorted(rings[0]["member_ids"]) == [1, 2], key


# -------------------------------------------------------- NumbersTest
def test_numbers_plausibility():
    """NumbersTest: the full plausibility matrix for number-interval
    specs (imgfmt/app/net/NumbersTest.java), via the engine's Numbers
    record — the same strings the Polish reader's Numbers<i>= lines
    carry."""
    from mkgmap_spark.operators.housenumbers import Numbers

    plausible = [
        "0,O,1,7,E,2,12",        # odd/even overlap is fine
        "0,B,1,7,B,8,15",        # both/both no overlap
        "0,B,1,7,E,8,16",        # both/even no overlap
        "0,B,10012,10024,N,0,0", # large numbers in range
        "0,O,15,15,O,15,15",     # single number both sides
        "0,O,15,15,O,13,13",     # single different number each side
    ]
    implausible = [
        "0,B,1,7,E,8,15",        # even style with odd number
        "0,B,1,7,B,7,16",        # overlap at start/end
        "0,B,1,7,E,6,16",        # both/even overlap
        "0,B,10012,1000240,N,0,0",  # delta beyond MAX_DELTA
        "0,B,10,23,O,15,15",     # single number inside other side
        "0,O,15,15,B,10,23",
        "0,O,13,15,O,15,15",     # single number equals other end
        "0,O,15,15,O,13,15",
        "0,O,15,13,O,15,15",
        "0,O,15,15,O,15,13",
    ]
    for spec in plausible:
        assert Numbers(spec).is_plausible(), spec
    for spec in implausible:
        assert not Numbers(spec).is_plausible(), spec


def test_numbers_count_matches():
    """NumbersTest.testCountMatchesValid / testCountMatchesGap."""
    from mkgmap_spark.operators.housenumbers import Numbers

    n = Numbers("0,O,1,7,E,2,12")
    assert n.count_matches(1) == 1
    assert n.count_matches(13) == 0
    g = Numbers("0,B,1,7,B,9,12")
    assert g.count_matches(1) == 1
    assert g.count_matches(7) == 1
    assert g.count_matches(8) == 0
    assert g.count_matches(13) == 0


def test_numbers_from_polish_source():
    """The Polish reader's raw Numbers<i>= strings parse into the same
    record ('0' tolerated as odd, NumberStyle.fromChar:64-66)."""
    from mkgmap_spark.operators.housenumbers import Numbers
    from mkgmap_spark.sources.polish import parse_mp

    feats, _ = parse_mp(
        "[IMG ID]\nID=1\n[END-IMG ID]\n"
        "[POLYLINE]\nType=0x06\nRoadID=1\n"
        "Numbers1=0,O,1,9,E,2,10\nNumbers2=1,0,11,15,N,-1,-1\n"
        "Data0=(0.0,0.0),(0.001,0.001)\n[END]\n"
    )
    nums = [Numbers(s) for s in feats[0]["numbers"]]
    assert nums[0].left_style == "O" and nums[0].right_end == 10
    assert nums[0].is_plausible()
    assert nums[1].left_style == "O"  # '0' tolerated
    assert nums[1].right_style == "N"
    assert nums[1].node == 1


# --------------------------------------------- RestrictionRelationTest
def test_restriction_except_masks(spark):
    """RestrictionRelationTest's except-mask matrix (basic/foot/
    foot+bike/psv/multiple/unknown/explicit-vehicle cases) through the
    engine's turn_restrictions."""
    from mkgmap_spark.operators.routing import turn_restrictions

    FOOT, BIKE, CAR, TRUCK, BUS, TAXI, EMERGENCY = 1, 2, 4, 16, 32, 64, 128
    DEFAULT = FOOT | EMERGENCY

    nodes = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 1000), (3, 0, 2000)], "id long, lat int, lon int"
    )
    ways = spark.createDataFrame(
        [(10, [0, 0], [0, 1000]), (11, [0, 0], [1000, 2000])],
        "id long, lats array<int>, lons array<int>",
    )
    members = [("from", "way", 10), ("via", "node", 2), ("to", "way", 11)]
    cases = {
        # rel id -> (tags, expected mask)
        200: ({"type": "restriction", "restriction": "no_left_turn",
               "except": "bicycle"}, BIKE | DEFAULT),
        201: ({"type": "restriction", "restriction:foot": "no_left_turn"},
              0xFF & ~FOOT),
        202: ({"type": "restriction", "restriction:foot": "no_left_turn",
               "restriction:bicycle": "no_left_turn"}, 0xFF & ~(FOOT | BIKE)),
        203: ({"type": "restriction", "restriction": "no_left_turn",
               "except": "psv"}, BUS | TAXI | DEFAULT),
        204: ({"type": "restriction", "restriction": "no_left_turn",
               "except": "psv;bicycle"}, BUS | TAXI | BIKE | DEFAULT),
        205: ({"type": "restriction", "restriction": "no_left_turn",
               "except": "psv;xyz;bicycle"}, BUS | TAXI | BIKE | DEFAULT),
        206: ({"type": "restriction", "restriction:motorcar": "no_left_turn",
               "restriction:hgv": "no_left_turn",
               "restriction:xyz": "no_left_turn"}, 0xFF & ~(CAR | TRUCK)),
    }
    rels = spark.createDataFrame(
        [(rid, tags, [{"role": r, "mtype": t, "ref": n} for r, t, n in members])
         for rid, (tags, _) in cases.items()],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    out = {r["rel_id"]: r["except_mask"] for r in turn_restrictions(rels, ways, nodes).collect()}
    for rid, (_tags, want) in cases.items():
        assert out.get(rid) == want, (rid, out.get(rid), want)
