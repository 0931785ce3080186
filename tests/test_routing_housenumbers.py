"""Turn restrictions (RestrictionRelation semantics) and housenumber
interval generation (HousenumberGenerator semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.operators.housenumbers import housenumber_intervals, project_houses
from mkgmap_spark.operators.routing import DEFAULT_EXCEPT_MASK, turn_restrictions


def _members(*trip):
    return [{"role": r, "mtype": t, "ref": i} for r, t, i in trip]


def test_turn_restrictions_validation(spark):
    nodes = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 1000), (3, 0, 2000), (9, 500, 500)],
        "id long, lat int, lon int",
    )
    ways = spark.createDataFrame(
        [(10, [0, 0], [0, 1000]), (11, [0, 0], [1000, 2000])],
        "id long, lats array<int>, lons array<int>",
    )
    rels = spark.createDataFrame(
        [
            # valid: via node 2 is end of both ways
            (100, {"type": "restriction", "restriction": "no_left_turn"},
             _members(("from", "way", 10), ("via", "node", 2), ("to", "way", 11))),
            # unsupported restriction kind
            (101, {"type": "restriction", "restriction": "no_parking"},
             _members(("from", "way", 10), ("via", "node", 2), ("to", "way", 11))),
            # via node not on the from way
            (102, {"type": "restriction", "restriction": "no_u_turn"},
             _members(("from", "way", 10), ("via", "node", 9), ("to", "way", 11))),
            # except list ORs vehicle bits in
            (103, {"type": "restriction", "restriction": "only_right_turn", "except": "bicycle; psv"},
             _members(("from", "way", 10), ("via", "node", 2), ("to", "way", 11))),
            # type=restriction:motorcar restricts only cars
            (104, {"type": "restriction:motorcar", "restriction": "no_straight_on"},
             _members(("from", "way", 10), ("via", "node", 2), ("to", "way", 11))),
            # two from ways -> dropped
            (105, {"type": "restriction", "restriction": "no_left_turn"},
             _members(("from", "way", 10), ("from", "way", 11), ("via", "node", 2), ("to", "way", 11))),
        ],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    out = {r["rel_id"]: r for r in turn_restrictions(rels, ways, nodes).collect()}
    assert set(out) == {100, 103, 104}
    assert out[100]["except_mask"] == DEFAULT_EXCEPT_MASK  # foot|emergency
    assert out[100]["via_lat"] == 0 and out[100]["via_lon"] == 1000
    assert out[103]["except_mask"] == DEFAULT_EXCEPT_MASK | 2 | 96  # + bike + psv
    assert out[104]["except_mask"] == 0xFF & ~4  # everything but CAR


def test_housenumber_intervals(spark):
    roads = spark.createDataFrame(
        [(1, [0, 0], [0, 20000])], "road_id long, lats array<int>, lons array<int>"
    )
    houses = spark.createDataFrame(
        [
            # left side (hy > 0 on west-east road): odd numbers ascending
            (101, 1, 1, 500, 1000),
            (102, 3, 1, 500, 5000),
            (103, 5, 1, 500, 9000),
            # right side: even numbers with one order violation
            (201, 2, 1, -500, 2000),
            (202, 6, 1, -500, 6000),
            (203, 4, 1, -500, 10000),
        ],
        "house_id long, number int, road_id long, hy int, hx int",
    )
    proj = project_houses(houses, roads)
    rows = {r["house_id"]: r for r in proj.collect()}
    assert rows[101]["side"] == "L" and rows[201]["side"] == "R"
    assert rows[101]["t"] < rows[102]["t"] < rows[103]["t"]

    iv = {(r["road_id"], r["side"]): r for r in housenumber_intervals(proj).collect()}
    left = iv[(1, "L")]
    assert (left["style"], left["start_num"], left["end_num"], left["n_houses"]) == ("O", 1, 5, 3)
    assert not left["needs_split"]
    right = iv[(1, "R")]
    assert (right["style"], right["start_num"], right["end_num"]) == ("E", 2, 4)
    assert right["needs_split"]  # 2 -> 6 -> 4 reverses direction


def test_project_houses_multi_segment(spark):
    roads = spark.createDataFrame(
        [(1, [0, 0, 10000], [0, 10000, 10000])],
        "road_id long, lats array<int>, lons array<int>",
    )
    houses = spark.createDataFrame(
        [(1, 10, 1, 100, 5000), (2, 12, 1, 5000, 9900)],
        "house_id long, number int, road_id long, hy int, hx int",
    )
    rows = {r["house_id"]: r for r in project_houses(houses, roads).collect()}
    assert 0 <= rows[1]["t"] < 1  # first segment
    assert 1 <= rows[2]["t"] <= 2  # second segment


def test_housenumber_intervals_split(spark):
    """Direction reversals start new intervals; each interval is
    monotonic (HousenumberRoad.checkIntervals semantics)."""
    from mkgmap_spark.operators.housenumbers import housenumber_intervals_split

    # one road side, numbers 2,4,8 then back down 6,2a... use 2,4,8,6,4
    proj = spark.createDataFrame(
        [
            (1, 2, 1, 0.1, "R"),
            (2, 4, 1, 0.2, "R"),
            (3, 8, 1, 0.3, "R"),
            (4, 6, 1, 0.4, "R"),
            (5, 4, 1, 0.5, "R"),
            # a second side with no reversal
            (6, 1, 1, 0.1, "L"),
            (7, 3, 1, 0.2, "L"),
        ],
        "house_id long, number int, road_id long, t double, side string",
    )
    out = {(r["side"], r["interval"]): r for r in housenumber_intervals_split(proj).collect()}
    assert set(out) == {("R", 0), ("R", 1), ("L", 0)}
    r0, r1 = out[("R", 0)], out[("R", 1)]
    assert (r0["start_num"], r0["end_num"], r0["n_houses"]) == (2, 8, 3)
    assert (r1["start_num"], r1["end_num"], r1["n_houses"]) == (6, 4, 2)
    assert out[("L", 0)]["style"] == "O"


def test_turn_restriction_via_way(spark):
    """Single via-WAY restrictions: from joins one end of the via way,
    to the other; mismatched connections drop."""
    nodes = spark.createDataFrame([(1, 0, 0)], "id long, lat int, lon int")
    ways = spark.createDataFrame(
        [
            (10, [0, 0], [0, 1000]),       # from: ends at (0,1000)
            (20, [0, 0], [1000, 2000]),    # via:  (0,1000)-(0,2000)
            (11, [0, 0], [2000, 3000]),    # to:   starts at (0,2000)
            (12, [500, 500], [0, 500]),    # disconnected
        ],
        "id long, lats array<int>, lons array<int>",
    )
    rels = spark.createDataFrame(
        [
            (200, {"type": "restriction", "restriction": "no_u_turn"},
             _members(("from", "way", 10), ("via", "way", 20), ("to", "way", 11))),
            (201, {"type": "restriction", "restriction": "no_u_turn"},
             _members(("from", "way", 10), ("via", "way", 20), ("to", "way", 12))),
        ],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    out = {r["rel_id"]: r for r in turn_restrictions(rels, ways, nodes).collect()}
    assert set(out) == {200}
    r = out[200]
    assert r["via_way"] == 20 and r["via_node"] is None
    assert (r["via_lat"], r["via_lon"]) == (0, 1000)  # from x via junction


def test_turn_restriction_via_way_chain(spark):
    """Multi-via-way chains (RestrictionRelation.java:235-248, :375-399):
    the ordered via ways walk junction-to-junction; the dual-carriageway
    U-turn ban is the canonical real-world 2-via-way case."""
    nodes = spark.createDataFrame([(1, 0, 0)], "id long, lat int, lon int")
    ways = spark.createDataFrame(
        [
            (10, [0, 0], [0, 1000]),        # from: ends at (0,1000)
            (20, [0, 0], [1000, 2000]),     # via1: (0,1000)-(0,2000)
            (21, [0, 5], [2000, 2000]),     # via2: (0,2000)-(5,2000), REVERSED walk ok
            (22, [5, 5], [2000, 3000]),     # via3: (5,2000)-(5,3000)
            (11, [5, 9], [3000, 3000]),     # to: starts at (5,3000)
            (12, [500, 500], [0, 500]),     # disconnected
            (30, [7, 7, 7], [0, 100, 0]),   # closed ring (start==end)
        ],
        "id long, lats array<int>, lons array<int>",
    )
    tags = {"type": "restriction", "restriction": "no_u_turn"}
    rels = spark.createDataFrame(
        [
            # 3-way chain, all connected in member order
            (300, tags, _members(("from", "way", 10), ("via", "way", 20),
                                 ("via", "way", 21), ("via", "way", 22), ("to", "way", 11))),
            # 2-way chain where 'to' attaches at the middle, not the end
            (301, tags, _members(("from", "way", 10), ("via", "way", 20),
                                 ("via", "way", 21), ("to", "way", 11))),
            # broken chain: via2 disconnected from via1
            (302, tags, _members(("from", "way", 10), ("via", "way", 20),
                                 ("via", "way", 12), ("to", "way", 11))),
            # chain out of member order (22 before 21) -> walk breaks
            (303, tags, _members(("from", "way", 10), ("via", "way", 20),
                                 ("via", "way", 22), ("via", "way", 21), ("to", "way", 11))),
            # closed via way -> ambiguous, dropped
            (304, tags, _members(("from", "way", 10), ("via", "way", 30), ("to", "way", 11))),
            # via way doubling as the from way -> dropped
            (305, tags, _members(("from", "way", 20), ("via", "way", 20), ("to", "way", 11))),
            # unresolved via ref -> dropped
            (306, tags, _members(("from", "way", 10), ("via", "way", 999), ("to", "way", 11))),
        ],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    out = {r["rel_id"]: r for r in turn_restrictions(rels, ways, nodes).collect()}
    assert set(out) == {300}
    r = out[300]
    assert r["via_ways"] == [20, 21, 22]
    assert r["via_way"] == 20
    # junction where the restriction starts: from x first via way
    assert (r["via_lat"], r["via_lon"]) == (0, 1000)


def test_turn_restriction_multi_from_to(spark):
    """no_entry accepts multiple 'from' ways, no_exit multiple 'to'
    ways (RestrictionRelation.java:250-265) — one restriction row per
    from x to pair, all-or-nothing per relation when a member fails to
    touch the via node."""
    nodes = spark.createDataFrame(
        [(1, 0, 1000), (9, 500, 500)], "id long, lat int, lon int"
    )
    ways = spark.createDataFrame(
        [
            (10, [0, 0], [0, 1000]),      # ends at via (0,1000)
            (11, [0, 0], [1000, 2000]),   # starts at via
            (12, [0, 7], [1000, 3000]),   # starts at via
            (13, [500, 600], [0, 500]),   # NOT at via
        ],
        "id long, lats array<int>, lons array<int>",
    )
    rels = spark.createDataFrame(
        [
            # two from ways into one to way: no_entry -> 2 rows
            (500, {"type": "restriction", "restriction": "no_entry"},
             _members(("from", "way", 11), ("from", "way", 12),
                      ("via", "node", 1), ("to", "way", 10))),
            # one from, two to: no_exit -> 2 rows
            (501, {"type": "restriction", "restriction": "no_exit"},
             _members(("from", "way", 10), ("via", "node", 1),
                      ("to", "way", 11), ("to", "way", 12))),
            # multi-from NOT allowed for other kinds
            (502, {"type": "restriction", "restriction": "no_left_turn"},
             _members(("from", "way", 11), ("from", "way", 12),
                      ("via", "node", 1), ("to", "way", 10))),
            # one of the from ways misses the via node -> whole relation drops
            (503, {"type": "restriction", "restriction": "no_entry"},
             _members(("from", "way", 11), ("from", "way", 13),
                      ("via", "node", 1), ("to", "way", 10))),
        ],
        "id long, tags map<string,string>, "
        "members array<struct<role: string, mtype: string, ref: long>>",
    )
    out = turn_restrictions(rels, ways, nodes).collect()
    by_rel = {}
    for row in out:
        by_rel.setdefault(row["rel_id"], []).append((row["from_way"], row["to_way"]))
    assert set(by_rel) == {500, 501}
    assert sorted(by_rel[500]) == [(11, 10), (12, 10)]
    assert sorted(by_rel[501]) == [(10, 11), (10, 12)]


# ------------------------------------------------------- addr:interpolation
def test_interpolate_housenumbers_basic(spark):
    """even/odd/all step rules, calcSteps counts, even spacing along a
    straight way (interpretInterpolationWay + getInterpolatedPoints)."""
    from mkgmap_spark.operators.housenumbers import interpolate_housenumbers

    ways = spark.createDataFrame(
        [
            # straight E-W line, even 2..10 -> steps (10-2)/2-1 = 3: 4,6,8
            (1, "even", [1000, 1000], [0, 4000]),
            # odd 1..9 -> 3,5,7
            (2, "odd", [2000, 2000], [0, 4000]),
            # all 1..5 -> 2,3,4
            (3, "all", [3000, 3000], [0, 4000]),
            # alphabetic: ignored
            (4, "alphabetic", [4000, 4000], [0, 4000]),
        ],
        "way_id long, method string, lats array<int>, lons array<int>",
    )
    nodes = spark.createDataFrame(
        [
            (11, 2, "Main St", 1000, 0), (12, 10, "Main St", 1000, 4000),
            (21, 1, "Odd St", 2000, 0), (22, 9, "Odd St", 2000, 4000),
            (31, 1, "All St", 3000, 0), (32, 5, "All St", 3000, 4000),
            (41, 1, "X St", 4000, 0), (42, 9, "X St", 4000, 4000),
        ],
        "node_id long, number int, street string, y int, x int",
    )
    out = interpolate_housenumbers(ways, nodes, metric="planar").collect()
    by_way = {}
    for r in out:
        by_way.setdefault(r["way_id"], []).append(r)
    assert set(by_way) == {1, 2, 3}
    nums = sorted(r["number"] for r in by_way[1])
    assert nums == [4, 6, 8]
    # even spacing: 4 intervals over 4000 units -> lon 1000, 2000, 3000
    lons = sorted(r["lon"] for r in by_way[1])
    assert lons == [1000, 2000, 3000]
    assert all(r["lat"] == 1000 and r["street"] == "Main St" for r in by_way[1])
    assert sorted(r["number"] for r in by_way[2]) == [3, 5, 7]
    assert sorted(r["number"] for r in by_way[3]) == [2, 3, 4]


def test_interpolate_housenumbers_rejections(spark):
    """Whole-way rejections: parity violation under even/odd, mixed
    street names; descending numbers still interpolate (usedStep < 0)."""
    from mkgmap_spark.operators.housenumbers import interpolate_housenumbers

    ways = spark.createDataFrame(
        [
            (1, "even", [0, 0], [0, 4000]),     # 2..9: odd endpoint -> reject
            (2, "odd", [100, 100], [0, 4000]),  # 2..9: even endpoint -> reject
            # two ELIGIBLE pairs with different street names -> reject
            # whole way (a mixed pair alone is merely skipped)
            (3, "all", [200, 200, 200, 200], [0, 2000, 4000, 6000]),
            (4, "even", [300, 300], [0, 4000]),  # descending 10..2
            # a single mixed-street pair: the pair is skipped, no houses
            (5, "all", [400, 400], [0, 4000]),
        ],
        "way_id long, method string, lats array<int>, lons array<int>",
    )
    nodes = spark.createDataFrame(
        [
            (11, 2, "A St", 0, 0), (12, 9, "A St", 0, 4000),
            (21, 2, "B St", 100, 0), (22, 9, "B St", 100, 4000),
            (31, 1, "C St", 200, 0), (32, 5, "C St", 200, 2000),
            (33, 9, "D St", 200, 4000), (34, 13, "D St", 200, 6000),
            (41, 10, "E St", 300, 0), (42, 2, "E St", 300, 4000),
            (51, 1, "F St", 400, 0), (52, 9, "G St", 400, 4000),
        ],
        "node_id long, number int, street string, y int, x int",
    )
    out = interpolate_housenumbers(ways, nodes, metric="planar").collect()
    by_way = {}
    for r in out:
        by_way.setdefault(r["way_id"], []).append(r)
    assert 1 not in by_way and 2 not in by_way and 3 not in by_way and 5 not in by_way
    # way 4: 10 down to 2, steps = 8/2-1 = 3 -> 8, 6, 4 walking from start
    got = sorted((r["lon"], r["number"]) for r in by_way[4])
    assert got == [(1000, 8), (2000, 6), (3000, 4)]


def test_interpolate_housenumbers_multisegment_walk(spark):
    """Spacing follows the polyline arc length across bends, not the
    chord (getInterpolatedPoints's segment walk)."""
    from mkgmap_spark.operators.housenumbers import interpolate_housenumbers

    # L-shape: 3000 units east then 3000 north; all 1..7 -> 5 houses
    # at arc distances 1000..5000: three on the E leg, two on the N leg
    ways = spark.createDataFrame(
        [(1, "all", [0, 0, 3000], [0, 3000, 3000])],
        "way_id long, method string, lats array<int>, lons array<int>",
    )
    nodes = spark.createDataFrame(
        [(1, 1, "L St", 0, 0), (2, 7, "L St", 3000, 3000)],
        "node_id long, number int, street string, y int, x int",
    )
    out = {r["number"]: (r["lat"], r["lon"])
           for r in interpolate_housenumbers(ways, nodes, metric="planar").collect()}
    assert out == {
        2: (0, 1000), 3: (0, 2000), 4: (0, 3000),
        5: (1000, 3000), 6: (2000, 3000),
    }


def test_interpolate_housenumbers_interior_pairs(spark):
    """A way with three addressed nodes forms two intervals; the 0.1 m
    guard kills degenerate (zero-length) intervals in metric mode."""
    from mkgmap_spark.operators.housenumbers import interpolate_housenumbers

    ways = spark.createDataFrame(
        [(1, "even", [0, 0, 0], [0, 2000, 6000])],
        "way_id long, method string, lats array<int>, lons array<int>",
    )
    nodes = spark.createDataFrame(
        [
            (1, 2, "M St", 0, 0),
            (2, 6, "M St", 0, 2000),
            (3, 14, "M St", 0, 6000),
        ],
        "node_id long, number int, street string, y int, x int",
    )
    rows = interpolate_housenumbers(ways, nodes, metric="planar").collect()
    got = sorted((r["pair_idx"], r["number"], r["lon"]) for r in rows)
    # pair 0: 2..6 -> one house (4) at lon 1000; pair 1: 6..14 -> 8,10,12
    assert got == [(0, 4, 1000), (1, 8, 3000), (1, 10, 4000), (1, 12, 5000)]

    # equirect metric agrees on this E-W line (uniform scale per leg)
    rows_m = interpolate_housenumbers(ways, nodes, metric="equirect").collect()
    got_m = sorted((r["pair_idx"], r["number"], r["lon"]) for r in rows_m)
    assert got_m == got
