"""LinkDestinationHook semantics: tag ladder, chain dedup, 3-part
splitting, exit hints (reader/osm/LinkDestinationHook.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mkgmap_spark.operators.link_destination import (
    dedup_chain_hints,
    exit_hints,
    process_link_destinations,
    select_dest_hint,
    split_hint_parts,
)

WAYS_SCHEMA = "id long, tags map<string,string>, lats array<int>, lons array<int>"


def test_destination_tag_ladder(spark):
    rows = [
        (1, {"highway": "motorway_link", "destination": "Berlin"}, [0, 10], [0, 10]),
        # destination:lanes without '|' is used
        (2, {"highway": "motorway_link", "destination:lanes": "Hamburg"}, [0, 10], [0, 10]),
        # lane-specific '|' is NOT used -> falls to destination:street
        (3, {"highway": "motorway_link", "destination:lanes": "A|B",
             "destination:street": "Ring"}, [0, 10], [0, 10]),
        # directed lanes for oneway
        (4, {"highway": "motorway_link", "oneway": "yes",
             "destination:lanes:forward": "Kiel"}, [0, 10], [0, 10]),
        (5, {"highway": "motorway_link", "oneway": "-1",
             "destination:backward": "Bonn"}, [0, 10], [0, 10]),
        # non-link highway: no hint even with destination
        (6, {"highway": "motorway", "destination": "X"}, [0, 10], [0, 10]),
    ]
    df = spark.createDataFrame(rows, WAYS_SCHEMA)
    got = {r["id"]: r["dest_hint"] for r in select_dest_hint(df).collect()}
    assert got == {1: "Berlin", 2: "Hamburg", 3: "Ring", 4: "Kiel", 5: "Bonn", 6: None}


def test_chain_dedup(spark):
    # A (0,0)->(0,100) then B (0,100)->(0,200), same destination: B is
    # announced by A and drops; C with a different destination stays
    rows = [
        (1, {"highway": "motorway_link", "oneway": "yes", "destination": "X"},
         [0, 0], [0, 100]),
        (2, {"highway": "motorway_link", "oneway": "yes", "destination": "X"},
         [0, 0], [100, 200]),
        (3, {"highway": "motorway_link", "oneway": "yes", "destination": "Y"},
         [0, 0], [200, 300]),
        # reverse-oneway: cannot be entered at its first point -> kept
        (4, {"highway": "motorway_link", "oneway": "-1", "destination": "X"},
         [0, 0], [100, 150]),
    ]
    df = spark.createDataFrame(rows, WAYS_SCHEMA)
    links = select_dest_hint(df).filter(F.col("dest_hint").isNotNull())
    kept = {r["id"] for r in dedup_chain_hints(links).collect()}
    assert kept == {1, 3, 4}


def test_split_hint_parts_kernel():
    u = 1.0  # planar: 1 metre per unit for readable numbers
    # 200 m straight way, many points far apart: first existing point
    # at 150 m > maxLength for the 10/50 cut but <= min(len,100)?
    pts = [(0, 0), (0, 150), (0, 200)]
    parts = split_hint_parts(pts, u)
    # cut1 = min(100, 20) = 20, cut2 = min(200, 100) = 100:
    # first segment 150 > 100 -> interpolated cut at 20 m
    assert parts[0][0] == "approach" and parts[0][1] == [(0, 0), (0, 20)]
    # rest from (0,20): total 180 > 50 -> hint cut 10/50: first segment
    # 130 > 50 -> interpolated at 10 m
    assert parts[1][0] == "hint" and parts[1][1] == [(0, 20), (0, 30)]
    assert parts[2][0] == "rest" and parts[2][1][0] == (0, 30)

    # short way (< 10 m): nothing
    assert split_hint_parts([(0, 0), (0, 5)], u) == []

    # 40 m way: approach at min(20,20)=20, remainder all hint (<= 50)
    parts = split_hint_parts([(0, 0), (0, 40)], u)
    assert [p[0] for p in parts] == ["approach", "hint"]
    assert parts[0][1] == [(0, 0), (0, 20)] and parts[1][1] == [(0, 20), (0, 40)]

    # existing second point used when first segment <= min(len, 100)
    parts = split_hint_parts([(0, 0), (0, 30), (0, 200)], u)
    assert parts[0][1] == [(0, 0), (0, 30)]  # existing point, not 20 m


def test_process_destination_end_to_end(spark):
    rows = [
        (1, {"highway": "motorway_link", "oneway": "yes", "destination": "Z"},
         [0, 0, 0], [0, 3000, 60000]),
        # not oneway -> ignored
        (2, {"highway": "motorway_link", "destination": "Q"}, [0, 0], [0, 60000]),
    ]
    df = spark.createDataFrame(rows, WAYS_SCHEMA)
    out = process_link_destinations(df).collect()
    by = {(r["id"], r["role"]): r for r in out}
    assert {k[0] for k in by} == {1}
    assert (1, "approach") in by and (1, "hint") in by and (1, "rest") in by
    assert by[(1, "hint")]["dest_hint"] == "Z"
    assert by[(1, "approach")]["dest_hint"] is None
    # parts chain: approach ends where hint begins
    assert by[(1, "approach")]["lons"][-1] == by[(1, "hint")]["lons"][0]
    assert by[(1, "hint")]["lons"][-1] == by[(1, "rest")]["lons"][0]


def test_exit_hints(spark):
    # motorway through (0,0)-(0,1000)-(0,2000); junction node mid-way
    # at (0,1000) with a oneway link leaving it; a second junction node
    # NOT on any highway must be skipped
    ways = spark.createDataFrame(
        [
            (1, {"highway": "motorway"}, [0, 0, 0], [0, 1000, 2000]),
            (2, {"highway": "motorway_link", "oneway": "yes",
                 "destination": "Mitte"}, [0, 500], [1000, 1500]),
            (3, {"highway": "residential"}, [900, 900], [0, 100]),
        ],
        WAYS_SCHEMA,
    )
    nodes = spark.createDataFrame(
        [
            (10, {"highway": "motorway_junction", "ref": "12", "name": "Kreuz",
                  "exit_to": "Centre"}, 0, 1000),
            (11, {"highway": "motorway_junction", "ref": "13"}, 900, 0),
        ],
        "node_id long, tags map<string,string>, lat int, lon int",
    )
    out = exit_hints(ways, nodes).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_id"], r["way_id"]) == (10, 2)
    assert r["exit_hint"] is True
    assert r["exit_hint_ref"] == "12" and r["exit_hint_name"] == "Kreuz"
    # node 10 sits MID-way on the motorway: two same-tag neighbours ->
    # countMatches = 2 -> exit_to suppressed (:547-553)
    assert r["exit_hint_exit_to"] is None
    assert r["dest_hint"] == "Mitte"

    # junction at the END of the motorway: one neighbour -> exit_to used
    ways_end = spark.createDataFrame(
        [
            (1, {"highway": "motorway"}, [0, 0], [0, 1000]),
            (2, {"highway": "motorway_link", "oneway": "yes"}, [0, 500], [1000, 1500]),
        ],
        WAYS_SCHEMA,
    )
    out = exit_hints(ways_end, nodes).collect()
    assert len(out) == 1 and out[0]["exit_hint_exit_to"] == "Centre"


def test_integrated_exits_and_destinations(spark):
    """With nodes supplied, exit-adjacent links leave plain destination
    processing (processWays:556) and re-emerge as exit-tagged splits."""
    ways = spark.createDataFrame(
        [
            (1, {"highway": "motorway"}, [0, 0], [0, 1000]),
            # exit-adjacent link (from the junction node)
            (2, {"highway": "motorway_link", "oneway": "yes",
                 "destination": "Mitte"}, [0, 0], [1000, 61000]),
            # plain link elsewhere
            (3, {"highway": "motorway_link", "oneway": "yes",
                 "destination": "Nord"}, [90000, 90000], [0, 60000]),
        ],
        WAYS_SCHEMA,
    )
    nodes = spark.createDataFrame(
        [(10, {"highway": "motorway_junction", "ref": "7"}, 0, 1000)],
        "node_id long, tags map<string,string>, lat int, lon int",
    )
    out = process_link_destinations(ways, nodes=nodes, metric="planar").collect()
    by = {}
    for r in out:
        by.setdefault(r["id"], {})[r["role"]] = r
    assert set(by) == {2, 3}
    # way 2: exit path — hint part carries the exit attributes
    h2 = by[2]["hint"]
    assert h2["exit_hint"] is True and h2["exit_hint_ref"] == "7"
    assert h2["dest_hint"] == "Mitte"  # dest text still available
    assert by[2]["approach"]["exit_hint"] is None
    # way 3: plain destination path, no exit attrs
    h3 = by[3]["hint"]
    assert h3["dest_hint"] == "Nord" and h3["exit_hint"] is None
