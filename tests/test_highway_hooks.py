"""HighwayHooks (roundabout oneway, opposite cycleways, exit refs) —
scenario tests for the edges the gate query's arithmetic mix can miss."""

from __future__ import annotations


from mkgmap_spark.operators.highway_hooks import (
    exit_road_refs,
    highway_hooks_ways,
    synthesize_cycleways,
)


def _ways(spark, rows):
    return spark.createDataFrame(
        [(int(r["id"]), dict(r["tags"])) for r in rows],
        schema="id long, tags map<string,string>")


def test_roundabout_implicit_oneway(spark):
    out = {r.id: dict(r.tags) for r in highway_hooks_ways(_ways(spark, [
        {"id": 1, "tags": {"highway": "primary", "junction": "roundabout"}},
        {"id": 2, "tags": {"highway": "primary", "junction": "roundabout",
                           "oneway": "no"}},     # explicit wins
        {"id": 3, "tags": {"junction": "roundabout"}},  # not a road
        {"id": 4, "tags": {"route": "ferry", "junction": "roundabout"}},
    ])).collect()}
    assert out[1]["oneway"] == "yes"
    assert out[2]["oneway"] == "no"
    assert "oneway" not in out[3]
    assert out[4]["oneway"] == "yes"


def test_opposite_cycleway_ladder(spark):
    out = {r.id: dict(r.tags) for r in highway_hooks_ways(_ways(spark, [
        # oneway + bicycle exception -> flagged
        {"id": 1, "tags": {"highway": "primary", "oneway": "yes",
                           "oneway:bicycle": "no"}},
        # reverse oneway + opposite lane on the left -> flagged
        {"id": 2, "tags": {"highway": "primary", "oneway": "-1",
                           "cycleway:left": "opposite_lane"}},
        # already a cycleway -> never flagged
        {"id": 3, "tags": {"highway": "cycleway", "oneway": "yes",
                           "oneway:bicycle": "no"}},
        # not oneway -> no flag
        {"id": 4, "tags": {"highway": "primary", "cycleway": "opposite"}},
        # roundabout's implicit oneway feeds the ladder
        {"id": 5, "tags": {"highway": "primary", "junction": "roundabout",
                           "cycleway": "opposite"}},
    ]), make_opposite_cycleways=True).collect()}
    assert out[1].get("mkgmap:make-cycle-way") == "yes"
    assert out[2].get("mkgmap:make-cycle-way") == "yes"
    assert "mkgmap:make-cycle-way" not in out[3]
    assert "mkgmap:make-cycle-way" not in out[4]
    assert out[5].get("mkgmap:make-cycle-way") == "yes"


def test_synthesize_cycleway_tags(spark):
    rows = synthesize_cycleways(_ways(spark, [
        {"id": 1, "tags": {"highway": "primary", "oneway": "yes",
                           "mkgmap:make-cycle-way": "yes",
                           "motorcar": "yes", "foot": "designated",
                           "name": "High St"}},
        {"id": 2, "tags": {"highway": "primary"}},
    ])).collect()
    by_kind = {}
    for r in rows:
        t = dict(r.tags)
        by_kind[(r.id, t.get("mkgmap:synthesised") == "yes")] = t
    assert len(rows) == 3
    orig = by_kind[(1, False)]
    assert "mkgmap:make-cycle-way" not in orig
    assert orig["motorcar"] == "yes" and orig["oneway"] == "yes"
    cyc = by_kind[(1, True)]
    assert cyc["access"] == "no" and cyc["bicycle"] == "yes"
    assert cyc["oneway"] == "no" and cyc["name"] == "High St"
    assert "motorcar" not in cyc and "foot" not in cyc


def test_exit_refs_pretagged_and_lowest_way(spark):
    nodes = _ways(spark, [
        {"id": 10, "tags": {"highway": "motorway_junction"}},
        {"id": 11, "tags": {"highway": "motorway_junction",
                            "exit:road_ref": "KEEP"}},
        {"id": 12, "tags": {"highway": "services"}},
        {"id": 13, "tags": {"highway": "bus_stop"}},
    ])
    ways = spark.createDataFrame(
        [(100, {"highway": "motorway", "ref": "M1"}, [10, 11, 12]),
         (99, {"highway": "trunk", "ref": "T9"}, [10]),
         (101, {"highway": "motorway"}, [12])],
        schema="id long, tags map<string,string>, refs array<long>")
    out = {r.id: dict(r.tags) for r in exit_road_refs(nodes, ways).collect()}
    assert set(out) == {10, 11, 12}  # bus_stop is not an exit
    assert out[10]["exit:road_ref"] == "T9"  # lowest way id wins
    assert out[11]["exit:road_ref"] == "KEEP"
    assert out[12]["exit:road_ref"] == "M1"  # ref-less way 101 ignored
    assert out[10]["mkgmap:osmid"] == "10"
