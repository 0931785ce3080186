"""POI generation (--add-pois-to-areas / --add-pois-to-lines,
POIGeneratorHook semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.operators.poi_gen import areas_to_pois, lines_to_pois


def test_areas_to_pois_label_priority_and_cofg(spark):
    nodes = spark.createDataFrame(
        [
            (1, {"entrance": "yes"}, 10, 20),        # order 1
            (2, {"entrance": "main"}, 30, 40),       # order 0 (wins)
            (3, {"building": "entrance"}, 50, 60),   # order 2
            (4, {"shop": "bakery"}, 70, 80),         # not a label
        ],
        "id long, tags map<string,string>, lat int, lon int",
    )
    polys = spark.createDataFrame(
        [
            # ring contains label nodes 1 and 2 -> entrance=main wins
            (100, {"building": "yes"}, [10, 30, 99, 10], [20, 40, 99, 20]),
            # no label on ring -> centre of gravity, closing point excluded
            (101, {"landuse": "park"}, [0, 0, 8, 8, 0], [0, 8, 8, 0, 0]),
        ],
        "id long, tags map<string,string>, lats array<int>, lons array<int>",
    )
    out = {r["id"]: r for r in areas_to_pois(polys, nodes).collect()}
    assert (out[100]["lat"], out[100]["lon"]) == (30, 40)
    assert (out[101]["lat"], out[101]["lon"]) == (4, 4)  # mean of 4 ring pts
    assert out[100]["tags"]["mkgmap:area2poi"] == "true"
    assert out[100]["tags"]["building"] == "yes"


def test_lines_to_pois_points_and_mid(spark):
    lines = spark.createDataFrame(
        [
            # straight line, 3 points: start, end, 1 inner, mid at centre
            (1, {"highway": "x"}, [0, 0, 0], [0, 100, 400]),
            # consecutive duplicate inner point skipped
            (2, {}, [0, 5, 5, 9], [0, 5, 5, 9]),
        ],
        "id long, tags map<string,string>, lats array<int>, lons array<int>",
    )
    out = lines_to_pois(lines, planar=True).collect()
    by = {}
    for r in out:
        by.setdefault((r["id"], r["poi_type"]), []).append((r["lat"], r["lon"]))
    assert by[(1, "start")] == [(0, 0)]
    assert by[(1, "end")] == [(0, 400)]
    assert by[(1, "inner")] == [(0, 100)]
    assert by[(1, "mid")] == [(0, 200)]  # half of 400 planar units
    # line 2: inner points (5,5) dup-collapsed to one
    assert by[(2, "inner")] == [(5, 5)]
    assert all(r["tags"]["mkgmap:line2poi"] == "true" for r in out)
    assert {r["tags"]["mkgmap:line2poitype"] for r in out} == {"start", "end", "inner", "mid"}


def test_lines_to_pois_degenerate(spark):
    """Zero-length (all-equal-point) lines must not NaN out."""
    lines = spark.createDataFrame(
        [(1, {}, [7, 7], [9, 9])],
        "id long, tags map<string,string>, lats array<int>, lons array<int>",
    )
    rows = {r["poi_type"]: (r["lat"], r["lon"]) for r in lines_to_pois(lines, planar=True).collect()}
    assert rows["start"] == (7, 9) and rows["end"] == (7, 9)
    assert rows["mid"] == (7, 9)


def test_name_from_tag_list(spark):
    """--name-tag-list: first non-null tag of the list becomes name."""
    from mkgmap_spark.operators.text import name_from_tag_list

    df = spark.createDataFrame(
        [
            (1, {"name": "local", "name:en": "english"}),
            (2, {"int_name": "intl"}),
            (3, {"shop": "bakery"}),
        ],
        "id long, tags map<string,string>",
    )
    out = {
        r["id"]: r["tags"].get("name")
        for r in name_from_tag_list(df, "name:en, int_name, name").collect()
    }
    assert out == {1: "english", 2: "intl", 3: None}
    # default list is a no-op
    same = {r["id"]: r["tags"].get("name") for r in name_from_tag_list(df).collect()}
    assert same[1] == "local"
