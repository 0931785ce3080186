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


def test_poi_gen_edge_cases(spark):
    """Empty rings emit no POI (no ANSI divide-by-zero); dateline-
    crossing segments measure the short way; empty name spec no-ops."""
    from mkgmap_spark.operators.text import name_from_tag_list

    polys = spark.createDataFrame(
        [(1, {"building": "yes"}, [], []), (2, {"building": "yes"}, [4, 4], [0, 8])],
        "id long, tags map<string,string>, lats array<int>, lons array<int>",
    )
    nodes = spark.createDataFrame([], "id long, tags map<string,string>, lat int, lon int")
    out = areas_to_pois(polys, nodes).collect()
    assert [r["id"] for r in out] == [2]

    # dateline wrap affects segment LENGTHS (Coord.distance wraps the
    # short way): the first segment crosses the antimeridian and is 20
    # units, not 2^24-20, so the midpoint lands in the SECOND segment
    # (interpolation itself is raw, like the reference's
    # makeBetweenPoint)
    H = 1 << 23
    lines = spark.createDataFrame(
        [(1, {}, [0, 0, 0], [H - 10, -(H - 10), -(H - 10) + 1000])],
        "id long, tags map<string,string>, lats array<int>, lons array<int>",
    )
    mid = [r for r in lines_to_pois(lines).collect() if r["poi_type"] == "mid"][0]
    # half of (20 + 1000) = 510 -> 490 into segment 2
    assert mid["lon"] == -(H - 10) + 490

    df = spark.createDataFrame([(1, {"name": "x"})], "id long, tags map<string,string>")
    assert name_from_tag_list(df, "  ").collect()[0]["tags"]["name"] == "x"
