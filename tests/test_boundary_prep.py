"""Boundary preparer (operators/boundary_prep.py): the precompiled-
bounds ETL — usability filter, location-info parsing (incl. the
admin_level=2 ISO substitution), raster split arithmetic, and the
end-to-end elements -> per-cell clipped rings flow feeding pip_join."""

from __future__ import annotations

import numpy as np

from mkgmap_spark.operators.boundary_prep import (
    RASTER,
    UNSET_ADMIN_LEVEL,
    is_boundary,
    parse_boundary_tags,
    prepare_boundaries,
    split_begin,
    split_end,
)


def test_split_arithmetic():
    assert split_begin(0) == 0
    assert split_begin(49999) == 0
    assert split_begin(50000) == 50000
    assert split_begin(-1) == -50000
    assert split_begin(-50000) == -50000
    assert split_end(0) == 0
    assert split_end(1) == 50000
    assert split_end(-49999) == 0
    assert split_end(-50000) == -50000


def test_parse_boundary_tags():
    # plain admin boundary
    adm, name, zipc = parse_boundary_tags(
        {"boundary": "administrative", "admin_level": "6", "name": "Kreis X; alt"}
    )
    assert adm == 6 and name == "Kreis X" and zipc is None
    # admin_level outside 2..11 / non-numeric -> unset
    assert parse_boundary_tags({"boundary": "administrative", "admin_level": "12"})[0] == UNSET_ADMIN_LEVEL
    assert parse_boundary_tags({"boundary": "administrative", "admin_level": "x"})[0] == UNSET_ADMIN_LEVEL
    assert parse_boundary_tags({"admin_level": "6"})[0] == UNSET_ADMIN_LEVEL
    # admin_level=2: the name is replaced by the LocatorConfig ISO code
    adm, name, _ = parse_boundary_tags(
        {"boundary": "administrative", "admin_level": "2", "name": "Deutschland"}
    )
    assert adm == 2 and name == "DEU"
    # level-2 fallback order name -> name:en -> int_name
    adm, name, _ = parse_boundary_tags(
        {"boundary": "administrative", "admin_level": "2", "name:en": "France"}
    )
    assert name == "FRA"
    # unknown country keeps the raw (first-part) name
    adm, name, _ = parse_boundary_tags(
        {"boundary": "administrative", "admin_level": "2", "name": "Atlantis"}
    )
    assert name == "Atlantis"
    # postal code via tag and via boundary=postal_code name
    assert parse_boundary_tags({"postal_code": "12345"})[2] == "12345"
    assert parse_boundary_tags({"boundary": "postal_code", "name": "54321 Town"})[2] == "54321"


def test_is_boundary():
    adm_tags = {"boundary": "administrative", "admin_level": "6", "name": "X"}
    assert is_boundary("relation", {"type": "boundary", **adm_tags}, False)
    assert is_boundary("relation", {"type": "multipolygon", **adm_tags}, False)
    assert not is_boundary("relation", {"type": "route", **adm_tags}, False)
    assert is_boundary("way", adm_tags, True)
    assert not is_boundary("way", adm_tags, False)  # open way
    assert not is_boundary("node", adm_tags, True)
    # no relevant tags
    assert not is_boundary("way", {"boundary": "administrative"}, True)
    # level 3-11 with only an int_name-like key
    assert is_boundary(
        "way", {"boundary": "administrative", "admin_level": "4", "int_name": "y"}, True
    )
    # zip alone suffices
    assert is_boundary("way", {"postal_code": "999"}, True)


def _grid_elements(spark):
    """One closed admin way spanning two raster cells, one boundary
    relation of two member ways, one irrelevant way."""
    mu = RASTER
    rows = []
    # nodes for the admin way: a rectangle from (10, 10) to (mu+10, ...)
    way_pts = [(10, 10), (10, mu + 10), (mu // 2, mu + 10), (mu // 2, 10), (10, 10)]
    nid = 1
    refs = []
    for la, lo in way_pts:
        rows.append({"id": nid, "kind": "node", "tags": {}, "lat": la, "lon": lo,
                     "refs": None, "members": None})
        refs.append(nid)
        nid += 1
    rows.append({"id": 100, "kind": "way",
                 "tags": {"boundary": "administrative", "admin_level": "6", "name": "Span; x"},
                 "lat": None, "lon": None, "refs": refs, "members": None})
    # relation: two half-rings forming a closed square inside one cell
    half1 = [(100, 100), (100, 2000), (2000, 2000)]
    half2 = [(2000, 2000), (2000, 100), (100, 100)]
    r1, r2 = [], []
    for la, lo in half1:
        rows.append({"id": nid, "kind": "node", "tags": {}, "lat": la, "lon": lo,
                     "refs": None, "members": None})
        r1.append(nid)
        nid += 1
    for la, lo in half2:
        rows.append({"id": nid, "kind": "node", "tags": {}, "lat": la, "lon": lo,
                     "refs": None, "members": None})
        r2.append(nid)
        nid += 1
    rows.append({"id": 200, "kind": "way", "tags": {}, "lat": None, "lon": None,
                 "refs": r1, "members": None})
    rows.append({"id": 201, "kind": "way", "tags": {}, "lat": None, "lon": None,
                 "refs": r2, "members": None})
    rows.append({"id": 300, "kind": "relation",
                 "tags": {"type": "boundary", "boundary": "administrative",
                          "admin_level": "2", "name": "Deutschland"},
                 "lat": None, "lon": None, "refs": None,
                 "members": [{"role": "outer", "mtype": "way", "ref": 200},
                             {"role": "outer", "mtype": "way", "ref": 201}]})
    # irrelevant closed way
    rows.append({"id": 400, "kind": "way", "tags": {"landuse": "forest"},
                 "lat": None, "lon": None, "refs": refs, "members": None})
    from mkgmap_spark.sources.o5m import O5M_SCHEMA

    return spark.createDataFrame(rows, O5M_SCHEMA)


def test_prepare_boundaries_end_to_end(spark):
    out = prepare_boundaries(_grid_elements(spark)).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["boundary_id"], []).append(r)

    # the spanning way covers two lon cells (0 and RASTER)
    w = by_id["w100"]
    assert sorted((r["cell_lat"], r["cell_lon"]) for r in w) == [(0, 0), (0, RASTER)]
    assert all(r["admin_level"] == 6 and r["name"] == "Span" for r in w)
    for r in w:
        la, lo = np.array(r["lats"]), np.array(r["lons"])
        assert la[0] == la[-1] and lo[0] == lo[-1]  # closed
        assert lo.min() >= r["cell_lon"] and lo.max() <= r["cell_lon"] + RASTER

    # the relation assembled into one ring in cell (0, 0), ISO-named
    r300 = by_id["r300"]
    assert len(r300) == 1
    assert r300[0]["admin_level"] == 2 and r300[0]["name"] == "DEU"
    assert (r300[0]["cell_lat"], r300[0]["cell_lon"]) == (0, 0)

    # the forest way is filtered out
    assert "w400" not in by_id


def test_prepared_boundaries_feed_pip_join(spark):
    """The preparer's output drives the existing PIP location join."""
    from pyspark.sql import functions as F

    from mkgmap_spark.operators.pip_join import pip_join

    prepared = prepare_boundaries(_grid_elements(spark))
    b = (
        prepared.filter("boundary_id = 'r300'")
        .groupBy("boundary_id")
        .agg(
            F.first("admin_level").alias("admin_level"),
            F.first("name").alias("name"),
            F.first("zip").alias("postcode"),
            F.collect_list(
                F.struct(F.col("lats"), F.col("lons"), F.col("is_hole"))
            ).alias("rings"),
        )
    )
    pts = spark.createDataFrame(
        [(1, 1000, 1000), (2, 3000, 3000)], "id long, ay int, ax int"
    )
    res = pip_join(pts, b, strategy="broadcast")
    got = {r["id"]: r for r in res.collect()}
    assert 1 in got and got[1]["name"] == "DEU"
    assert 2 not in got
