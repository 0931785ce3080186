"""Precompiled-sea source (--precomp-sea): index parsing, full-cell
rectangles, mixed-tile OSM round trip, and the clip path that the
aligned driver query deliberately avoids (SeaGenerator.java:83-96,
addPrecompSea:571-690)."""

from __future__ import annotations

import pandas as pd
import pytest

from mkgmap_spark.mapunits import to_degrees
from mkgmap_spark.sources.precomp_sea import (
    PRECOMP_RASTER,
    precomp_sea_polygons,
    precomp_tile_start,
    precomp_tile_end,
    read_precomp_index,
    write_precomp_fixture,
)

R = PRECOMP_RASTER


def test_tile_start_end_rounding():
    # getPrecompTileStart/End including the negative branch
    assert precomp_tile_start(0) == 0
    assert precomp_tile_start(R) == R
    assert precomp_tile_start(R + 1) == R
    assert precomp_tile_start(-1) == -R
    assert precomp_tile_start(-R) == -R
    assert precomp_tile_end(0) == 0
    assert precomp_tile_end(1) == R
    assert precomp_tile_end(-1) == 0
    assert precomp_tile_end(-R - 1) == -R


def _bounds(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_id", "min_lat", "min_lon", "max_lat", "max_lon"]),
        schema="tile_id long, min_lat long, min_lon long, max_lat long, max_lon long",
    )


def _square_elements(cell_lat, cell_lon, oy0, ox0, oy1, ox1, tags, way_id, nid0):
    corners = [
        (cell_lat + oy0, cell_lon + ox0), (cell_lat + oy1, cell_lon + ox0),
        (cell_lat + oy1, cell_lon + ox1), (cell_lat + oy0, cell_lon + ox1),
    ]
    els, refs = [], []
    for i, (yy, xx) in enumerate(corners):
        els.append({"kind": "node", "id": nid0 + i,
                    "lat_deg": float(to_degrees(yy)), "lon_deg": float(to_degrees(xx))})
        refs.append(nid0 + i)
    els.append({"kind": "way", "id": way_id, "refs": refs + [refs[0]], "tags": tags})
    return els


@pytest.mark.parametrize("gz", [True, False])
def test_index_parse_both_forms(spark, tmp_path, gz):
    d = str(tmp_path / ("gz" if gz else "plain"))
    write_precomp_fixture(
        d, [(0, 0, "sea"), (R, 0, "land"), (0, R, "tile.osm")],
        {"tile.osm": _square_elements(0, R, 100, 100, 200, 200, {"natural": "land"}, 7, 1)},
        gzip_index=gz,
    )
    idx = read_precomp_index(spark, d).orderBy("cell_lat", "cell_lon").collect()
    assert [(r["cell_lat"], r["cell_lon"], r["cell_type"]) for r in idx] == [
        (0, 0, "sea"), (0, R, "mixed"), (R, 0, "land"),
    ]
    assert idx[1]["file_name"] == "tile.osm"


def test_full_cells_clip_to_bbox(spark, tmp_path):
    """A bbox straddling cell boundaries clips full sea/land cells to
    partial rectangles; cells missing from the index are skipped."""
    d = str(tmp_path / "full")
    write_precomp_fixture(d, [(0, 0, "sea"), (0, R, "land")], {})
    # bbox covers x in [R/2, 3R/2] of both cells, y in [R/4, 3R/4];
    # also extends into the un-indexed cell row at lat=R (skipped)
    bounds = _bounds(spark, [(5, R // 4, R // 2, 3 * R // 4, 3 * R // 2)])
    out = precomp_sea_polygons(spark, d, bounds).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], set()).add((r["lat"], r["lon"]))
    assert by_kind["sea"] == {(R // 4, R // 2), (3 * R // 4, R // 2),
                              (3 * R // 4, R), (R // 4, R)}
    assert by_kind["land"] == {(R // 4, R), (3 * R // 4, R),
                               (3 * R // 4, 3 * R // 2), (R // 4, 3 * R // 2)}


def test_mixed_way_partial_clip(spark, tmp_path):
    """A mixed-tile way straddling the bbox edge is Sutherland-Hodgman
    clipped; the first vertex is inside so the clipped ring starts at
    the same corner and the clamped vertices are exact."""
    d = str(tmp_path / "mix")
    # square y,x in [R/4, 3R/4]^2 inside cell (0,0)
    write_precomp_fixture(
        d, [(0, 0, "mix.osm")],
        {"mix.osm": _square_elements(0, 0, R // 4, R // 4, 3 * R // 4, 3 * R // 4,
                                     {"natural": "land"}, 9, 1)},
    )
    # bbox cuts the square at x = R/2 (keeps the left half); first
    # vertex (R/4, R/4) stays inside
    bounds = _bounds(spark, [(1, 0, 0, R, R // 2)])
    out = precomp_sea_polygons(spark, d, bounds).orderBy("idx").collect()
    assert all(r["kind"] == "land" for r in out)
    got = [(r["lat"], r["lon"]) for r in out]
    # closed 4-corner ring (SH may rotate the starting vertex)
    assert len(got) == 5 and got[0] == got[-1]
    expect = [
        (R // 4, R // 4), (3 * R // 4, R // 4), (3 * R // 4, R // 2), (R // 4, R // 2),
    ]
    ring = got[:-1]
    assert set(ring) == set(expect)
    start = expect.index(ring[0])
    assert ring == expect[start:] + expect[:start]  # orientation preserved


def test_mixed_way_fully_outside_dropped(spark, tmp_path):
    d = str(tmp_path / "out")
    write_precomp_fixture(
        d, [(0, 0, "o.osm")],
        {"o.osm": _square_elements(0, 0, R // 2, R // 2, 3 * R // 4, 3 * R // 4,
                                   {"natural": "sea"}, 3, 1)},
    )
    # bbox only covers the cell's first quadrant — the way vanishes,
    # nothing else in the cell, so the tile emits zero rows
    bounds = _bounds(spark, [(1, 0, 0, R // 4, R // 4)])
    assert precomp_sea_polygons(spark, d, bounds).count() == 0


def test_sea_vs_land_tagging(spark, tmp_path):
    """natural=land -> land, anything else -> sea
    (addPrecompSea:640-645)."""
    d = str(tmp_path / "tag")
    els = _square_elements(0, 0, 100, 100, 200, 200, {"natural": "land"}, 1, 1)
    els += _square_elements(0, 0, 300, 300, 400, 400, {}, 2, 10)
    write_precomp_fixture(d, [(0, 0, "t.osm")], {"t.osm": els})
    bounds = _bounds(spark, [(1, 0, 0, R, R)])
    out = precomp_sea_polygons(spark, d, bounds)
    kinds = {r["way"]: r["kind"] for r in
             out.selectExpr("poly as way", "kind").distinct().collect()}
    assert set(kinds.values()) == {"land", "sea"}


def test_driver_query_fixture_deterministic():
    """Two builds of the driver-query fixture are byte-identical
    (index gzip written with fixed mtime)."""
    import os

    from mkgmap_spark.queries import _precomp_fixture_dir

    d = _precomp_fixture_dir()
    with open(os.path.join(d, "index.txt.gz"), "rb") as fh:
        first = fh.read()
    # force a rebuild next to it
    import shutil
    import tempfile

    tmp = os.path.join(tempfile.gettempdir(), "mkgmap_precomp_fixture_v1")
    marker = os.path.join(tmp, ".complete")
    os.remove(marker)
    d2 = _precomp_fixture_dir()
    with open(os.path.join(d2, "index.txt.gz"), "rb") as fh:
        assert fh.read() == first
