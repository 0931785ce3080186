"""Osmosis .poly reader + point-region semantics (sources/polyfile.py)
against the reference's PolygonFileReader grammar and the
java.awt.geom.Area add/subtract sequence it feeds
(MapBuilder --dem-poly -> Java2DConverter.readPolyFile)."""

import numpy as np
import pytest

from mkgmap_spark.mapunits import to_map_unit
from mkgmap_spark.sources.polyfile import (
    PolyRing,
    parse_poly,
    points_in_poly,
    read_poly,
    rect_poly_relation,
    write_poly,
)

POLY_TEXT = """australia_v
1
     0.1446763E+03    -0.3825659E+02
   0.1446693E+03  -0.3826255E+02
     0.1446627E+03    -0.3825661E+02

END
!2
     0.1422483E+03    -0.3839481E+02
     0.1422436E+03    -0.3839315E+02
     0.1422496E+03    -0.3839070E+02
END
END
"""


def test_parse_poly_grammar():
    rings = parse_poly(POLY_TEXT)
    assert [r.negative for r in rings] == [False, True]
    assert [r.name for r in rings] == ["1", "2"]
    assert len(rings[0].lats_mu) == 3
    assert rings[0].lats_mu[0] == to_map_unit(-0.3825659e02)
    assert rings[0].lons_mu[0] == to_map_unit(0.1446763e03)
    assert rings[1].lats_mu[-1] == to_map_unit(-0.3839070e02)


@pytest.mark.parametrize("text,err", [
    ("", "header"),
    ("name\n1\n 1.0 2.0\n", "END"),        # no section END
    ("name\n1\n 1.0 2.0\nEND\n", "END"),   # no global END
    ("name\n1\n 1.0\nEND\nEND\n", "coordinate"),
])
def test_parse_poly_malformed(text, err):
    with pytest.raises(ValueError, match=err):
        parse_poly(text)


def _ring(negative, pts_deg, name="r"):
    lats = to_map_unit(np.array([p[0] for p in pts_deg], dtype=np.float64))
    lons = to_map_unit(np.array([p[1] for p in pts_deg], dtype=np.float64))
    return PolyRing(name=name, negative=negative, lats_mu=lats, lons_mu=lons)


def test_points_in_poly_add_subtract_sequence():
    # 10x10-degree square, minus a 4x4 hole, plus a 1x1 island re-added
    # inside the hole — file order matters and is preserved
    outer = _ring(False, [(0, 0), (0, 10), (10, 10), (10, 0)])
    hole = _ring(True, [(3, 3), (3, 7), (7, 7), (7, 3)])
    island = _ring(False, [(4.5, 4.5), (4.5, 5.5), (5.5, 5.5), (5.5, 4.5)])
    rings = [outer, hole, island]
    pts_deg = [(1, 1), (5, 1), (5, 5), (4, 4), (5, 6.2), (11, 5), (-1, -1)]
    exp = [True, True, True, False, False, False, False]
    exp[2] = True  # (5,5) inside the re-added island
    lats = to_map_unit(np.array([p[0] for p in pts_deg], dtype=np.float64))
    lons = to_map_unit(np.array([p[1] for p in pts_deg], dtype=np.float64))
    got = points_in_poly(lats, lons, rings)
    assert got.tolist() == exp
    # without the island, the whole hole is outside
    got2 = points_in_poly(lats, lons, [outer, hole])
    assert got2.tolist() == [True, True, False, False, False, False, False]
    # scale: the same region tested at x256 (DEM units)
    got3 = points_in_poly(lats * 256, lons * 256, rings, scale=256)
    assert got3.tolist() == exp


def test_rect_poly_relation_tristate():
    outer = _ring(False, [(0, 0), (0, 10), (10, 10), (10, 0)])
    mu = lambda d: int(to_map_unit(float(d)))
    # rect fully inside the polygon -> contains (2)
    assert rect_poly_relation([outer], mu(2), mu(2), mu(8), mu(8)) == 2
    # rect crossing the boundary -> intersects (1)
    assert rect_poly_relation([outer], mu(5), mu(5), mu(15), mu(15)) == 1
    # disjoint -> 0
    assert rect_poly_relation([outer], mu(20), mu(20), mu(30), mu(30)) == 0
    # polygon entirely inside the rect (no edge crossing) -> intersects
    assert rect_poly_relation([outer], mu(-5), mu(-5), mu(15), mu(15)) == 1
    # a hole inside the rect flips contains -> intersects
    hole = _ring(True, [(3, 3), (3, 7), (7, 7), (7, 3)])
    assert rect_poly_relation([outer, hole], mu(2), mu(2), mu(8), mu(8)) == 1


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "clip.poly")
    write_poly(p, "clip", [
        (False, [0.0, 0.0, 10.0, 10.0], [0.0, 10.0, 10.0, 0.0]),
        (True, [3.0, 3.0, 7.0, 7.0], [3.0, 7.0, 7.0, 3.0]),
    ])
    rings = read_poly(p)
    assert [r.negative for r in rings] == [False, True]
    assert rings[0].lats_mu.tolist() == [
        to_map_unit(0.0), to_map_unit(0.0), to_map_unit(10.0), to_map_unit(10.0)]
