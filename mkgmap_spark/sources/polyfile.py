"""Osmosis polygon-filter (``.poly``) file reader.

Grammar per the reference's bundled PolygonFileReader
(src/org/openstreetmap/osmosis/core/filter/common/PolygonFileReader.java,
public domain): a header line naming the polygon, then ring sections —
a section-name line (``!`` prefix marks a SUBTRACTIVE ring), coordinate
lines ``<lon> <lat>`` in degrees (scientific notation allowed, extra
whitespace ignored, blank lines skipped), ``END`` closing each section —
terminated by a global ``END``.  Rings close implicitly back to their
first point.

mkgmap consumes this behind ``--dem-poly``
(build/MapBuilder.java:219-221 -> util/Java2DConverter.readPolyFile:369,
which converts the degree rings to integer map units via
Utils.toMapUnit before handing them to the DEM lattice clip).  We keep
the same two-stage shape: :func:`parse_poly` returns map-unit rings,
:func:`points_in_poly` evaluates the java.awt.geom.Area add/subtract
sequence point-wise (vectorized winding number, nonzero rule — Path2D's
default WIND_NON_ZERO).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..functions.geometry import winding_number
from ..mapunits import to_map_unit


@dataclass(frozen=True)
class PolyRing:
    """One ring section in file order; coords in integer map units."""

    name: str
    negative: bool
    lats_mu: np.ndarray  # int64
    lons_mu: np.ndarray  # int64


def parse_poly(text: str) -> List[PolyRing]:
    """Parse a ``.poly`` file body into map-unit rings (file order).

    Raises ``ValueError`` on the same malformations PolygonFileReader
    rejects: a missing header, EOF before a section/global ``END``, or
    a coordinate line without two numeric tokens.
    """
    lines = text.splitlines()
    if not lines or not lines[0].strip():
        raise ValueError("polygon file must begin with a header name line")
    rings: List[PolyRing] = []
    i = 1

    def next_nonblank(j: int) -> int:
        while j < len(lines) and not lines[j].strip():
            j += 1
        if j >= len(lines):
            raise ValueError("file terminated prematurely without END")
        return j

    while True:
        i = next_nonblank(i)
        header = lines[i].strip()
        i += 1
        if header == "END":
            break
        negative = header.startswith("!")
        name = header[1:] if negative else header
        lats: List[float] = []
        lons: List[float] = []
        while True:
            i = next_nonblank(i)
            row = lines[i].strip()
            i += 1
            if row == "END":
                break
            toks = [t for t in row.split() if t]
            if len(toks) < 2:
                raise ValueError(f"malformed coordinate line: {row!r}")
            lons.append(float(toks[0]))
            lats.append(float(toks[1]))
        rings.append(
            PolyRing(
                name=name,
                negative=negative,
                lats_mu=to_map_unit(np.asarray(lats, dtype=np.float64)),
                lons_mu=to_map_unit(np.asarray(lons, dtype=np.float64)),
            )
        )
    return rings


def read_poly(path: str) -> List[PolyRing]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:  # type: ignore[operator]
        return parse_poly(f.read())


def write_poly(path: str, name: str,
               rings: Sequence[Tuple[bool, Sequence[float], Sequence[float]]]) -> None:
    """Fixture twin: rings as (negative, lats_deg, lons_deg)."""
    out = [name]
    for k, (negative, lats, lons) in enumerate(rings, start=1):
        out.append(f"{'!' if negative else ''}{k}")
        out.extend(f"   {lon:.7E}   {lat:.7E}" for lat, lon in zip(lats, lons))
        out.append("END")
    out.append("END")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def points_in_poly(lats: np.ndarray, lons: np.ndarray,
                   rings: Sequence[PolyRing], scale: int = 1) -> np.ndarray:
    """Point-wise evaluation of the sequential Area.add/.subtract the
    reference builds from the ring sections (PolygonFileReader
    loadPolygon): walking rings in file order, a point inside a
    positive ring becomes inside, inside a negative ring becomes
    outside, otherwise keeps its prior state.  For point queries this
    reproduces the region sequence exactly.

    ``scale`` multiplies ring coordinates so callers can test points in
    finer units (the DEM lattice is in map units * 256, matching
    HGTConverter.getHeights' ``px / 256.0`` test against the map-unit
    polygon).
    """
    py = np.asarray(lats, dtype=np.int64)
    px = np.asarray(lons, dtype=np.int64)
    inside = np.zeros(len(py), dtype=bool)
    for ring in rings:
        m = winding_number(py, px, ring.lats_mu * scale, ring.lons_mu * scale) != 0
        if not m.any():
            continue
        inside = np.where(m, not ring.negative, inside)
    return inside


def rect_poly_relation(rings: Sequence[PolyRing],
                       min_lat_mu: int, min_lon_mu: int,
                       max_lat_mu: int, max_lon_mu: int) -> int:
    """Tri-state rectangle-vs-polygon test mirroring
    HGTConverter.intersectsPoly / MapBuilder's contains+intersects
    guard: 2 = the polygon region contains the whole rectangle,
    1 = they intersect, 0 = disjoint.

    Exact for the simple driver-side uses here: if no ring edge
    crosses the rectangle boundary and no ring vertex lies inside the
    rectangle, the region's relation to the rectangle is decided by
    any one corner point.
    """
    from ..functions.geometry import segments_intersect

    corners_lat = np.array([min_lat_mu, min_lat_mu, max_lat_mu, max_lat_mu],
                           dtype=np.int64)
    corners_lon = np.array([min_lon_mu, max_lon_mu, min_lon_mu, max_lon_mu],
                           dtype=np.int64)
    rect_edges = [
        (min_lat_mu, min_lon_mu, min_lat_mu, max_lon_mu),
        (min_lat_mu, max_lon_mu, max_lat_mu, max_lon_mu),
        (max_lat_mu, max_lon_mu, max_lat_mu, min_lon_mu),
        (max_lat_mu, min_lon_mu, min_lat_mu, min_lon_mu),
    ]
    vertex_inside = False
    for ring in rings:
        ry = np.append(ring.lats_mu, ring.lats_mu[0])
        rx = np.append(ring.lons_mu, ring.lons_mu[0])
        y1, x1, y2, x2 = ry[:-1], rx[:-1], ry[1:], rx[1:]
        for (ay, ax, by, bx) in rect_edges:
            if segments_intersect(
                np.full(len(y1), ay, dtype=np.int64),
                np.full(len(y1), ax, dtype=np.int64),
                np.full(len(y1), by, dtype=np.int64),
                np.full(len(y1), bx, dtype=np.int64),
                y1, x1, y2, x2,
            ).any():
                return 1
        if (
            (ring.lats_mu > min_lat_mu) & (ring.lats_mu < max_lat_mu)
            & (ring.lons_mu > min_lon_mu) & (ring.lons_mu < max_lon_mu)
        ).any():
            vertex_inside = True
    corners_in = points_in_poly(corners_lat, corners_lon, rings)
    if corners_in.all():
        return 1 if vertex_inside else 2
    if vertex_inside or corners_in.any():
        return 1
    return 0
