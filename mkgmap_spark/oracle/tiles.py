"""Element-at-a-time tile-split oracle.

Implements the engine's canonical split semantics (see
operators/tiling.py module docstring for the documented divergences from
mkgmap) directly on per-element lists, mirroring the recursive shape of
MapSplitter.addAreasToList (build/MapSplitter.java:131-200) and
MapArea.split (build/MapArea.java:223-338).  No numpy, no histograms —
an independent code path for differential testing.
"""

from __future__ import annotations

MAX_DIVISION_SIZE = 0x7FFF
MAX_RGN_SIZE = 0xFFF8
MAX_NUM_LINES = 0xFF
MAX_NUM_POINTS = 0xFF
MIN_DIMENSION = 10
WANTED_MAX_AREA_SIZE = 0x3FFF


def size_estimate(kind_i: int, npts: int) -> int:
    """MapArea.addSize:555-608 with raw point counts."""
    if kind_i == 0:
        return 9
    if kind_i == 1 and npts <= 1:
        return 0
    if kind_i == 2 and npts <= 3:
        return 0
    n_elem = 1 + (npts - 1) // 250
    return n_elem * 11 + npts * 4


def assignment_point(kind_i: int, lats: list[int], lons: list[int]) -> tuple[int, int]:
    """Node: its coord; way/shape: floor bbox centre."""
    if kind_i == 0:
        return lats[0], lons[0]
    ay = (min(lats) + max(lats)) // 2
    ax = (min(lons) + max(lons)) // 2
    return ay, ax


def _compute_root(min_y, min_x, max_y, max_x, shift):
    # half-size anchored power-of-2 square (see operators/tiling.py
    # compute_root — identical canonical rule, independent code)
    min_size = max(max_y - min_y, max_x - min_x, (MIN_DIMENSION << shift) * 2, 2)
    g = 1
    while (1 << g) < min_size:
        g += 1
    while True:
        size = 1 << g
        a = g - 1
        mn_y = (min_y >> a) << a
        mn_x = (min_x >> a) << a
        if mn_y + size >= max_y and mn_x + size >= max_x:
            return mn_y, mn_x, mn_y + size, mn_x + size
        g += 1


LARGE_OBJECT_DIM = 8192


def _rect_ring_interior_intersect(rect, lats, lons):
    """True iff ring interior ∩ rect interior is non-empty.

    Independent of the engine's Sutherland-Hodgman clip: vertex-in-rect
    OR rect-corner-in-ring OR proper edge crossing (scalar tests from
    oracle/pip.py semantics)."""
    from .pip import point_in_ring

    ry0, rx0, ry1, rx1 = rect  # half-open
    n = len(lats)
    for i in range(n):
        if ry0 < lats[i] < ry1 - 1 and rx0 < lons[i] < rx1 - 1:
            return True
    for cy, cx in ((ry0, rx0), (ry0, rx1 - 1), (ry1 - 1, rx0), (ry1 - 1, rx1 - 1)):
        if point_in_ring(cy, cx, lats, lons):
            return True
    # proper segment crossings against the 4 rect edges
    edges = [
        (ry0, rx0, ry0, rx1 - 1),
        (ry1 - 1, rx0, ry1 - 1, rx1 - 1),
        (ry0, rx0, ry1 - 1, rx0),
        (ry0, rx1 - 1, ry1 - 1, rx1 - 1),
    ]
    m = n - 1 if (lats[0] == lats[-1] and lons[0] == lons[-1]) else n
    for i in range(m):
        ay, ax = lats[i], lons[i]
        by, bx = lats[(i + 1) % n], lons[(i + 1) % n]
        for ey0, ex0, ey1, ex1 in edges:
            d1 = (bx - ax) * (ey0 - ay) - (by - ay) * (ex0 - ax)
            d2 = (bx - ax) * (ey1 - ay) - (by - ay) * (ex1 - ax)
            d3 = (ex1 - ex0) * (ay - ey0) - (ey1 - ey0) * (ax - ex0)
            d4 = (ex1 - ex0) * (by - ey0) - (ey1 - ey0) * (bx - ex0)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and 0 not in (d1, d2, d3, d4):
                return True
    return False


def split_with_geometry(elements, shift):
    """Element-at-a-time oracle for the geometry-aware assignment
    (engine twin: operators/clip_assign.assign_ways_with_split).

    elements: dicts with id, kind_i, lats, lons, size_bytes (nodes have
    one coord).  Returns (tiles, point_membership, way_membership)
    where way_membership is a set of (id, tile_id, part)."""
    for e in elements:
        e["ay"], e["ax"] = assignment_point(e["kind_i"], e["lats"], e["lons"])
    tiles, membership = split_oracle(elements, shift)

    max_size = min((1 << 24) - 1, max(0x7FFF << shift, 0x8000))
    seen_bounds = set()
    base_tiles = []
    for t in sorted(tiles, key=lambda t: t["tile_id"]):
        b = (t["min_lat"], t["min_lon"], t["max_lat"], t["max_lon"])
        if b not in seen_bounds:
            seen_bounds.add(b)
            base_tiles.append(t)

    def base_tile_of(ay, ax):
        for t in base_tiles:
            if t["min_lat"] <= ay < t["max_lat"] and t["min_lon"] <= ax < t["max_lon"]:
                return t
        return None

    way_members = set()
    priv = []
    for e in sorted(elements, key=lambda e: e["id"]):
        if e["kind_i"] == 0:
            continue
        la, lo = e["lats"], e["lons"]
        y0, y1 = min(la), max(la)
        x0, x1 = min(lo), max(lo)
        t = base_tile_of(e["ay"], e["ax"])
        if t is None:
            continue
        contained = t["min_lat"] <= y0 and y1 < t["max_lat"] and t["min_lon"] <= x0 and x1 < t["max_lon"]
        if contained:
            way_members.add((e["id"], t["tile_id"], 0))
            continue
        if e["kind_i"] == 2:
            part = 0
            hits = []
            for ct in base_tiles:
                if ct["max_lat"] <= y0 or ct["min_lat"] > y1 or ct["max_lon"] <= x0 or ct["min_lon"] > x1:
                    continue
                rect = (ct["min_lat"], ct["min_lon"], ct["max_lat"], ct["max_lon"])
                if _rect_ring_interior_intersect(rect, la, lo):
                    hits.append(ct["tile_id"])
            for tid in sorted(hits):
                way_members.add((e["id"], tid, part))
                part += 1
            if part == 0:
                way_members.add((e["id"], t["tile_id"], 0))
        else:
            tw, th = t["max_lon"] - t["min_lon"], t["max_lat"] - t["min_lat"]
            max_w = max(min(tw, max_size // 2), 2 * LARGE_OBJECT_DIM)
            max_h = max(min(th, max_size // 2), 2 * LARGE_OBJECT_DIM)
            if (y1 - y0) > max_h or (x1 - x0) > max_w:
                priv.append((e["id"], y0, x0, y1 + 1, x1 + 1))
            else:
                way_members.add((e["id"], t["tile_id"], 0))

    for pid, y0, x0, y1, x1 in sorted(priv):
        tid = len(tiles)
        tiles.append(
            {
                "tile_id": tid,
                "min_lat": y0,
                "min_lon": x0,
                "max_lat": y1,
                "max_lon": x1,
                "n_slots": 1,
                "n_points": 0,
                "n_lines": 1,
                "n_shapes": 0,
                "size_bytes": 0,
            }
        )
        way_members.add((pid, tid, 0))

    point_members = {k: v for k, v in membership.items()}
    return tiles, point_members, way_members


def split_oracle(elements, shift):
    """elements: list of dicts with id, kind_i, ay, ax, size_bytes.

    Returns (tiles, membership):
      tiles: list of dicts (tile_id, min_lat, min_lon, max_lat, max_lon,
             n_slots, n_points, n_lines, n_shapes, size_bytes)
      membership: dict element_id -> tile_id
    """
    tiles: list[dict] = []
    membership: dict[int, int] = {}
    if not elements:
        return tiles, membership

    min_y = min(e["ay"] for e in elements)
    max_y = max(e["ay"] for e in elements) + 1
    min_x = min(e["ax"] for e in elements)
    max_x = max(e["ax"] for e in elements) + 1
    root = _compute_root(min_y, min_x, max_y, max_x, shift)

    accepted: list[tuple[tuple[int, int, int, int], list]] = []

    def recurse(bounds, elems):
        if not elems:
            return
        ry0, rx0, ry1, rx1 = bounds
        h, w = ry1 - ry0, rx1 - rx0
        max_dim = max(h, w)
        n_p = sum(1 for e in elems if e["kind_i"] == 0)
        n_l = sum(1 for e in elems if e["kind_i"] == 1)
        n_s = sum(1 for e in elems if e["kind_i"] == 2)
        s_tot = sum(e["size_bytes"] for e in elems)

        must = (
            n_l > MAX_NUM_LINES
            or n_p > MAX_NUM_POINTS
            or s_tot > MAX_RGN_SIZE
            or (max_dim >> shift) > MAX_DIVISION_SIZE
        )
        want = (not must) and max_dim > (MIN_DIMENSION << shift) and s_tot > WANTED_MAX_AREA_SIZE
        can = (n_p + n_l + n_s) > 1

        if (must or want) and can and max_dim > (MIN_DIMENSION << shift):
            if w > h:
                mid = rx0 + w // 2
                lo = [e for e in elems if e["ax"] < mid]
                hi = [e for e in elems if e["ax"] >= mid]
                recurse((ry0, rx0, ry1, mid), lo)
                recurse((ry0, mid, ry1, rx1), hi)
            else:
                mid = ry0 + h // 2
                lo = [e for e in elems if e["ay"] < mid]
                hi = [e for e in elems if e["ay"] >= mid]
                recurse((ry0, rx0, mid, rx1), lo)
                recurse((mid, rx0, ry1, rx1), hi)
            return
        accepted.append((bounds, elems))

    recurse(root, list(elements))

    # deterministic numbering: (min_lat, min_lon); slots consecutive
    accepted.sort(key=lambda t: (t[0][0], t[0][1]))
    for bounds, elems in accepted:
        ry0, rx0, ry1, rx1 = bounds
        n_p = sum(1 for e in elems if e["kind_i"] == 0)
        n_l = sum(1 for e in elems if e["kind_i"] == 1)
        n_s = sum(1 for e in elems if e["kind_i"] == 2)
        s_tot = sum(e["size_bytes"] for e in elems)
        max_dim = max(ry1 - ry0, rx1 - rx0)
        must = (
            n_l > MAX_NUM_LINES
            or n_p > MAX_NUM_POINTS
            or s_tot > MAX_RGN_SIZE
            or (max_dim >> shift) > MAX_DIVISION_SIZE
        )
        n_slots = 1
        if must and (n_p + n_l + n_s) > 1:
            n_slots = max(
                1,
                -(-n_p // MAX_NUM_POINTS),
                -(-n_l // MAX_NUM_LINES),
                -(-s_tot // MAX_RGN_SIZE),
            )
        base = len(tiles)
        for s in range(n_slots):
            tiles.append(
                {
                    "tile_id": base + s,
                    "min_lat": ry0,
                    "min_lon": rx0,
                    "max_lat": ry1,
                    "max_lon": rx1,
                    "n_slots": n_slots,
                    "n_points": n_p,
                    "n_lines": n_l,
                    "n_shapes": n_s,
                    "size_bytes": s_tot,
                }
            )
        for kind in (0, 1, 2):
            ke = sorted((e for e in elems if e["kind_i"] == kind), key=lambda e: e["id"])
            for rank, e in enumerate(ke):
                membership[e["id"]] = base + (rank % n_slots)
    return tiles, membership
