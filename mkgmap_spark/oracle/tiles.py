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
