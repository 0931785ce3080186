"""Independent point-in-polygon oracle: classic even-odd ray casting,
scalar Python — deliberately a different algorithm than the engine's
vectorized winding number (for simple polygons they must agree;
fixtures avoid self-intersecting rings, as do mkgmap boundaries)."""

from __future__ import annotations


def point_in_ring(py: int, px: int, lats, lons) -> bool:
    n = len(lats)
    if n >= 2 and lats[0] == lats[-1] and lons[0] == lons[-1]:
        n -= 1
    inside = False
    j = n - 1
    for i in range(n):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[j], lons[j]
        if (yi > py) != (yj > py):
            t = (py - yi) / (yj - yi)
            xcross = xi + t * (xj - xi)
            if px < xcross:
                inside = not inside
        j = i
    return inside


def point_in_polygon(py: int, px: int, rings) -> bool:
    """rings: iterable of (lats, lons, is_hole)."""
    inside = False
    for la, lo, hole in rings:
        if not hole and point_in_ring(py, px, la, lo):
            inside = True
    if inside:
        for la, lo, hole in rings:
            if hole and point_in_ring(py, px, la, lo):
                return False
    return inside


def locate_all(points, boundaries):
    """points: list of (id, lat, lon); boundaries: list of dicts with
    boundary_id, admin_level, name, postcode, rings.
    Returns set of (id, admin_level, boundary_id) with the smallest
    boundary_id per (id, level)."""
    best: dict[tuple[int, int], str] = {}
    for pid, py, px in points:
        for b in boundaries:
            rings = [(r["lats"], r["lons"], r["is_hole"]) for r in b["rings"]]
            if point_in_polygon(py, px, rings):
                key = (pid, b["admin_level"])
                if key not in best or b["boundary_id"] < best[key]:
                    best[key] = b["boundary_id"]
    return {(pid, lv, bid) for (pid, lv), bid in best.items()}
