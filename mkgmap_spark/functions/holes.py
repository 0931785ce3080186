"""Hole elimination for multipolygon rings — numpy kernel.

Reference: reader/osm/MultiPolygonCutter.java:70-200 cuts the holes
out of an outer ring (Garmin shapes cannot carry holes) using
java.awt.geom.Area boolean subtraction followed by axis cuts at hole
bounds.  This module re-expresses the same CONTRACT — input: one outer
ring + contained hole rings; output: hole-free simple polygon(s)
whose covered region is exactly outer minus holes — with the classic
*bridge insertion* construction (Eberly, "Triangulation by Ear
Clipping" §5: connect each hole's rightmost vertex to a visible
outer-ring vertex and splice the hole into the ring):

- holes are processed by decreasing rightmost-vertex x (ties by y,
  then input order) — fully deterministic;
- a horizontal ray from the hole's rightmost vertex M finds the
  closest intersected edge of the current merged ring, and M connects
  to that edge's endpoint (or to a reflex vertex inside the triangle
  (M, I, P) with the smallest angle to the ray, the visibility repair
  step);
- the hole's points splice in walking the hole OPPOSITE to the outer
  orientation, with the bridge traversed in both directions.

Divergence from the reference (documented): the result is ONE simple
ring with zero-width bridge channels rather than several bridge-free
polygons — the covered area (shoelace sum), winding parity at every
non-boundary point, and therefore rendering are identical; the
decomposition differs.  Exact integer coordinates throughout.
"""

from __future__ import annotations

import numpy as np


def _shoelace2(ys: np.ndarray, xs: np.ndarray) -> int:
    """Twice the signed area (int64 exact); >0 = counter-clockwise."""
    y = ys.astype(np.int64)
    x = xs.astype(np.int64)
    y2 = np.roll(y, -1)
    x2 = np.roll(x, -1)
    return int(np.sum(x * y2 - x2 * y))


def _open_ring(ys, xs) -> tuple[np.ndarray, np.ndarray]:
    ys = np.asarray(ys, dtype=np.int64)
    xs = np.asarray(xs, dtype=np.int64)
    if len(ys) > 1 and ys[0] == ys[-1] and xs[0] == xs[-1]:
        ys, xs = ys[:-1], xs[:-1]
    return ys, xs


def _rightmost(ys: np.ndarray, xs: np.ndarray) -> int:
    """Index of the lexicographically (x, y) max vertex."""
    mx = xs.max()
    cand = np.flatnonzero(xs == mx)
    return int(cand[np.argmax(ys[cand])])


def _find_bridge_vertex(oy: np.ndarray, ox: np.ndarray, my: int, mx: int) -> int:
    """Index of the ring vertex the hole vertex (my, mx) bridges to.

    Horizontal ray from M in +x: take the edge with the closest
    intersection x >= mx; bridge to its larger-x endpoint P, unless a
    ring vertex lies inside triangle (M, I, P) — then the one with the
    smallest angle from the ray (visibility repair)."""
    n = len(oy)
    best_ix: float | None = None
    best_p = -1
    for i in range(n):
        j = (i + 1) % n
        y1, y2 = int(oy[i]), int(oy[j])
        if y1 == y2:
            if y1 == my:
                # collinear horizontal edge: nearest endpoint at x>=mx
                for k in (i, j):
                    if ox[k] >= mx and (best_ix is None or ox[k] < best_ix):
                        best_ix, best_p = float(ox[k]), k
            continue
        lo, hi = (i, j) if y1 < y2 else (j, i)
        if not (oy[lo] <= my <= oy[hi]):
            continue
        # x at the ray height (exact rational -> float is fine for
        # comparison; the bridge TARGET is always an exact vertex)
        t = (my - int(oy[i])) / (y2 - y1)
        ix = int(ox[i]) + t * (int(ox[j]) - int(ox[i]))
        if ix < mx:
            continue
        if best_ix is None or ix < best_ix:
            best_ix = ix
            # endpoint with larger x
            best_p = i if ox[i] >= ox[j] else j
    if best_p < 0:
        raise ValueError("hole ray found no intersection — hole outside ring?")
    # visibility repair (Eberly §5 step 5): only REFLEX ring vertices
    # inside triangle (M, I, P) can block the M->P bridge; among them
    # take the one with the smallest angle to the ray, compared with
    # exact integer cross-multiplication (|dy_a|/dx_a < |dy_b|/dx_b iff
    # |dy_a|*dx_b < |dy_b|*dx_a), ties broken by the smaller dx
    # (closest to M), then by index for determinism.
    prev_y, prev_x = np.roll(oy, 1), np.roll(ox, 1)
    next_y, next_x = np.roll(oy, -1), np.roll(ox, -1)
    # ring is CCW at this point: reflex iff cross(prev->v, v->next) < 0
    reflex = (
        (ox - prev_x) * (next_y - oy) - (oy - prev_y) * (next_x - ox)
    ) < 0
    px, py = int(ox[best_p]), int(oy[best_p])
    ix = best_ix
    cand = best_p
    best_dy = best_dx = None
    for k in range(n):
        if k == best_p or not reflex[k]:
            continue
        vx, vy = int(ox[k]), int(oy[k])
        dx = vx - mx
        if dx <= 0:
            continue
        # inside triangle M(mx,my), I(ix,my), P(px,py)? (loose test:
        # sign of areas; degenerate triangles skip)
        def area2(ax, ay, bx, by, cx, cy):
            return (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)

        d1 = area2(mx, my, ix, my, vx, vy)
        d2 = area2(ix, my, px, py, vx, vy)
        d3 = area2(px, py, mx, my, vx, vy)
        neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
        pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
        if neg and pos:
            continue  # outside
        dy = abs(vy - my)
        if (
            best_dy is None
            or dy * best_dx < best_dy * dx  # strictly smaller angle
            or (dy * best_dx == best_dy * dx and dx < best_dx)
        ):
            best_dy, best_dx = dy, dx
            cand = k
    return cand


def cut_out_inner_polygons(
    outer: tuple[np.ndarray, np.ndarray],
    holes: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Bridge every hole into the outer ring; returns the merged
    hole-free ring (open form — first point not repeated).

    Preconditions (the multipolygon assembler guarantees them): holes
    lie inside the outer ring and do not cross each other."""
    oy, ox = _open_ring(*outer)
    if _shoelace2(oy, ox) < 0:  # normalize outer to CCW
        oy, ox = oy[::-1].copy(), ox[::-1].copy()

    hs = []
    for hy, hx in holes:
        hy, hx = _open_ring(hy, hx)
        if _shoelace2(hy, hx) > 0:  # holes walk CW (opposite the outer)
            hy, hx = hy[::-1].copy(), hx[::-1].copy()
        m = _rightmost(hy, hx)
        hs.append((int(hx[m]), int(hy[m]), m, hy, hx))
    # decreasing rightmost-x (ties: y, then stable input order)
    hs.sort(key=lambda t: (-t[0], -t[1]))

    for _mx, _my, m, hy, hx in hs:
        p = _find_bridge_vertex(oy, ox, int(hy[m]), int(hx[m]))
        # splice: ...outer[:p+1], hole[m:], hole[:m+1], outer[p:]...
        oy = np.concatenate([oy[: p + 1], hy[m:], hy[: m + 1], oy[p:]])
        ox = np.concatenate([ox[: p + 1], hx[m:], hx[: m + 1], ox[p:]])
    return oy, ox
