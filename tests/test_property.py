"""Property-based tests (hypothesis) for the geometry kernels —
invariants that must hold for every input, complementing the
example-based oracles."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mkgmap_spark.functions import geometry as g
from mkgmap_spark.mapunits import round_pof2
from mkgmap_spark.sources.catalog import ParquetCatalog  # noqa: F401  (import check)

coords = st.integers(min_value=-(1 << 22), max_value=1 << 22)
polyline = st.lists(st.tuples(coords, coords), min_size=2, max_size=30)


@given(polyline, coords, coords, coords, coords)
@settings(max_examples=80, deadline=None)
def test_clip_polyline_stays_in_bbox(pts, a, b, c, d):
    y0, y1 = sorted((a, b))
    x0, x1 = sorted((c, d))
    la = np.array([p[0] for p in pts])
    lo = np.array([p[1] for p in pts])
    for cy, cx in g.clip_polyline(la, lo, (y0, x0, y1, x1)):
        assert (cy >= y0 - 1e-6).all() and (cy <= y1 + 1e-6).all()
        assert (cx >= x0 - 1e-6).all() and (cx <= x1 + 1e-6).all()
        assert len(cy) >= 2


@given(polyline)
@settings(max_examples=80, deadline=None)
def test_dp_keeps_endpoints_and_subset(pts):
    la = np.array([p[0] for p in pts], dtype=np.float64)
    lo = np.array([p[1] for p in pts], dtype=np.float64)
    keep = g.douglas_peucker_mask(la, lo, max_error=1000.0)
    assert keep[0] and keep[-1]
    assert keep.sum() <= len(la)


@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=20), coords, coords)
@settings(max_examples=80, deadline=None)
def test_winding_matches_evenodd_for_simple_probe(ring, py, px):
    """For probe points NOT on an edge, nonzero-winding and even-odd
    agree on rings without self-intersection checks only when winding
    is +/-1 — assert consistency of the kernel with the scalar oracle
    in exactly that regime."""
    from mkgmap_spark.oracle.pip import point_in_ring

    ry = np.array([p[0] for p in ring])
    rx = np.array([p[1] for p in ring])
    wn = g.winding_number(np.array([py]), np.array([px]), ry, rx)[0]
    if abs(wn) <= 1:
        assert (wn != 0) == point_in_ring(py, px, ry.tolist(), rx.tolist())


@given(st.integers(min_value=-(1 << 23), max_value=1 << 23), st.integers(min_value=1, max_value=12))
@settings(max_examples=200, deadline=None)
def test_round_pof2_properties(v, s):
    r = round_pof2(v, s)
    assert r % (1 << s) == 0
    assert abs(r - v) <= (1 << s) // 2  # nearest multiple (half up)


# ---------------------------------------------------------------- round 4
@given(
    st.lists(st.integers(-300000, 300000), min_size=4, max_size=4),
    st.lists(st.integers(-300000, 300000), min_size=4, max_size=4),
    st.integers(10, 18),
)
@settings(max_examples=200, deadline=None)
def test_supercover_shares_cell_for_intersecting_segments(a, b, g_):
    """Any two truly intersecting segments must share at least one
    band-clipped supercover cell (the completeness property the
    segment join's candidate generation depends on)."""
    from mkgmap_spark.functions.geometry import segments_intersect

    hit = segments_intersect(
        np.array([a[0]]), np.array([a[1]]), np.array([a[2]]), np.array([a[3]]),
        np.array([b[0]]), np.array([b[1]]), np.array([b[2]]), np.array([b[3]]),
    )
    if not hit[0]:
        return

    def cover(y1, x1, y2, x2, g):
        """Python twin of explode_segments' band-clipped supercover."""
        ys, xs, ye, xe = (y1, x1, y2, x2) if y1 <= y2 else (y2, x2, y1, x1)
        cells = set()
        for cy in range(ys >> g, (ye >> g) + 1):
            blo = max(ys, cy << g)
            bhi = min(ye, (cy + 1) << g)
            if ye == ys:
                xa, xb = min(x1, x2), max(x1, x2)
            else:
                xa = xs + (xe - xs) * (blo - ys) / (ye - ys)
                xb = xs + (xe - xs) * (bhi - ys) / (ye - ys)
            lo = max(min(x1, x2) >> g, (int(np.floor(min(xa, xb))) - 1) >> g)
            hi = min(max(x1, x2) >> g, (int(np.ceil(max(xa, xb))) + 1) >> g)
            for cx in range(lo, hi + 1):
                cells.add((cy, cx))
        return cells

    ca = cover(a[0], a[1], a[2], a[3], g_)
    cb = cover(b[0], b[1], b[2], b[3], g_)
    assert ca & cb, (a, b, g_)


@given(st.text(max_size=24))
@settings(max_examples=300, deadline=None)
def test_collation_key_total_order_consistent(s):
    """SRT keys must be stable and self-consistent: equal strings give
    equal keys; the key of s equals the key of its cp1252 round trip
    (the '?' replacement normal form)."""
    from mkgmap_spark.functions.collation import default_table

    t = default_table(1252)
    k1 = t.sort_key_hex(s)
    norm = s.encode("cp1252", errors="replace").decode("cp1252")
    assert k1 == t.sort_key_hex(norm)
    assert set(k1) <= set("0123456789ABCDEF-")
    assert k1.count("-") >= 2


@given(st.lists(st.tuples(st.integers(-100000, 100000), st.integers(-100000, 100000)),
                min_size=2, max_size=12))
@settings(max_examples=200, deadline=None)
def test_split_hint_parts_chain_and_roles(pts):
    """The 3-part link split must chain exactly (each part starts where
    the previous ends), keep endpoints, and emit a valid role sequence
    — for ANY way geometry (planar metric)."""
    from mkgmap_spark.operators.link_destination import split_hint_parts

    parts = split_hint_parts(list(pts), 1.0)
    if not parts:
        return
    roles = [r for r, _ in parts]
    assert roles in (["approach", "hint"], ["approach", "rest"],
                     ["approach", "hint", "rest"])
    assert parts[0][1][0] == tuple(pts[0])
    assert parts[-1][1][-1] == tuple(pts[-1])
    for (_, a), (_, b) in zip(parts, parts[1:]):
        assert a[-1] == b[0]
    for _, p in parts:
        assert len(p) >= 2


@given(st.lists(st.tuples(st.integers(-5000, 5000), st.integers(-5000, 5000)),
                min_size=3, max_size=10, unique=True))
@settings(max_examples=150, deadline=None)
def test_sea_synthesis_never_crashes_and_classifies(ring_pts):
    """Arbitrary closed rings go through the per-tile sea synthesis as
    island or anti-island without error; the background is always
    emitted last."""
    from mkgmap_spark.operators.sea import synthesize_tile_sea

    lats = [p[0] for p in ring_pts] + [ring_pts[0][0]]
    lons = [p[1] for p in ring_pts] + [ring_pts[0][1]]
    out = synthesize_tile_sea(
        [(lats, lons)], (-8192, -8192, 8192, 8192), metric="planar"
    )
    kinds = [k for k, _ in out]
    assert kinds[-1] in ("sea", "land")
    assert all(k in ("sea", "land", "water", "coastline") for k in kinds)
