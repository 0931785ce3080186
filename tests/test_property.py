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
