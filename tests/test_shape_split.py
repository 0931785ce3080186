"""Exact splitShape kernel vs the reference's own golden cases
(test/uk/me/parabola/util/ShapeSplitterTest.java) + property checks,
and the WrongAngleFixer displacement kernel."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mkgmap_spark.functions.shape_split import clip_shape_exact, split_shape


def ring(*pts):
    la = [p[0] for p in pts] + [pts[0][0]]
    lo = [p[1] for p in pts] + [pts[0][1]]
    return la, lo


def shoelace2(ring_pts):
    p = ring_pts if ring_pts[0] == ring_pts[-1] else ring_pts + [ring_pts[0]]
    return sum(
        p[i][1] * p[i + 1][0] - p[i + 1][1] * p[i][0] for i in range(len(p) - 1)
    )


def canon(ring_pts):
    """rotation+orientation independent canonical form (open ring)."""
    p = list(ring_pts)
    if p[0] == p[-1]:
        p = p[:-1]
    best = None
    for cand in (p, p[::-1]):
        k = min(range(len(cand)), key=lambda i: cand[i])
        rot = tuple(cand[k:] + cand[:k])
        if best is None or rot < best:
            best = rot
    return best


def check(got_shapes, expected):
    got = sorted(canon(s) for s in got_shapes)
    want = sorted(canon(s) for s in expected)
    assert got == want, (got, want)
    # area conservation
    assert sum(abs(shoelace2(list(s))) for s in got_shapes) == sum(
        abs(shoelace2(list(e))) for e in expected
    )


# --- the reference's golden cases (ShapeSplitterTest.java) ---
def test1_simple_split():
    la, lo = ring((1, 1), (5, 3), (7, 7), (3, 5))
    less, more = split_shape(la, lo, 3, False)  # cut at lat 3
    check(less, [[(1, 1), (3, 2), (3, 5)]])
    check(more, [[(3, 2), (5, 3), (7, 7), (3, 5)]])
    less, more = split_shape(la, lo, 5, True)  # cut at lon 5
    check(less, [[(1, 1), (5, 3), (6, 5), (3, 5)]])
    check(more, [[(6, 5), (7, 7), (3, 5)]])


def test2_cut_to_hole():
    la, lo = ring(
        (1, 1), (3, 1), (3, 3), (2, 3), (2, 4), (4, 4), (4, 3), (3, 3),
        (3, 1), (5, 1), (5, 5), (1, 5),
    )
    less, more = split_shape(la, lo, 2, True)
    check(less, [[(1, 1), (3, 1), (3, 2), (1, 2)], [(3, 1), (5, 1), (5, 2), (3, 2)]])
    check(
        more,
        [[(1, 2), (3, 2), (3, 3), (2, 3), (2, 4), (4, 4), (4, 3), (3, 3), (3, 2), (5, 2), (5, 5), (1, 5)]],
    )
    less, more = split_shape(la, lo, 3, False)
    check(less, [[(1, 1), (3, 1), (3, 3), (2, 3), (2, 4), (3, 4), (3, 5), (1, 5)]])
    check(more, [[(3, 1), (5, 1), (5, 5), (3, 5), (3, 4), (4, 4), (4, 3), (3, 3)]])


def test3_cut_spiral():
    la, lo = ring(
        (7, 10), (6, 10), (6, 6), (10, 6), (10, 14), (2, 14), (2, 2), (14, 2),
        (14, 14), (13, 14), (13, 3),
        (3, 3), (3, 13), (9, 13), (9, 7), (7, 7),
        (7, 8), (8, 8), (8, 12), (4, 12), (4, 4), (12, 4), (12, 15),
        (15, 15), (15, 1),
        (1, 1), (1, 15), (11, 15), (11, 5), (5, 5), (5, 11), (7, 11),
    )
    less, more = split_shape(la, lo, 9, True)
    check(
        less,
        [
            [(1, 9), (1, 1), (15, 1), (15, 9), (14, 9), (14, 2), (2, 2), (2, 9)],
            [(3, 9), (3, 3), (13, 3), (13, 9), (12, 9), (12, 4), (4, 4), (4, 9)],
            [(5, 9), (5, 5), (11, 5), (11, 9), (10, 9), (10, 6), (6, 6), (6, 9)],
            [(8, 9), (8, 8), (7, 8), (7, 7), (9, 7), (9, 9)],
        ],
    )
    check(
        more,
        [
            [(1, 9), (1, 15), (11, 15), (11, 9), (10, 9), (10, 14), (2, 14), (2, 9)],
            [(3, 9), (3, 13), (9, 13), (9, 9), (8, 9), (8, 12), (4, 12), (4, 9)],
            [(5, 9), (5, 11), (7, 11), (7, 10), (6, 10), (6, 9)],
            [(12, 9), (12, 15), (15, 15), (15, 9), (14, 9), (14, 14), (13, 14), (13, 9)],
        ],
    )


def test4_cut_flash():
    la, lo = ring(
        (20, 18), (15, 18), (6, 9), (6, 10), (4, 8), (4, 18),
        (1, 18), (1, 1), (20, 1), (20, 10),
        (12, 2), (12, 10), (11, 9), (11, 10), (9, 8), (9, 10), (2, 3),
        (2, 10), (3, 11), (3, 5), (13, 15), (13, 7), (16, 10), (16, 8), (18, 10), (18, 9), (20, 11),
    )
    less, more = split_shape(la, lo, 9, True)
    check(
        less,
        [
            [(1, 9), (1, 1), (20, 1), (20, 9), (19, 9), (12, 2), (12, 9), (10, 9), (9, 8), (9, 9), (8, 9), (2, 3), (2, 9)],
            [(3, 9), (3, 5), (7, 9), (5, 9), (4, 8), (4, 9)],
            [(13, 9), (13, 7), (15, 9)],
            [(16, 9), (16, 8), (17, 9)],
        ],
    )
    check(
        more,
        [
            [(1, 9), (1, 18), (4, 18), (4, 9), (3, 9), (3, 11), (2, 10), (2, 9)],
            [(5, 9), (6, 10), (6, 9)],
            [(6, 9), (15, 18), (20, 18), (20, 11), (18, 9), (18, 10), (17, 9), (16, 9), (16, 10), (15, 9), (13, 9), (13, 15), (7, 9)],
            [(8, 9), (9, 10), (9, 9)],
            [(10, 9), (11, 10), (11, 9)],
            [(11, 9), (12, 10), (12, 9)],
            [(19, 9), (20, 10), (20, 9)],
        ],
    )


def test_no_crossing_sides():
    la, lo = ring((0, 0), (10, 0), (10, 10), (0, 10))
    less, more = split_shape(la, lo, 20, False)
    assert more == [] and len(less) == 1
    less, more = split_shape(la, lo, -5, False)
    assert less == [] and len(more) == 1


def test_clip_shape_exact_matches_split():
    la, lo = ring((1, 1), (5, 3), (7, 7), (3, 5))
    out = clip_shape_exact(la, lo, (2, 2, 6, 6))
    assert len(out) >= 1
    total = sum(abs(shoelace2(s)) for s in out)
    assert 0 < total < abs(shoelace2(list(zip(la, lo))))
    for s in out:
        for lat, lon in s:
            assert 2 <= lat <= 6 and 2 <= lon <= 6


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)), min_size=3, max_size=8
    ),
    st.integers(5, 55),
    st.booleans(),
)
def test_split_area_conserved(pts, line, is_lon):
    """|area| is conserved across any split of a simple polygon, up to
    the crossing-point rounding (each crossing rounds <= 0.5 unit in
    the along axis, shifting at most span units of doubled area — the
    reference has the same quantization; its golden cases use on-grid
    crossings and are checked exactly above)."""
    import math as m

    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    uniq = sorted(set(pts), key=lambda p: m.atan2(p[0] - cx, p[1] - cy))
    if len(uniq) < 3:
        return
    la = [p[0] for p in uniq] + [uniq[0][0]]
    lo = [p[1] for p in uniq] + [uniq[0][1]]
    orig = abs(shoelace2(list(zip(la, lo))))
    if orig == 0:
        return
    less, more = split_shape(la, lo, line, is_lon)
    got = sum(abs(shoelace2(s)) for s in less) + sum(abs(shoelace2(s)) for s in more)
    tol = 61 * len(uniq)  # crossings x max span (doubled-area units)
    assert abs(got - orig) <= tol
    # every piece lies strictly on its side of the line
    for s in less:
        for p in s:
            assert (p[1] if is_lon else p[0]) <= line
    for s in more:
        for p in s:
            assert (p[1] if is_lon else p[0]) >= line


# ------------------------------------------------ WrongAngleFixer
def test_wrong_angle_zigzag_fixed():
    from mkgmap_spark.operators.wrong_angle import (
        DELTA_SHIFT,
        fix_way_angles,
        hp_to_display,
        max_bearing_error,
    )

    # nearly-straight shallow line whose rounding zig-zags: real lats
    # hover just around the .5 rounding boundary alternating sides
    n = 12
    base_lat = 1_000_000 << DELTA_SHIFT
    hp_lats, hp_lons = [], []
    for i in range(n):
        off = 31 if i % 2 == 0 else 33  # rounds to 0 or 1 map units
        hp_lats.append(base_lat + off)
        hp_lons.append((2_000_000 + i) << DELTA_SHIFT)
    hp_lats = np.array(hp_lats, dtype=np.int64)
    hp_lons = np.array(hp_lons, dtype=np.int64)
    before = max_bearing_error(
        hp_lats, hp_lons, hp_to_display(hp_lats), hp_to_display(hp_lons)
    )
    dla, dlo, keep = fix_way_angles(hp_lats, hp_lons)
    after = max_bearing_error(hp_lats[keep], hp_lons[keep], dla[keep], dlo[keep])
    assert before >= 15.0  # the zig-zag really was broken
    assert after < before
    assert keep[0] and keep[-1]  # endpoints preserved


def test_wrong_angle_straight_line_untouched():
    from mkgmap_spark.operators.wrong_angle import DELTA_SHIFT, fix_way_angles, hp_to_display

    hp_lats = np.array([(1_000_000 + i) << DELTA_SHIFT for i in range(8)], dtype=np.int64)
    hp_lons = np.array([(2_000_000 + 2 * i) << DELTA_SHIFT for i in range(8)], dtype=np.int64)
    dla, dlo, keep = fix_way_angles(hp_lats, hp_lons)
    assert keep.all()
    assert (dla == hp_to_display(hp_lats)).all()
    assert (dlo == hp_to_display(hp_lons)).all()


def test_wrong_angle_dataframe(spark):
    from mkgmap_spark.operators.wrong_angle import DELTA_SHIFT, fix_wrong_angles

    rows = []
    for wid in range(6):
        la = [((1_000_000 + wid) << DELTA_SHIFT) + (31 if i % 2 == 0 else 33) for i in range(10)]
        lo = [(2_000_000 + i) << DELTA_SHIFT for i in range(10)]
        rows.append((wid, la, lo))
    df = spark.createDataFrame(rows, "id long, lats array<long>, lons array<long>")
    out = fix_wrong_angles(df).collect()
    assert len(out) == 6
    for r in out:
        assert len(r["lats"]) >= 2
        assert len(r["lats"]) + r["n_removed"] == 10


def test_wrong_angle_cross_way_consistency(spark):
    """A point shared by two ways must end at ONE display position
    decided from the union of both ways' neighbours (the reference's
    CenterOfAngle graph is cross-way) — and zig-zags still improve."""
    from mkgmap_spark.operators.wrong_angle import (
        DELTA_SHIFT,
        fix_group_angles,
        fix_wrong_angles_grouped,
        hp_to_display,
        max_bearing_error,
    )

    # shallow zig-zag way A and a crossing way B sharing A's point 5
    n = 12
    base_lat = 1_000_000 << DELTA_SHIFT
    a_lats, a_lons = [], []
    for i in range(n):
        off = 31 if i % 2 == 0 else 33
        a_lats.append(base_lat + off)
        a_lons.append((2_000_000 + i) << DELTA_SHIFT)
    a_lats = np.array(a_lats, dtype=np.int64)
    a_lons = np.array(a_lons, dtype=np.int64)
    shared = (int(a_lats[5]), int(a_lons[5]))
    b_lats = np.array(
        [shared[0] - (40 << DELTA_SHIFT), shared[0], shared[0] + (40 << DELTA_SHIFT)],
        dtype=np.int64,
    )
    b_lons = np.array([shared[1], shared[1], shared[1]], dtype=np.int64)

    fixed = fix_group_angles([(1, a_lats, a_lons, None), (2, b_lats, b_lons, None)])
    dla1, dlo1, keep1 = fixed[1]
    dla2, dlo2, keep2 = fixed[2]
    # the shared point survives in BOTH ways at the SAME display coords
    assert keep1[5] and keep2[1]
    assert (dla1[5], dlo1[5]) == (dla2[1], dlo2[1])
    before = max_bearing_error(a_lats, a_lons, hp_to_display(a_lats), hp_to_display(a_lons))
    after = max_bearing_error(a_lats[keep1], a_lons[keep1], dla1[keep1], dlo1[keep1])
    assert before >= 15.0 and after < before

    # DataFrame form over groups
    df = spark.createDataFrame(
        [
            (7, 1, a_lats.tolist(), a_lons.tolist()),
            (7, 2, b_lats.tolist(), b_lons.tolist()),
        ],
        "tile_id long, id long, lats array<long>, lons array<long>",
    )
    out = {r["id"]: r for r in fix_wrong_angles_grouped(df).collect()}
    assert set(out) == {1, 2}
    # way B's mid point still present and equal to way A's point 5
    assert out[2]["lats"][1] in out[1]["lats"]
