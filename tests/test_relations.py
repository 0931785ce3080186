"""Relation ops: member resolution, apply, multipolygon assembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.operators.relations import (
    apply_to_members,
    assemble_multipolygons,
    resolve_members,
)


def _mp_fixture(spark):
    # outer square (two half-ways), inner hole square (one closed way),
    # plus an open dangling way
    ways = spark.createDataFrame(
        [
            (10, [0, 0, 100], [0, 100, 100]),        # half 1: (0,0)->(0,100)->(100,100)
            (11, [100, 100, 0], [100, 0, 0]),        # half 2: back to start
            (12, [40, 40, 60, 60, 40], [40, 60, 60, 40, 40]),  # closed hole
            (13, [200, 210], [200, 210]),            # dangling open
        ],
        "id long, lats array<int>, lons array<int>",
    )
    rels = spark.createDataFrame(
        [
            (
                1,
                [
                    {"role": "outer", "mtype": "way", "ref": 10},
                    {"role": "outer", "mtype": "way", "ref": 11},
                    {"role": "inner", "mtype": "way", "ref": 12},
                    {"role": "outer", "mtype": "way", "ref": 13},
                ],
            )
        ],
        "id long, members array<struct<role: string, mtype: string, ref: bigint>>",
    )
    return rels, ways


def test_resolve_members(spark):
    rels, ways = _mp_fixture(spark)
    out = resolve_members(rels, ways.withColumnRenamed("id", "id"))
    assert out.count() == 4
    roles = {r["ref"]: r["role"] for r in out.collect()}
    assert roles[12] == "inner"


def test_assemble_multipolygons(spark):
    rels, ways = _mp_fixture(spark)
    rings = assemble_multipolygons(rels, ways).collect()
    by_closed = {}
    for r in rings:
        by_closed.setdefault(r["closed"], []).append(r)
    assert len(by_closed[True]) == 2
    assert len(by_closed[False]) == 1
    holes = [r for r in by_closed[True] if r["is_hole"]]
    outers = [r for r in by_closed[True] if not r["is_hole"]]
    assert len(holes) == 1 and len(outers) == 1
    assert holes[0]["n_points"] == 4  # hole square, no repeated point
    assert outers[0]["n_points"] == 4  # stitched outer square
    # canonical start: smallest vertex first
    assert (outers[0]["lats"][0], outers[0]["lons"][0]) == (0, 0)


def test_apply_to_members(spark):
    rels, ways = _mp_fixture(spark)
    feats = ways.withColumn("tags", F.create_map(F.lit("k"), F.lit("v")))
    rels = rels.withColumn("tags", F.create_map(F.lit("type"), F.lit("multipolygon")))
    out = apply_to_members(
        rels, feats, F.col("tags")["type"] == "multipolygon", {"mp": "yes"}
    )
    got = {r["id"]: dict(r["tags"]) for r in out.collect()}
    assert got[10].get("mp") == "yes" and got[12].get("mp") == "yes"
    # non-member features untouched would need one; all 4 are members here
    assert all("k" in v for v in got.values())


def test_cut_out_inner_polygons_kernel():
    """Bridged ring covers exactly outer minus holes: shoelace area is
    conserved and winding parity matches on a dense sample grid."""
    import numpy as np

    from mkgmap_spark.functions.geometry import points_in_ring, shoelace2
    from mkgmap_spark.functions.holes import cut_out_inner_polygons

    outer = (np.array([0, 0, 100, 100]), np.array([0, 100, 100, 0]))
    hole1 = (np.array([20, 20, 40, 40]), np.array([20, 40, 40, 20]))
    hole2 = (np.array([60, 60, 80, 80]), np.array([50, 90, 90, 50]))
    my, mx = cut_out_inner_polygons(outer, [hole1, hole2])

    a_outer = abs(shoelace2(*outer))
    a_h1 = abs(shoelace2(*hole1))
    a_h2 = abs(shoelace2(*hole2))
    assert abs(shoelace2(my, mx)) == a_outer - a_h1 - a_h2

    # winding parity equivalence on a grid avoiding boundaries
    ys, xs = np.meshgrid(np.arange(1, 100, 3), np.arange(1, 100, 3))
    py, px = ys.ravel(), xs.ravel()
    want = (
        points_in_ring(py, px, *outer)
        & ~points_in_ring(py, px, *hole1)
        & ~points_in_ring(py, px, *hole2)
    )
    got = points_in_ring(py, px, my, mx)
    # bridge channels are zero-width: exclude points on bridge rows
    off_bridge = ~np.isin(py, [my[i] for i in range(len(my))]) | True
    assert (got == want).mean() > 0.99  # only bridge-line points may flip
    mism = np.flatnonzero(got != want)
    # any mismatch must sit exactly on a bridge (hole rightmost y)
    assert all(py[i] in (20, 40, 60, 80, 30, 70) for i in mism)


def test_cut_multipolygons_operator(spark):
    """DataFrame-level hole elimination over assembled rings."""
    import numpy as np

    from mkgmap_spark.functions.geometry import shoelace2
    from mkgmap_spark.operators.relations import cut_multipolygons

    rings = spark.createDataFrame(
        [
            # rel 1: outer with one hole
            (1, 0, True, False, 5, [0, 0, 100, 100, 0], [0, 100, 100, 0, 0]),
            (1, 1, True, True, 5, [30, 30, 60, 60, 30], [30, 60, 60, 30, 30]),
            # rel 1: second outer, no holes
            (1, 2, True, False, 4, [200, 200, 250, 250], [0, 50, 50, 0]),
            # unclosed ring: dropped
            (1, 3, False, False, 2, [500, 510], [0, 10]),
            # rel 2: plain square
            (2, 0, True, False, 4, [0, 0, 10, 10], [0, 10, 10, 0]),
        ],
        "rel_id long, ring_idx int, closed boolean, is_hole boolean, "
        "n_points int, lats array<int>, lons array<int>",
    )
    out = cut_multipolygons(rings).collect()
    by = {(r["rel_id"], r["poly_idx"]): r for r in out}
    assert set(by) == {(1, 0), (1, 1), (2, 0)}
    a0 = abs(shoelace2(np.array(by[(1, 0)]["lats"]), np.array(by[(1, 0)]["lons"])))
    assert a0 == 2 * (100 * 100 - 30 * 30)  # outer minus hole, 2x area
    a1 = abs(shoelace2(np.array(by[(1, 1)]["lats"]), np.array(by[(1, 1)]["lons"])))
    assert a1 == 2 * 50 * 50


def test_cut_out_inner_polygons_randomized():
    """Randomized concave (star) outers with square holes: winding
    parity of the bridged ring must equal outer∧¬holes everywhere off
    the boundary lines — catches invalid bridges (a self-crossing
    splice flips parity in whole regions, not just on bridge rows)."""
    import numpy as np

    from mkgmap_spark.functions.geometry import points_in_ring
    from mkgmap_spark.functions.holes import cut_out_inner_polygons

    rng = np.random.RandomState(11)
    for trial in range(40):
        nv = rng.randint(6, 18)
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        # wide radius spread -> deep spikes -> strong reflex vertices,
        # so the visibility-repair path is exercised often
        rad = rng.randint(150, 1000, nv)
        oy = (np.cos(ang) * rad).astype(np.int64)
        ox = (np.sin(ang) * rad).astype(np.int64)
        holes = []
        for _ in range(rng.randint(1, 4)):
            hy0 = rng.randint(-200, 120)
            hx0 = rng.randint(-200, 120)
            s = rng.randint(20, 80)
            hy = np.array([hy0, hy0, hy0 + s, hy0 + s], dtype=np.int64)
            hx = np.array([hx0, hx0 + s, hx0 + s, hx0], dtype=np.int64)
            corners_in = points_in_ring(hy, hx, oy, ox)
            # precondition from the assembler: holes are disjoint —
            # reject bbox overlap with an already chosen hole
            overlaps = any(
                max(hy.min(), h1[0].min()) <= min(hy.max(), h1[0].max())
                and max(hx.min(), h1[1].min()) <= min(hx.max(), h1[1].max())
                for h1 in holes
            )
            if corners_in.all() and not overlaps:
                holes.append((hy, hx))
        if not holes:
            continue
        my, mx = cut_out_inner_polygons((oy, ox), holes)
        ys, xs = np.meshgrid(np.arange(-950, 951, 37), np.arange(-950, 951, 37))
        py, px = ys.ravel().astype(np.int64), xs.ravel().astype(np.int64)
        want = points_in_ring(py, px, oy, ox)
        for hy, hx in holes:
            want &= ~points_in_ring(py, px, hy, hx)
        got = points_in_ring(py, px, my, mx)
        mism = np.flatnonzero(got != want)
        # mismatches may only sit on bridge rows (hole rightmost y's)
        bridge_ys = {int(hy[np.argmax(hx)]) for hy, hx in holes} | {
            int(hy[i]) for hy, hx in holes for i in np.flatnonzero(hx == hx.max())
        }
        assert all(int(py[i]) in bridge_ys for i in mism), (trial, len(mism))
