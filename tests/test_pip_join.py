"""PIP location join: broadcast and shuffle strategies vs the scalar
even-odd oracle, on fixture boundaries (rects, nested, holes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mkgmap_spark.operators.decode import decode_documents
from mkgmap_spark.operators import tiling
from mkgmap_spark.operators.pip_join import pip_join_broadcast, pip_join_shuffle
from mkgmap_spark.oracle.pip import locate_all


@pytest.fixture(scope="module")
def pip_inputs(spark, documents_df, fixture_dir):
    feats = decode_documents(documents_df).filter(F.col("kind") == "node")
    pts = tiling.prepare_features(feats).select("id", "ay", "ax").limit(400)
    boundaries = spark.read.parquet(os.path.join(fixture_dir, "boundaries.parquet"))
    pts_pd = pts.toPandas()
    b_pd = boundaries.toPandas()
    oracle_points = [(int(r.id), int(r.ay), int(r.ax)) for r in pts_pd.itertuples()]
    oracle_bnds = [
        {
            "boundary_id": r.boundary_id,
            "admin_level": int(r.admin_level),
            "name": r.name,
            "postcode": r.postcode,
            "rings": [
                {"lats": list(x["lats"]), "lons": list(x["lons"]), "is_hole": bool(x["is_hole"])}
                for x in r.rings
            ],
        }
        for r in b_pd.itertuples()
    ]
    want = locate_all(oracle_points, oracle_bnds)
    return pts, boundaries, want


def _got(df):
    return {(r["id"], r["admin_level"], r["boundary_id"]) for r in df.collect()}


def test_pip_broadcast_matches_oracle(spark, pip_inputs):
    pts, boundaries, want = pip_inputs
    got = _got(pip_join_broadcast(pts, boundaries))
    assert got == want
    assert len(want) > 50  # fixture actually covers points


def test_pip_shuffle_matches_broadcast(spark, pip_inputs):
    pts, boundaries, want = pip_inputs
    got = _got(pip_join_shuffle(pts, boundaries))
    assert got == want


def test_pip_hole_semantics(spark, pip_inputs):
    """Points inside a hole must not match the hole-bearing boundary
    (level 8 towns in the fixture have holes)."""
    pts, boundaries, want = pip_inputs
    lvl8 = {w for w in want if w[1] == 8}
    # the oracle says some points are in towns; the fixture's holes are
    # inside towns, so if hole handling were broken the engine would
    # report strictly more matches than the oracle — covered by exact
    # equality above. Here just assert the fixture exercises level 8.
    assert lvl8, "fixture should place some points inside level-8 towns"


def test_pip_shuffle_candidates_geometry_free(spark, pip_inputs):
    """The shuffle path's exchanged candidate rows must not carry ring
    geometry: a polygon covering 10^4 cells must not duplicate its
    coordinate arrays per cell through the shuffle.  Rings are joined
    in once per (boundary, cell block) after candidate aggregation."""
    from mkgmap_spark.operators.pip_join import pip_shuffle_candidates

    pts, boundaries, want = pip_inputs
    cand = pip_shuffle_candidates(pts, boundaries)
    assert "rings" not in cand.columns
    # candidate batch rows: one per (boundary, block), point structs only
    assert set(cand.columns) == {"boundary_id", "by", "bx", "pts"}
    pt_fields = {f.name for f in cand.schema["pts"].dataType.elementType.fields}
    assert pt_fields == {"id", "lat", "lon"}


def test_pip_broadcast_accepts_pandas_boundaries(spark, pip_inputs):
    """Driver-synthesized boundary sets pass as pandas directly —
    identical result, no createDataFrame -> toPandas round trip."""
    pts, boundaries, want = pip_inputs
    b_pd = boundaries.toPandas()
    got = _got(pip_join_broadcast(pts, b_pd))
    assert got == want


def test_pip_join_dispatch(spark):
    """The dispatcher picks broadcast for bounded boundary sets and
    shuffle above the threshold; results identical either way."""
    from mkgmap_spark.operators.pip_join import pip_join

    pts = spark.createDataFrame(
        [(1, 50, 50), (2, 5000, 5000)], "id long, ay int, ax int"
    )
    rings = [{"lats": [0, 0, 100, 100, 0], "lons": [0, 100, 100, 0, 0], "is_hole": False}]
    bnd = spark.createDataFrame(
        [("b1", 2, "Box", "P1", rings)],
        "boundary_id string, admin_level int, name string, postcode string, "
        "rings array<struct<lats: array<int>, lons: array<int>, is_hole: boolean>>",
    )
    got_b = {(r["id"], r["boundary_id"]) for r in pip_join(pts, bnd).collect()}
    got_s = {(r["id"], r["boundary_id"])
             for r in pip_join(pts, bnd, broadcast_threshold=0).collect()}
    assert got_b == got_s == {(1, "b1")}


def test_pip_join_strategy_hint(spark):
    """Explicit strategy skips the cardinality probe and picks the
    named path; results identical either way."""
    from mkgmap_spark.operators.pip_join import pip_join

    pts = spark.createDataFrame(
        [(1, 50, 50), (2, 5000, 5000)], "id long, ay int, ax int"
    )
    rings = [{"lats": [0, 0, 100, 100, 0], "lons": [0, 100, 100, 0, 0], "is_hole": False}]
    bnd = spark.createDataFrame(
        [("b1", 2, "Box", "P1", rings)],
        "boundary_id string, admin_level int, name string, postcode string, "
        "rings array<struct<lats: array<int>, lons: array<int>, is_hole: boolean>>",
    )
    for strat in ("broadcast", "shuffle"):
        got = {(r["id"], r["boundary_id"])
               for r in pip_join(pts, bnd, strategy=strat).collect()}
        assert got == {(1, "b1")}, strat
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pip_join(pts, bnd, strategy="nope")


def test_pip_candidates_cap_and_spill(spark):
    """A hot (boundary, block) splits into multiple bounded rows on the
    id-hash salt, and the shuffle join output is unchanged (round-4
    verdict item 6)."""
    import pandas as pd

    from mkgmap_spark.operators.pip_join import pip_shuffle_candidates

    # 600 points inside one 2^16-unit cell -> one (boundary, block)
    n = 600
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"id": range(n), "ay": [1000 + i % 37 for i in range(n)],
             "ax": [2000 + i % 53 for i in range(n)]}
        ),
        schema="id long, ay int, ax int",
    )
    bnd = spark.createDataFrame(
        [("B1", 4, "big", None,
          [{"lats": [0, 0, 65000, 65000], "lons": [0, 65000, 65000, 0],
            "is_hole": False}])],
        "boundary_id string, admin_level int, name string, postcode string, "
        "rings array<struct<lats: array<int>, lons: array<int>, is_hole: boolean>>",
    )
    cap = 100
    rows = pip_shuffle_candidates(pts, bnd, max_pts_per_row=cap).collect()
    sizes = [len(r["pts"]) for r in rows]
    assert len(rows) >= 2, "hot block did not split"
    assert max(sizes) <= 2 * cap, sizes  # hash-salt variance bound
    assert sum(sizes) == n  # nothing lost, nothing duplicated
    ids = sorted(p["id"] for r in rows for p in r["pts"])
    assert ids == list(range(n))
    # uncapped: exactly one row
    one = pip_shuffle_candidates(pts, bnd).collect()
    assert len(one) == 1 and len(one[0]["pts"]) == n
    # end-to-end unchanged under the cap
    from mkgmap_spark.operators.pip_join import pip_join_broadcast, pip_join_shuffle

    want = _got(pip_join_broadcast(pts, bnd))
    got = _got(pip_join_shuffle(pts, bnd, max_pts_per_row=cap))
    assert got == want and len(got) == n
