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
