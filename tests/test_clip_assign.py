"""Geometry-aware assignment (clip-split + large-object) vs oracle."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mkgmap_spark.operators import tiling
from mkgmap_spark.operators.clip_assign import assign_ways_with_split
from mkgmap_spark.operators.decode import decode_documents
from mkgmap_spark.oracle.tiles import split_with_geometry


def _inputs(spark, documents_df):
    feats = decode_documents(documents_df).filter(F.col("kind").isin("node", "way"))
    prepared = tiling.prepare_features(feats).select(
        "id", "kind_i", "ay", "ax", "size_bytes", "min_res", "lats", "lons"
    )
    pdf = prepared.toPandas()
    elements = [
        {
            "id": int(r.id),
            "kind_i": int(r.kind_i),
            "lats": list(r.lats) if len(r.lats) else [int(r.ay)],
            "lons": list(r.lons) if len(r.lons) else [int(r.ax)],
            "size_bytes": int(r.size_bytes),
        }
        for r in pdf.itertuples()
    ]
    return prepared, elements


def test_clip_assign_vs_oracle(spark, documents_df):
    prepared, elements = _inputs(spark, documents_df)
    shift = 0

    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, shift)
    ways = prepared.filter(F.col("kind_i") != tiling.POINT_KIND)
    tiles2, members = assign_ways_with_split(spark, ways, res.index, res.tiles, shift)
    got = {(r["id"], r["tile_id"], r["part"]) for r in members.collect()}

    o_tiles, _o_pts, o_ways = split_with_geometry(elements, shift)
    assert got == o_ways

    # appended private tiles match bounds
    n_base = len(res.tiles)
    got_priv = [(t.min_lat, t.min_lon, t.max_lat, t.max_lon) for t in tiles2[n_base:]]
    want_priv = [
        (t["min_lat"], t["min_lon"], t["max_lat"], t["max_lon"]) for t in o_tiles[n_base:]
    ]
    assert got_priv == want_priv


def test_clip_split_shapes_exist(spark, documents_df):
    """The fixture must actually exercise the split path: some closed
    shapes cross tile borders at shift 0."""
    prepared, elements = _inputs(spark, documents_df)
    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, 0)
    ways = prepared.filter(F.col("kind_i") != tiling.POINT_KIND)
    _, members = assign_ways_with_split(spark, ways, res.index, res.tiles, 0)
    multi = (
        members.groupBy("id").count().filter(F.col("count") > 1).count()
    )
    assert multi > 0


def test_pipeline_geometry_assign(spark, documents_df):
    """build_tiles(geometry_assign=True) end-to-end vs the oracle."""
    from mkgmap_spark.plans.pipeline import build_tiles

    res = build_tiles(spark, documents_df, levels=((0, 24),), geometry_assign=True)
    prepared, elements = _inputs(spark, documents_df)
    o_tiles, o_pts, o_ways = split_with_geometry(elements, 0)

    rows = res.membership.collect()
    got_pts = {r["id"]: r["tile_id"] for r in rows if r["kind_i"] == 0}
    got_ways = {(r["id"], r["tile_id"], r["part"]) for r in rows if r["kind_i"] != 0}
    want_pts = {e["id"]: o_pts[e["id"]] for e in elements if e["kind_i"] == 0}
    assert got_pts == want_pts
    assert got_ways == o_ways
    assert res.tiles.count() == len(o_tiles)


def test_exact_split_kernel_matches_sh(spark, documents_df):
    """The exact ShapeSplitter kernel and the Sutherland-Hodgman clip
    agree on tile membership for the fixture's (non-degenerate)
    shapes; the exact kernel additionally handles border-touching
    degenerates (covered in tests/test_shape_split.py)."""
    prepared, _ = _inputs(spark, documents_df)
    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, 0)
    ways = prepared.filter(F.col("kind_i") != tiling.POINT_KIND)
    _, m_sh = assign_ways_with_split(spark, ways, res.index, res.tiles, 0, split_kernel="sh")
    _, m_ex = assign_ways_with_split(spark, ways, res.index, res.tiles, 0, split_kernel="exact")
    got_sh = {(r["id"], r["tile_id"], r["part"]) for r in m_sh.collect()}
    got_ex = {(r["id"], r["tile_id"], r["part"]) for r in m_ex.collect()}
    assert got_sh == got_ex


def test_pipeline_geometry_filters(spark, documents_df):
    """geometry_filters=True runs the per-level filter chain before
    assignment: the coarse level assigns thinned geometry, membership
    stays complete and orphan-free."""
    from mkgmap_spark.plans.pipeline import build_tiles

    res = build_tiles(
        spark, documents_df, levels=((0, 24), (2, 18)), geometry_assign=True,
        geometry_filters=True,
    )
    m = res.membership
    assert m.count() > 0
    orphans = m.join(res.tiles.select("tile_id", "level"), ["tile_id", "level"], "left_anti")
    assert orphans.count() == 0
    # both levels produced way memberships
    lv = {r["level"] for r in m.filter(F.col("kind_i") != 0).select("level").distinct().collect()}
    assert lv == {0, 2}


def test_private_tile_cap_bounds_driver_surface(spark, documents_df):
    """A pathological input where EVERY line is oversized must not
    stream one driver row per feature: beyond max_private_tiles the
    rest share a single union-bounds overflow tile."""
    import warnings

    from mkgmap_spark.operators import tiling

    prepared, _ = _inputs(spark, documents_df)
    provider = tiling.SparkHistogramProvider(prepared)
    res = tiling.split_level(provider, 0)
    # giant diagonal lines spanning the whole domain -> all private
    n = 500
    big = spark.range(1, n + 1).select(
        (F.col("id") + 10_000_000).alias("id"),
        F.lit(1).alias("kind_i"),
        F.array(F.lit(-2_000_000) + F.col("id").cast("int"), F.lit(2_000_000)).alias("lats"),
        F.array(F.lit(-4_000_000), F.lit(4_000_000) - F.col("id").cast("int")).alias("lons"),
    )
    cap = 50
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tiles2, members = assign_ways_with_split(
            spark, big, res.index, res.tiles, 0, max_private_tiles=cap
        )
        assert any("private-tile cap" in str(w.message) for w in caught)
    n_base = len(res.tiles)
    # cap private tiles + exactly one overflow tile
    assert len(tiles2) == n_base + cap + 1
    overflow = tiles2[-1]
    assert overflow.n_lines == n - cap
    rows = members.collect()
    assert len(rows) == n  # every feature still assigned
    per_tile = {}
    for r in rows:
        per_tile[r["tile_id"]] = per_tile.get(r["tile_id"], 0) + 1
    assert per_tile[overflow.tile_id] == n - cap
    # union bounds cover all overflow features
    assert overflow.min_lat <= -2_000_000 + cap + 1
    assert overflow.max_lat >= 2_000_001
