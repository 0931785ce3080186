"""Point-in-polygon location join (LocationHook semantics).

Reference: every tagged node/way-centre is tagged with the admin
boundaries containing it (reader/osm/LocationHook.java:120-239
``processElem``; boundaries organised as a fixed raster of quadtrees,
boundary/BoundaryGrid.java:74-92, BoundaryQuadTree.java).

Spark re-expression — a cell-keyed spatial hash join with a winding-
number refine (functions/geometry.py :: winding_number, the engine's
java.awt.Polygon.contains equivalent):

* ``pip_join_broadcast`` — boundary set fits on the driver (mkgmap's
  own model: boundary files are loaded fully, BoundaryUtil.java).  The
  boundaries are indexed by coarse cell once, shipped in the UDF
  closure, and every Arrow batch of points is matched vectorized.
  Zero shuffles on the points side.  ``boundaries`` may be a Spark
  DataFrame *or* a driver-side pandas DataFrame — callers that
  synthesize the boundary set on the driver pass pandas directly and
  skip a createDataFrame -> toPandas round trip (nested-struct Arrow
  collection is the single most expensive step of the small-boundary
  path otherwise).

* ``pip_join_shuffle`` — boundary set too big to broadcast.  The
  shuffle ships NO geometry: boundaries explode to bare
  (boundary_id, cell) keys, points join on cell id (AQE-skew-
  splittable), candidates aggregate into bounded per-(boundary, block)
  point batches, and ring geometry joins in ONCE per (boundary, block)
  before a vectorized winding refine.  A continent polygon covering
  10^4 cells therefore duplicates its rings per coarse block (cells
  >> BLOCK_SHIFT), not per cell — bounded amplification.

Match semantics (BoundaryQuadTree merge rule): per (point,
admin_level) the lexicographically-smallest containing boundary_id
wins — deterministic under any partitioning.

Output: (id, admin_level, boundary_id, name, postcode) long format.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geometry import points_in_polygon

OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("admin_level", T.IntegerType()),
        T.StructField("boundary_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("postcode", T.StringType()),
    ]
)

# pip_join_shuffle: ring geometry is brought in once per
# (boundary, cell block); a block is 2^BLOCK_SHIFT cells on a side.
BLOCK_SHIFT = 4


def _prep_boundaries(boundaries_pdf: pd.DataFrame):
    """Driver-side: numpy rings + bbox per boundary."""
    prepped = []
    for row in boundaries_pdf.itertuples():
        rings = []
        min_y = min_x = 2**62
        max_y = max_x = -(2**62)
        for r in row.rings:
            la = np.asarray(r["lats"], dtype=np.int64)
            lo = np.asarray(r["lons"], dtype=np.int64)
            rings.append((la, lo, bool(r["is_hole"])))
            if not r["is_hole"] and len(la):
                min_y = min(min_y, int(la.min()))
                max_y = max(max_y, int(la.max()))
                min_x = min(min_x, int(lo.min()))
                max_x = max(max_x, int(lo.max()))
        prepped.append(
            {
                "boundary_id": row.boundary_id,
                "admin_level": int(row.admin_level),
                "name": row.name,
                "postcode": row.postcode,
                "rings": rings,
                "bbox": (min_y, min_x, max_y, max_x),
            }
        )
    return prepped


def _cell_index(prepped, gshift: int) -> dict[tuple[int, int], list[int]]:
    idx: dict[tuple[int, int], list[int]] = {}
    for i, b in enumerate(prepped):
        y0, x0, y1, x1 = b["bbox"]
        for cy in range(y0 >> gshift, (y1 >> gshift) + 1):
            for cx in range(x0 >> gshift, (x1 >> gshift) + 1):
                idx.setdefault((cy, cx), []).append(i)
    return idx


def pip_join_broadcast(
    points: DataFrame,
    boundaries,
    gshift: int = 16,
    id_col: str = "id",
    lat_col: str = "ay",
    lon_col: str = "ax",
) -> DataFrame:
    """Broadcast PIP join; boundaries held once on the driver.

    ``boundaries`` is a Spark DataFrame or a pandas DataFrame with
    columns (boundary_id, admin_level, name, postcode, rings) where
    rings is a list of {lats, lons, is_hole} mappings.
    """
    if isinstance(boundaries, pd.DataFrame):
        boundaries_pdf = boundaries
    else:
        boundaries_pdf = boundaries.toPandas()
    prepped = _prep_boundaries(boundaries_pdf)
    cell_idx = _cell_index(prepped, gshift)
    n_bounds = len(prepped)

    def match_batch(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            py = pdf["lat"].to_numpy(np.int64)
            px = pdf["lon"].to_numpy(np.int64)
            cy = py >> gshift
            cx = px >> gshift
            # Phase 1 (cheap, index-only): per cell group, append the
            # group's point indices to each candidate boundary's list.
            # Phase 2 (vectorized): ONE bbox mask + winding test per
            # boundary over its concatenated candidates — the numpy
            # call count is O(boundaries present), not
            # O(cells x candidates) as a per-cell refine would be.
            order = np.lexsort((cx, cy))
            scy, scx = cy[order], cx[order]
            breaks = np.flatnonzero((np.diff(scy) != 0) | (np.diff(scx) != 0)) + 1
            per_bound: dict[int, list[np.ndarray]] = {}
            for seg in np.split(order, breaks):
                key = (int(cy[seg[0]]), int(cx[seg[0]]))
                cands = cell_idx.get(key)
                if not cands:
                    continue
                for bi in cands:
                    per_bound.setdefault(bi, []).append(seg)
            out_id, out_lv, out_b = [], [], []
            for bi, segs in per_bound.items():
                b = prepped[bi]
                idxs = segs[0] if len(segs) == 1 else np.concatenate(segs)
                sy, sx = py[idxs], px[idxs]
                y0, x0, y1, x1 = b["bbox"]
                m = (sy >= y0) & (sy <= y1) & (sx >= x0) & (sx <= x1)
                if not m.any():
                    continue
                inside = points_in_polygon(sy[m], sx[m], b["rings"])
                hit = idxs[m][inside]
                out_id.extend(ids[hit].tolist())
                out_lv.extend([b["admin_level"]] * len(hit))
                out_b.extend([bi] * len(hit))
            yield pd.DataFrame({"id": out_id, "admin_level": out_lv, "bi": out_b})

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
    )
    matched = pts.mapInPandas(match_batch, "id long, admin_level int, bi int")

    spark = points.sparkSession
    attrs = spark.createDataFrame(
        pd.DataFrame(
            {
                "bi": np.arange(n_bounds, dtype=np.int32),
                "boundary_id": [b["boundary_id"] for b in prepped],
                "name": [b["name"] for b in prepped],
                "postcode": [b["postcode"] for b in prepped],
            }
        )
    )
    out = matched.join(F.broadcast(attrs), "bi").drop("bi")
    # innermost-wins per (point, level): deterministic smallest
    # boundary_id.  min(struct) instead of a window: partial (map-side)
    # aggregation halves the shuffle and avoids the per-group sort.
    return (
        out.groupBy("id", "admin_level")
        .agg(F.min(F.struct("boundary_id", "name", "postcode")).alias("_b"))
        .select("id", "admin_level", "_b.boundary_id", "_b.name", "_b.postcode")
    )


def pip_shuffle_candidates(
    points: DataFrame,
    boundaries: DataFrame,
    gshift: int = 16,
    id_col: str = "id",
    lat_col: str = "ay",
    lon_col: str = "ax",
    max_pts_per_row: int = 250_000,
) -> DataFrame:
    """Candidate stage of the shuffle PIP join — geometry-free.

    Returns (boundary_id, by, bx, pts) where pts is a bounded array of
    candidate (id, lat, lon) structs per (boundary, cell block).  The
    cell-cover explode and the point shuffle carry ONLY
    (boundary_id, cy, cx) — no ring arrays — so a polygon covering many
    cells does not amplify its geometry through the exchange.

    Cap-and-spill: a pathologically hot block under one huge boundary
    would otherwise produce one fat collect_list row.  Blocks whose
    candidate count exceeds ``max_pts_per_row`` split on a
    hash(id)-derived salt into ceil(n/cap) rows of ~cap structs each —
    semantically transparent, because the refine kernel treats every
    row independently and the final (id, admin_level) aggregation
    dedups across rows.  The count pre-pass is a keys-only aggregate
    over the same exchange (AQE reuses it), so the common small-block
    case pays one cheap extra stage and no extra data shuffle.
    """
    g = gshift
    b = boundaries.select(
        "boundary_id",
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(2147483647 as int), (acc, r) -> least(acc, array_min(r.lats)))").alias("_y0"),
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(-2147483648 as int), (acc, r) -> greatest(acc, array_max(r.lats)))").alias("_y1"),
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(2147483647 as int), (acc, r) -> least(acc, array_min(r.lons)))").alias("_x0"),
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(-2147483648 as int), (acc, r) -> greatest(acc, array_max(r.lons)))").alias("_x1"),
    )
    cover = b.select(
        "boundary_id",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(shiftright(_y0, {g}), shiftright(_y1, {g})), "
                f"cy -> transform(sequence(shiftright(_x0, {g}), shiftright(_x1, {g})), "
                f"cx -> struct(cy as cy, cx as cx))))"
            )
        ).alias("c"),
    ).select("boundary_id", "c.cy", "c.cx")

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.shiftright(F.col(lat_col).cast("long"), g).alias("cy"),
        F.shiftright(F.col(lon_col).cast("long"), g).alias("cx"),
    )

    paired = pts.join(cover, ["cy", "cx"]).select(
        "boundary_id",
        F.shiftright(F.col("cy"), BLOCK_SHIFT).alias("by"),
        F.shiftright(F.col("cx"), BLOCK_SHIFT).alias("bx"),
        "id", "lat", "lon",
    )
    counts = paired.groupBy("boundary_id", "by", "bx").agg(
        F.count(F.lit(1)).alias("_n")
    )
    salted = paired.join(counts, ["boundary_id", "by", "bx"]).withColumn(
        "_salt",
        F.pmod(
            F.xxhash64("id"),
            F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(max_pts_per_row))),
        ),
    )
    return (
        salted.groupBy("boundary_id", "by", "bx", "_salt")
        .agg(F.collect_list(F.struct("id", "lat", "lon")).alias("pts"))
        .select("boundary_id", "by", "bx", "pts")
    )


def pip_join_shuffle(
    points: DataFrame,
    boundaries: DataFrame,
    gshift: int = 16,
    id_col: str = "id",
    lat_col: str = "ay",
    lon_col: str = "ax",
    max_pts_per_row: int = 250_000,
) -> DataFrame:
    """Shuffle PIP join for boundary sets too large to broadcast.

    Three stages: (1) geometry-free cell-keyed candidate join
    (``pip_shuffle_candidates``), (2) ring geometry joined in once per
    (boundary, cell block), (3) one vectorized winding refine per
    candidate batch.
    """
    cand = pip_shuffle_candidates(
        points, boundaries, gshift=gshift, id_col=id_col, lat_col=lat_col,
        lon_col=lon_col, max_pts_per_row=max_pts_per_row,
    )
    withgeo = cand.join(
        boundaries.select("boundary_id", "admin_level", "name", "postcode", "rings"),
        "boundary_id",
    )

    def refine(it):
        for pdf in it:
            outs = []
            for row in pdf.itertuples():
                rings = [
                    (
                        np.asarray(r["lats"], dtype=np.int64),
                        np.asarray(r["lons"], dtype=np.int64),
                        bool(r["is_hole"]),
                    )
                    for r in row.rings
                ]
                cpts = row.pts
                py = np.fromiter((p["lat"] for p in cpts), dtype=np.int64, count=len(cpts))
                px = np.fromiter((p["lon"] for p in cpts), dtype=np.int64, count=len(cpts))
                inside = points_in_polygon(py, px, rings)
                if not inside.any():
                    continue
                hit = np.flatnonzero(inside)
                outs.append(
                    pd.DataFrame(
                        {
                            "id": [int(cpts[i]["id"]) for i in hit],
                            "admin_level": row.admin_level,
                            "boundary_id": row.boundary_id,
                            "name": row.name,
                            "postcode": row.postcode,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    refined = withgeo.mapInPandas(
        refine,
        "id long, admin_level int, boundary_id string, name string, postcode string",
    )
    return (
        refined.groupBy("id", "admin_level")
        .agg(F.min(F.struct("boundary_id", "name", "postcode")).alias("_b"))
        .select("id", "admin_level", "_b.boundary_id", "_b.name", "_b.postcode")
    )


def pip_join(
    points: DataFrame,
    boundaries: DataFrame,
    gshift: int = 16,
    broadcast_threshold: int = 10_000,
    strategy: str | None = None,
    **kwargs,
) -> DataFrame:
    """Strategy dispatch, mirroring the reference's grid+quadtree-index
    vs full-scan choice (BoundaryGrid vs ElementQuadTree): a bounded
    boundary set (admin polygons — the LocationHook case) broadcasts;
    an sf-scaled one goes through the cell-keyed shuffle join.

    ``strategy`` ('broadcast' | 'shuffle') skips the cardinality probe
    (one bounded count action) for call sites that know their side."""
    if strategy is None:
        n = boundaries.limit(broadcast_threshold + 1).count()
        strategy = "broadcast" if n <= broadcast_threshold else "shuffle"
    if strategy == "broadcast":
        return pip_join_broadcast(points, boundaries, gshift=gshift, **kwargs)
    if strategy == "shuffle":
        return pip_join_shuffle(points, boundaries, gshift=gshift, **kwargs)
    raise ValueError(f"unknown pip_join strategy {strategy!r}")
