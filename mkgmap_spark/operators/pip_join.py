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
  Zero shuffles on the points side.

* ``pip_join_shuffle`` — boundary set too big to broadcast: boundaries
  are exploded to their bbox cover cells, points join on cell id
  (AQE-skew-splittable shuffle), and each (boundary, candidate points)
  group is refined with one vectorized winding test via applyInPandas.

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
    boundaries: DataFrame,
    gshift: int = 16,
    id_col: str = "id",
    lat_col: str = "ay",
    lon_col: str = "ax",
) -> DataFrame:
    """Broadcast PIP join; boundaries collected once on the driver."""
    prepped = _prep_boundaries(boundaries.toPandas())
    cell_idx = _cell_index(prepped, gshift)

    def match_batch(it):
        for pdf in it:
            ids = pdf["id"].to_numpy(np.int64)
            py = pdf["lat"].to_numpy(np.int64)
            px = pdf["lon"].to_numpy(np.int64)
            cy = py >> gshift
            cx = px >> gshift
            out_id, out_lv, out_b = [], [], []
            # group points by cell, vectorized winding per candidate
            order = np.lexsort((cx, cy))
            scy, scx = cy[order], cx[order]
            breaks = np.flatnonzero((np.diff(scy) != 0) | (np.diff(scx) != 0)) + 1
            for seg in np.split(order, breaks):
                key = (int(cy[seg[0]]), int(cx[seg[0]]))
                cands = cell_idx.get(key)
                if not cands:
                    continue
                sy, sx = py[seg], px[seg]
                for bi in cands:
                    b = prepped[bi]
                    y0, x0, y1, x1 = b["bbox"]
                    m = (sy >= y0) & (sy <= y1) & (sx >= x0) & (sx <= x1)
                    if not m.any():
                        continue
                    inside = points_in_polygon(sy[m], sx[m], b["rings"])
                    hit = seg[m][inside]
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
                "bi": np.arange(len(prepped), dtype=np.int32),
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


def pip_join_shuffle(
    points: DataFrame,
    boundaries: DataFrame,
    gshift: int = 16,
    id_col: str = "id",
    lat_col: str = "ay",
    lon_col: str = "ax",
) -> DataFrame:
    """Shuffle PIP join for boundary sets too large to broadcast.

    Boundaries explode to bbox cover cells (done JVM-side with
    sequence() over the cell ranges); points shuffle on cell id; the
    winding refine runs once per (boundary, cell) group.
    """
    b = boundaries.select(
        "boundary_id",
        "admin_level",
        "name",
        "postcode",
        "rings",
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(2147483647 as int), (acc, r) -> least(acc, array_min(r.lats)))").alias("_y0"),
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(-2147483648 as int), (acc, r) -> greatest(acc, array_max(r.lats)))").alias("_y1"),
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(2147483647 as int), (acc, r) -> least(acc, array_min(r.lons)))").alias("_x0"),
        F.expr("aggregate(filter(rings, r -> not r.is_hole), cast(-2147483648 as int), (acc, r) -> greatest(acc, array_max(r.lons)))").alias("_x1"),
    )
    g = gshift
    cover = b.select(
        "boundary_id",
        "admin_level",
        "name",
        "postcode",
        "rings",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(shiftright(_y0, {g}), shiftright(_y1, {g})), "
                f"cy -> transform(sequence(shiftright(_x0, {g}), shiftright(_x1, {g})), "
                f"cx -> struct(cy as cy, cx as cx))))"
            )
        ).alias("c"),
    ).select("boundary_id", "admin_level", "name", "postcode", "rings", "c.cy", "c.cx")

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.shiftright(F.col(lat_col).cast("long"), g).alias("cy"),
        F.shiftright(F.col(lon_col).cast("long"), g).alias("cx"),
    )

    paired = pts.join(cover, ["cy", "cx"])

    def refine(key, pdf):
        rings_raw = pdf["rings"].iloc[0]
        rings = [
            (
                np.asarray(r["lats"], dtype=np.int64),
                np.asarray(r["lons"], dtype=np.int64),
                bool(r["is_hole"]),
            )
            for r in rings_raw
        ]
        py = pdf["lat"].to_numpy(np.int64)
        px = pdf["lon"].to_numpy(np.int64)
        inside = points_in_polygon(py, px, rings)
        sub = pdf.loc[inside, ["id", "admin_level", "boundary_id", "name", "postcode"]]
        return sub

    refined = paired.groupBy("boundary_id", "cy", "cx").applyInPandas(
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
    **kwargs,
) -> DataFrame:
    """Strategy dispatch, mirroring the reference's grid+quadtree-index
    vs full-scan choice (BoundaryGrid vs ElementQuadTree): a bounded
    boundary set (admin polygons — the LocationHook case) broadcasts;
    an sf-scaled one goes through the cell-keyed shuffle join."""
    n = boundaries.limit(broadcast_threshold + 1).count()
    if n <= broadcast_threshold:
        return pip_join_broadcast(points, boundaries, gshift=gshift, **kwargs)
    return pip_join_shuffle(points, boundaries, gshift=gshift, **kwargs)
