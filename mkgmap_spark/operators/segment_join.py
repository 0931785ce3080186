"""Segment x segment intersection join (road/border crossings).

Reference: StyledConverter.checkRoutingNodesAtAdminBoundaries
(osmstyle/StyledConverter.java:628-720) finds crossings between road
segments and admin-boundary segments with an ElementQuadTree
accelerator, then inserts routing nodes at the exact crossing points
(imgfmt/Utils.getSegmentSegmentIntersection).

Spark re-expression: both sides explode ways into segments JVM-side
(arrays_zip of the coord array with itself shifted), key each segment
by the cover cells of its bbox, equi-join on cell, and refine with the
exact integer orientation test (functions/geometry.segments_intersect)
inside an Arrow batch.  A crossing pair straddling several cover cells
would match in each; dedup on (left_id, left_seg, right_id, right_seg).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import segments_intersect


def explode_segments(ways: DataFrame, id_col: str = "id", gshift: int = 14) -> DataFrame:
    """ways(id, lats, lons) -> one row per segment per cover cell.

    All JVM-side: arrays_zip + posexplode + a supercover line
    rasterization over the cell grid.  For each cell row (cy) the
    segment passes through, the segment is clipped to that horizontal
    band and only the cells in the band's x-extent are emitted — the
    fanout of a diagonal segment is O(cells along the line), not the
    O(bbox area) a naive bbox cover explode would produce (a random
    long segment covers ~N^2 bbox cells but crosses only ~2N).  The
    interpolation runs in doubles with a +-1 map-unit margin before
    the cell shift, so float rounding can only ADD a neighbouring
    candidate cell (removed by the exact refine), never drop the cell
    containing a true crossing.
    """
    segs = ways.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(
                "zip_with(slice(lats, 1, size(lats) - 1), slice(lats, 2, size(lats) - 1),"
                " (a, b) -> struct(a as y1, b as y2))"
            )
        ).alias("pos", "ys"),
        F.col("lons"),
    ).select(
        "id",
        "pos",
        F.col("ys.y1").alias("y1"),
        F.col("ys.y2").alias("y2"),
        F.expr("lons[pos]").alias("x1"),
        F.expr("lons[pos + 1]").alias("x2"),
    )
    g = gshift
    # orient the segment so ys <= ye, then per band cy in
    # [ys>>g, ye>>g]: clip to the band's y-interval, interpolate the
    # two clipped x endpoints, widen by 1 unit each way, clamp to the
    # segment's overall x cell span.
    oriented = segs.select(
        "id",
        "pos",
        "y1",
        "x1",
        "y2",
        "x2",
        F.expr("if(y1 <= y2, cast(y1 as bigint), cast(y2 as bigint))").alias("ys"),
        F.expr("if(y1 <= y2, cast(y2 as bigint), cast(y1 as bigint))").alias("ye"),
        F.expr("if(y1 <= y2, cast(x1 as bigint), cast(x2 as bigint))").alias("xs"),
        F.expr("if(y1 <= y2, cast(x2 as bigint), cast(x1 as bigint))").alias("xe"),
    )
    band_cells = (
        f"flatten(transform(sequence(shiftright(ys, {g}), shiftright(ye, {g})), cy -> "
        # band y-interval clipped to the segment
        f"transform(sequence("
        f"  greatest(shiftright(least(cast(x1 as bigint), cast(x2 as bigint)), {g}),"
        f"           shiftright(cast(floor(least("
        f"             if(ye = ys, cast(least(x1, x2) as double),"
        f"                xs + (xe - xs) * cast(greatest(ys, shiftleft(cy, {g})) - ys as double) / (ye - ys)),"
        f"             if(ye = ys, cast(least(x1, x2) as double),"
        f"                xs + (xe - xs) * cast(least(ye, shiftleft(cy + 1, {g})) - ys as double) / (ye - ys))"
        f"           )) as bigint) - 1, {g})),"
        f"  least(shiftright(greatest(cast(x1 as bigint), cast(x2 as bigint)), {g}),"
        f"        shiftright(cast(ceil(greatest("
        f"             if(ye = ys, cast(greatest(x1, x2) as double),"
        f"                xs + (xe - xs) * cast(greatest(ys, shiftleft(cy, {g})) - ys as double) / (ye - ys)),"
        f"             if(ye = ys, cast(greatest(x1, x2) as double),"
        f"                xs + (xe - xs) * cast(least(ye, shiftleft(cy + 1, {g})) - ys as double) / (ye - ys))"
        f"           )) as bigint) + 1, {g}))"
        f"), cx -> struct(cy as cy, cx as cx))))"
    )
    return oriented.select(
        "id",
        "pos",
        "y1",
        "x1",
        "y2",
        "x2",
        F.explode(F.expr(band_cells)).alias("c"),
    ).select("id", "pos", "y1", "x1", "y2", "x2", "c.cy", "c.cx")


def segment_intersection_join(
    left_ways: DataFrame,
    right_ways: DataFrame,
    gshift: int = 14,
    broadcast_right: bool = False,
) -> DataFrame:
    """Find all intersecting (left way, right way) segment pairs.

    Output: (left_id, left_pos, right_id, right_pos) distinct.
    """
    ls = explode_segments(left_ways, gshift=gshift).withColumnsRenamed(
        {"id": "left_id", "pos": "left_pos", "y1": "ly1", "x1": "lx1", "y2": "ly2", "x2": "lx2"}
    )
    rs = explode_segments(right_ways, gshift=gshift).withColumnsRenamed(
        {"id": "right_id", "pos": "right_pos", "y1": "ry1", "x1": "rx1", "y2": "ry2", "x2": "rx2"}
    )
    if broadcast_right:
        rs = F.broadcast(rs)
    paired = ls.join(rs, ["cy", "cx"])

    def refine(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            hit = segments_intersect(
                pdf["ly1"].to_numpy(np.int64),
                pdf["lx1"].to_numpy(np.int64),
                pdf["ly2"].to_numpy(np.int64),
                pdf["lx2"].to_numpy(np.int64),
                pdf["ry1"].to_numpy(np.int64),
                pdf["rx1"].to_numpy(np.int64),
                pdf["ry2"].to_numpy(np.int64),
                pdf["rx2"].to_numpy(np.int64),
            )
            yield pdf.loc[hit, ["left_id", "left_pos", "right_id", "right_pos"]]

    out = paired.mapInPandas(refine, "left_id long, left_pos int, right_id long, right_pos int")
    return out.dropDuplicates(["left_id", "left_pos", "right_id", "right_pos"])
