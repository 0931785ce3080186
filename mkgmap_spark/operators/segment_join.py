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

    All JVM-side: arrays_zip + posexplode + sequence() over the cell
    span of each segment's bbox.
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
    return segs.select(
        "id",
        "pos",
        "y1",
        "x1",
        "y2",
        "x2",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(shiftright(least(y1, y2), {g}), shiftright(greatest(y1, y2), {g})),"
                f" cy -> transform(sequence(shiftright(least(x1, x2), {g}), shiftright(greatest(x1, x2), {g})),"
                f" cx -> struct(cy as cy, cx as cx))))"
            )
        ).alias("c"),
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
