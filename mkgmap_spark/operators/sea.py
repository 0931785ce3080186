"""Sea/coastline assembly: global endpoint connected components.

Reference: SeaGenerator joins coastline ways end-to-end and closes
small gaps before synthesizing land/sea polygons against the tile bbox
(reader/osm/SeaGenerator.java:818-1043, closeGaps:1407).

Spark re-expression:
1. endpoints snapped to a tolerance grid (2^snap_shift map units) —
   the distributed analogue of closeGaps' "nearby endpoints are the
   same point";
2. connected components via iterative min-label propagation over the
   shared-endpoint graph (each round: groupBy endpoint -> min label ->
   join back; converges in O(log(diameter)) rounds because labels hop
   a full chain segment per round);
3. per-component ring assembly with the merge.py stitching kernel
   (components are single coastlines — small groups).

Output: (component long, n_ways, closed, n_points, min_way_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coastline_components(
    ways: DataFrame,
    snap_shift: int = 6,
    max_rounds: int = 12,
    id_col: str = "id",
) -> DataFrame:
    """Label every way with its connected component (min way id)."""
    ep = lambda y, x: (
        (F.shiftright(F.expr(y).cast("long"), snap_shift) + (1 << 24)) * F.lit(1 << 26)
        + F.shiftright(F.expr(x).cast("long"), snap_shift)
        + (1 << 24)
    )
    pts = ways.select(
        F.col(id_col).alias("id"),
        F.col(id_col).alias("label"),
        F.explode(
            F.array(
                ep("lats[0]", "lons[0]"),
                ep("lats[size(lats) - 1]", "lons[size(lons) - 1]"),
            )
        ).alias("ep"),
    )
    cur = pts.localCheckpoint()
    prev_sum = None
    for _ in range(max_rounds):
        ep_min = cur.groupBy("ep").agg(F.min("label").alias("_m"))
        cur = (
            cur.join(ep_min, "ep")
            .withColumn("label", F.least(F.col("label"), F.col("_m")))
            .drop("_m")
        )
        way_min = cur.groupBy("id").agg(F.min("label").alias("_w"))
        cur = (
            cur.join(way_min, "id")
            .withColumn("label", F.least(F.col("label"), F.col("_w")))
            .drop("_w")
        )
        # materialize per round: an unbounded iterative lineage makes
        # Catalyst re-analyze an exponentially growing plan
        cur = cur.localCheckpoint()
        s = cur.agg(F.sum("label")).collect()[0][0]
        if s == prev_sum:  # converged (labels only ever decrease)
            break
        prev_sum = s
    return cur.groupBy("id").agg(F.min("label").alias("component"))


def assemble_coastlines(
    ways: DataFrame,
    snap_shift: int = 6,
    max_rounds: int = 12,
    id_col: str = "id",
) -> DataFrame:
    """Full assembly: components -> stitched chains per component."""
    comp = coastline_components(ways, snap_shift, max_rounds, id_col)
    joined = ways.join(comp, ways[id_col] == comp["id"]).select(
        comp["component"], ways[id_col].alias("wid"), "lats", "lons"
    )

    def kernel(key, pdf):
        segs = [
            (np.asarray(r.lats, dtype=np.int64) >> snap_shift,
             np.asarray(r.lons, dtype=np.int64) >> snap_shift)
            for r in pdf.itertuples()
        ]
        # stitch on snapped endpoints
        used = [False] * len(segs)
        chains = 0
        total_pts = 0
        closed_all = True
        for start in range(len(segs)):
            if used[start]:
                continue
            used[start] = True
            chains += 1
            la = list(segs[start][0])
            lo = list(segs[start][1])
            while not (la[0] == la[-1] and lo[0] == lo[-1]):
                ext = None
                for j in range(len(segs)):
                    if used[j]:
                        continue
                    sl, so = segs[j]
                    if sl[0] == la[-1] and so[0] == lo[-1]:
                        ext = (j, False)
                        break
                    if sl[-1] == la[-1] and so[-1] == lo[-1]:
                        ext = (j, True)
                        break
                if ext is None:
                    closed_all = False
                    break
                j, rev = ext
                used[j] = True
                sl, so = segs[j]
                if rev:
                    sl, so = sl[::-1], so[::-1]
                la.extend(sl[1:])
                lo.extend(so[1:])
            total_pts += len(la)
        return pd.DataFrame(
            [
                (
                    int(key[0]),
                    int(len(segs)),
                    bool(closed_all and chains == 1),
                    int(total_pts),
                    int(pdf["wid"].min()),
                )
            ],
            columns=["component", "n_ways", "closed", "n_points", "min_way_id"],
        )

    return joined.groupBy("component").applyInPandas(
        kernel, "component long, n_ways int, closed boolean, n_points int, min_way_id long"
    )
