"""Geometry-aware tile assignment: clip-split + large-object rule.

Reference semantics (build/MapArea.java:223-338):
- lines/shapes go to the tile holding their centre (pickArea), and may
  stick out over the border;
- a LINE whose bbox exceeds the area's large-object limits
  (maxWidth/maxHeight = max(min(tile_dim, maxSize/2),
  2*LARGE_OBJECT_DIM), LARGE_OBJECT_DIM=8192, MapArea.java:59,270-271)
  and is not contained in its centre tile gets a PRIVATE area of its
  own bounds (MapArea.java:315-323);
- SHAPES are clip-split into every overlapping area
  (splitPolygonsIntoArea / orderByDecreasingArea mode,
  MapArea.splitIntoAreas:808-880 using ShapeSplitter) — the engine
  adopts this mode unconditionally for border-crossing shapes (the
  mkgmap default since r4+); each piece is the Sutherland-Hodgman clip
  of the ring to the tile rectangle, kept when it has positive area.

Output membership: (id, level, tile_id, part) — part=0 for unsplit,
k = 0..n-1 over a split shape's pieces ordered by tile_id (the shared
canonicalization the row-for-row gate needs, SURVEY §7 hard-point 3).
Private tiles are appended to the tile list ordered by feature id.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geometry import clip_ring, shoelace2
from ..plans.materialize import materialize
from .tiling import MAX_DIVISION_SIZE, SHAPE_KIND, Tile, TileIndex

LARGE_OBJECT_DIM = 8192  # MapArea.java:59


def max_size_for_shift(shift: int) -> int:
    # MapArea.java:260: min(2^24-1, max(MAX_DIVISION_SIZE << shift, 0x8000))
    return min((1 << 24) - 1, max(MAX_DIVISION_SIZE << shift, 0x8000))


def assign_ways_with_split(
    spark: SparkSession,
    ways: DataFrame,
    index: TileIndex,
    tiles: list[Tile],
    shift: int,
    level: int = 0,
    split_kernel: str = "sh",
    max_private_tiles: int = 100_000,
) -> tuple[list[Tile], DataFrame]:
    """ways: (id, kind_i in {1,2}, lats, lons).  Returns (tiles +
    appended private tiles, membership df (id, level, tile_id, part)).

    ``split_kernel``: 'sh' = Sutherland-Hodgman clip per tile (fast
    default, same as the oracle); 'exact' = the ShapeSplitter
    crossing-point pairing kernel (functions/shape_split.py, exact port
    of util/ShapeSplitter.splitShape:554) which also handles shapes
    degenerately touching or running along tile borders."""
    bounds_map = index.tile_bounds()
    max_size = max_size_for_shift(shift)
    use_exact = split_kernel == "exact"
    if use_exact:
        from ..functions.shape_split import clip_shape_exact

    def kernel(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(np.int64)
            kinds = pdf["kind_i"].to_numpy(np.int64)
            la_list = pdf["lats"].tolist()
            lo_list = pdf["lons"].tolist()
            n = len(ids)
            y0 = np.array([min(v) for v in la_list], dtype=np.int64)
            y1 = np.array([max(v) for v in la_list], dtype=np.int64)
            x0 = np.array([min(v) for v in lo_list], dtype=np.int64)
            x1 = np.array([max(v) for v in lo_list], dtype=np.int64)
            ay = (y0 + y1) // 2
            ax = (x0 + x1) // 2
            base = index.assign(ay, ax)

            out_id, out_tile, out_part, out_priv = [], [], [], []
            for i in range(n):
                t = int(base[i])
                tb = bounds_map.get(t)
                if tb is None:
                    continue
                contained = tb[0] <= y0[i] and y1[i] < tb[2] and tb[1] <= x0[i] and x1[i] < tb[3]
                if contained:
                    out_id.append(ids[i]); out_tile.append(t); out_part.append(0); out_priv.append(False)
                    continue
                if kinds[i] == SHAPE_KIND:
                    cand = index.overlapping(int(y0[i]), int(x0[i]), int(y1[i]) + 1, int(x1[i]) + 1)
                    la = np.asarray(la_list[i], dtype=np.int64)
                    lo = np.asarray(lo_list[i], dtype=np.int64)
                    part = 0
                    for ct in sorted(set(cand)):
                        cb = bounds_map[ct]
                        if use_exact:
                            pieces = clip_shape_exact(la, lo, (cb[0], cb[1], cb[2] - 1, cb[3] - 1))
                            keep = any(
                                len(p) >= 4
                                and shoelace2(
                                    np.array([q[0] for q in p], dtype=np.int64),
                                    np.array([q[1] for q in p], dtype=np.int64),
                                )
                                != 0
                                for p in pieces
                            )
                            if keep:
                                out_id.append(ids[i]); out_tile.append(ct); out_part.append(part); out_priv.append(False)
                                part += 1
                            continue
                        cy, cx = clip_ring(la, lo, (cb[0], cb[1], cb[2] - 1, cb[3] - 1))
                        if len(cy) >= 3 and shoelace2(np.round(cy).astype(np.int64), np.round(cx).astype(np.int64)) != 0:
                            out_id.append(ids[i]); out_tile.append(ct); out_part.append(part); out_priv.append(False)
                            part += 1
                    if part == 0:  # degenerate: keep centre tile
                        out_id.append(ids[i]); out_tile.append(t); out_part.append(0); out_priv.append(False)
                else:
                    tw, th = tb[3] - tb[1], tb[2] - tb[0]
                    max_w = max(min(tw, max_size // 2), 2 * LARGE_OBJECT_DIM)
                    max_h = max(min(th, max_size // 2), 2 * LARGE_OBJECT_DIM)
                    if (y1[i] - y0[i]) > max_h or (x1[i] - x0[i]) > max_w:
                        out_id.append(ids[i]); out_tile.append(-1); out_part.append(0); out_priv.append(True)
                    else:
                        out_id.append(ids[i]); out_tile.append(t); out_part.append(0); out_priv.append(False)
            yield pd.DataFrame(
                {"id": out_id, "tile_id": out_tile, "part": out_part, "_priv": out_priv}
            )

    raw = ways.select("id", "kind_i", "lats", "lons").mapInPandas(
        kernel, "id long, tile_id long, part int, _priv boolean"
    )
    # eager localCheckpoint instead of persist: raw feeds both the
    # private-tile pass and the returned membership; a persist would
    # outlive the function with no unpersist point
    raw = raw.transform(materialize)

    # private tiles: deterministic ids — rank by feature id, appended
    # after the shared tiles.  The id->tile mapping stays distributed
    # (range-partitioned rank + join); only the per-tile BOUNDS come to
    # the driver to extend the tile list — the same bound the reference
    # holds for its area list (MapArea.java) — never the feature rows
    # themselves, and never a plan-literal map that grows with data.
    # The driver surface is HARD-CAPPED: a pathological input where
    # every shape is oversized would otherwise stream one bounds row
    # per feature to the driver; beyond the cap, features share one
    # union-bounds overflow tile and a warning names the overflow count.
    from ..functions.rank import global_rank

    base_tid = len(tiles)
    priv_assign = global_rank(
        raw.filter(F.col("_priv"))
        .join(ways.select("id", "lats", "lons"), "id")
        .select(
            "id",
            F.array_min("lats").alias("y0"),
            F.array_min("lons").alias("x0"),
            (F.array_max("lats") + 1).alias("y1"),
            (F.array_max("lons") + 1).alias("x1"),
        ),
        ["id"],
        out="_rk",
    )
    overflow_tid = base_tid + max_private_tiles
    priv_assign = priv_assign.withColumn(
        "_ptid",
        F.when(F.col("_rk") <= max_private_tiles, F.col("_rk") - 1 + base_tid)
        .otherwise(F.lit(overflow_tid))
        .cast("long"),
    ).transform(materialize)

    tiles_out = list(tiles)
    for r in (
        priv_assign.filter(F.col("_rk") <= max_private_tiles)
        .select("_ptid", "y0", "x0", "y1", "x1")
        .orderBy("_ptid")
        .collect()
    ):
        tiles_out.append(
            Tile(r["_ptid"], level, r["y0"], r["x0"], r["y1"], r["x1"], 1, 0, 1, 0, 0, -1)
        )
    over = (
        priv_assign.filter(F.col("_rk") > max_private_tiles)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("y0").alias("y0"), F.min("x0").alias("x0"),
            F.max("y1").alias("y1"), F.max("x1").alias("x1"),
        )
        .collect()[0]
    )
    if over["n"] > 0:
        import warnings

        warnings.warn(
            f"{over['n']} oversized features beyond the {max_private_tiles} "
            "private-tile cap share one union-bounds overflow tile "
            f"{overflow_tid}; raise max_private_tiles to split them out",
            stacklevel=2,
        )
        tiles_out.append(
            Tile(
                overflow_tid, level, over["y0"], over["x0"], over["y1"], over["x1"],
                1, 0, int(over["n"]), 0, 0, -1,
            )
        )

    resolved = raw.join(priv_assign.select("id", "_ptid"), "id", "left").withColumn(
        "tile_id", F.when(F.col("_priv"), F.col("_ptid")).otherwise(F.col("tile_id"))
    )
    members = resolved.select("id", F.lit(level).alias("level"), "tile_id", "part")
    return tiles_out, members
