"""Sea/coastline assembly + land/sea polygon synthesis.

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
   (components are single coastlines — small groups);
4. per-TILE land/sea polygon synthesis (``generate_sea_polygons``):
   the SeaGenerator.end() pipeline — clip, islands, edge-hit border
   traversal, anti-island detection, sea/land background — runs as an
   independent kernel per tile group (applyInPandas over tile_id);
   tiles are independent, so the stage scales with the tile count.

Output of assembly: (component, n_ways, closed, n_points, min_way_id);
of synthesis: one row per polygon POINT (tile_id, kind, poly, idx,
lat, lon) with kind in {'sea','land','water','coastline'}.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import materialize, materialize_lazy


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
    cur = pts.transform(materialize)
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
        # Catalyst re-analyze an exponentially growing plan.  The lazy
        # cut persists on the convergence sum's full scan — one job per
        # round instead of two
        cur = cur.transform(materialize_lazy)
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

    from ..functions.grouped import kernel_partitions

    return (
        joined.repartition(kernel_partitions(joined), "component")
        .groupBy("component")
        .applyInPandas(
            kernel,
            "component long, n_ways int, closed boolean, n_points int, min_way_id long",
        )
    )


# ------------------------------------------------------------------
# land/sea polygon synthesis (SeaGenerator.end():818-1043)
# ------------------------------------------------------------------

_M_PER_UNIT = 2.0 * 3.141592653589793 * 6378137.0 / (1 << 24)


def _edge_hit(bbox, lat, lon, tolerance=10):
    """(edge, t) where the bbox border is hit, or None
    (SeaGenerator.getEdgeHit:1341-1360; edge 0=S walking E, 1=E walking
    N, 2=N walking W, 3=W walking S — a counter-clockwise border walk)."""
    min_lat, min_lon, max_lat, max_lon = bbox
    if lat <= min_lat + tolerance:
        return (0, (lon - min_lon) / (max_lon - min_lon))
    if lon >= max_lon - tolerance:
        return (1, (lat - min_lat) / (max_lat - min_lat))
    if lat >= max_lat - tolerance:
        return (2, (max_lon - lon) / (max_lon - min_lon))
    if lon <= min_lon + tolerance:
        return (3, (max_lat - lat) / (max_lat - min_lat))
    return None


def _next_edge_hit(bbox, lat, lon):
    """Nearest border (getNextEdgeHit:1364-1405) for --extend-sea-sectors."""
    min_lat, min_lon, max_lat, max_lon = bbox
    best = lat - min_lat
    i, t = 0, (lon - min_lon) / (max_lon - min_lon)
    if max_lon - lon < best:
        best = max_lon - lon
        i, t = 1, (lat - min_lat) / (max_lat - min_lat)
    if max_lat - lat < best:
        best = max_lat - lat
        i, t = 2, (max_lon - lon) / (max_lon - min_lon)
    if lon - min_lon < best:
        i, t = 3, (max_lat - lat) / (max_lat - min_lat)
    return (i, t)


def _edge_point(bbox, hit):
    """EdgeHit.getPoint:1310-1327 — int truncation like the Java cast."""
    min_lat, min_lon, max_lat, max_lon = bbox
    edge, t = hit
    if edge == 0:
        return (min_lat, int(min_lon + t * (max_lon - min_lon)))
    if edge == 1:
        return (int(min_lat + t * (max_lat - min_lat)), max_lon)
    if edge == 2:
        return (max_lat, int(max_lon - t * (max_lon - min_lon)))
    return (int(max_lat - t * (max_lat - min_lat)), min_lon)


def _clockwise(pts):
    """Way.clockwise:216-236 — shoelace sum over (lon, lat), <= 0."""
    area = 0
    for (y1, x1), (y2, x2) in zip(pts, pts[1:]):
        area += x1 * y2 - x2 * y1
    return area <= 0


def _dist(p, q, metric):
    dy = float(p[0] - q[0])
    dx = float(p[1] - q[1])
    d = (dy * dy + dx * dx) ** 0.5
    return d * _M_PER_UNIT if metric == "equirect" else d


def _add_pt(pts, p):
    """Way.addPointIfNotEqualToLastPoint."""
    if not pts or pts[-1] != p:
        pts.append(p)


def synthesize_tile_sea(
    chains: list[tuple[list[int], list[int]]],
    bbox: tuple[int, int, int, int],
    allow_sea_sectors: bool = True,
    extend_sea_sectors: bool = False,
    metric: str = "equirect",
    tolerance: int = 10,
) -> list[tuple[str, list[tuple[int, int]]]]:
    """One tile's SeaGenerator.end() pipeline.

    chains: assembled (possibly closed) coastline point lists (water on
    the RIGHT of travel, the OSM coastline convention); bbox =
    (min_lat, min_lon, max_lat, max_lon).  Returns [(kind, points)]:
    'land' (landmass/island/background), 'water' (anti-island lake),
    'sea' (background rectangle / sea sector), 'coastline' (kept
    unresolved line).  Emission order is deterministic: closed chains
    in input order, then border landmasses, then the background.
    """
    from ..functions.geometry import clip_polyline

    import numpy as np

    min_lat, min_lon, max_lat, max_lon = bbox
    # 1. clip to the tile (clipShorlineSegments:1002-1023)
    shoreline: list[list[tuple[int, int]]] = []
    for la, lo in chains:
        parts = clip_polyline(
            np.asarray(la, dtype=np.int64),
            np.asarray(lo, dtype=np.int64),
            (min_lat, min_lon, max_lat, max_lon),
        )
        for pl, px in parts:
            pts = [(int(round(y)), int(round(x))) for y, x in zip(pl, px)]
            dedup = []
            for p in pts:
                _add_pt(dedup, p)
            if len(dedup) >= 2:
                shoreline.append(dedup)

    out: list[tuple[str, list[tuple[int, int]]]] = []
    if not shoreline:
        # no sea at all: land background (end():861-875)
        rect = [
            (min_lat, min_lon), (max_lat, min_lon), (max_lat, max_lon),
            (min_lat, max_lon), (min_lat, min_lon),
        ]
        return [("land", rect)]

    # 2. islands = closed chains (handleIslands:1030-1043); gap closing
    # happened in the distributed assembly stage (snap grid)
    islands = [c for c in shoreline if c[0] == c[-1]]
    opens = [c for c in shoreline if c[0] != c[-1]]

    generate_sea_background = True
    sea_sectors: list[list[tuple[int, int]]] = []
    coastline_only: list[list[tuple[int, int]]] = []

    # 3. edge hits for open chains (findIntesectionPoints:1177-1276)
    hit_map: list[tuple[tuple[int, float], list | None]] = []
    for pts in opens:
        h_start = _edge_hit(bbox, *pts[0], tolerance)
        h_end = _edge_hit(bbox, *pts[-1], tolerance)
        if h_start is None or h_end is None:
            length = sum(_dist(pts[i], pts[i + 1], metric) for i in range(len(pts) - 1))
            nearly_closed = _dist(pts[0], pts[-1], metric) < 0.1 * length
            if nearly_closed:
                islands.append(pts + [pts[0]])
            elif allow_sea_sectors:
                sector = list(pts)
                _add_pt(sector, (pts[-1][0], pts[0][1]))
                _add_pt(sector, pts[0])
                sea_sectors.append(sector)
                generate_sea_background = False
            elif extend_sea_sectors:
                if h_start is None:
                    h_start = _next_edge_hit(bbox, *pts[0])
                    pts = [_edge_point(bbox, h_start)] + pts
                if h_end is None:
                    h_end = _next_edge_hit(bbox, *pts[-1])
                    pts = pts + [_edge_point(bbox, h_end)]
                hit_map.append((h_start, pts))
                hit_map.append((h_end, None))
            else:
                coastline_only.append(pts)
        else:
            hit_map.append((h_start, pts))
            hit_map.append((h_end, None))

    # 4. walk the border CCW joining segments (createInnerWays:1056-1121)
    hits = sorted(hit_map, key=lambda h: (h[0][0], h[0][1]))
    hit_seg = {h: seg for h, seg in hit_map}
    remaining = [h for h, _ in hits]
    landmasses: list[list[tuple[int, int]]] = []
    while remaining:
        w: list[tuple[int, int]] = []
        h_first = remaining[0]
        hit = h_first
        while True:
            seg = hit_seg.get(hit)
            if seg is not None:
                for p in seg:
                    _add_pt(w, p)
                h_next = _edge_hit(bbox, *seg[-1], tolerance)
            else:
                _add_pt(w, _edge_point(bbox, hit))
                later = [h for h in remaining if h > hit]
                h_next = min(later) if later else h_first
                if hit < h_next:
                    for i in range(hit[0], h_next[0]):
                        _add_pt(w, _edge_point(bbox, (i, 1.0)))
                elif hit > h_next:
                    for i in range(hit[0], 4):
                        _add_pt(w, _edge_point(bbox, (i, 1.0)))
                    for i in range(0, h_next[0]):
                        _add_pt(w, _edge_point(bbox, (i, 1.0)))
                _add_pt(w, _edge_point(bbox, h_next))
            remaining.remove(hit)
            hit = h_next
            if not remaining or hit == h_first:
                break
        if w[0] != w[-1]:
            w.append(w[0])
        landmasses.append(w)
    shoreline_reaches_boundary = bool(landmasses)

    if not shoreline_reaches_boundary and not sea_sectors and not islands:
        generate_sea_background = False

    # 5. anti-islands: water inside (removeAntiIslands:1129-1166)
    anti = [c for c in islands if _clockwise(c)]
    land_islands = [c for c in islands if not _clockwise(c)]
    if not land_islands and not landmasses:
        generate_sea_background = False

    # 6. emission — closed chains in input order with final tags
    from ..functions.geometry import points_in_ring

    def contained(inner, outer):
        py = np.array([p[0] for p in inner], dtype=np.int64)
        px = np.array([p[1] for p in inner], dtype=np.int64)
        oy = np.array([p[0] for p in outer], dtype=np.int64)
        ox = np.array([p[1] for p in outer], dtype=np.int64)
        return bool(points_in_ring(py, px, oy, ox).all())

    for c in islands:
        if c in anti:
            if generate_sea_background and not any(
                contained(c, i) for i in land_islands
            ):
                out.append(("land", c))  # lone lake converts back (end():917-938)
            else:
                out.append(("water", c))
        else:
            out.append(("land", c))
    for w in landmasses:
        out.append(("land", w))
    for s in sea_sectors:
        out.append(("sea", s))
    for c in coastline_only:
        out.append(("coastline", c))
    if generate_sea_background:
        rect = [
            (min_lat - 1, min_lon - 1), (max_lat + 1, min_lon - 1),
            (max_lat + 1, max_lon + 1), (min_lat - 1, max_lon + 1),
            (min_lat - 1, min_lon - 1),
        ]
        out.append(("sea", rect))
    else:
        rect = [
            (min_lat, min_lon), (max_lat, min_lon), (max_lat, max_lon),
            (min_lat, max_lon), (min_lat, min_lon),
        ]
        out.append(("land", rect))
    return out


def generate_sea_polygons(
    chains: DataFrame,
    bounds: DataFrame,
    allow_sea_sectors: bool = True,
    extend_sea_sectors: bool = False,
    metric: str = "equirect",
) -> DataFrame:
    """Distributed SeaGenerator.end(): one synthesis kernel per tile.

    chains: (tile_id, chain_id, lats, lons); bounds: (tile_id, min_lat,
    min_lon, max_lat, max_lon).  Tiles without any chain emit the plain
    land background rectangle.  Output: one row per polygon point
    (tile_id, kind, poly, idx, lat, lon) — scalar columns only, so the
    result is oracle-hashable in any engine.
    """
    # JVM-side per-tile aggregation, then MANY tiles per Arrow batch
    # via mapInPandas: applyInPandas would pay its per-group pandas
    # materialization cost 1x per tile (~tens of ms each — measured as
    # the whole stage's bottleneck); here the per-batch cost amortizes
    # over thousands of tiles.
    agg = chains.groupBy("tile_id").agg(
        F.sort_array(F.collect_list(F.struct("chain_id", "lats", "lons"))).alias("cs")
    )
    joined = agg.join(bounds, "tile_id")

    def kernel(it):
        for pdf in it:
            tid_out, kind_out, poly_out, idx_out, lat_out, lon_out = (
                [], [], [], [], [], []
            )
            for r in pdf.itertuples():
                bbox = (int(r.min_lat), int(r.min_lon), int(r.max_lat), int(r.max_lon))
                cs = [(list(c["lats"]), list(c["lons"])) for c in r.cs]
                polys = synthesize_tile_sea(
                    cs, bbox,
                    allow_sea_sectors=allow_sea_sectors,
                    extend_sea_sectors=extend_sea_sectors,
                    metric=metric,
                )
                tid = int(r.tile_id)
                for poly_idx, (kind, pts) in enumerate(polys):
                    for idx, (y, x) in enumerate(pts):
                        tid_out.append(tid)
                        kind_out.append(kind)
                        poly_out.append(poly_idx)
                        idx_out.append(idx)
                        lat_out.append(int(y))
                        lon_out.append(int(x))
            yield pd.DataFrame(
                {
                    "tile_id": tid_out, "kind": kind_out, "poly": poly_out,
                    "idx": idx_out, "lat": lat_out, "lon": lon_out,
                }
            )

    synth = joined.mapInPandas(
        kernel, "tile_id long, kind string, poly int, idx int, lat int, lon int"
    )
    # tiles with no shoreline: plain land rectangle (end():861-875)
    empty = bounds.join(chains.select("tile_id").distinct(), "tile_id", "left_anti")
    corners = empty.select(
        "tile_id",
        F.lit("land").alias("kind"),
        F.lit(0).alias("poly"),
        F.posexplode(
            F.array(
                F.struct(F.col("min_lat").alias("lat"), F.col("min_lon").alias("lon")),
                F.struct(F.col("max_lat").alias("lat"), F.col("min_lon").alias("lon")),
                F.struct(F.col("max_lat").alias("lat"), F.col("max_lon").alias("lon")),
                F.struct(F.col("min_lat").alias("lat"), F.col("max_lon").alias("lon")),
                F.struct(F.col("min_lat").alias("lat"), F.col("min_lon").alias("lon")),
            )
        ).alias("idx", "p"),
    ).select(
        "tile_id", "kind", "poly", F.col("idx").cast("int"),
        F.col("p.lat").cast("int").alias("lat"), F.col("p.lon").cast("int").alias("lon"),
    )
    return synth.unionByName(corners)
