"""The tiling core: quadtree tile splitting + tile assignment.

Re-expresses mkgmap's MapSplitter/MapArea subdivision pipeline
(build/MapSplitter.java:42-200, build/MapArea.java:223-338,555-608,
imgfmt/app/Area.java:150-215) as a Spark-first program:

1.  Features get an *assignment point* (nodes: their coord; lines/shapes:
    bbox centre — MapArea.split assigns lines/shapes by located centre,
    MapArea.java:286,302,315 via pickArea:770) and a *size estimate*
    (MapArea.addSize:555-608: points 9 bytes; lines/shapes
    ``numElements*11 + numPoints*4`` with numElements =
    1+(numPoints-1)//250, LineSplitterFilter.MAX_POINTS_IN_LINE /
    PolygonSplitterFilter.MAX_POINT_IN_ELEMENT = 250).  All of this is
    JVM-side Column arithmetic — no Python in the row path.

2.  A bounded per-cell histogram (``groupBy(cell).agg(counts, sizes)``)
    is collected to the driver; the driver runs the deterministic
    quadtree split loop (thresholds verbatim from MapSplitter.java:42-66:
    MAX_DIVISION_SIZE=0x7fff, MAX_RGN_SIZE=0xfff8, MAX_NUM_LINES=0xff,
    MAX_NUM_POINTS=0xff, WANTED_MAX_AREA_SIZE=0x3fff, MIN_DIMENSION=10).
    Dense ("urban") regions whose decisions need finer cells than the
    current histogram trigger *batched hierarchical refinement*: one
    extra Spark aggregation per refinement round, restricted to the hot
    regions only.  This is the skew-detection / adaptive-split path: the
    driver never holds more than ``MAX_CELLS_PER_FETCH`` cells per
    region, regardless of input scale.

3.  The resulting split tree is broadcast and walked *vectorized* inside
    one Arrow-batched UDF to assign every feature a tile id; overflow
    tiles (area too small to divide but over the caps —
    MapSplitter.addAreasToList:186-195, MapArea.distShapesIntoNewAreas)
    are handled by a per-(tile,kind) round-robin slot.

Documented divergences from the reference (shared bit-for-bit with the
pure-Python oracle in mkgmap_spark/oracle/tiles.py, which implements the
same rules element-at-a-time):

- the root area is the smallest power-of-2-sized, origin-aligned square
  of the global quadtree that covers the data (instead of the raw data
  bbox).  Consequence: *every* split boundary is exactly representable
  at every histogram granularity, so the distributed histogram decisions
  equal the element-at-a-time decisions.  The reference instead rounds
  each boundary with Area.roundPof2 (Area.java:150) — same alignment
  idea, applied per split.
- MapSplitter.splitMaxSize's initial even grid is folded into the
  recursion as ``mustSplit if dim>>shift > MAX_DIVISION_SIZE`` — the
  resulting invariant (every tile dimension <= MAX_DIVISION_SIZE<<shift)
  is identical.
- numPoints in size estimates is the raw point count (the reference
  predicts the post-filter count, PredictFilterPoints; raw count is a
  deterministic overestimate).
- empty child areas produce no tile (MapSplitter.addAreasToList:137
  ``if (!area.hasData()) continue``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mapunits import MAX_RESOLUTION, floor_pof2

# --- thresholds, verbatim from MapSplitter.java:42-66 ---------------------
MAX_DIVISION_SIZE = 0x7FFF
MAX_RGN_SIZE = 0xFFF8
MAX_NUM_LINES = 0xFF
MAX_NUM_POINTS = 0xFF
MAX_XT_POINTS_SIZE = 0xFF00
MAX_XT_LINES_SIZE = 0xFF00
MAX_XT_SHAPES_SIZE = 0xFF00
MIN_DIMENSION = 10
WANTED_MAX_AREA_SIZE = 0x3FFF

POINT_KIND, LINE_KIND, SHAPE_KIND = 0, 1, 2

# max cells the driver will hold per fetched region; 2^12 per axis =
# up to ~16M total only in the pathological uniform case, typical fetches
# return only occupied cells (<< bound).
FETCH_AXIS_BITS = 6  # 2^6 x 2^6 = 4096 candidate cells per region/round


# --------------------------------------------------------------------------
# feature preparation (pure Column arithmetic)
# --------------------------------------------------------------------------


def prepare_features(features: DataFrame) -> DataFrame:
    """Add tiling columns to a decoded ``features`` DataFrame.

    Input schema (operators/decode.py): id, kind('node'|'way'|'relation'),
    tags, lats:array<int>, lons:array<int>, closed, min_res.
    Output adds: kind_i (0/1/2), ay, ax (assignment point), npts,
    size_bytes — all JVM-side expressions.
    """
    npts = F.size("lats")
    kind_i = (
        F.when(F.col("kind") == "node", F.lit(POINT_KIND))
        .when(F.col("closed") & (npts >= 4), F.lit(SHAPE_KIND))
        .otherwise(F.lit(LINE_KIND))
    )
    # assignment point: node -> its coord; way -> bbox centre (floor mean
    # of min/max, matching the oracle's integer arithmetic)
    ay = F.floor((F.array_min("lats").cast("long") + F.array_max("lats").cast("long")) / 2).cast("int")
    ax = F.floor((F.array_min("lons").cast("long") + F.array_max("lons").cast("long")) / 2).cast("int")

    n_elem = (F.lit(1) + F.floor((npts.cast("long") - 1) / 250)).cast("long")
    size_line = n_elem * 11 + npts.cast("long") * 4
    size_bytes = (
        F.when(kind_i == POINT_KIND, F.lit(9).cast("long"))
        .when((kind_i == LINE_KIND) & (npts <= 1), F.lit(0).cast("long"))
        .when((kind_i == SHAPE_KIND) & (npts <= 3), F.lit(0).cast("long"))
        .otherwise(size_line)
    )
    out = (
        features.withColumn("kind_i", kind_i)
        .withColumn("ay", ay)
        .withColumn("ax", ax)
        .withColumn("npts", npts)
        .withColumn("size_bytes", size_bytes)
    )
    if "min_res" not in features.columns:
        out = out.withColumn("min_res", F.lit(MAX_RESOLUTION))
    return out


# --------------------------------------------------------------------------
# histogram provider
# --------------------------------------------------------------------------

AGG_COLS = ["n_p", "n_l", "n_s", "s_p", "s_l", "s_s"]


@dataclass
class Region:
    """Half-open rectangle [min_y, max_y) x [min_x, max_x) in map units."""

    min_y: int
    min_x: int
    max_y: int
    max_x: int

    @property
    def h(self) -> int:
        return self.max_y - self.min_y

    @property
    def w(self) -> int:
        return self.max_x - self.min_x

    @property
    def max_dim(self) -> int:
        return max(self.h, self.w)


class SparkHistogramProvider:
    """Fetches exact per-cell aggregates for regions at a granularity.

    ``df`` must be a prepared features DataFrame already filtered to the
    level's resolution (min_res <= resolution), ideally cached — every
    refinement round is one aggregation job against it, filtered to the
    hot regions (Catalyst pushes the bbox conjunctions into the scan).
    """

    def __init__(self, df: DataFrame):
        self.df = df
        self.jobs = 0

    def fetch(self, regions: list[Region], gshift: int) -> pd.DataFrame:
        """One Spark job: per-cell aggregates for the union of regions.

        Returns pandas DataFrame with columns cy, cx (cell coords at
        ``gshift``) + AGG_COLS.  Regions are disjoint, so the driver can
        re-attribute cells to regions by coordinates.
        """
        pred = None
        for r in regions:
            p = (
                (F.col("ay") >= r.min_y)
                & (F.col("ay") < r.max_y)
                & (F.col("ax") >= r.min_x)
                & (F.col("ax") < r.max_x)
            )
            pred = p if pred is None else (pred | p)
        d = self.df.filter(pred) if pred is not None else self.df
        cy = F.shiftright(F.col("ay").cast("long"), gshift).alias("cy")
        cx = F.shiftright(F.col("ax").cast("long"), gshift).alias("cx")
        k = F.col("kind_i")
        agg = (
            d.groupBy(cy, cx)
            .agg(
                F.sum(F.when(k == POINT_KIND, 1).otherwise(0)).alias("n_p"),
                F.sum(F.when(k == LINE_KIND, 1).otherwise(0)).alias("n_l"),
                F.sum(F.when(k == SHAPE_KIND, 1).otherwise(0)).alias("n_s"),
                F.sum(F.when(k == POINT_KIND, F.col("size_bytes")).otherwise(0)).alias("s_p"),
                F.sum(F.when(k == LINE_KIND, F.col("size_bytes")).otherwise(0)).alias("s_l"),
                F.sum(F.when(k == SHAPE_KIND, F.col("size_bytes")).otherwise(0)).alias("s_s"),
            )
        )
        self.jobs += 1
        return agg.toPandas()

    def data_bounds(self) -> Region | None:
        row = self.df.agg(
            F.min("ay"), F.min("ax"), F.max("ay"), F.max("ax"), F.count(F.lit(1))
        ).collect()[0]
        if row[4] == 0:
            return None
        return Region(int(row[0]), int(row[1]), int(row[2]) + 1, int(row[3]) + 1)


class InMemoryHistogramProvider:
    """Test twin of SparkHistogramProvider over numpy arrays."""

    def __init__(self, ay, ax, kind_i, size_bytes):
        self.ay = np.asarray(ay, dtype=np.int64)
        self.ax = np.asarray(ax, dtype=np.int64)
        self.kind_i = np.asarray(kind_i, dtype=np.int64)
        self.size_bytes = np.asarray(size_bytes, dtype=np.int64)
        self.jobs = 0

    def fetch(self, regions: list[Region], gshift: int) -> pd.DataFrame:
        mask = np.zeros(len(self.ay), dtype=bool)
        for r in regions:
            mask |= (
                (self.ay >= r.min_y)
                & (self.ay < r.max_y)
                & (self.ax >= r.min_x)
                & (self.ax < r.max_x)
            )
        cy = self.ay[mask] >> gshift
        cx = self.ax[mask] >> gshift
        kk = self.kind_i[mask]
        sz = self.size_bytes[mask]
        df = pd.DataFrame({"cy": cy, "cx": cx})
        for i, (nc, sc) in enumerate(zip(["n_p", "n_l", "n_s"], ["s_p", "s_l", "s_s"])):
            df[nc] = (kk == i).astype(np.int64)
            df[sc] = np.where(kk == i, sz, 0)
        self.jobs += 1
        return df.groupby(["cy", "cx"], as_index=False).sum()

    def data_bounds(self) -> Region | None:
        if len(self.ay) == 0:
            return None
        return Region(
            int(self.ay.min()), int(self.ax.min()), int(self.ay.max()) + 1, int(self.ax.max()) + 1
        )


# --------------------------------------------------------------------------
# split tree
# --------------------------------------------------------------------------


@dataclass
class Tile:
    tile_id: int
    level: int
    min_lat: int
    min_lon: int
    max_lat: int
    max_lon: int
    n_slots: int  # >1 for overflow areas (round-robin per kind)
    n_points: int
    n_lines: int
    n_shapes: int
    size_bytes: int
    parent_id: int  # within-level split-tree parent (-1 for root)


# tree node encoding (plain tuples — broadcast-friendly):
#   ("leaf", tile_id, n_slots)
#   ("split", axis, boundary, lo_child, hi_child)    axis: 0=lat, 1=lon
#   ("empty",)
TreeNode = tuple


def compute_root(data: Region, shift: int) -> Region:
    """Smallest power-of-2 square covering the data, anchored at
    half-size alignment (min corner a multiple of 2^(g-1)).

    The half-size anchor (rather than full 2^g alignment) is what makes
    origin-straddling data coverable; every descendant split boundary is
    still a multiple of its own dimension, so boundaries stay exactly
    representable in any histogram at granularity <= the area dimension
    (the engine/oracle equivalence precondition).
    """
    min_size = max(data.max_dim, (MIN_DIMENSION << shift) * 2, 2)
    g = 1
    while (1 << g) < min_size:
        g += 1
    while True:
        size = 1 << g
        mn_y = floor_pof2(data.min_y, g - 1)
        mn_x = floor_pof2(data.min_x, g - 1)
        if mn_y + size >= data.max_y and mn_x + size >= data.max_x:
            return Region(mn_y, mn_x, mn_y + size, mn_x + size)
        g += 1


@dataclass
class _Pending:
    region: Region
    parent_id: int
    # histogram slice for this region (cell coords at gshift + aggregates)
    cells: np.ndarray  # (n, 2) int64 [cy, cx]
    aggs: np.ndarray  # (n, 6) int64
    gshift: int


@dataclass
class SplitResult:
    tiles: list[Tile]
    tree: TreeNode
    refine_rounds: int
    cells_fetched: int


def split_level(provider, shift: int, level: int = 0) -> SplitResult:
    """Run the MapSplitter recursion for one level against a provider."""
    data = provider.data_bounds()
    tiles: list[Tile] = []
    if data is None:
        return SplitResult(tiles, ("empty",), 0, 0)
    root = compute_root(data, shift)

    refine_rounds = 0
    cells_fetched = 0

    def initial_g(region: Region) -> int:
        g = max(shift, region.max_dim.bit_length() - 1 - FETCH_AXIS_BITS)
        return g

    g0 = initial_g(root)
    hist = provider.fetch([root], g0)
    cells_fetched += len(hist)
    cells0 = hist[["cy", "cx"]].to_numpy(dtype=np.int64)
    aggs0 = hist[AGG_COLS].to_numpy(dtype=np.int64)

    # the tree is built as a nested list structure we mutate in place
    def make_node() -> list:
        return ["empty"]

    root_node = make_node()
    queue: list[tuple[Region, int, np.ndarray, np.ndarray, int, list]] = [
        (root, -1, cells0, aggs0, g0, root_node)
    ]

    while queue:
        refits: list[tuple[Region, int, list]] = []
        next_queue: list[tuple[Region, int, np.ndarray, np.ndarray, int, list]] = []

        for region, parent_id, cells, aggs, g, node in queue:
            _process(
                region, parent_id, cells, aggs, g, node, shift, level, tiles, next_queue, refits
            )

        if refits:
            refine_rounds += 1
            regions = [r for r, _, _ in refits]
            g_new = max(shift, min(r.max_dim for r in regions).bit_length() - 1 - FETCH_AXIS_BITS)
            hist = provider.fetch(regions, g_new)
            cells_fetched += len(hist)
            hc = hist[["cy", "cx"]].to_numpy(dtype=np.int64)
            ha = hist[AGG_COLS].to_numpy(dtype=np.int64)
            for region, parent_id, node in refits:
                m = (
                    (hc[:, 0] >= (region.min_y >> g_new))
                    & (hc[:, 0] <= ((region.max_y - 1) >> g_new))
                    & (hc[:, 1] >= (region.min_x >> g_new))
                    & (hc[:, 1] <= ((region.max_x - 1) >> g_new))
                )
                next_queue.append((region, parent_id, hc[m], ha[m], g_new, node))

        queue = next_queue

    _renumber(tiles, root_node)
    return SplitResult(tiles, _freeze(root_node), refine_rounds, cells_fetched)


def _renumber(tiles: list[Tile], root_node: list) -> None:
    """Assign final tile ids by geometry, (min_lat, min_lon, slot) order.

    Makes ids independent of BFS/refinement timing, so the engine and the
    element-at-a-time oracle number tiles identically."""
    order = sorted(range(len(tiles)), key=lambda i: (tiles[i].min_lat, tiles[i].min_lon, tiles[i].tile_id))
    remap = {tiles[i].tile_id: new for new, i in enumerate(order)}
    for t in tiles:
        t.tile_id = remap[t.tile_id]
    tiles.sort(key=lambda t: t.tile_id)

    stack = [root_node]
    while stack:
        n = stack.pop()
        if n[0] == "leaf":
            n[1] = remap[n[1]]
        elif n[0] == "split":
            stack.append(n[3])
            stack.append(n[4])


def _process(region, parent_id, cells, aggs, g, node, shift, level, tiles, next_queue, refits):
    """Decide accept/halve/overflow for one area (MapSplitter.addAreasToList:131-200)."""
    if len(cells) == 0:
        node[:] = ["empty"]
        return
    tot = aggs.sum(axis=0)
    n_p, n_l, n_s, s_p, s_l, s_s = (int(v) for v in tot)
    n_total = n_p + n_l + n_s
    if n_total == 0:
        node[:] = ["empty"]
        return

    must_split = (
        n_l > MAX_NUM_LINES
        or n_p > MAX_NUM_POINTS
        or (s_p + s_l + s_s) > MAX_RGN_SIZE
        or (region.max_dim >> shift) > MAX_DIVISION_SIZE
    )
    want_split = False
    if not must_split and region.max_dim > (MIN_DIMENSION << shift):
        if (s_p + s_l + s_s) > WANTED_MAX_AREA_SIZE:
            want_split = True

    can_split = n_total > 1

    if (must_split or want_split) and can_split and region.max_dim > (MIN_DIMENSION << shift):
        axis = 1 if region.w > region.h else 0  # split wider axis; ties -> lat
        if axis == 1:
            mid = region.min_x + region.w // 2
        else:
            mid = region.min_y + region.h // 2
        # boundary must be cell-aligned to split the histogram exactly
        if mid % (1 << g) != 0:
            refits.append((region, parent_id, node))
            return
        mid_cell = mid >> g
        col = cells[:, axis]
        lo_m = col < mid_cell
        if axis == 1:
            lo_r = Region(region.min_y, region.min_x, region.max_y, mid)
            hi_r = Region(region.min_y, mid, region.max_y, region.max_x)
        else:
            lo_r = Region(region.min_y, region.min_x, mid, region.max_x)
            hi_r = Region(mid, region.min_x, region.max_y, region.max_x)
        lo_node, hi_node = ["empty"], ["empty"]
        node[:] = ["split", axis, mid, lo_node, hi_node]
        my_id = parent_id  # intermediate splits don't allocate tile ids
        next_queue.append((lo_r, my_id, cells[lo_m], aggs[lo_m], g, lo_node))
        next_queue.append((hi_r, my_id, cells[~lo_m], aggs[~lo_m], g, hi_node))
        return

    # accept (possibly as overflow stack of tiles with the same bounds —
    # MapSplitter.addAreasToList:186-195 "split area by contents")
    n_slots = 1
    if must_split and can_split:
        n_slots = max(
            1,
            -(-n_p // MAX_NUM_POINTS),
            -(-n_l // MAX_NUM_LINES),
            -(-(s_p + s_l + s_s) // MAX_RGN_SIZE),
        )
    tid = len(tiles)
    for s in range(n_slots):
        tiles.append(
            Tile(
                tile_id=tid + s,
                level=level,
                min_lat=region.min_y,
                min_lon=region.min_x,
                max_lat=region.max_y,
                max_lon=region.max_x,
                n_slots=n_slots,
                n_points=n_p,
                n_lines=n_l,
                n_shapes=n_s,
                size_bytes=s_p + s_l + s_s,
                parent_id=parent_id,
            )
        )
    node[:] = ["leaf", tid, n_slots]


def _freeze(node: list) -> TreeNode:
    if node[0] == "split":
        return ("split", node[1], node[2], _freeze(node[3]), _freeze(node[4]))
    return tuple(node)


# --------------------------------------------------------------------------
# vectorized assignment
# --------------------------------------------------------------------------


def assign_with_tree(tree: TreeNode, ay: np.ndarray, ax: np.ndarray) -> np.ndarray:
    """Walk the split tree for many points at once.

    Returns base tile id per point (-1 for points falling in empty
    children — possible only for features outside the level's data).
    """
    ay = np.asarray(ay, dtype=np.int64)
    ax = np.asarray(ax, dtype=np.int64)
    out = np.full(len(ay), -1, dtype=np.int64)
    if len(ay) == 0:
        return out

    stack: list[tuple[TreeNode, np.ndarray]] = [(tree, np.arange(len(ay)))]
    while stack:
        node, idx = stack.pop()
        if len(idx) == 0:
            continue
        tag = node[0]
        if tag == "leaf":
            out[idx] = node[1]
        elif tag == "split":
            _, axis, mid, lo_n, hi_n = node
            v = ay[idx] if axis == 0 else ax[idx]
            lo_m = v < mid
            stack.append((lo_n, idx[lo_m]))
            stack.append((hi_n, idx[~lo_m]))
        # "empty" -> stays -1
    return out


def assign_tiles(prepared: DataFrame, tree: TreeNode, resolution: int, level: int) -> DataFrame:
    """Assign each participating feature to its tile (+ overflow slot).

    Output: (id, level, tile_id, kind_i).  The split tree is shipped in
    the UDF closure (small — one entry per tile) and applied vectorized
    per Arrow batch; overflow slots are resolved with a window over the
    (rare) multi-slot tiles only.
    """
    part = prepared.filter(F.col("min_res") <= resolution)

    @F.pandas_udf("long")
    def tile_of(ay: pd.Series, ax: pd.Series) -> pd.Series:
        base = assign_with_tree(tree, ay.to_numpy(np.int64), ax.to_numpy(np.int64))
        return pd.Series(base)

    assigned = part.select(
        "id",
        "kind_i",
        tile_of(F.col("ay"), F.col("ax")).alias("base_tile"),
    ).withColumn("level", F.lit(level))

    # overflow slot: round-robin per (tile, kind) ordered by id —
    # distLinesIntoNewAreas-style spill (MapArea.java:345-381).
    slots = {}
    for node_tid, n_slots in _leaf_slots(tree):
        if n_slots > 1:
            slots[node_tid] = n_slots
    if slots:
        from pyspark.sql import Window

        slot_map = F.create_map(*[F.lit(v) for kv in slots.items() for v in kv])
        w = Window.partitionBy("base_tile", "kind_i").orderBy("id")
        assigned = assigned.withColumn("_ns", slot_map[F.col("base_tile")]).withColumn(
            "tile_id",
            F.when(
                F.col("_ns").isNotNull(),
                F.col("base_tile") + (F.row_number().over(w) - 1) % F.col("_ns"),
            ).otherwise(F.col("base_tile")),
        ).drop("_ns")
    else:
        assigned = assigned.withColumn("tile_id", F.col("base_tile"))
    return assigned.select("id", "level", "tile_id", "kind_i")


def _leaf_slots(tree: TreeNode):
    stack = [tree]
    while stack:
        n = stack.pop()
        if n[0] == "leaf":
            yield n[1], n[2]
        elif n[0] == "split":
            stack.append(n[3])
            stack.append(n[4])


def tiles_to_df(spark: SparkSession, tiles: list[Tile]) -> DataFrame:
    rows = [
        (
            t.tile_id,
            t.level,
            t.min_lat,
            t.min_lon,
            t.max_lat,
            t.max_lon,
            t.n_slots,
            t.n_points,
            t.n_lines,
            t.n_shapes,
            t.size_bytes,
            t.parent_id,
        )
        for t in tiles
    ]
    return spark.createDataFrame(
        rows,
        "tile_id long, level int, min_lat int, min_lon int, max_lat int, max_lon int, "
        "n_slots int, n_points long, n_lines long, n_shapes long, size_bytes long, parent_id long",
    )
