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
    is collected to the driver; the driver decides every split with the
    thresholds verbatim from MapSplitter.java:42-66 (MAX_DIVISION_SIZE=
    0x7fff, MAX_RGN_SIZE=0xfff8, MAX_NUM_LINES=0xff, MAX_NUM_POINTS=0xff,
    WANTED_MAX_AREA_SIZE=0x3fff, MIN_DIMENSION=10).  The split hierarchy
    is the deterministic halve-the-longer-axis chain, so the driver can
    evaluate *all* areas of one granularity round fully vectorized:
    numpy bincount roll-up of the cell pyramid + array-filtered
    top-down sweep (no per-area Python).  Dense ("urban") regions whose
    decisions need finer cells than the current histogram trigger
    *batched hierarchical refinement*: one extra Spark aggregation per
    round, restricted to the hot blocks only — the skew-detection /
    adaptive-split path.  The driver never holds more than the occupied
    cells of the active regions, regardless of input scale.

3.  Tiles are aligned power-of-2 blocks; assignment is a per-depth
    ``searchsorted`` lookup over the broadcast block index, applied
    vectorized inside one Arrow-batched UDF.  Overflow tiles (area too
    small to divide but over the caps — MapSplitter.addAreasToList:
    186-195, MapArea.distShapesIntoNewAreas) get a per-(tile,kind)
    round-robin slot.

Documented divergences from the reference (shared bit-for-bit with the
pure-Python oracle in mkgmap_spark/oracle/tiles.py, which implements the
same rules element-at-a-time):

- the root area is the smallest power-of-2 square covering the data,
  min corner aligned to half its size.  Consequence: every split
  boundary is exactly representable at every histogram granularity, so
  distributed histogram decisions equal element-at-a-time decisions.
  (The reference instead rounds each boundary with Area.roundPof2,
  Area.java:150 — same alignment idea, applied per split.)
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

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cells import CELL_OFFSET, CELL_SPAN
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

# histogram fetch granularity: cover ~2^FETCH_AXIS_BITS further split
# levels per axis per refinement round.  5 (was 4) trades ~4x more
# cells per round for one round fewer — measured on the 600k-point
# gate: 3 rounds/490k cells -> 2 rounds/320k cells, split wall ~2x
# down, identical tiles (decisions don't depend on fetch granularity).
FETCH_AXIS_BITS = 5

AGG_COLS = ["n_p", "n_l", "n_s", "s_p", "s_l", "s_s"]


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
# histogram providers
# --------------------------------------------------------------------------


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
    hot regions only.
    """

    def __init__(self, df: DataFrame):
        self.df = df
        self.jobs = 0

    def fetch(self, regions: list[Region], gshift: int) -> pd.DataFrame:
        """One Spark job: per-cell aggregates for the union of regions.

        An EMPTY region list means "no filter" — the whole input is
        aggregated (the caller detected that the active blocks tile
        the entire root, so a filter could only pass every row).

        Returns pandas DataFrame with cy, cx (absolute cell coords at
        ``gshift``) + AGG_COLS.
        """
        # Regions are quadtree blocks (dims 2^a x 2^b, min corner aligned
        # to its dim) except possibly the root. Grouping by (a, b) turns
        # the filter into a handful of `block_id IN (...)` predicates —
        # flat no matter how many hot regions a refinement round carries
        # (an OR-chain of bbox conjunctions overflows the JVM expression
        # stack past a few hundred regions).
        grouped: dict[tuple[int, int], list[int]] = {}
        others: list[Region] = []
        for r in regions:
            h, w = r.h, r.w
            if h > 0 and w > 0 and (h & (h - 1)) == 0 and (w & (w - 1)) == 0 and r.min_y % h == 0 and r.min_x % w == 0:
                a, b = h.bit_length() - 1, w.bit_length() - 1
                key = ((r.min_y >> a) + CELL_OFFSET) * CELL_SPAN + (r.min_x >> b) + CELL_OFFSET
                grouped.setdefault((a, b), []).append(key)
            else:
                others.append(r)
        parts: list[DataFrame] = []
        for (a, b), keys in grouped.items():
            blk = (F.shiftright(F.col("ay").cast("long"), a) + CELL_OFFSET) * CELL_SPAN + (
                F.shiftright(F.col("ax").cast("long"), b) + CELL_OFFSET
            )
            if len(keys) <= 32:
                parts.append(self.df.filter(blk.isin(keys)))
            else:
                # thousands of hot blocks: a python-literal IN list costs
                # one py4j round-trip per key — ship them as a broadcast
                # semi-join instead (regions are disjoint, no dup rows)
                spark = self.df.sparkSession
                keys_df = spark.createDataFrame(pd.DataFrame({"_blk": np.asarray(keys, dtype=np.int64)}))
                parts.append(
                    self.df.withColumn("_blk", blk)
                    .join(F.broadcast(keys_df), "_blk", "left_semi")
                    .drop("_blk")
                )
        pred = None
        for r in others:
            p = (
                (F.col("ay") >= r.min_y)
                & (F.col("ay") < r.max_y)
                & (F.col("ax") >= r.min_x)
                & (F.col("ax") < r.max_x)
            )
            pred = p if pred is None else (pred | p)
        if pred is not None:
            parts.append(self.df.filter(pred))
        if not parts:
            d = self.df
        else:
            d = parts[0]
            for p_ in parts[1:]:
                d = d.unionByName(p_)

        cy = F.shiftright(F.col("ay").cast("long"), gshift).alias("cy")
        cx = F.shiftright(F.col("ax").cast("long"), gshift).alias("cx")
        k = F.col("kind_i")
        agg = d.groupBy(cy, cx).agg(
            F.sum(F.when(k == POINT_KIND, 1).otherwise(0)).alias("n_p"),
            F.sum(F.when(k == LINE_KIND, 1).otherwise(0)).alias("n_l"),
            F.sum(F.when(k == SHAPE_KIND, 1).otherwise(0)).alias("n_s"),
            F.sum(F.when(k == POINT_KIND, F.col("size_bytes")).otherwise(0)).alias("s_p"),
            F.sum(F.when(k == LINE_KIND, F.col("size_bytes")).otherwise(0)).alias("s_l"),
            F.sum(F.when(k == SHAPE_KIND, F.col("size_bytes")).otherwise(0)).alias("s_s"),
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
        # empty region list = no filter (whole input), matching
        # SparkHistogramProvider
        if not regions:
            mask = np.ones(len(self.ay), dtype=bool)
        else:
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
# the split hierarchy
#
# The halve-the-longer-axis rule from a square root gives a fixed shape
# chain: (a, a) --lat--> (a-1, a) --lon--> (a-1, a-1) --> ...   where a
# block of shape (a, b) spans 2^a x 2^b map units (b - a is 0 or 1).
# Depth key s = a + b is unique per shape.  Block coords (by, bx) are
# RELATIVE to the root min corner: abs_min = root_min + (by<<a, bx<<b).
# --------------------------------------------------------------------------


def _shape(s: int) -> tuple[int, int]:
    a = s // 2
    return a, s - a


def compute_root(data: Region, shift: int) -> Region:
    """Smallest power-of-2 square covering the data, min corner aligned
    to half its size (coverable even when data straddles the origin);
    every descendant boundary is a multiple of its own dimension."""
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
class Tile:
    tile_id: int
    level: int
    min_lat: int
    min_lon: int
    max_lat: int
    max_lon: int
    n_slots: int
    n_points: int
    n_lines: int
    n_shapes: int
    size_bytes: int
    parent_id: int


@dataclass
class TileIndex:
    """Broadcast-friendly assignment index: per depth s, the sorted
    relative block keys and their (base tile id, n_slots)."""

    root_min_y: int
    root_min_x: int
    levels: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]]  # s -> (keys, tile_ids, n_slots)

    def overlapping(self, y0: int, x0: int, y1: int, x1: int) -> list[int]:
        """Tile ids whose bounds intersect the half-open bbox
        [y0,y1) x [x0,x1). Tiles are aligned blocks, so per depth the
        candidates form a small rectangular key range."""
        out: list[int] = []
        ty0, tx0 = y0 - self.root_min_y, x0 - self.root_min_x
        ty1, tx1 = y1 - 1 - self.root_min_y, x1 - 1 - self.root_min_x
        for s, (keys, tids, _slots) in self.levels.items():
            a, b = _shape(s)
            by0, by1 = ty0 >> a, ty1 >> a
            bx0, bx1 = tx0 >> b, tx1 >> b
            for by in range(by0, by1 + 1):
                lo = np.searchsorted(keys, (by << 32) | bx0)
                hi = np.searchsorted(keys, ((by << 32) | bx1), side="right")
                out.extend(tids[lo:hi].tolist())
        return out

    def tile_bounds(self) -> dict[int, tuple[int, int, int, int]]:
        """tile_id -> (min_lat, min_lon, max_lat, max_lon)."""
        out = {}
        for s, (keys, tids, _slots) in self.levels.items():
            a, b = _shape(s)
            for k, t in zip(keys.tolist(), tids.tolist()):
                by, bx = k >> 32, k & 0xFFFFFFFF
                out[t] = (
                    self.root_min_y + (by << a),
                    self.root_min_x + (bx << b),
                    self.root_min_y + ((by + 1) << a),
                    self.root_min_x + ((bx + 1) << b),
                )
        return out

    def assign(self, ay: np.ndarray, ax: np.ndarray) -> np.ndarray:
        ay = np.asarray(ay, dtype=np.int64)
        ax = np.asarray(ax, dtype=np.int64)
        out = np.full(len(ay), -1, dtype=np.int64)
        ty = ay - self.root_min_y
        tx = ax - self.root_min_x
        todo = np.arange(len(ay))
        for s in sorted(self.levels, reverse=True):
            if len(todo) == 0:
                break
            keys, tids, _slots = self.levels[s]
            a, b = _shape(s)
            k = ((ty[todo] >> a) << 32) | (tx[todo] >> b)
            pos = np.searchsorted(keys, k)
            pos_c = np.clip(pos, 0, len(keys) - 1)
            hit = keys[pos_c] == k
            out[todo[hit]] = tids[pos_c[hit]]
            todo = todo[~hit]
        return out


@dataclass
class SplitResult:
    """``tiles`` may be passed as a zero-arg factory: building 300k+
    Tile objects costs ~1s of driver time, and the assignment-only
    path (flagship query) never touches them — the list materializes
    lazily on first access and is cached."""

    tiles: list[Tile] | Callable[[], list[Tile]]
    index: TileIndex
    refine_rounds: int
    cells_fetched: int

    def __getattribute__(self, name):
        v = object.__getattribute__(self, name)
        if name == "tiles" and callable(v):
            v = v()
            object.__setattr__(self, "tiles", v)
        return v


def _dedupe_sum(
    keys: np.ndarray, aggs: np.ndarray, assume_sorted: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    # one sort + segmented sum (reduceat) — np.unique + per-column
    # float bincounts cost ~2x on the 400k+-cell rounds.
    # assume_sorted skips the argsort (the x-halving pyramid transform
    # is monotone, so sortedness survives it); the all-unique fast path
    # skips the reduceat copy (the first level's keys come out of a
    # groupBy, already distinct).
    if not assume_sorted:
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        aggs = aggs[order]
    uniq = np.concatenate(([True], keys[1:] != keys[:-1]))
    if uniq.all():
        return keys, aggs
    starts = np.flatnonzero(uniq)
    return keys[starts], np.add.reduceat(aggs, starts, axis=0)


def _in_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in an already-sorted key array.

    np.isin re-sorts both inputs on every call; the sweep's key arrays
    are sorted by construction (_dedupe_sum output, np.unique results),
    so a searchsorted probe does the same job in O(n log m) with no
    copies — measured ~3x faster on the 450k-cell refinement rounds.
    """
    if len(sorted_set) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_set, values)
    pos_c = np.minimum(pos, len(sorted_set) - 1)
    return sorted_set[pos_c] == values


def split_level(provider, shift: int, level: int = 0) -> SplitResult:
    """Run the MapSplitter decision loop for one level.

    Vectorized rounds: fetch cells for the active blocks -> roll the
    aggregate pyramid up with bincounts -> sweep top-down with boolean
    masks -> emit tiles / collect refinement blocks -> repeat for the
    hot blocks at finer granularity.
    """
    data = provider.data_bounds()
    if data is None:
        return SplitResult([], TileIndex(0, 0, {}), 0, 0)
    root = compute_root(data, shift)
    g = (root.h).bit_length() - 1  # root is 2^g x 2^g
    mn_y, mn_x = root.min_y, root.min_x

    # pending: dict s -> int64 array of block keys ((by<<32)|bx) to evaluate
    pending: dict[int, np.ndarray] = {2 * g: np.array([0], dtype=np.int64)}

    raw_tiles: list[np.ndarray] = []  # (n, 7) blocks: s, key, n_slots, n_p, n_l, n_s, s_tot
    refine_rounds = -1
    cells_fetched = 0
    total_rows = None  # grand total, known after an unfiltered round
    pending_rows = None  # rows inside the current pending blocks

    while pending:
        refine_rounds += 1
        s_top = max(pending)
        # fetch granularity: FETCH_AXIS_BITS further split levels below
        # the deepest pending block, never below the level shift
        a_min = min(_shape(s)[0] for s in pending)
        gc = max(shift, a_min - FETCH_AXIS_BITS)

        # pending blocks are disjoint by construction; when they tile
        # the ENTIRE root, or when the previous round proved that the
        # pending blocks hold every input row (the uniform-density
        # case — every block of a round stays hot), the per-region
        # filter/semi-join in fetch() can only pass every row, so skip
        # building it: fetch([]) scans the whole input unfiltered (one
        # less broadcast join per refinement round).
        covered = sum(len(keys) << s for s, keys in pending.items())
        whole = covered == root.h * root.w or (
            total_rows is not None and pending_rows == total_rows
        )
        if whole:
            regions: list[Region] = []
        else:
            regions = []
            for s, keys in pending.items():
                a, b = _shape(s)
                for k in keys.tolist():
                    by, bx = k >> 32, k & 0xFFFFFFFF
                    regions.append(
                        Region(
                            mn_y + (by << a),
                            mn_x + (bx << b),
                            mn_y + ((by + 1) << a),
                            mn_x + ((bx + 1) << b),
                        )
                    )
        hist = provider.fetch(regions, gc)
        cells_fetched += len(hist)
        if len(hist) == 0:
            break
        cy = hist["cy"].to_numpy(np.int64)
        cx = hist["cx"].to_numpy(np.int64)
        aggs = hist[AGG_COLS].to_numpy(np.int64)
        if whole:
            total_rows = int(aggs[:, 0:3].sum())
        # translate to root-relative block coords at granularity gc
        by = cy - (mn_y >> gc)
        bx = cx - (mn_x >> gc)

        # roll the pyramid up from (gc, gc) to (a_top, b_top)
        pyramid: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        keys = (by << 32) | bx
        keys, A = _dedupe_sum(keys, aggs)
        s = 2 * gc
        pyramid[s] = (keys, A)
        while s < s_top:
            if s % 2 == 0:  # (a,a) -> parent (a, a+1): x halves
                keys = ((keys >> 32) << 32) | ((keys & 0xFFFFFFFF) >> 1)
                # monotone transform of sorted keys: skip the argsort
                keys, A = _dedupe_sum(keys, A, assume_sorted=True)
            else:  # (a, a+1) -> parent (a+1, a+1): y halves
                keys = (((keys >> 32) >> 1) << 32) | (keys & 0xFFFFFFFF)
                keys, A = _dedupe_sum(keys, A)
            s += 1
            pyramid[s] = (keys, A)

        # top-down sweep
        refine_rows = 0
        next_pending: dict[int, np.ndarray] = {}
        active: dict[int, np.ndarray] = {}
        for s, ks in pending.items():
            active[s] = np.sort(np.asarray(ks, dtype=np.int64))
        for s in range(s_top, 2 * gc - 1, -1):
            act = active.pop(s, None)
            if act is None or s not in pyramid:
                continue
            keys, A = pyramid[s]
            sel = _in_sorted(keys, act)
            if not sel.any():
                continue
            bkeys = keys[sel]
            bA = A[sel]
            a, b = _shape(s)
            max_dim = 1 << max(a, b)
            n_p, n_l, n_s_ = bA[:, 0], bA[:, 1], bA[:, 2]
            s_tot = bA[:, 3] + bA[:, 4] + bA[:, 5]
            n_tot = n_p + n_l + n_s_

            must = (
                (n_l > MAX_NUM_LINES)
                | (n_p > MAX_NUM_POINTS)
                | (s_tot > MAX_RGN_SIZE)
                | ((max_dim >> shift) > MAX_DIVISION_SIZE)
            )
            want = (~must) & (max_dim > (MIN_DIMENSION << shift)) & (s_tot > WANTED_MAX_AREA_SIZE)
            can = n_tot > 1
            split = (must | want) & can & (max_dim > (MIN_DIMENSION << shift))

            acc = ~split
            if acc.any():
                n_slots = np.ones(int(acc.sum()), dtype=np.int64)
                am = must[acc] & can[acc]
                if am.any():
                    ns = np.maximum.reduce(
                        [
                            -(-n_p[acc] // MAX_NUM_POINTS),
                            -(-n_l[acc] // MAX_NUM_LINES),
                            -(-s_tot[acc] // MAX_RGN_SIZE),
                            np.ones_like(n_slots),
                        ]
                    )
                    n_slots = np.where(am, ns, 1)
                # columnar accumulation — a python tuple per accepted
                # tile cost ~1s of driver time on 300k+-tile rounds
                blk = np.empty((int(acc.sum()), 7), dtype=np.int64)
                blk[:, 0] = s
                blk[:, 1] = bkeys[acc]
                blk[:, 2] = n_slots
                blk[:, 3] = n_p[acc]
                blk[:, 4] = n_l[acc]
                blk[:, 5] = n_s_[acc]
                blk[:, 6] = s_tot[acc]
                raw_tiles.append(blk)

            if split.any():
                sk = bkeys[split]
                if s - 1 >= 2 * gc:
                    # children of split blocks at s-1 (from the pyramid)
                    ck, _ = pyramid[s - 1]
                    if s % 2 == 1:  # children came from x-halving of (a,b-?) ... parent derive
                        pk = ((ck >> 32) << 32) | ((ck & 0xFFFFFFFF) >> 1)
                    else:
                        pk = (((ck >> 32) >> 1) << 32) | (ck & 0xFFFFFFFF)
                    child_sel = _in_sorted(pk, sk)
                    prev = active.get(s - 1)
                    newa = np.sort(ck[child_sel])
                    active[s - 1] = newa if prev is None else np.unique(np.concatenate([prev, newa]))
                else:
                    # cells too coarse to evaluate the children: refine
                    refine_rows += int(n_tot[split].sum())
                    prev = next_pending.get(s)
                    next_pending[s] = sk if prev is None else np.unique(np.concatenate([prev, sk]))

        pending = next_pending
        pending_rows = refine_rows

    # deterministic numbering: (min_lat, min_lon); overflow slots
    # consecutive.  Everything below is vectorized — a Python sort key
    # over 300k+ tiles used to dominate the warm driver loop.
    if not raw_tiles:
        return SplitResult([], TileIndex(mn_y, mn_x, {}), max(refine_rounds, 0), cells_fetched)
    rt = np.vstack(raw_tiles)
    s_a, k_a, ns_a = rt[:, 0], rt[:, 1], rt[:, 2]
    a_a = s_a // 2
    b_a = s_a - a_a
    by_a = k_a >> 32
    bx_a = k_a & 0xFFFFFFFF
    y0 = mn_y + (by_a << a_a)
    x0 = mn_x + (bx_a << b_a)
    y1 = mn_y + ((by_a + 1) << a_a)
    x1 = mn_x + ((bx_a + 1) << b_a)
    order = np.lexsort((x0, y0))
    rt = rt[order]
    y0, x0, y1, x1 = y0[order], x0[order], y1[order], x1[order]
    ns_a = ns_a[order]
    s_a, k_a = s_a[order], k_a[order]
    base_a = np.zeros(len(rt), dtype=np.int64)
    np.cumsum(ns_a[:-1], out=base_a[1:])

    def make_tiles() -> list[Tile]:
        tiles: list[Tile] = []
        bases = base_a.tolist()
        ys0, xs0, ys1, xs1 = y0.tolist(), x0.tolist(), y1.tolist(), x1.tolist()
        for i, (s, k, ns, p_, l_, sh_, st_) in enumerate(rt.tolist()):
            base = bases[i]
            tiles.extend(
                Tile(base + j, level, ys0[i], xs0[i], ys1[i], xs1[i],
                     ns, p_, l_, sh_, st_, -1)
                for j in range(ns)
            )
        return tiles

    idx_levels = {}
    for s in np.unique(s_a).tolist():
        sel = s_a == s
        ks = k_a[sel]
        o2 = np.argsort(ks)
        idx_levels[int(s)] = (ks[o2], base_a[sel][o2], ns_a[sel][o2])
    index = TileIndex(mn_y, mn_x, idx_levels)
    return SplitResult(make_tiles, index, max(refine_rounds, 0), cells_fetched)


# --------------------------------------------------------------------------
# vectorized assignment
# --------------------------------------------------------------------------


def assign_tiles(prepared: DataFrame, index: TileIndex, resolution: int, level: int) -> DataFrame:
    """Assign each participating feature to its tile (+ overflow slot).

    Output: (id, level, tile_id, kind_i).  The block index ships in the
    UDF closure and is applied vectorized per Arrow batch; overflow
    slots are resolved with a window over the (rare) multi-slot tiles.
    """
    part = prepared.filter(F.col("min_res") <= resolution)

    @F.pandas_udf("long")
    def tile_of(ay: pd.Series, ax: pd.Series) -> pd.Series:
        base = index.assign(ay.to_numpy(np.int64), ax.to_numpy(np.int64))
        return pd.Series(base)

    assigned = part.select(
        "id",
        "kind_i",
        tile_of(F.col("ay"), F.col("ax")).alias("base_tile"),
    ).withColumn("level", F.lit(level))

    # overflow slot: round-robin per (tile, kind) ordered by id —
    # distLinesIntoNewAreas-style spill (MapArea.java:345-381).
    slots = {}
    for s, (_k, tids, ns) in index.levels.items():
        for t, n in zip(tids.tolist(), ns.tolist()):
            if n > 1:
                slots[t] = n
    if slots:
        from pyspark.sql import Window

        # only rows landing in multi-slot (overflow) tiles need the
        # rank window — route the rest around the shuffle entirely
        slot_map = F.create_map(*[F.lit(v) for kv in slots.items() for v in kv])
        # persist before forking the DAG — both branches reuse the
        # decode+assign work instead of recomputing it
        assigned = assigned.withColumn("_ns", slot_map[F.col("base_tile")]).persist()
        plain = assigned.filter(F.col("_ns").isNull()).withColumn(
            "tile_id", F.col("base_tile")
        )
        w = Window.partitionBy("base_tile", "kind_i").orderBy("id")
        spilled = assigned.filter(F.col("_ns").isNotNull()).withColumn(
            "tile_id", F.col("base_tile") + (F.row_number().over(w) - 1) % F.col("_ns")
        )
        assigned = plain.unionByName(spilled).drop("_ns")
    else:
        assigned = assigned.withColumn("tile_id", F.col("base_tile"))
    return assigned.select("id", "level", "tile_id", "kind_i")


def tiles_to_df(spark: SparkSession, tiles: list[Tile]) -> DataFrame:
    # ship via Arrow (a python list of tuples costs one py4j round per
    # chunk and serializes row-at-a-time; 300k+ tiles made this seconds)
    pdf = pd.DataFrame(
        {
            "tile_id": np.array([t.tile_id for t in tiles], dtype=np.int64),
            "level": np.array([t.level for t in tiles], dtype=np.int32),
            "min_lat": np.array([t.min_lat for t in tiles], dtype=np.int32),
            "min_lon": np.array([t.min_lon for t in tiles], dtype=np.int32),
            "max_lat": np.array([t.max_lat for t in tiles], dtype=np.int32),
            "max_lon": np.array([t.max_lon for t in tiles], dtype=np.int32),
            "n_slots": np.array([t.n_slots for t in tiles], dtype=np.int32),
            "n_points": np.array([t.n_points for t in tiles], dtype=np.int64),
            "n_lines": np.array([t.n_lines for t in tiles], dtype=np.int64),
            "n_shapes": np.array([t.n_shapes for t in tiles], dtype=np.int64),
            "size_bytes": np.array([t.size_bytes for t in tiles], dtype=np.int64),
            "parent_id": np.array([t.parent_id for t in tiles], dtype=np.int64),
        }
    )
    # explicit schema: an empty corpus yields zero tiles and schema
    # inference cannot work on an empty frame
    schema = (
        "tile_id long, level int, min_lat int, min_lon int, max_lat int, "
        "max_lon int, n_slots int, n_points long, n_lines long, "
        "n_shapes long, size_bytes long, parent_id long"
    )
    return spark.createDataFrame(pdf, schema=schema)
