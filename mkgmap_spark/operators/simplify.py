"""Per-feature geometry filters (the reference's per-level filter chain).

Reference chain (build/MapBuilder.java:1177-1188 for lines, :1236-1251
for shapes): Round -> Size -> DouglasPeucker -> LineSplit ->
RemoveEmpty -> RemoveObsolete...  Each filter is order-sensitive within
a feature's point array; across features it's embarrassingly parallel
— exactly one vectorized Arrow batch pass, no window functions needed
because the arrays stay packed per row.

Implemented as composable DataFrame -> DataFrame operators over
(lats:array<int>, lons:array<int>) columns:

- round_coords(shift)        RoundCoordsFilter.java:24-46
- remove_obsolete_points     RemoveObsoletePointsFilter.java:30 (drop
                             consecutive duplicates + collinear points)
- douglas_peucker(max_err)   DouglasPeuckerFilter.java:52-135
- split_long_lines(max_pts)  LineSplitterFilter.java:42-118 (>250 pts
                             -> pieces, each >=50% target)
- size_filter(min_size)      SizeFilter.java:25 (drop tiny bbox)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geometry import douglas_peucker_mask

MAX_POINTS_IN_LINE = 250  # LineSplitterFilter.MAX_POINTS_IN_LINE


def round_coords(df: DataFrame, shift: int) -> DataFrame:
    """Quantize to the level grid with round-half-up on the shifted
    value (RoundCoordsFilter: ``(v >> (shift-1)) + 1 >> 1 << shift``
    — same as Area.roundPof2).  Pure JVM bit arithmetic."""
    if shift <= 0:
        return df

    def rc(col):
        return F.shiftleft(F.shiftright(F.shiftright(F.col(col).cast("long"), shift - 1) + 1, 1), shift).cast("int")

    return df.withColumn("lats", F.expr(
        f"transform(lats, v -> cast(shiftleft(shiftright(shiftright(cast(v as bigint), {shift - 1}) + 1, 1), {shift}) as int))"
    )).withColumn("lons", F.expr(
        f"transform(lons, v -> cast(shiftleft(shiftright(shiftright(cast(v as bigint), {shift - 1}) + 1, 1), {shift}) as int))"
    ))


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("lats", T.ArrayType(T.IntegerType())),
        T.StructField("lons", T.ArrayType(T.IntegerType())),
    ]
)


def remove_obsolete_points(df: DataFrame) -> DataFrame:
    """Drop consecutive duplicates and exactly-collinear interior points
    (RemoveObsoletePointsFilter semantics on the quantized grid)."""

    @F.pandas_udf(_PAIR_SCHEMA)
    def kernel(lats: pd.Series, lons: pd.Series) -> pd.DataFrame:
        out_la, out_lo = [], []
        for la, lo in zip(lats, lons):
            y = np.asarray(la, dtype=np.int64)
            x = np.asarray(lo, dtype=np.int64)
            n = len(y)
            if n <= 2:
                out_la.append(y.astype(np.int32))
                out_lo.append(x.astype(np.int32))
                continue
            dup = np.zeros(n, dtype=bool)
            dup[1:] = (y[1:] == y[:-1]) & (x[1:] == x[:-1])
            y, x = y[~dup], x[~dup]
            n = len(y)
            if n > 2:
                cross = (x[1:-1] - x[:-2]) * (y[2:] - y[:-2]) - (y[1:-1] - y[:-2]) * (x[2:] - x[:-2])
                between = (
                    (np.minimum(y[:-2], y[2:]) <= y[1:-1])
                    & (y[1:-1] <= np.maximum(y[:-2], y[2:]))
                    & (np.minimum(x[:-2], x[2:]) <= x[1:-1])
                    & (x[1:-1] <= np.maximum(x[:-2], x[2:]))
                )
                keep = np.ones(n, dtype=bool)
                keep[1:-1] = ~((cross == 0) & between)
                y, x = y[keep], x[keep]
            out_la.append(y.astype(np.int32))
            out_lo.append(x.astype(np.int32))
        return pd.DataFrame({"lats": out_la, "lons": out_lo})

    return df.withColumn("_g", kernel("lats", "lons")).withColumn("lats", F.col("_g.lats")).withColumn(
        "lons", F.col("_g.lons")
    ).drop("_g")


def douglas_peucker(df: DataFrame, max_error: float) -> DataFrame:
    """DP simplification per feature, packed-array Arrow kernel."""

    @F.pandas_udf(_PAIR_SCHEMA)
    def kernel(lats: pd.Series, lons: pd.Series) -> pd.DataFrame:
        out_la, out_lo = [], []
        for la, lo in zip(lats, lons):
            y = np.asarray(la, dtype=np.float64)
            x = np.asarray(lo, dtype=np.float64)
            if len(y) <= 2:
                out_la.append(np.asarray(la, dtype=np.int32))
                out_lo.append(np.asarray(lo, dtype=np.int32))
                continue
            keep = douglas_peucker_mask(y, x, max_error)
            out_la.append(np.asarray(la, dtype=np.int32)[keep])
            out_lo.append(np.asarray(lo, dtype=np.int32)[keep])
        return pd.DataFrame({"lats": out_la, "lons": out_lo})

    return df.withColumn("_g", kernel("lats", "lons")).withColumn("lats", F.col("_g.lats")).withColumn(
        "lons", F.col("_g.lons")
    ).drop("_g")


def split_long_lines(df: DataFrame, max_points: int = MAX_POINTS_IN_LINE) -> DataFrame:
    """Split lines with > max_points points into balanced pieces
    (LineSplitterFilter.java:80: pieces of >= half the target so no
    fragment is tiny).  JVM-side sequence+slice+posexplode; adds a
    ``part`` column (0-based)."""
    n = F.size("lats")
    # number of pieces and balanced size (ceil division)
    pieces = F.ceil((n - F.lit(1)) / F.lit(max_points - 1)).cast("int")
    pieces = F.when(pieces < 1, F.lit(1)).otherwise(pieces)
    df = df.withColumn("_pieces", pieces)
    # piece i covers [i*step, min(n, i*step + step + 1)) with step =
    # ceil((n-1)/pieces) segments; consecutive pieces share a point
    step = F.ceil((n - F.lit(1)) / F.col("_pieces")).cast("int")
    df = df.withColumn("_step", step)
    exploded = df.select(
        *[c for c in df.columns if c not in ("lats", "lons", "_pieces", "_step")],
        F.posexplode(F.expr("sequence(0, _pieces - 1)")).alias("part", "_i"),
        F.expr("transform(sequence(0, _pieces - 1), i -> slice(lats, i * _step + 1, _step + 1))").alias("_las"),
        F.expr("transform(sequence(0, _pieces - 1), i -> slice(lons, i * _step + 1, _step + 1))").alias("_los"),
    )
    return (
        exploded.withColumn("lats", F.expr("_las[part]"))
        .withColumn("lons", F.expr("_los[part]"))
        .filter(F.size("lats") >= 2)
        .drop("_las", "_los", "_i")
    )


def size_filter(df: DataFrame, min_size: int) -> DataFrame:
    """Drop features whose bbox is below min_size in both dimensions
    (SizeFilter semantics), keeping single points intact."""
    h = F.array_max("lats") - F.array_min("lats")
    w = F.array_max("lons") - F.array_min("lons")
    return df.filter((F.size("lats") <= 1) | (h >= min_size) | (w >= min_size))


def smoothing_filter(df: DataFrame, gshift: int) -> DataFrame:
    """Keep one point per grid cell at low resolution
    (filters/SmoothingFilter.java:33-61: first point of each run of
    same-cell points survives; endpoints always kept)."""

    @F.pandas_udf(_PAIR_SCHEMA)
    def kernel(lats: pd.Series, lons: pd.Series) -> pd.DataFrame:
        out_la, out_lo = [], []
        for la, lo in zip(lats, lons):
            y = np.asarray(la, dtype=np.int64)
            x = np.asarray(lo, dtype=np.int64)
            n = len(y)
            if n <= 2:
                out_la.append(y.astype(np.int32))
                out_lo.append(x.astype(np.int32))
                continue
            cy, cx = y >> gshift, x >> gshift
            keep = np.ones(n, dtype=bool)
            keep[1:] = (cy[1:] != cy[:-1]) | (cx[1:] != cx[:-1])
            keep[0] = keep[-1] = True
            out_la.append(y[keep].astype(np.int32))
            out_lo.append(x[keep].astype(np.int32))
        return pd.DataFrame({"lats": out_la, "lons": out_lo})

    return df.withColumn("_g", kernel("lats", "lons")).withColumn(
        "lats", F.col("_g.lats")
    ).withColumn("lons", F.col("_g.lons")).drop("_g")


def line_size_splitter(df: DataFrame, shift: int = 0) -> DataFrame:
    """Split lines whose bounding box exceeds the 15-bit tile dimension
    (LineSizeSplitterFilter.java:36-57: maxSize = min(2^24-1,
    max(0x7fff << shift, 0x8000))).

    Exact reference algorithm: first densify single segments longer
    than maxSize-10 by recursive midpoint insertion
    (splitLinesToMaxSize), then scan emitting a part whenever the
    running bbox dimension exceeds maxSize (consecutive parts share
    the boundary point).  Per-way Arrow kernel; adds ``part``.
    """
    import numpy as np
    import pandas as pd

    max_size = min((1 << 24) - 1, max(0x7FFF << shift, 0x8000))
    seg_max = max_size - 10
    keep_cols = [c for c in df.columns if c not in ("lats", "lons")]

    def kernel(it):
        for pdf in it:
            ids = pdf[keep_cols]
            las = pdf["lats"].tolist()
            los = pdf["lons"].tolist()
            rows = []
            for r in range(len(las)):
                la = [int(v) for v in las[r]]
                lo = [int(v) for v in los[r]]
                meta = tuple(ids.iloc[r])
                y0, y1 = min(la), max(la)
                x0, x1 = min(lo), max(lo)
                if max(y1 - y0, x1 - x0) < max_size:
                    rows.append(meta + (0, la, lo))
                    continue
                # densify long segments (midpoint insertion, from the end)
                i = len(la) - 2
                while i >= 0:
                    if max(abs(la[i + 1] - la[i]), abs(lo[i + 1] - lo[i])) > seg_max:
                        la.insert(i + 1, (la[i] + la[i + 1]) // 2)
                        lo.insert(i + 1, (lo[i] + lo[i + 1]) // 2)
                        i += 1
                    else:
                        i -= 1
                # greedy bbox scan
                part = 0
                cur_la: list[int] = []
                cur_lo: list[int] = []
                bb = [1 << 30, 1 << 30, -(1 << 30), -(1 << 30)]

                def add(bb, y, x):
                    bb[0] = min(bb[0], y); bb[1] = min(bb[1], x)
                    bb[2] = max(bb[2], y); bb[3] = max(bb[3], x)

                prev = None
                for y, x in zip(la, lo):
                    add(bb, y, x)
                    if max(bb[2] - bb[0], bb[3] - bb[1]) > max_size:
                        rows.append(meta + (part, cur_la, cur_lo))
                        part += 1
                        cur_la, cur_lo = [prev[0]], [prev[1]]
                        bb = [prev[0], prev[1], prev[0], prev[1]]
                        add(bb, y, x)
                    cur_la.append(y)
                    cur_lo.append(x)
                    prev = (y, x)
                if len(cur_la) > 1:
                    rows.append(meta + (part, cur_la, cur_lo))
            yield pd.DataFrame(
                rows, columns=keep_cols + ["part", "lats", "lons"]
            )

    schema_prefix = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in keep_cols)
    return df.mapInPandas(
        kernel, f"{schema_prefix}, part int, lats array<int>, lons array<int>"
    )


def line_filter_chain(
    ways: DataFrame,
    resolution: int,
    max_error_mu: float = 2.6,
    max_points: int = MAX_POINTS_IN_LINE,
    min_size: int = 1,
) -> DataFrame:
    """The per-level LINE filter pipeline in the reference's order
    (MapBuilder.java:1177-1188: Round -> Size -> DouglasPeucker ->
    LineSplitter -> RemoveEmpty -> RemoveObsoletePoints): quantize to
    the level grid, drop sub-pixel features, thin, split oversized
    lines, drop spikes/collinears.  ``max_error_mu`` is in map units at
    resolution 24 (DouglasPeuckerFilter's max-error-distance knob);
    scaled by the level shift like the reference's filter config.
    Output gains ``part`` (from the splitter)."""
    shift = 24 - resolution
    df = round_coords(ways, shift)
    if shift > 0:
        df = size_filter(df, min_size << shift)
    df = df.filter(F.size("lats") >= 2)
    df = douglas_peucker(df, max_error=max_error_mu * (1 << shift))
    df = split_long_lines(df, max_points=max_points)
    df = remove_obsolete_points(df)
    return df.filter(F.size("lats") >= 2)


def shape_filter_chain(
    shapes: DataFrame,
    resolution: int,
    max_error_mu: float = 2.6,
    min_size: int = 1,
) -> DataFrame:
    """The per-level SHAPE pipeline (MapBuilder.java:1236-1251:
    PolygonSplit -> Round -> Size -> DP -> RemoveObsolete ->
    RemoveEmpty); the polygon size split happens in the tile
    clip-assign stage (clip_assign.py), so here: quantize, size-gate,
    thin, drop degenerates (< 3 distinct points can't close)."""
    shift = 24 - resolution
    df = round_coords(shapes, shift)
    if shift > 0:
        df = size_filter(df, min_size << shift)
    df = df.filter(F.size("lats") >= 3)
    df = douglas_peucker(df, max_error=max_error_mu * (1 << shift))
    df = remove_obsolete_points(df)
    return df.filter(F.size("lats") >= 3)
