"""Distributed DEM tile encoding (Garmin elevation bit streams).

The reference compresses each DEM tile of the elevation grid with the
adaptive predictive coder in ``imgfmt/app/dem/DEMTile.java`` and lays
the tiles out per zoom level (``DEMSection.java``).  Here the grid is a
DataFrame of (tile_id, idx, height) cells: tiles are independent, so
Spark groups the cells per tile (a single keyed exchange, bounded at
tile size: at most 64x64 int rows per group) and runs the pure-CPU
codec (``functions/dem_codec.py``) as an Arrow-batched kernel.

``roundtrip_dem_tiles`` encodes every tile and decodes it back,
re-emitting the cells together with the derived header fields — the
gate query's oracle recomputes the headers in SQL and the heights by
identity, so any codec asymmetry or header drift shows up as a value
mismatch.

Scale shape: one shuffle keyed by tile_id, then embarrassingly
parallel per-tile work; no driver state, no skew (every group is the
same fixed size), output size == input size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DEM units: 2^29 units per 45 degrees (DEMFile.FACTOR / HGTConverter.FACTOR)
FACTOR = 45.0 / (1 << 29)
# allowed widening of the HGT read area in degrees (DEMFile.EXTRA)
EXTRA = 0.1
_UNDEF = -0x8000

_ROUNDTRIP_SCHEMA = (
    "tile_id bigint, idx int, height int, "
    "base int, max_delta int, enc_type int"
)

_STD_DIM = 64  # DEMSection.STD_DIM: standard tile edge in sample points


def section_tile_grid(sections: DataFrame) -> DataFrame:
    """Carve each DEM section into its tile grid.

    Input rows carry (``area_top``, ``area_left``, ``area_height``,
    ``area_width`` in DEM units, ``point_dist`` between samples) plus
    any id columns.  Output: one row per tile with the grid dimensions,
    the tile's sample offsets and its (possibly non-standard last
    row/column) width and height — the exact arithmetic of
    ``DEMSection.getTileInfo`` / ``calcTiles`` (DEMSection.java:92-146):
    the area is padded by one ``point_dist`` overlap, a remainder of at
    least half a tile becomes an extra tile, otherwise it is folded
    into the last tile as a 65..95-point edge (Garmin's 1..95
    normalization).

    Pure Column arithmetic end to end — the grid never touches Python,
    so Catalyst folds it into the scan and any scale of section list
    distributes trivially.
    """
    res = _STD_DIM  # points per tile edge

    def tile_info(points_col, dist_col, prefix):
        resolution = dist_col * res
        padded = points_col + dist_col  # Garmin prefers large overlaps
        n_full = (padded / resolution).cast("int")
        rest = padded - n_full * resolution
        nonstd0 = (rest / dist_col).cast("int") + \
            F.when(rest % dist_col != 0, 1).otherwise(0)
        grow = nonstd0 >= res // 2
        num0 = n_full + F.when(grow, 1).otherwise(0)
        nonstd = F.when(grow, nonstd0).otherwise(
            nonstd0 + F.when(n_full > 0, res).otherwise(0))
        num = F.greatest(num0, F.lit(1))
        return num.alias(f"tiles_{prefix}"), nonstd.alias(f"nonstd_{prefix}")

    n_lat, ns_lat = tile_info(F.col("area_height"), F.col("point_dist"), "lat")
    n_lon, ns_lon = tile_info(F.col("area_width"), F.col("point_dist"), "lon")
    with_grid = sections.select("*", n_lat, ns_lat, n_lon, ns_lon)

    m = F.col("tile_row")
    n = F.col("tile_col")
    return (
        with_grid
        .withColumn("tile_row",
                    F.explode(F.sequence(F.lit(0), F.col("tiles_lat") - 1)))
        .withColumn("tile_col",
                    F.explode(F.sequence(F.lit(0), F.col("tiles_lon") - 1)))
        .withColumn("lat_off",
                    F.col("area_top") - m * F.col("point_dist") * res)
        .withColumn("lon_off",
                    F.col("area_left") + n * F.col("point_dist") * res)
        .withColumn("tile_height",
                    F.when(m == F.col("tiles_lat") - 1, F.col("nonstd_lat"))
                     .otherwise(F.lit(res)))
        .withColumn("tile_width",
                    F.when(n == F.col("tiles_lon") - 1, F.col("nonstd_lon"))
                     .otherwise(F.lit(res)))
    )


def encode_dem_tiles(cells: DataFrame, key_cols) -> DataFrame:
    """Encode tiles of varying dimensions (the section grid's last
    row/column are non-standard) and emit one header row per tile:
    base, max_delta, enc_type, bit-stream length, has_data, and the
    display max height (DEMTile.getMaxHeight: enc_type 2 hides the
    reserved top value).  ``cells`` carries ``key_cols`` + tile_width,
    tile_height, idx, height."""
    from ..functions.dem_codec import UNDEF, encode_tile

    from ..functions.grouped import kernel_partitions

    keys = list(key_cols)
    out_cols = keys + ["tile_width", "tile_height", "base", "max_delta",
                       "enc_type", "bs_len", "has_data", "max_height",
                       "stream"]
    schema = ", ".join(
        [f"{k} bigint" for k in keys]
        + ["tile_width int", "tile_height int", "base int", "max_delta int",
           "enc_type int", "bs_len int", "has_data boolean",
           "max_height int", "stream binary"])

    # flat-column sorted shuffle (same shape as roundtrip_dem_tiles):
    # one pinned exchange on the tile key, kernel sees numpy columns
    # and finds group boundaries itself — no struct collect_list, no
    # per-row dict conversion
    d = cells.select(
        *keys, "tile_width", "tile_height", "idx", "height"
    ).repartition(kernel_partitions(cells), *keys).sortWithinPartitions(*keys, "idx")

    def kernel(batches):
        carry: pd.DataFrame | None = None

        def process(pdf, is_last):
            nonlocal carry
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            n = len(pdf)
            if n == 0:
                return None
            karr = [pdf[k].to_numpy(np.int64) for k in keys]
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for a in karr:
                change[1:] |= a[1:] != a[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            if not is_last:
                carry = pdf.iloc[int(starts[-1]):].reset_index(drop=True)
                starts, ends = starts[:-1], ends[:-1]
            if len(starts) == 0:
                return None
            widths = pdf["tile_width"].to_numpy(np.int64)
            heights_dim = pdf["tile_height"].to_numpy(np.int64)
            hts = pdf["height"].to_numpy(np.int64)
            rows = []
            for g in range(len(starts)):
                s, e = int(starts[g]), int(ends[g])
                w, h = int(widths[s]), int(heights_dim[s])
                if e - s != w * h:
                    continue
                heights = hts[s:e].tolist()
                base, md, et, bs = encode_tile(heights, w, h)
                has_data = any(v != UNDEF for v in heights)
                rows.append(tuple(int(a[s]) for a in karr) + (
                    w, h, base, md, et, len(bs), has_data,
                    base + md - (0 if et == 0 else 1), bs,
                ))
            if not rows:
                return None
            return pd.DataFrame(rows, columns=out_cols)

        prev = None
        for pdf in batches:
            if prev is not None:
                out = process(prev, is_last=False)
                if out is not None:
                    yield out
            prev = pdf
        if prev is not None:
            out = process(prev, is_last=True)
            if out is not None:
                yield out

    return d.mapInPandas(kernel, schema)


def section_record_desc(tiles: DataFrame, key_cols) -> DataFrame:
    """Aggregate encoded tiles into the per-section record descriptor:
    field widths for offset/base/delta, the extra-byte flag, and the
    section min/max height (DEMSection.calcTiles epilogue,
    DEMSection.java:163-182).  ``tiles`` carries per-tile header fields
    (base, max_delta, enc_type, bs_len, has_data, max_height)."""
    valid = F.col("has_data")
    agg = tiles.groupBy(*key_cols).agg(
        F.sum("bs_len").alias("data_len"),
        F.min(F.when(valid, F.col("base"))).alias("min_base"),
        F.max(F.when(valid, F.col("base"))).alias("max_base"),
        F.max(F.when(valid, F.col("max_delta"))).alias("max_delta_height"),
        F.max(F.when(valid, F.col("max_height"))).alias("max_height_raw"),
        F.max(F.when(F.col("enc_type") != 0, 1).otherwise(0)).alias("extra"),
    )
    dl = F.col("data_len")
    offset_size = (F.when(dl <= 0xFF, 1).when(dl <= 0xFFFF, 2)
                    .when(dl <= 0xFFFFFF, 3).otherwise(4))
    # all-void sections aggregate min/max over zero valid tiles to
    # NULL; the reference's sentinel arithmetic (minBase=MAX_VALUE,
    # maxBase=MIN_VALUE satisfy both comparisons, DEMSection.java:
    # 171-181) selects size 1 for both fields there
    base_size = F.when(
        F.col("min_base").isNull()
        | ((F.col("min_base") > -128) & (F.col("max_base") < 128)),
        1,
    ).otherwise(2)
    delta_size = F.when(
        F.col("max_delta_height").isNull() | (F.col("max_delta_height") <= 255),
        1,
    ).otherwise(2)
    has_extra = F.col("extra") == 1
    return agg.select(
        *key_cols,
        (offset_size - 1
         + F.when(base_size > 1, 4).otherwise(0)
         + F.when(delta_size > 1, 8).otherwise(0)
         + F.when(has_extra, 16).otherwise(0)).alias("record_desc"),
        (offset_size + base_size + delta_size
         + F.when(has_extra, 1).otherwise(0)).alias("tile_desc_size"),
        F.when(dl > 0, F.col("min_base")).otherwise(0).alias("min_height"),
        F.when(dl > 0, F.col("max_height_raw")).otherwise(0)
         .alias("max_height"),
    )


def roundtrip_dem_tiles(cells: DataFrame, width: int, height: int) -> DataFrame:
    """Encode each tile's cells into the DEM bit stream and decode them
    back.  ``cells`` must carry (tile_id, idx, height) with idx in
    row-major order covering width*height exactly.

    Shuffle shape: one hash exchange on tile_id with an in-partition
    sort — same bytes moved as the previous collect_list(struct) form,
    but the kernel sees flat Arrow columns instead of per-row
    struct-dict arrays, and emits columnar numpy output instead of
    256k python tuples (measured ~2x on the 256k-cell gate query)."""
    from ..functions.dem_codec import decode_tile, encode_tile

    expected = width * height

    from ..functions.grouped import kernel_partitions

    d = cells.select("tile_id", "idx", "height").repartition(
        kernel_partitions(cells), "tile_id"
    ).sortWithinPartitions("tile_id", "idx")

    def kernel(batches):
        carry: pd.DataFrame | None = None

        def process(pdf, is_last):
            nonlocal carry
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            n = len(pdf)
            if n == 0:
                return None
            tids = pdf["tile_id"].to_numpy(np.int64)
            change = np.empty(n, dtype=bool)
            change[0] = True
            np.not_equal(tids[1:], tids[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            if not is_last:
                # last group may continue in the next Arrow batch
                carry = pdf.iloc[int(starts[-1]):].reset_index(drop=True)
                starts, ends = starts[:-1], ends[:-1]
            if len(starts) == 0:
                return None
            heights_all = pdf["height"].to_numpy(np.int64)
            out_tid: list[int] = []
            out_h: list[list[int]] = []
            hdr: list[tuple[int, int, int]] = []
            for g in range(len(starts)):
                s, e = int(starts[g]), int(ends[g])
                if e - s != expected:
                    continue  # partial tile: surfaces as missing rows
                heights = heights_all[s:e].tolist()
                base, max_delta, enc_type, stream = encode_tile(
                    heights, width, height)
                decoded = decode_tile(
                    stream, base, max_delta, enc_type, width, height)
                out_tid.append(int(tids[s]))
                out_h.append(decoded)
                hdr.append((base, max_delta, enc_type))
            if not out_tid:
                return None
            k = len(out_tid)
            hdr_a = np.asarray(hdr, dtype=np.int64)
            return pd.DataFrame({
                "tile_id": np.repeat(np.asarray(out_tid, dtype=np.int64), expected),
                "idx": np.tile(np.arange(expected, dtype=np.int32), k),
                "height": np.asarray(out_h, dtype=np.int32).ravel(),
                "base": np.repeat(hdr_a[:, 0], expected).astype(np.int32),
                "max_delta": np.repeat(hdr_a[:, 1], expected).astype(np.int32),
                "enc_type": np.repeat(hdr_a[:, 2], expected).astype(np.int32),
            })

        prev = None
        for pdf in batches:
            if prev is not None:
                out = process(prev, is_last=False)
                if out is not None:
                    yield out
            prev = pdf
        if prev is not None:
            out = process(prev, is_last=True)
            if out is not None:
                yield out

    return d.mapInPandas(kernel, _ROUNDTRIP_SCHEMA)


# ---------------------------------------------------------------------------
# Level planning (DEMFile.calc / calcTREBounds, DEMFile.java:74-137)
# ---------------------------------------------------------------------------

def _java_rem(a: int, b: int) -> int:
    r = abs(a) % abs(b)
    return r if a >= 0 else -r


def _move_up(lat32: int, distance: int) -> int:
    # DEMFile.moveUp: snap north to the distance raster
    moved = lat32 - _java_rem(lat32, distance)
    if lat32 >= 0 and moved < 0x3FFFFFFF - distance:
        moved += distance
    return moved


def _move_left(lon32: int, distance: int) -> int:
    # DEMFile.moveLeft: snap west to the distance raster
    moved = lon32 - _java_rem(lon32, distance)
    if lon32 < 0 and moved > -(1 << 31) + distance:
        moved -= distance
    return moved


def calc_tre_bounds(min_lat_mu: int, min_lon_mu: int,
                    max_lat_mu: int, max_lon_mu: int,
                    alignment: int = 4) -> Tuple[int, int, int, int]:
    """Widen and align the tile bbox for the TRE header
    (DEMFile.calcTREBounds): grow one unit, round each edge outward to
    the alignment, widen bottom/right one more step, clamp to the
    world.  Returns map units (min_lat, min_lon, max_lat, max_lon)."""
    from ..mapunits import to_map_unit

    top = max_lat_mu + 1
    left = min_lon_mu - 1
    bottom = min_lat_mu + 1
    right = max_lon_mu - 1
    while top % alignment != 0:
        top += 1
    while left % alignment != 0:
        left -= 1
    while bottom % alignment != 0:
        bottom += 1
    while right % alignment != 0:
        right -= 1
    bottom -= alignment
    right += alignment
    right = min(right, to_map_unit(180.0))
    left = max(left, to_map_unit(-180.0))
    top = min(top, to_map_unit(90.0))
    bottom = max(bottom, to_map_unit(-90.0))
    return bottom, left, top, right


@dataclass
class DemLevel:
    zoom: int
    top: int            # DEM units
    left: int
    area_height: int
    area_width: int
    point_dist: int
    last: bool


def dem_level_plan(min_lat_mu: int, min_lon_mu: int,
                   max_lat_mu: int, max_lon_mu: int,
                   point_dists: List[int],
                   highest_res: int = 1200) -> Tuple[Tuple[int, int, int, int], List[DemLevel]]:
    """Derive the per-zoom DEM sections for a tile bbox (map units) and
    the --dem-dists list: TRE-aligned DEM-unit corners, distance
    rounding to a multiple of 16, raster alignment when the distance
    fits inside the EXTRA widening (DEMFile.calc).  A point_dist of -1
    derives the distance from the best available HGT resolution."""
    tre = calc_tre_bounds(min_lat_mu, min_lon_mu, max_lat_mu, max_lon_mu)
    bottom_mu, left_mu, top_mu, right_mu = tre
    top = top_mu * 256
    bottom = bottom_mu * 256
    left = left_mu * 256
    right = right_mu * 256

    levels: List[DemLevel] = []
    last_dist = point_dists[-1]
    align_limit = int(math.floor(EXTRA / 45.0 * (1 << 29)))
    for zoom, point_dist in enumerate(point_dists):
        distance = point_dist
        if distance == -1:
            res = highest_res if highest_res > 0 else 1200
            distance = int(round((1 << 29) / (res * 45.0)))
        distance = ((distance + 8) // 16) * 16
        x_top, x_left = top, left
        if distance < align_limit:
            x_top = _move_up(top, distance)
            x_left = _move_left(left, distance)
        levels.append(DemLevel(zoom, x_top, x_left, x_top - bottom,
                               right - x_left, distance,
                               point_dist == last_dist))
    return tre, levels


# ---------------------------------------------------------------------------
# Lattice sampling (HGTConverter.getHeights / getElevation /
# interpolatedHeight, HGTConverter.java:115-185, 379-442)
# ---------------------------------------------------------------------------

def interpolated_height_vec(qx: np.ndarray, qy: np.ndarray,
                            hlt: np.ndarray, hrt: np.ndarray,
                            hrb: np.ndarray, hlb: np.ndarray) -> np.ndarray:
    """Vectorized twin of HGTConverter.interpolatedHeight: bilinear
    interpolation with the reference's void-corner ladder — a single
    missing corner is extrapolated from the other three unless the
    sample sits near it; two or more missing corners degrade to an
    edge interpolation or the nearest corner."""
    hlt = hlt.astype(np.float64)
    hrt = hrt.astype(np.float64)
    hrb = hrb.astype(np.float64)
    hlb = hlb.astype(np.float64)
    u_lt = hlt == _UNDEF
    u_rt = hrt == _UNDEF
    u_rb = hrb == _UNDEF
    u_lb = hlb == _UNDEF
    n_undef = (u_lt.astype(np.int8) + u_rt.astype(np.int8)
               + u_rb.astype(np.int8) + u_lb.astype(np.int8))

    def jround(x):
        return np.floor(x + 0.5)  # Java Math.round, not banker's rounding

    nearest = np.where(qx < 0.5, np.where(qy < 0.5, hlb, hlt),
                       np.where(qy < 0.5, hrb, hrt))
    top_edge = jround((1.0 - qx) * hlt + qx * hrt)
    bottom_edge = jround((1.0 - qx) * hlb + qx * hrb)
    left_edge = jround((1.0 - qy) * hlb + qy * hlt)
    right_edge = jround((1.0 - qy) * hrb + qy * hrt)

    out = np.full(qx.shape, float(_UNDEF))
    done = np.zeros(qx.shape, dtype=bool)

    def settle(mask, values):
        pick = mask & ~done
        out[pick] = values[pick] if isinstance(values, np.ndarray) else values
        done[pick] = True

    # ladder order matters: lb, rt, rb, lt (the reference's else-if chain)
    multi_lb = u_lb & (u_rb | u_lt | u_rt)
    settle(multi_lb & ~u_rt & ~u_lt & (qy > 0.5), top_edge)
    settle(multi_lb & ~u_rt & ~u_rb & (qx > 0.5), right_edge)
    settle(multi_lb, nearest)
    only_lb = u_lb & ~done & (n_undef == 1)
    settle(only_lb & (qx + qy < 0.4), float(_UNDEF))
    hlb = np.where(u_lb & ~done, hlt + hrb - hrt, hlb)

    multi_rt = u_rt & ~done & (u_lb | u_rb | u_lt)
    settle(multi_rt & ~u_lb & ~u_rb & (qy < 0.5), bottom_edge)
    settle(multi_rt & ~u_lb & ~u_lt & (qx < 0.5), left_edge)
    settle(multi_rt, nearest)
    only_rt = u_rt & ~done & (n_undef == 1)
    settle(only_rt & (qx + qy > 1.6), float(_UNDEF))
    hrt = np.where(u_rt & ~done, hlt + hrb - hlb, hrt)

    multi_rb = u_rb & ~done & (u_lb | u_lt | u_rt)
    settle(multi_rb & ~u_lt & ~u_rt & (qy > 0.5), top_edge)
    settle(multi_rb & ~u_lt & ~u_lb & (qx < 0.5), left_edge)
    settle(multi_rb, nearest)
    only_rb = u_rb & ~done & (n_undef == 1)
    settle(only_rb & (qy < qx - 0.4), float(_UNDEF))
    hrb = np.where(u_rb & ~done, hlb + hrt - hlt, hrb)

    multi_lt = u_lt & ~done & (u_lb | u_rb | u_rt)
    settle(multi_lt & ~u_rb & ~u_lb & (qy < 0.5), bottom_edge)
    settle(multi_lt & ~u_rb & ~u_rt & (qx > 0.5), right_edge)
    settle(multi_lt, nearest)
    only_lt = u_lt & ~done & (n_undef == 1)
    settle(only_lt & (qy > qx + 0.6), float(_UNDEF))
    hlt = np.where(u_lt & ~done, hlb + hrt - hrb, hlt)

    hxt = (1.0 - qx) * hlt + qx * hrt
    hxb = (1.0 - qx) * hlb + qx * hrb
    bilinear = jround((1.0 - qy) * hxb + qy * hxt)
    out[~done] = bilinear[~done]
    return out.astype(np.int32)


def _cubic_vec(p0, p1, p2, p3, t):
    """Catmull-Rom spline segment (HGTConverter.cubicInterpolation)."""
    return p1 + 0.5 * t * (p2 - p0 + t * (
        2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3 + t * (
            3.0 * (p1 - p2) + p3 - p0)))


def _extended_grid(key: Tuple[int, int],
                   grids: Dict[Tuple[int, int], Tuple[int, np.ndarray]]
                   ) -> np.ndarray:
    """Stitch a (res+3)^2 extension of one reader's grid for the
    16-point bicubic window: row/col -1 come from the adjacent
    reader's row res-1 / col res-1, row/col res+1 from its row/col 1
    (the shared edge is already duplicated inside each file), corners
    from the diagonal readers — exactly the borrow pattern of
    HGTConverter.fillArray, with UNDEF where the neighbour is missing
    or has a different resolution (prepReader's res check), which
    forces the same bilinear fallback."""
    cy, cx = key
    res, grid = grids[key]
    g = np.asarray(grid, dtype=np.int32).reshape(res + 1, res + 1)
    ext = np.full((res + 3, res + 3), _UNDEF, dtype=np.int32)
    ext[1:res + 2, 1:res + 2] = g

    def side(dy, dx):
        n = grids.get((cy + dy, cx + dx))
        if n is None or n[0] != res:
            return None
        return np.asarray(n[1], dtype=np.int32).reshape(res + 1, res + 1)

    below, above = side(-1, 0), side(1, 0)
    left, right = side(0, -1), side(0, 1)
    if below is not None:
        ext[0, 1:res + 2] = below[res - 1, :]
    if above is not None:
        ext[res + 2, 1:res + 2] = above[1, :]
    if left is not None:
        ext[1:res + 2, 0] = left[:, res - 1]
    if right is not None:
        ext[1:res + 2, res + 2] = right[:, 1]
    for dy, dx, ey, ex in ((-1, -1, 0, 0), (-1, 1, 0, res + 2),
                           (1, -1, res + 2, 0), (1, 1, res + 2, res + 2)):
        d = side(dy, dx)
        if d is not None:
            ext[ey, ex] = d[res - 1 if dy < 0 else 1,
                            res - 1 if dx < 0 else 1]
    return ext


def bicubic_height_vec(ext: np.ndarray, res: int,
                       x_left: np.ndarray, y_bottom: np.ndarray,
                       qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """16-point Catmull-Rom sample over the extended grid; returns
    UNDEF where any window value is missing (HGTConverter.fillArray
    returning false -> bilinear fallback)."""
    d = np.arange(4)
    win = ext[(y_bottom[:, None, None] + d[None, :, None]),
              (x_left[:, None, None] + d[None, None, :])].astype(np.float64)
    valid = ~(win == _UNDEF).any(axis=(1, 2))
    # cubic along y (per x column), then along x — eleArray[x][y] order
    cols = [_cubic_vec(win[:, 0, x], win[:, 1, x], win[:, 2, x],
                       win[:, 3, x], qy) for x in range(4)]
    val = _cubic_vec(cols[0], cols[1], cols[2], cols[3], qx)
    out = np.where(valid, np.floor(val + 0.5), float(_UNDEF))
    return out.astype(np.int32)


def sample_hgt_lattice(cells: DataFrame,
                       hgt_grids: Dict[Tuple[int, int], Tuple[int, np.ndarray]],
                       min_lat_deg: int, min_lon_deg: int,
                       outside_height: int = _UNDEF,
                       poly_rings=None) -> DataFrame:
    """Sample elevation at every lattice point.  ``cells`` carries a
    DEM-unit position (lat32, lon32) per point plus any pass-through
    columns; ``hgt_grids`` maps integer-degree SW corners to
    (res, south-first (res+1)^2 int16 grid) as produced by
    ``sources/hgt.py``.  (min_lat_deg, min_lon_deg) is the reader-grid
    origin; positions index into it through the reference's
    map-unit-quantized arithmetic (HGTConverter.java:81-82,122-139 —
    the origin passes through toMapUnit's 24-bit rounding, so samples
    carry the same sub-pixel offset the reference produces).  Points
    whose degree cell has no grid get ``outside_height``; the
    180-degree overflow guard (origin east of 0 but the point wrapped
    to <= 0) applies too.

    ``poly_rings`` (--dem-poly, a ``sources.polyfile`` ring list in map
    units): lattice points outside the polygon region get
    ``outside_height`` without touching the HGT grids — the point-wise
    equivalent of HGTConverter.getHeights' testArea.contains clip
    (HGTConverter.java:609-641; the polygon is in map units, the
    lattice in map units * 256, so rings scale by 256).

    Scale shape: the HGT dimension for one map tile is tens of
    one-degree grids — broadcast once per job; sampling is a
    mapInPandas over the lattice with pure numpy per batch, so cost is
    linear in points with no shuffle at all."""
    from pyspark.sql.types import IntegerType, StructField

    from ..mapunits import to_map_unit

    spark = cells.sparkSession
    bc = spark.sparkContext.broadcast(
        {k: (res, np.asarray(g, dtype=np.int16))
         for k, (res, g) in hgt_grids.items()})
    bc_poly = (spark.sparkContext.broadcast(list(poly_rings))
               if poly_rings else None)
    min_lat32 = int(to_map_unit(float(min_lat_deg))) * 256
    min_lon32 = int(to_map_unit(float(min_lon_deg))) * 256

    # copy, NOT .add(): StructType.add mutates in place and cells.schema
    # is the DataFrame's cached schema object
    from pyspark.sql.types import StructType
    out_schema = StructType(
        list(cells.schema.fields) + [StructField("height", IntegerType())])

    has_complex = "use_complex" in cells.columns

    def kernel(batches):
        grids = bc.value
        ext_cache: Dict[Tuple[int, int], np.ndarray] = {}
        for pdf in batches:
            lat32 = pdf["lat32"].to_numpy(np.int64)
            lon32 = pdf["lon32"].to_numpy(np.int64)
            rel_lat = (lat32 - min_lat32) * FACTOR
            rel_lon = (lon32 - min_lon32) * FACTOR
            row = np.trunc(rel_lat).astype(np.int64)
            col = np.trunc(rel_lon).astype(np.int64)
            h = np.full(len(pdf), outside_height, dtype=np.int32)
            # 180-degree overflow guard (HGTConverter.getHeights)
            guard = (pdf["lon_off"].to_numpy(np.int64) > 0) & (lon32 <= 0)
            ok = ~guard & (rel_lat >= 0) & (rel_lon >= 0)
            if bc_poly is not None:
                from ..sources.polyfile import points_in_poly

                ok &= points_in_poly(lat32, lon32, bc_poly.value, scale=256)
            want_complex = (pdf["use_complex"].to_numpy(bool)
                            if has_complex else np.zeros(len(pdf), bool))
            for (cy, cx), (res, grid) in grids.items():
                sel = ok & (row == cy - min_lat_deg) & (col == cx - min_lon_deg)
                if not sel.any():
                    continue
                if res <= 0:
                    h[sel] = 0  # ocean placeholder file
                    continue
                g = grid.reshape(res + 1, res + 1)
                scale = res * FACTOR
                y1 = (lat32[sel] - min_lat32) * scale - (cy - min_lat_deg) * res
                x1 = (lon32[sel] - min_lon32) * scale - (cx - min_lon_deg) * res
                x_left = np.clip(x1.astype(np.int64), 0, res - 1)
                y_bottom = np.clip(y1.astype(np.int64), 0, res - 1)
                qx = x1 - x_left
                qy = y1 - y_bottom
                hsel = np.full(sel.sum(), _UNDEF, dtype=np.int32)
                cx_sel = want_complex[sel]
                if cx_sel.any():
                    if (cy, cx) not in ext_cache:
                        ext_cache[(cy, cx)] = _extended_grid((cy, cx), grids)
                    hsel[cx_sel] = bicubic_height_vec(
                        ext_cache[(cy, cx)], res, x_left[cx_sel],
                        y_bottom[cx_sel], qx[cx_sel], qy[cx_sel])
                need = hsel == _UNDEF  # bilinear path + bicubic fallback
                if need.any():
                    hlb = g[y_bottom[need], x_left[need]]
                    hrb = g[y_bottom[need], x_left[need] + 1]
                    hlt = g[y_bottom[need] + 1, x_left[need]]
                    hrt = g[y_bottom[need] + 1, x_left[need] + 1]
                    hsel[need] = interpolated_height_vec(
                        qx[need], qy[need], hlt, hrt, hrb, hlb)
                h[sel] = hsel
            pdf = pdf.copy()
            pdf["height"] = h
            yield pdf

    return cells.mapInPandas(kernel, out_schema)


def build_dem(spark: SparkSession,
              hgt_grids: Dict[Tuple[int, int], Tuple[int, np.ndarray]],
              min_lat_mu: int, min_lon_mu: int,
              max_lat_mu: int, max_lon_mu: int,
              point_dists: List[int],
              outside_height: int = _UNDEF,
              highest_res: Optional[int] = None,
              interpolation: str = "auto",
              poly_rings=None):
    """The --dem stage end to end: plan the zoom levels for the tile
    bbox, carve each section into its tile grid, sample the HGT
    lattice, encode every tile into the Garmin bit stream, and derive
    the per-section record descriptors.

    Returns (tiles DataFrame from :func:`encode_dem_tiles` keyed by
    (zoom, tile_row, tile_col), sections DataFrame from
    :func:`section_record_desc` keyed by zoom, tre_bounds).

    ``interpolation``: "bilinear", "bicubic", or "auto"
    (HGTConverter.startNewLevel picks bicubic when the lattice is
    finer than a third of the HGT resolution); the bicubic window
    borrows across file edges from same-resolution neighbours exactly
    like HGTConverter.fillArray/prepReader, degrading to the bilinear
    void ladder otherwise.

    ``poly_rings`` (--dem-poly): clip the elevation lattice to a
    bounding polygon — points outside get ``outside_height``
    (--dem-outside-polygon, default the void value); see
    :func:`sample_hgt_lattice`.  The caller decides WHETHER to clip
    (MapBuilder.java:326-333 skips the polygon when it doesn't
    intersect or fully contains the widened tile rect — that guard
    lives in plans/main.build_dem_for_features)."""
    from ..mapunits import to_degrees

    if highest_res is None:
        highest_res = max((res for res, _ in hgt_grids.values()), default=1200)
    # reader-grid origin: the tile bbox widened by EXTRA and floored to
    # integer degrees (HGTConverter's constructor)
    min_lat_deg = max(int(math.floor(to_degrees(min_lat_mu) - EXTRA)), -90)
    min_lon_deg = max(int(math.floor(to_degrees(min_lon_mu) - EXTRA)), -180)
    tre, levels = dem_level_plan(min_lat_mu, min_lon_mu,
                                 max_lat_mu, max_lon_mu,
                                 point_dists, highest_res)
    def use_complex(distance: int) -> bool:
        # HGTConverter.startNewLevel: auto picks bicubic when the DEM
        # lattice is finer than 1/3 of the HGT resolution
        if interpolation == "bilinear":
            return False
        if interpolation == "bicubic":
            return True
        if highest_res <= 0:
            return False
        return (1 << 29) // ((45 // 3) * highest_res) + 20 > distance

    secs = spark.createDataFrame(
        pd.DataFrame([{
            "zoom": lv.zoom, "area_top": lv.top, "area_left": lv.left,
            "area_height": lv.area_height, "area_width": lv.area_width,
            "point_dist": lv.point_dist,
            "use_complex": use_complex(lv.point_dist),
        } for lv in levels]),
        schema="zoom long, area_top long, area_left long, "
               "area_height long, area_width long, point_dist long, "
               "use_complex boolean",
    )
    grid = section_tile_grid(secs)
    w = F.col("tile_width").cast("long")
    cells = grid.select(
        "zoom", F.col("tile_row").cast("long").alias("tile_row"),
        F.col("tile_col").cast("long").alias("tile_col"),
        "tile_width", "tile_height", "point_dist", "lat_off", "lon_off",
        "use_complex",
        F.explode(F.sequence(
            F.lit(0), (w * F.col("tile_height").cast("long")) - 1)).alias("idx"),
    ).select(
        "zoom", "tile_row", "tile_col",
        F.col("tile_width").cast("int").alias("tile_width"),
        F.col("tile_height").cast("int").alias("tile_height"),
        F.col("idx").cast("int").alias("idx"),
        "lon_off", "use_complex",
        (F.col("lat_off") - (F.col("idx") / w).cast("long")
         * F.col("point_dist")).alias("lat32"),
        (F.col("lon_off") + (F.col("idx") % w)
         * F.col("point_dist")).alias("lon32"),
    )
    sampled = sample_hgt_lattice(cells, hgt_grids, min_lat_deg,
                                 min_lon_deg, outside_height, poly_rings)
    tiles = encode_dem_tiles(
        sampled.select("zoom", "tile_row", "tile_col", "tile_width",
                       "tile_height", "idx", "height"),
        ["zoom", "tile_row", "tile_col"])
    sections = section_record_desc(tiles, ["zoom"])
    return tiles, sections, tre


def load_hgt_grids(dem_dirs: List[str],
                   min_lat_deg: int, min_lon_deg: int,
                   max_lat_deg: int, max_lon_deg: int
                   ) -> Dict[Tuple[int, int], Tuple[int, np.ndarray]]:
    """Driver-side HGT loader for the --dem stage: for every integer
    degree cell of the (already EXTRA-widened) area, look for
    {N|S}yy{E|W}xxx.hgt in the given directories (first hit wins, the
    reference's comma-separated path search) and return south-first
    grids keyed by SW corner.  A map tile spans tens of cells, so this
    stays a small broadcast dimension."""
    import os

    from ..sources.hgt import parse_hgt

    out: Dict[Tuple[int, int], Tuple[int, np.ndarray]] = {}
    empty = np.empty(0, dtype=np.int16)
    for lat in range(min_lat_deg, max_lat_deg):
        for lon in range(min_lon_deg, max_lon_deg):
            name = "%s%02d%s%03d.hgt" % (
                "N" if lat >= 0 else "S", abs(lat),
                "E" if lon >= 0 else "W", abs(lon))
            # missing or invalid cells record res=-1: the reference
            # treats them as sea (HGTReader res=-1; HGTConverter
            # getElevation 'res <= 0 -> return 0'), so the sampler's
            # ocean branch yields height 0 there — outside_height is
            # reserved for the --dem-poly clip, not missing coverage
            cell: Tuple[int, np.ndarray] = (-1, empty)
            for d in dem_dirs:
                p = os.path.join(d, name)
                if not os.path.exists(p):
                    continue
                with open(p, "rb") as f:
                    res, grid = parse_hgt(f.read())
                if res < 0:
                    continue
                # parse_hgt rows start at the north edge; the sampler
                # indexes south-first
                cell = (res, np.flipud(grid).copy().ravel())
                break
            out[(lat, lon)] = cell
    return out
