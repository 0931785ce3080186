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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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

    keys = list(key_cols)
    grouped = cells.groupBy(*keys, "tile_width", "tile_height").agg(
        F.sort_array(F.collect_list(F.struct("idx", "height"))).alias("cells")
    )
    out_cols = keys + ["tile_width", "tile_height", "base", "max_delta",
                       "enc_type", "bs_len", "has_data", "max_height"]
    schema = ", ".join(
        [f"{k} bigint" for k in keys]
        + ["tile_width int", "tile_height int", "base int", "max_delta int",
           "enc_type int", "bs_len int", "has_data boolean",
           "max_height int"])

    def kernel(batches):
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                rec = tup._asdict()
                w, h = int(rec["tile_width"]), int(rec["tile_height"])
                heights = [int(c["height"]) for c in rec["cells"]]
                if len(heights) != w * h:
                    continue
                base, md, et, bs = encode_tile(heights, w, h)
                has_data = any(v != UNDEF for v in heights)
                rows.append(tuple(int(rec[k]) for k in keys) + (
                    w, h, base, md, et, len(bs), has_data,
                    base + md - (0 if et == 0 else 1),
                ))
            yield pd.DataFrame(rows, columns=out_cols)

    return grouped.mapInPandas(kernel, schema)


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
    base_size = F.when((F.col("min_base") > -128) & (F.col("max_base") < 128),
                       1).otherwise(2)
    delta_size = F.when(F.col("max_delta_height") <= 255, 1).otherwise(2)
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
    row-major order covering width*height exactly."""
    from ..functions.dem_codec import decode_tile, encode_tile

    expected = width * height

    grouped = cells.groupBy("tile_id").agg(
        F.sort_array(F.collect_list(F.struct("idx", "height"))).alias("cells")
    )

    cols = ["tile_id", "idx", "height", "base", "max_delta", "enc_type"]

    def kernel(batches):
        for pdf in batches:
            rows = []
            for tile_id, packed in zip(pdf["tile_id"], pdf["cells"]):
                if len(packed) != expected:
                    continue  # partial tile: surfaces as missing rows
                heights = [int(c["height"]) for c in packed]
                base, max_delta, enc_type, stream = encode_tile(
                    heights, width, height)
                decoded = decode_tile(
                    stream, base, max_delta, enc_type, width, height)
                tid = int(tile_id)
                rows.extend(
                    (tid, i, h, base, max_delta, enc_type)
                    for i, h in enumerate(decoded)
                )
            yield pd.DataFrame(rows, columns=cols)

    return grouped.mapInPandas(kernel, _ROUNDTRIP_SCHEMA)
