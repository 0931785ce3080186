"""Combiner jobs: the multi-tile packaging passes.

Reference: after every per-tile compile, mkgmap re-reads the finished
tiles and runs registered combiners (main/Main.endOptions:583-687):
TdbBuilder writes the tile directory (per-tile bounds + description +
section sizes + parent overview number, combiners/TdbBuilder.java:
50-110), GmapsuppBuilder packs every tile plus a global index into one
file ordered by mapname (combiners/GmapsuppBuilder.java), MdrBuilder
builds the global search index (already covered by the mdr_index
query) and OverviewBuilder re-runs the pipeline at coarse levels
(already covered by the level pyramid in plans/pipeline.py).

Engine form: the binary formats are out of scope (BASELINE input_hint
— the sink is tables); the combiner SEMANTICS are aggregations over
the tiles/membership tables:

- tdb_manifest: one row per detail tile with bounds (degrees and map
  units), per-kind element counts, size estimate, and the parent
  (overview) tile number — TdbFile DetailMapBlock fields.
- gmapsupp_layout: the single-file packing order and byte offsets —
  tiles sorted by mapname with a running offset (FileSystem layout is
  a running sum; exclusive scan via a window).

Both are pure JVM aggregations/windows over the tile tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..mapunits import UNITS_PER_CIRCLE

MAP_UNIT_DEG = 360.0 / UNITS_PER_CIRCLE  # imgfmt/Utils.toDegrees


def tdb_manifest(
    tiles: DataFrame,
    membership: DataFrame,
    overview_level: int | None = None,
    mapname_base: int = 63240001,
) -> DataFrame:
    """TDB detail-map directory over the tile tables.

    tiles: tiles_to_df schema; membership: (id, level, tile_id,
    kind_i).  Detail tiles are the finest level (level 0); the parent
    map number is the coarsest level's covering tile (the overview
    map), resolved by bounds containment like OverviewBuilder wires
    parents."""
    lv = [r[0] for r in tiles.select("level").distinct().collect()]
    detail_level = min(lv)
    overview_level = max(lv) if overview_level is None else overview_level

    detail = tiles.filter(F.col("level") == detail_level)
    counts = (
        membership.filter(F.col("level") == detail_level)
        .groupBy("tile_id")
        .agg(
            F.count(F.lit(1)).alias("n_elements"),
            F.sum(F.when(F.col("kind_i") == 0, 1).otherwise(0)).alias("c_points"),
            F.sum(F.when(F.col("kind_i") == 1, 1).otherwise(0)).alias("c_lines"),
            F.sum(F.when(F.col("kind_i") == 2, 1).otherwise(0)).alias("c_shapes"),
        )
    )
    ov = tiles.filter(F.col("level") == overview_level).select(
        F.col("tile_id").alias("parent_tile"),
        F.col("min_lat").alias("p_y0"), F.col("min_lon").alias("p_x0"),
        F.col("max_lat").alias("p_y1"), F.col("max_lon").alias("p_x1"),
    )
    # centre-containment join against the (small) overview level
    j = detail.join(
        F.broadcast(ov),
        ((F.col("min_lat") + F.col("max_lat")) / 2 >= F.col("p_y0"))
        & ((F.col("min_lat") + F.col("max_lat")) / 2 < F.col("p_y1"))
        & ((F.col("min_lon") + F.col("max_lon")) / 2 >= F.col("p_x0"))
        & ((F.col("min_lon") + F.col("max_lon")) / 2 < F.col("p_x1")),
        "left",
    )
    w = Window.orderBy("tile_id")
    return (
        j.join(counts, "tile_id", "left")
        .na.fill(0, ["n_elements", "c_points", "c_lines", "c_shapes"])
        .withColumn("mapname", (F.lit(mapname_base) + F.row_number().over(w) - 1).cast("long"))
        .select(
            "mapname",
            "tile_id",
            F.coalesce("parent_tile", F.lit(-1)).alias("parent_tile"),
            "min_lat", "min_lon", "max_lat", "max_lon",
            (F.col("min_lat") * MAP_UNIT_DEG).alias("min_lat_deg"),
            (F.col("min_lon") * MAP_UNIT_DEG).alias("min_lon_deg"),
            (F.col("max_lat") * MAP_UNIT_DEG).alias("max_lat_deg"),
            (F.col("max_lon") * MAP_UNIT_DEG).alias("max_lon_deg"),
            "n_elements",
            F.col("c_points").alias("n_points"),
            F.col("c_lines").alias("n_lines"),
            F.col("c_shapes").alias("n_shapes"),
            "size_bytes",
            F.concat(F.lit("tile "), F.col("tile_id").cast("string")).alias("description"),
        )
    )


def gmapsupp_layout(manifest: DataFrame, block_size: int = 512) -> DataFrame:
    """Single-file packing order: tiles sorted by mapname, each rounded
    up to whole filesystem blocks, with the running byte offset
    (GmapsuppBuilder's FileSystem layout as an exclusive-scan window)."""
    blocks = F.ceil(F.col("size_bytes") / block_size).cast("long")
    w = Window.orderBy("mapname").rowsBetween(Window.unboundedPreceding, -1)
    d = manifest.withColumn("n_blocks", blocks)
    return d.select(
        "mapname",
        "tile_id",
        "n_blocks",
        (F.coalesce(F.sum("n_blocks").over(w), F.lit(0)) * block_size).alias("byte_offset"),
        (F.col("n_blocks") * block_size).alias("byte_len"),
    )


def write_gpx_debug(features: DataFrame, out_dir: str) -> None:
    """GPX debug sink (util/GpxCreator.java): dump feature geometry for
    inspection.  One GPX document string per feature (trk/trkseg/trkpt
    in degrees), written as text — the debugging aid, not a data path."""
    from pyspark.sql import functions as F

    deg = 360.0 / (1 << 24)
    pts = (
        "aggregate(zip_with(lats, lons, (a, b) -> concat('<trkpt lat=\"', "
        f"cast(a * {deg!r} as string), '\" lon=\"', cast(b * {deg!r} as string), '\"/>')), "
        "'', (acc, x) -> concat(acc, x))"
    )
    gpx = F.concat(
        F.lit('<?xml version="1.0"?><gpx version="1.1"><trk><name>'),
        F.col("id").cast("string"),
        F.lit("</name><trkseg>"),
        F.expr(pts),
        F.lit("</trkseg></trk></gpx>"),
    )
    features.select(gpx.alias("value")).write.mode("overwrite").text(out_dir)
