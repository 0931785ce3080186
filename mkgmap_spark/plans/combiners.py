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
    from ..functions.rank import global_rank

    # range-partitioned rank: at planet scale the tile directory can
    # reach millions of rows — never a single-partition window
    ranked = global_rank(
        j.join(counts, "tile_id", "left").na.fill(
            0, ["n_elements", "c_points", "c_lines", "c_shapes"]
        ),
        ["tile_id"],
        out="_rk",
    )
    return (
        ranked.withColumn("mapname", (F.lit(mapname_base) + F.col("_rk") - 1).cast("long"))
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
    from ..functions.rank import global_cumsum

    blocks = F.ceil(F.col("size_bytes") / block_size).cast("long")
    d = global_cumsum(
        manifest.withColumn("n_blocks", blocks), ["mapname"], "n_blocks", out="_off"
    )
    return d.select(
        "mapname",
        "tile_id",
        "n_blocks",
        (F.col("_off") * block_size).alias("byte_offset"),
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


# ---------------------------------------------------------------------------
# MDX / NSIS / GMAPI — the remaining --index / installer combiners
# (main/Main.java:689-716 registers MdxBuilder with MdrBuilder on
# --index, NsisBuilder on --nsis, GmapiBuilder on --gmapi).  Like the
# TDB/gmapsupp forms above, the engine emits the combiner SEMANTICS as
# tables; the binary/installer file encodings are out of scope.
# ---------------------------------------------------------------------------

DEFAULT_FAMILY_ID = 6324  # CommandArgs.DEFAULT_FAMILYID
DEFAULT_PRODUCT_ID = 1


def mdx_manifest(
    manifest: DataFrame,
    family_id: int = DEFAULT_FAMILY_ID,
    product_id: int = DEFAULT_PRODUCT_ID,
) -> DataFrame:
    """MDX mapset listing: "basically just a list of maps in a set"
    (combiners/MdxBuilder.java:26-49 — MdxFile.addMap(mapnameAsInt,
    hexname, filename) per img tile, plus the family/product header
    carried on every row)."""
    return manifest.select(
        F.lit(family_id).alias("family_id"),
        F.lit(product_id).alias("product_id"),
        F.col("mapname"),
        F.upper(F.hex(F.col("mapname"))).alias("hexname"),
        F.concat(F.col("mapname").cast("string"), F.lit(".img")).alias("filename"),
    )


def nsis_manifest(
    manifest: DataFrame,
    family_name: str = "OSM map",
    base_filename: str = "osm",
    family_id: int = DEFAULT_FAMILY_ID,
    product_id: int = DEFAULT_PRODUCT_ID,
    has_index: bool = False,
    typ_name: str | None = None,
) -> DataFrame:
    """NSIS installer script rows (combiners/NsisBuilder.java:129-180):
    the DEFINES header, the registry line, one added-File row per
    artifact and one removed-Delete row per artifact.  Section order
    and per-tile line order follow the reference's writeNsisFile;
    columns (section, seq, line) make the script reconstructible with
    ORDER BY section_rank, seq."""
    spark = manifest.sparkSession
    defines = [
        f'!define DEFAULT_DIR "C:\\Garmin\\Maps\\{family_name}"',
        f'!define INSTALLER_DESCRIPTION "{family_name}"',
        f'!define INSTALLER_NAME "{family_name}"',
        f'!define MAPNAME "{base_filename}"',
        f'!define PRODUCT_ID "{product_id}"',
        f'!define REG_KEY "{family_name}"',
    ]
    if has_index:
        defines.append("!define INDEX")
    if typ_name:
        defines.append(f'!define TYPNAME "{typ_name}"')
    added = ['  File "${MAPNAME}.img"']
    removed = ['  Delete "$INSTDIR\\${MAPNAME}.img"']
    if has_index:
        added += ['  File "${MAPNAME}_mdr.img"', '  File "${MAPNAME}.mdx"']
        removed += ['  Delete "$INSTDIR\\${MAPNAME}_mdr.img"', '  Delete "$INSTDIR\\${MAPNAME}.mdx"']
    if typ_name:
        added.append(f'  File "{typ_name}"')
        removed.append(f'  Delete "$INSTDIR\\{typ_name}"')
    added.append('  File "${MAPNAME}.tdb"')
    removed.append('  Delete "$INSTDIR\\${MAPNAME}.tdb"')

    head_rows = (
        [("defines", i, s) for i, s in enumerate(defines)]
        + [("regbin", 0,
            '  WriteRegBin HKLM "SOFTWARE\\Garmin\\MapSource\\Families\\${REG_KEY}" '
            f'"ID" {family_id_hex(family_id)}')]
        + [("added_files", i, s) for i, s in enumerate(added)]
        + [("removed_files", i, s) for i, s in enumerate(removed)]
        # trails the per-tile Delete rows (seq=mapname < 2^40)
        + [("removed_files", 1 << 40, '  Delete "$INSTDIR\\Uninstall.exe"')]
    )
    head = spark.createDataFrame(head_rows, "section string, seq long, line string")
    # per-tile rows are distributed (a planet mapset has thousands);
    # seq = mapname sorts them after the fixed header lines (header
    # seqs are < 100, mapnames are 8-digit) without any global window
    per_tile_added = manifest.select(
        F.lit("added_files").alias("section"),
        F.col("mapname").alias("seq"),
        F.concat(F.lit('  File "'), F.col("mapname").cast("string"), F.lit('.img"')).alias("line"),
    )
    per_tile_removed = manifest.select(
        F.lit("removed_files").alias("section"),
        F.col("mapname").alias("seq"),
        F.concat(F.lit('  Delete "$INSTDIR\\'), F.col("mapname").cast("string"), F.lit('.img"')).alias("line"),
    )
    return head.unionByName(per_tile_added).unionByName(per_tile_removed)


def family_id_hex(family_id: int) -> str:
    """NSIS WriteRegBin little-endian hex id (NsisBuilder.init:58-63)."""
    return f"{family_id & 0xFF:02x}{(family_id >> 8) & 0xFF:02x}"


def gmapi_layout(
    manifest: DataFrame,
    family_name: str = "OSM map",
    overview_name: str = "osmmap",
    has_index: bool = False,
    typ_name: str | None = None,
) -> DataFrame:
    """GMAPI (.gmap directory) layout rows (combiners/GmapiBuilder.java:
    85-136): one row per artifact placed under <family>.gmap/ — the
    Info.xml registry stand-in, the optional MDX/MDR copies, the TYP
    copy, one unzipped tile directory per img, and the per-product
    overview + TDB.  Columns (path, kind, mapname)."""
    spark = manifest.sparkSession
    root = f"{family_name}.gmap"
    fixed = [(f"{root}/Info.xml", "info_xml", None)]
    if has_index:
        fixed.append((f"{root}/{overview_name}.mdx", "mdx", None))
        fixed.append((f"{root}/{overview_name}_mdr", "mdr_dir", None))
    if typ_name:
        fixed.append((f"{root}/{typ_name}", "typ", None))
    fixed.append((f"{root}/Product1/{overview_name}.tdb", "tdb", None))
    fixed.append((f"{root}/Product1/{overview_name}", "overview_dir", None))
    head = spark.createDataFrame(fixed, "path string, kind string, mapname long")
    tiles = manifest.select(
        F.concat(F.lit(root + "/Product1/"), F.col("mapname").cast("string")).alias("path"),
        F.lit("tile_dir").alias("kind"),
        F.col("mapname"),
    )
    return head.unionByName(tiles)
