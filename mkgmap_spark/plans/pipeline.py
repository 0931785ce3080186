"""The flagship pipeline: documents -> decode -> tile split -> assignment.

mkgmap equivalent: MapMaker.makeMap (main/MapMaker.java:50) ->
MapBuilder.makeMapAreas (build/MapBuilder.java:740-814) for each level of
the pyramid (LevelInfo.java:40 "0:24, 1:22, 2:20, 3:18, 4:16").

Spark shape per level:
  decode (codegen) -> prepare (codegen) -> [cache] ->
  bounded histogram aggregations (1 + #refinement-rounds jobs) ->
  driver quadtree -> broadcast tree -> vectorized assignment (1 Arrow UDF)

The features DataFrame is cached once and reused across all levels and
refinement rounds; nothing but bounded histograms is ever collected.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..mapunits import DEFAULT_LEVELS, shift_for_resolution
from ..operators.decode import decode_documents
from ..operators import tiling


@dataclass
class TileBuildResult:
    tiles: DataFrame  # tile_id, level, bounds, counts
    membership: DataFrame  # id, level, tile_id, kind_i
    stats: list[dict]


def build_tiles(
    spark: SparkSession,
    documents: DataFrame,
    levels: tuple[tuple[int, int], ...] = DEFAULT_LEVELS,
    cache: bool = True,
    geometry_assign: bool = False,
    geometry_filters: bool = False,
) -> TileBuildResult:
    """documents -> (tiles, membership) over the level pyramid.

    ``geometry_assign=True`` turns on the MapArea geometry semantics
    for ways: clip-split of border-crossing shapes into every
    overlapping tile + private tiles for oversized lines
    (operators/clip_assign.py); points always go through the
    slot-aware point assignment.

    ``geometry_filters=True`` additionally runs the reference's
    per-level LayerFilterChain over way geometry before assignment
    (MapBuilder.java:1177-1251 Round -> Size -> DP -> Split ->
    RemoveObsolete; simplify.line_filter_chain/shape_filter_chain) —
    the geometry actually assigned at a coarse level is the thinned
    one, like each Subdivision stores filtered points."""
    features = decode_documents(documents).filter(F.col("kind").isin("node", "way"))
    return build_tiles_from_features(
        spark,
        features,
        levels=levels,
        cache=cache,
        geometry_assign=geometry_assign,
        geometry_filters=geometry_filters,
    )


def build_tiles_from_features(
    spark: SparkSession,
    features: DataFrame,
    levels: tuple[tuple[int, int], ...] = DEFAULT_LEVELS,
    cache: bool = True,
    geometry_assign: bool = False,
    geometry_filters: bool = False,
) -> TileBuildResult:
    """The build_tiles level loop over ALREADY-DECODED features
    (id, kind, tags, lats, lons, closed, min_res) — the entry the
    OSM-file front door (plans/main.py, elements_to_features) uses."""
    cols = ["id", "kind_i", "ay", "ax", "size_bytes", "min_res"]
    if geometry_assign:
        cols += ["lats", "lons"]
    prepared = tiling.prepare_features(features).select(*cols)
    if cache:
        prepared = prepared.persist()

    all_tiles = None
    all_members = None
    stats = []
    for level, resolution in levels:
        shift = shift_for_resolution(resolution)
        lvl_df = prepared.filter(F.col("min_res") <= resolution)
        provider = tiling.SparkHistogramProvider(lvl_df)
        result = tiling.split_level(provider, shift, level=level)
        tiles = result.tiles

        if geometry_assign:
            from ..operators.clip_assign import assign_ways_with_split

            pts = lvl_df.filter(F.col("kind_i") == tiling.POINT_KIND)
            m_pts = (
                tiling.assign_tiles(pts, result.index, resolution, level)
                .withColumn("part", F.lit(0))
                .select("id", "level", "tile_id", "kind_i", "part")
            )
            ways = lvl_df.filter(F.col("kind_i") != tiling.POINT_KIND)
            piece_ids = False
            if geometry_filters:
                from ..operators.simplify import line_filter_chain, shape_filter_chain

                # the LineSplitter inside the chain produces multiple
                # PIECES per way id; ids must stay unique through
                # assignment (duplicate ids would collide in membership
                # and fan out the private-tile join), so pieces get
                # synthetic ids id*4096+piece, decoded back below
                lines = line_filter_chain(
                    ways.filter(F.col("kind_i") == tiling.LINE_KIND), resolution
                ).withColumnRenamed("part", "_piece")
                shapes = shape_filter_chain(
                    ways.filter(F.col("kind_i") == tiling.SHAPE_KIND), resolution
                ).withColumn("_piece", F.lit(0))
                ways = (
                    lines.unionByName(shapes)
                    .withColumn("id", F.col("id") * 4096 + F.col("_piece"))
                    .drop("_piece")
                )
                piece_ids = True
            tiles, m_ways = assign_ways_with_split(spark, ways, result.index, tiles, shift, level)
            if piece_ids:
                # decode: original way id + a part unique across pieces
                m_ways = m_ways.withColumn(
                    "part", (F.pmod(F.col("id"), F.lit(4096)) * 256 + F.col("part")).cast("int")
                ).withColumn("id", F.floor(F.col("id") / 4096).cast("long"))
            m_ways = m_ways.join(lvl_df.select("id", "kind_i"), "id").select(
                "id", "level", "tile_id", "kind_i", "part"
            )
            members_df = m_pts.unionByName(m_ways)
        else:
            members_df = (
                tiling.assign_tiles(prepared, result.index, resolution, level)
                .withColumn("part", F.lit(0))
                .select("id", "level", "tile_id", "kind_i", "part")
            )

        tiles_df = tiling.tiles_to_df(spark, tiles)
        all_tiles = tiles_df if all_tiles is None else all_tiles.unionByName(tiles_df)
        all_members = members_df if all_members is None else all_members.unionByName(members_df)
        stats.append(
            {
                "level": level,
                "resolution": resolution,
                "n_tiles": len(tiles),
                "refine_rounds": result.refine_rounds,
                "cells_fetched": result.cells_fetched,
                "histogram_jobs": provider.jobs,
            }
        )
    return TileBuildResult(all_tiles, all_members, stats)


def elements_to_features(
    elements: DataFrame,
    rules=None,
) -> DataFrame:
    """Raw source elements (sources/{osm_xml,o5m,pbf}.read_* schema:
    nodes with map-unit lat/lon, ways with refs) -> the decoded
    features schema build_tiles consumes (id, kind, tags, lats, lons,
    closed, min_res).

    Way geometry comes from the order-preserving way->node join
    (sources/o5m.resolve_way_coords = ElementSaver.java:95-106).  When
    a parsed ruleset is given, the rule engine resolves each element's
    Garmin types and its min/max resolution — the StyledConverter
    convertNode/convertWay path: elements with no emission are dropped
    (unused-element semantics), min_res = the smallest min_res over
    the emitted types."""
    from ..sources.o5m import resolve_way_coords

    nodes = elements.filter(F.col("kind") == "node").select(
        "id",
        F.lit("node").alias("kind"),
        "tags",
        F.array(F.col("lat")).alias("lats"),
        F.array(F.col("lon")).alias("lons"),
    )
    ways = resolve_way_coords(elements).select(
        "id", F.lit("way").alias("kind"), "tags", "lats", "lons"
    )
    feats = nodes.unionByName(ways)
    closed = (F.size("lats") >= 4) & F.expr(
        "lats[0] = lats[size(lats) - 1] and lons[0] = lons[size(lons) - 1]"
    )
    feats = feats.withColumn("closed", closed)
    if rules is None:
        return feats.withColumn("min_res", F.lit(24))
    from ..rules import compile_rules

    styled = compile_rules(rules, feats, kind_col="kind", id_col="id")
    return (
        styled.filter(F.size("results") > 0)
        .withColumn("min_res", F.expr("array_min(transform(results, r -> r.min_res))"))
        .select("id", "kind", F.col("tags_out").alias("tags"), "lats", "lons", "closed", "min_res")
    )
